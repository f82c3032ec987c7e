"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Two tiers:

- **brute-force cosine top-k** — the correctness baseline. Dot products
  are computed by position-join with exact decimal accumulation, so the
  result is bit-identical at any parallelism and in the oracle. At
  scale this is the O(Q·N) fallback; Q (query set) stays small.
- **IVF-style partitioned top-k** — the scale path: candidates are
  restricted to the query's coarse partition (the ``label`` column
  plays the IVF cell id), turning the N in O(Q·N) into N/cells. On a
  real corpus the cell id comes from a k-means fit; the Spark plumbing
  (partition-pruned join + per-query top-k window) is identical.

A fully array-native implementation (``F.zip_with`` fold) is faster per
row but float-addition order makes it engine-dependent; the decimal
position-join is the provably-reproducible form. Both are O(Q·N·D)
work; the shuffle shape is the same.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.registry import register_query
from ..sources import load_table

TOP_K = 5
N_QUERIES = 10  # vec_id < 10 form the query set

# Exact per-pair dot/norm via decimal accumulation (order-independent).
_PAIR_DOT_SQL = f"""
  WITH q AS (
    SELECT vec_id AS q_id, CAST(embedding[pos] AS DOUBLE) AS qx, pos
    FROM embeddings, LATERAL UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(pos)
    WHERE vec_id < {N_QUERIES}
  ),
  c AS (
    SELECT vec_id AS c_id, CAST(embedding[pos] AS DOUBLE) AS cx, pos
    FROM embeddings, LATERAL UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(pos)
  ),
  dots AS (
    SELECT q.q_id, c.c_id,
           CAST(SUM(CAST(q.qx * c.cx AS DECIMAL(28,14))) AS DOUBLE) AS dot
    FROM q JOIN c ON q.pos = c.pos
    WHERE q.q_id <> c.c_id
    GROUP BY q.q_id, c.c_id
  ),
  norms AS (
    SELECT vec_id,
           SQRT(CAST(SUM(CAST(
             CAST(embedding[pos] AS DOUBLE) * CAST(embedding[pos] AS DOUBLE)
             AS DECIMAL(28,14))) AS DOUBLE)) AS nrm
    FROM embeddings, LATERAL UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(pos)
    GROUP BY vec_id
  )
  SELECT d.q_id, d.c_id, ROUND(d.dot / (nq.nrm * nc.nrm), 6) AS cosine
  FROM dots d
  JOIN norms nq ON nq.vec_id = d.q_id
  JOIN norms nc ON nc.vec_id = d.c_id
"""


def _exploded(df: DataFrame, id_alias: str, x_alias: str) -> DataFrame:
    return df.select(
        F.col("vec_id").alias(id_alias),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", x_alias),
    )


def _norms(emb: DataFrame) -> DataFrame:
    e = _exploded(emb, "vec_id", "x")
    return e.groupBy("vec_id").agg(
        F.sqrt(
            F.sum((F.col("x") * F.col("x")).cast("decimal(28,14)")).cast("double")
        ).alias("nrm")
    )


def _pair_cosines(spark: SparkSession, sf_dir: str, prune_by_label: bool = False) -> DataFrame:
    """(q_id, c_id, cosine) for query×candidate pairs.

    With ``prune_by_label`` the label (IVF cell) is part of the join
    key, so non-cell pairs are never materialized — the pruning happens
    in the join, not as a post-filter."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < N_QUERIES)
    q = _exploded(queries, "q_id", "qx")
    c = _exploded(emb, "c_id", "cx")
    join_keys = ["pos"]
    if prune_by_label:
        labels = emb.select("vec_id", "label")
        q = q.join(
            F.broadcast(labels.select(F.col("vec_id").alias("q_id"), "label")), "q_id"
        )
        c = c.join(
            F.broadcast(labels.select(F.col("vec_id").alias("c_id"), "label")), "c_id"
        )
        join_keys = ["pos", "label"]
    # broadcast the exploded query side (Q×D rows, tiny by construction):
    # joining on `pos` alone has only D distinct keys — a shuffled join
    # would put the entire candidate corpus through a D-way skewed
    # exchange. Broadcasting keeps the big side map-side only; the one
    # remaining shuffle is the (q_id, c_id) partial aggregation.
    dots = (
        c.join(F.broadcast(q), join_keys)
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum((F.col("qx") * F.col("cx")).cast("decimal(28,14)")).cast("double").alias("dot"))
    )
    norms = _norms(emb)
    nq = norms.select(F.col("vec_id").alias("q_id"), F.col("nrm").alias("qn"))
    nc = norms.select(F.col("vec_id").alias("c_id"), F.col("nrm").alias("cn"))
    return (
        dots.join(F.broadcast(nq), "q_id")
        .join(nc, "c_id")
        .select("q_id", "c_id", F.round(F.col("dot") / (F.col("qn") * F.col("cn")), 6).alias("cosine"))
    )


@register_query(
    "similarity_bruteforce_topk",
    oracle=f"""
    SELECT q_id, c_id, cosine, rk FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
      FROM ({_PAIR_DOT_SQL}) pairs
    ) ranked
    WHERE rk <= {TOP_K}
    """,
    description=f"brute-force cosine top-{TOP_K} for {N_QUERIES} query vectors (exact baseline)",
)
def similarity_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _pair_cosines(spark, sf_dir)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cosine", "rk")
    )


NEAR_DUP_COSINE = 0.30


@register_query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, label, CAST(embedding[pos] AS DOUBLE) AS x, pos
      FROM embeddings, LATERAL UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(pos)
    ),
    dots AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2,
             CAST(SUM(CAST(a.x * b.x AS DECIMAL(28,14))) AS DOUBLE) AS dot
      FROM e a JOIN e b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    norms AS (
      SELECT vec_id,
             SQRT(CAST(SUM(CAST(x * x AS DECIMAL(28,14))) AS DOUBLE)) AS nrm
      FROM e GROUP BY vec_id
    )
    SELECT v1, v2, cosine FROM (
      SELECT d.v1, d.v2, ROUND(d.dot / (n1.nrm * n2.nrm), 6) AS cosine
      FROM dots d
      JOIN norms n1 ON n1.vec_id = d.v1
      JOIN norms n2 ON n2.vec_id = d.v2
    ) p WHERE cosine >= {NEAR_DUP_COSINE}
    """,
    description=f"embedding-cosine near-dup pairs (cosine >= {NEAR_DUP_COSINE}) within coarse buckets",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection by embedding cosine, bucket-pruned.

    The coarse ``label`` column is the blocking key (at 100 TB it would
    be an LSH band or IVF cell id): candidate pairs are generated only
    within a bucket, so pair count is sum-of-squares over buckets, not
    N². The dot product uses the same exact decimal position-join as
    the top-k queries; the exploded query side is broadcast, so the
    only shuffle is the (v1, v2) partial aggregation."""
    emb = load_table(spark, sf_dir, "embeddings")

    def exploded(id_alias: str, x_alias: str) -> DataFrame:
        return emb.select(
            F.col("vec_id").alias(id_alias),
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", x_alias),
        )

    a = exploded("v1", "ax")
    b = exploded("v2", "bx")
    dots = (
        b.join(F.broadcast(a), ["pos", "label"])
        .filter(F.col("v1") < F.col("v2"))
        .groupBy("v1", "v2")
        .agg(F.sum((F.col("ax") * F.col("bx")).cast("decimal(28,14)")).cast("double").alias("dot"))
    )
    norms = _norms(emb)
    n1 = norms.select(F.col("vec_id").alias("v1"), F.col("nrm").alias("nrm1"))
    n2 = norms.select(F.col("vec_id").alias("v2"), F.col("nrm").alias("nrm2"))
    return (
        dots.join(F.broadcast(n1), "v1")
        .join(F.broadcast(n2), "v2")
        .select("v1", "v2", F.round(F.col("dot") / (F.col("nrm1") * F.col("nrm2")), 6).alias("cosine"))
        .filter(F.col("cosine") >= NEAR_DUP_COSINE)
    )


@register_query(
    "similarity_ivf_topk",
    oracle=f"""
    WITH pairs AS ({_PAIR_DOT_SQL}),
    labeled AS (
      SELECT p.q_id, p.c_id, p.cosine
      FROM pairs p
      JOIN embeddings eq ON eq.vec_id = p.q_id
      JOIN embeddings ec ON ec.vec_id = p.c_id
      WHERE eq.label = ec.label
    )
    SELECT q_id, c_id, cosine, rk FROM (
      SELECT q_id, c_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rk
      FROM labeled
    ) ranked
    WHERE rk <= {TOP_K}
    """,
    description=f"IVF-style ANN: candidates pruned to the query's coarse partition (label) before top-{TOP_K}",
)
def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    pruned = _pair_cosines(spark, sf_dir, prune_by_label=True)
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), "c_id")
    return (
        pruned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TOP_K)
        .select("q_id", "c_id", "cosine", "rk")
    )
