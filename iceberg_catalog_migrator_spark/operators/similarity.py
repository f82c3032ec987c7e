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


QUANT_SCALE = 1_000_000


@register_query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH q AS (
      SELECT vec_id, label,
             CAST(ROUND(CAST(embedding[pos] AS DOUBLE) * {QUANT_SCALE}, 0) AS BIGINT) AS x,
             pos
      FROM embeddings, LATERAL UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS g(pos)
    ),
    dots AS (
      SELECT a.vec_id AS v1, b.vec_id AS v2, SUM(a.x * b.x) AS dotq
      FROM q a JOIN q b ON a.pos = b.pos AND a.label = b.label AND a.vec_id < b.vec_id
      GROUP BY 1, 2
    ),
    norms AS (
      SELECT vec_id, SUM(x * x) AS d FROM q GROUP BY vec_id
    )
    SELECT v1, v2, cosine FROM (
      SELECT d.v1, d.v2,
             ROUND(CAST(d.dotq AS DOUBLE)
                   / SQRT(CAST(n1.d AS DOUBLE) * CAST(n2.d AS DOUBLE)), 6) AS cosine
      FROM dots d
      JOIN norms n1 ON n1.vec_id = d.v1
      JOIN norms n2 ON n2.vec_id = d.v2
    ) p WHERE cosine >= {NEAR_DUP_COSINE}
    """,
    description=f"embedding-cosine near-dup pairs (quantized cosine >= {NEAR_DUP_COSINE}) within coarse buckets",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection by embedding cosine, bucket-pruned.

    The coarse ``label`` column is the blocking key (at 100 TB it would
    be an LSH band or IVF cell id, which also bounds bucket size):
    candidate pairs exist only within a bucket, so pair count is
    sum-of-squares over buckets, not N².

    Determinism at any parallelism comes from quantization: each
    element is rounded once to an int64 (``round(x * 1e6)``, identical
    half-away-from-zero in Spark and the oracle), and the per-bucket
    Gram matrix is exact int64 arithmetic inside an Arrow-batched
    ``applyInPandas`` kernel (one numpy matmul per bucket — the 100 TB
    hot path). The kernel emits exact integer (dot, norm²) triples with
    a conservative prefilter; the final cosine + threshold is evaluated
    in Spark expressions with the exact same IEEE formula as the
    oracle, so the comparison is bit-stable."""
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.round(x * QUANT_SCALE, 0).cast("long"),
        ).alias("q"),
    )

    # any pair whose rounded cosine can reach the threshold satisfies
    # cosine >= threshold - 5e-7; prefilter with a hair more slack.
    prefilter = NEAR_DUP_COSINE - 6e-7

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        empty = pd.DataFrame(
            {
                "v1": pd.Series(dtype="int64"),
                "v2": pd.Series(dtype="int64"),
                "dotq": pd.Series(dtype="int64"),
                "d1": pd.Series(dtype="int64"),
                "d2": pd.Series(dtype="int64"),
            }
        )
        n = len(pdf)
        if n < 2:
            return empty
        X = np.array(pdf["q"].tolist(), dtype=np.int64)
        ids = pdf["vec_id"].to_numpy()
        G = X @ X.T  # exact: |x| <= ~1e7, d <= 64 * 1e14 << 2^63
        d = np.diag(G)
        iu, ju = np.triu_indices(n, k=1)
        dotq, di, dj = G[iu, ju], d[iu], d[ju]
        approx = dotq / np.sqrt(di.astype(np.float64) * dj.astype(np.float64))
        keep = approx >= prefilter
        v1 = np.minimum(ids[iu], ids[ju])[keep]
        v2 = np.maximum(ids[iu], ids[ju])[keep]
        return pd.DataFrame(
            {"v1": v1, "v2": v2, "dotq": dotq[keep], "d1": di[keep], "d2": dj[keep]}
        )

    triples = emb.groupBy("label").applyInPandas(
        bucket_pairs, "v1 long, v2 long, dotq long, d1 long, d2 long"
    )
    cosine = F.round(
        F.col("dotq") / F.sqrt(F.col("d1").cast("double") * F.col("d2").cast("double")), 6
    )
    return (
        triples.select("v1", "v2", cosine.alias("cosine"))
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
