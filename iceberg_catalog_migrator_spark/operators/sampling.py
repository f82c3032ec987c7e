"""Deterministic sampling and dataset splitting over ``documents``.

Training pipelines need reproducible splits: the same document must land
in the same split on every run, on any cluster size, with no coordination.
Both operators therefore key on a content-independent hash of the stable
id — never ``F.rand`` (seed-per-partition makes results depend on the
partitioning) and never row order.

- **train/val/test assignment**: md5(doc_id) mapped to [0,1) by taking
  8 hex chars as an integer over 2^32; range cuts give an 80/10/10
  split that is exact-per-document and engine-independent.
- **per-stratum sampling**: top-n per language by the same hash — a
  deterministic "random" n-per-group sample (window row_number, never
  ``first()`` or LIMIT-without-order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.registry import register_query
from ..sources import load_table

# u in [0,1): first 8 md5 hex chars of the id as a 32-bit fraction.
# CONV exists in Spark; DuckDB spells it differently, so each side gets
# its own rendering of the SAME integer (checked bit-identical by the
# oracle gate).
_SPARK_U = "CONV(SUBSTR(MD5(CAST(doc_id AS STRING)), 1, 8), 16, 10) / 4294967296.0"
_DUCK_U = (
    "CAST(('0x' || SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) / 4294967296.0"
)

N_PER_STRATUM = 50


@register_query(
    "sample_train_val_test_split",
    oracle=f"""
    SELECT split, COUNT(*) AS n_docs, MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM (
      SELECT doc_id,
             CASE WHEN {_DUCK_U} < 0.8 THEN 'train'
                  WHEN {_DUCK_U} < 0.9 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ) t
    GROUP BY split
    """,
    description="deterministic 80/10/10 train/val/test split by id-hash (stable across runs, partitionings, engines)",
)
def sample_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = F.expr(_SPARK_U)
    split = (
        F.when(u < 0.8, "train").when(u < 0.9, "val").otherwise("test").alias("split")
    )
    return (
        docs.select("doc_id", split)
        .groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


@register_query(
    "sample_n_per_language",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_DUCK_U}, doc_id) AS rk
      FROM documents
    ) t WHERE rk <= {N_PER_STRATUM}
    """,
    description=f"deterministic stratified sample: {N_PER_STRATUM} docs per language by id-hash order",
)
def sample_n_per_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.expr(_SPARK_U), "doc_id")
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= N_PER_STRATUM)
        .select("doc_id", "lang")
    )


TOKEN_BUDGET = 2048


@register_query(
    "pack_documents_to_token_budget",
    oracle=f"""
    SELECT lang, batch_id, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
    FROM (
      SELECT lang, n_tokens,
             CAST(FLOOR((running - n_tokens) / {TOKEN_BUDGET}.0) AS BIGINT) AS batch_id
      FROM (
        SELECT lang, n_tokens,
               SUM(n_tokens) OVER (
                 PARTITION BY lang ORDER BY {_DUCK_U}, doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running
        FROM (
          SELECT doc_id, lang,
                 LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> '')) AS n_tokens
          FROM documents
        ) d
      ) r
    ) b
    GROUP BY lang, batch_id
    """,
    description=f"sequence packing: assign docs to ~{TOKEN_BUDGET}-token training batches by hash-ordered cumulative sum, per language shard",
)
def pack_documents_to_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy batch assignment: batch_id = floor(exclusive-prefix-sum /
    budget) over a deterministic hash order. Packing runs per language
    shard (``partitionBy``), so at 100 TB each shard's window sort is
    local to its partition — a single global ordering would serialize."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(
        F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    ).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy(F.expr(_SPARK_U), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_tok = docs.select("doc_id", "lang", n_tokens.alias("n_tokens"))
    running = with_tok.withColumn("running", F.sum("n_tokens").over(w))
    batched = running.withColumn(
        "batch_id",
        F.floor((F.col("running") - F.col("n_tokens")) / float(TOKEN_BUDGET)).cast("bigint"),
    )
    return batched.groupBy("lang", "batch_id").agg(
        F.count("*").alias("n_docs"), F.sum("n_tokens").alias("batch_tokens")
    )


@register_query(
    "profile_orders_columns",
    oracle="""
    SELECT 'o_orderkey' AS col, COUNT(*) AS n, COUNT(o_orderkey) AS n_nonnull,
           COUNT(DISTINCT o_orderkey) AS n_distinct,
           CAST(MIN(o_orderkey) AS VARCHAR) AS min_val, CAST(MAX(o_orderkey) AS VARCHAR) AS max_val
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*), COUNT(o_custkey), COUNT(DISTINCT o_custkey),
           CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', COUNT(*), COUNT(o_orderstatus), COUNT(DISTINCT o_orderstatus),
           MIN(o_orderstatus), MAX(o_orderstatus)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', COUNT(*), COUNT(o_orderpriority), COUNT(DISTINCT o_orderpriority),
           MIN(o_orderpriority), MAX(o_orderpriority)
    FROM orders
    """,
    description="dataset profiling: per-column row/null/distinct counts and value ranges in ONE scan (struct-packed aggregates, not one scan per column)",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One aggregation pass computes every column's stats (the naive
    per-column loop would scan the table C times); the wide single-row
    result is exploded into the long (col, stats) form driver-side-free
    via stack."""
    orders = load_table(spark, sf_dir, "orders")
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
    aggs = [F.count("*").alias("n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"{c}__nonnull"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nonnull, {c}__distinct, {c}__min, {c}__max" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS (col, n_nonnull, n_distinct, min_val, max_val)"
        ),
        F.col("n"),
    ).select("col", "n", "n_nonnull", "n_distinct", "min_val", "max_val")


# ------------------------------------------------- composition report
@register_query(
    "corpus_composition_report",
    oracle=r"""
    SELECT source, lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), t -> t <> '')))
                AS BIGINT) AS total_tokens,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 4) AS mean_chars
    FROM documents
    GROUP BY source, lang
    """,
    description="corpus composition: doc/char/token totals per (source, lang) cell — the mixture table a data curator reads",
)
def corpus_composition_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One scan, one shuffle on the tiny (source, lang) key space.
    Token counting stays inside array expressions so the report costs a
    single aggregation pass no matter the corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != F.lit("")))
    return (
        docs.select("source", "lang", "n_chars", n_tokens.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.sum("n_chars").cast("double") / F.count("*"), 4).alias("mean_chars"),
        )
    )


# weight in [0,1]: token count over a 200-token saturation point. The
# division and LEAST are IEEE-double identical in both engines; the
# acceptance test u < w reuses the exact 32-bit id-hash fraction, so the
# sample is parallelism- and engine-invariant.
_W_TOKENS_SAT = 200


@register_query(
    "sample_importance_weighted",
    oracle=f"""
    WITH weighted AS (
      SELECT doc_id, lang,
             LEAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), t -> t <> ''))
                   / {_W_TOKENS_SAT}.0, 1.0) AS w
      FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM weighted WHERE {_DUCK_U} < w
    GROUP BY lang
    """,
    description="importance-weighted sampling: accept doc iff id-hash u < length-based weight (deterministic data-mixing primitive)",
)
def sample_importance_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted acceptance sampling, the data-mixing primitive for
    upweighting long/high-quality documents: accept iff u(doc_id) < w.
    Stateless map-side filter + one bounded aggregate — no shuffle of
    document payloads at any scale, and the same doc set is accepted
    under any partitioning (the hash is the randomness)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    w = F.least(F.size(toks) / float(_W_TOKENS_SAT), F.lit(1.0))
    return (
        docs.select("doc_id", "lang", w.alias("w"))
        .filter(F.expr(_SPARK_U) < F.col("w"))
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
    )


# ------------------------------------------ temperature / flattening mix
# UniMax-style language rebalancing: sample each language at rate
# min(1, sqrt(K / n_lang)) — i.e. p ∝ n^alpha with alpha = 0.5 — so
# head languages are downsampled toward a flatter mixture while tail
# languages keep everything. The rate is ONE IEEE double op chain
# (divide then sqrt, both correctly rounded), never a sum of doubles,
# so both engines compute bit-identical rates and the id-hash
# acceptance test picks the identical document set.
FLATTEN_K = 100


@register_query(
    "sample_flatten_by_language",
    oracle=f"""
    WITH c AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total,
             LEAST(1.0, SQRT({FLATTEN_K}.0 / COUNT(*))) AS rate
      FROM documents GROUP BY lang
    )
    SELECT c.lang, c.n_total,
           ROUND(c.rate, 6) AS sample_rate,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           MIN(d.doc_id) AS min_id, MAX(d.doc_id) AS max_id
    FROM documents d JOIN c USING (lang)
    WHERE {_DUCK_U} < c.rate
    GROUP BY c.lang, c.n_total, c.rate
    """,
    description=(
        f"temperature-flattened language mixture (rate = min(1, sqrt({FLATTEN_K}/n)), "
        "alpha = 0.5): head languages downsampled, tail kept — deterministic data mixing"
    ),
)
def sample_flatten_by_language(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened-mixture sampling across languages (the multilingual
    pretraining rebalance: p ∝ n^0.5 capped at keep-everything).

    100 TB shape: the per-language census is a handful of rows, so it
    broadcasts; the acceptance test is then a stateless map-side filter
    over the corpus — documents are never shuffled, and the accepted
    set is invariant to partitioning because the id-hash is the only
    randomness."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count("*").cast("bigint").alias("n_total"))
    rate = F.least(F.lit(1.0), F.sqrt(F.lit(float(FLATTEN_K)) / F.col("n_total")))
    return (
        docs.select("doc_id", "lang", F.expr(_SPARK_U).alias("u"))
        .join(F.broadcast(counts.withColumn("rate", rate)), "lang")
        .filter(F.col("u") < F.col("rate"))
        .groupBy("lang", "n_total", "rate")
        .agg(
            F.count("*").cast("bigint").alias("n_sampled"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .select(
            "lang",
            "n_total",
            F.round("rate", 6).alias("sample_rate"),
            "n_sampled",
            "min_id",
            "max_id",
        )
    )


# ------------------------------------------------- sliding-window chunking
# Training-prep chunker: split each document into overlapping
# fixed-size token windows (stride < window ⇒ consecutive chunks share
# window−stride tokens of context, the standard LM packing prep).
CHUNK_TOKENS = 64
CHUNK_STRIDE = 48


@register_query(
    "chunk_documents_sliding",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(text, '\\s+'), x -> x <> '') AS toks
      FROM documents
    ),
    s AS (
      SELECT doc_id, toks,
             UNNEST(GENERATE_SERIES(0, LEN(toks) - 1, {CHUNK_STRIDE})) AS st
      FROM t WHERE LEN(toks) > 0
    )
    SELECT doc_id,
           CAST(st // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(LEN(LIST_SLICE(toks, st + 1, LEAST(st + {CHUNK_TOKENS}, LEN(toks)))) AS BIGINT)
             AS n_tokens,
           MD5(ARRAY_TO_STRING(
             LIST_SLICE(toks, st + 1, LEAST(st + {CHUNK_TOKENS}, LEN(toks))), ' '))
             AS chunk_md5
    FROM s
    """,
    description=(
        f"sliding-window chunking: {CHUNK_TOKENS}-token windows every {CHUNK_STRIDE} "
        f"tokens ({CHUNK_TOKENS - CHUNK_STRIDE}-token overlap) — LM training-prep chunker"
    ),
)
def chunk_documents_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking for context-length-bounded
    training examples. Entirely map-side: tokenize, generate window
    starts with ``sequence``, ``posexplode``, ``slice`` — a narrow
    per-row expansion with NO shuffle at any scale (the expansion
    factor is ~len/stride, bounded by document length). Chunk identity
    is the md5 of the joined window so downstream exact-dedup can run
    at chunk granularity."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != F.lit(""))
    base = (
        docs.select("doc_id", toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") > 0)
    )
    exploded = base.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))).alias(
            "chunk_idx", "start"
        ),
    )
    chunk = F.slice("toks", F.col("start") + 1, F.lit(CHUNK_TOKENS))
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_md5"),
    )
