"""Text-analysis operators over the ``documents`` table: language ID,
quality scoring, token counting, document fingerprinting.

Everything runs as built-in column expressions (JVM-side, whole-stage
codegen) — no Python UDFs anywhere. For language ID, marker-token
scoring is a rendition of the classic n-gram-profile heuristic; the
profiles are tiny static lists compiled into the plan as CASE
expressions, which is exactly how you'd ship a 100-language profile
set at scale (broadcast of a small lookup, never a shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..queries.registry import register_query
from ..sources import load_table
from .hashing import SHINGLE_SIZE, TOKEN_SPLIT_REGEX

# Marker tokens per language (classic function-word profiles).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "de", "et", "un"),
    "es": ("el", "la", "de", "y", "un"),
    "de": ("der", "die", "das", "und", "ein"),
    "zh": ("的", "了", "是", "在", "我"),
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def _marker_score_sql(lang: str) -> str:
    """SUM of marker-token hits — same string for Spark F.expr and DuckDB."""
    cases = " + ".join(
        f"(CASE WHEN token = '{m}' THEN 1 ELSE 0 END)" for m in LANG_MARKERS[lang]
    )
    return f"SUM({cases})"


def _tok(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower("text"), TOKEN_SPLIT_REGEX)).alias("token"),
    ).filter(F.col("token") != "")


_TOK_SQL = f"""
  SELECT doc_id, lang, u.token FROM documents,
    LATERAL UNNEST(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_SPLIT_REGEX}')) AS u(token)
  WHERE u.token <> ''
"""


@register_query(
    "text_language_id",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    scores AS (
      SELECT doc_id, lang,
             {', '.join(f'{_marker_score_sql(lg)} AS s_{lg}' for lg in LANG_MARKERS)}
      FROM tok GROUP BY doc_id, lang
    )
    SELECT doc_id, lang AS actual_lang,
           CASE
             WHEN s_en >= s_fr AND s_en >= s_es AND s_en >= s_de AND s_en >= s_zh THEN 'en'
             WHEN s_fr >= s_es AND s_fr >= s_de AND s_fr >= s_zh THEN 'fr'
             WHEN s_es >= s_de AND s_es >= s_zh THEN 'es'
             WHEN s_de >= s_zh THEN 'de'
             ELSE 'zh'
           END AS predicted_lang
    FROM scores
    """,
    description="language ID via marker-token profile scoring (deterministic argmax)",
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tok(spark, sf_dir)
    scores = tok.groupBy("doc_id", "lang").agg(
        *[F.expr(_marker_score_sql(lg)).alias(f"s_{lg}") for lg in LANG_MARKERS]
    )
    s = {lg: F.col(f"s_{lg}") for lg in LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] >= s["fr"]) & (s["en"] >= s["es"]) & (s["en"] >= s["de"]) & (s["en"] >= s["zh"]),
            "en",
        )
        .when((s["fr"] >= s["es"]) & (s["fr"] >= s["de"]) & (s["fr"] >= s["zh"]), "fr")
        .when((s["es"] >= s["de"]) & (s["es"] >= s["zh"]), "es")
        .when(s["de"] >= s["zh"], "de")
        .otherwise("zh")
    )
    return scores.select(
        "doc_id", F.col("lang").alias("actual_lang"), predicted.alias("predicted_lang")
    )


@register_query(
    "text_quality_score",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    stats AS (
      SELECT doc_id,
             COUNT(*) AS n_tokens,
             CAST(SUM(LENGTH(token)) AS BIGINT) AS n_chars,
             SUM(CASE WHEN token IN {STOPWORDS} THEN 1 ELSE 0 END) AS n_stop
      FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           ROUND(CAST(n_chars AS DOUBLE) / n_tokens, 6) AS mean_word_len,
           ROUND(CAST(n_stop AS DOUBLE) / n_tokens, 6) AS stopword_ratio,
           CAST(CASE WHEN n_tokens >= 50 AND n_tokens <= 500
                 AND CAST(n_chars AS DOUBLE) / n_tokens BETWEEN 3 AND 10
                THEN 1 ELSE 0 END AS BIGINT) AS passes_quality
    FROM stats
    """,
    description="quality scoring: length/word-shape/stopword-ratio gates",
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = _tok(spark, sf_dir)
    stats = tok.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(F.length("token")).cast("bigint").alias("n_chars"),
        F.sum(F.when(F.col("token").isin(*STOPWORDS), 1).otherwise(0)).alias("n_stop"),
    )
    mean_len = F.col("n_chars").cast("double") / F.col("n_tokens")
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(F.col("n_stop").cast("double") / F.col("n_tokens"), 6).alias("stopword_ratio"),
        F.when(
            (F.col("n_tokens") >= 50)
            & (F.col("n_tokens") <= 500)
            & (mean_len >= 3)
            & (mean_len <= 10),
            1,
        )
        .otherwise(0)
        .cast("bigint")
        .alias("passes_quality"),
    )


@register_query(
    "text_token_counts",
    oracle=r"""
    SELECT doc_id,
           LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), t -> t <> '')) AS ws_tokens,
           LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '[^a-z0-9]+'), t -> t <> '')) AS bpe_ish_tokens,
           CAST(CEIL(LENGTH(text) / 4.0) AS BIGINT) AS byte_estimate_tokens
    FROM documents
    """,
    description="token counting: whitespace, regex word-piece, bytes/4 estimate",
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    bpe = F.filter(F.split(F.lower("text"), "[^a-z0-9]+"), lambda t: t != "")
    return docs.select(
        "doc_id",
        F.size(ws).cast("bigint").alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4.0).cast("bigint").alias("byte_estimate_tokens"),
    )


@register_query(
    "text_fingerprint",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id, STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_SPLIT_REGEX}') AS toks
      FROM documents
    ),
    tok AS (
      SELECT doc_id, toks[pos] AS token, pos
      FROM tokarr, LATERAL UNNEST(GENERATE_SERIES(1, LEN(toks))) AS g(pos)
      WHERE toks[pos] <> ''
    ),
    shingled AS (
      SELECT doc_id,
             CONCAT(token, ' ', LEAD(token, 1) OVER w, ' ', LEAD(token, 2) OVER w) AS shingle,
             LEAD(token, {SHINGLE_SIZE - 1}) OVER w AS complete
      FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    )
    SELECT doc_id, MIN(MD5(shingle)) AS fingerprint
    FROM shingled WHERE complete IS NOT NULL
    GROUP BY doc_id
    """,
    description="document fingerprint: min-hash over rolling 3-token shingles (winnowing-style)",
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.posexplode(F.split(F.lower("text"), TOKEN_SPLIT_REGEX)).alias("pos", "token"),
    ).filter(F.col("token") != "")
    w = Window.partitionBy("doc_id").orderBy("pos")
    shingled = tok.select(
        "doc_id",
        F.concat_ws(" ", "token", F.lead("token", 1).over(w), F.lead("token", 2).over(w)).alias(
            "shingle"
        ),
        F.lead("token", SHINGLE_SIZE - 1).over(w).alias("complete"),
    ).filter(F.col("complete").isNotNull())
    return shingled.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("fingerprint"))


# ------------------------------------------------------------ repetition
@register_query(
    "text_repetition_ratio",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(text, '{TOKEN_SPLIT_REGEX}'), t -> t <> '') AS toks
      FROM documents
    ),
    stats AS (
      SELECT doc_id,
             LEN(toks) AS n_tokens,
             LEN(LIST_DISTINCT(toks)) AS n_distinct,
             LEN(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                                i -> CONCAT(toks[i], ' ', toks[i + 1]))) AS n_bigrams,
             LEN(LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                                i -> CONCAT(toks[i], ' ', toks[i + 1])))) AS n_distinct_bigrams
      FROM tokarr WHERE LEN(toks) >= 2
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(1.0 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_token_ratio,
           ROUND(1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams, 6) AS dup_bigram_ratio,
           CAST(CASE WHEN 1.0 - CAST(n_distinct_bigrams AS DOUBLE) / n_bigrams <= 0.5
                THEN 1 ELSE 0 END AS BIGINT) AS passes_repetition
    FROM stats
    """,
    description="Gopher-style repetition gate: duplicate token / bigram fraction per doc",
)
def text_repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality gate (cf. Gopher/MassiveText rules): the
    fraction of repeated tokens and bigrams per document, computed
    entirely inside array expressions — per-doc work is map-side, no
    explode and no shuffle at any scale."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", TOKEN_SPLIT_REGEX), lambda t: t != F.lit(""))
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    base = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    withb = base.select(
        "doc_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
        F.size(bigrams).alias("n_bigrams"),
        F.size(F.array_distinct(bigrams)).alias("n_distinct_bigrams"),
    )
    dup_tok = 1.0 - F.col("n_distinct").cast("double") / F.col("n_tokens")
    dup_big = 1.0 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams")
    return withb.select(
        "doc_id",
        "n_tokens",
        F.round(dup_tok, 6).alias("dup_token_ratio"),
        F.round(dup_big, 6).alias("dup_bigram_ratio"),
        F.when(dup_big <= 0.5, 1).otherwise(0).cast("bigint").alias("passes_repetition"),
    )


# ------------------------------------------------------------ PII scrub
# The synthetic corpus holds no real PII, so the operator plants
# deterministic emails / phone numbers / IPs inside the query (the same
# planted-work pattern as the dedup corpus) and then finds + redacts
# them. Patterns are kept to the regex subset Java (Spark) and RE2
# (DuckDB) treat identically.
PII_EMAIL = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
PII_PHONE = r"\d{3}-\d{3}-\d{4}"
PII_IP = r"\d+\.\d+\.\d+\.\d+"


@register_query(
    "text_pii_scrub",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 4 = 0
                THEN ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com' ELSE '' END
             || CASE WHEN doc_id % 7 = 0 THEN ' call 555-123-4567' ELSE '' END
             || CASE WHEN doc_id % 9 = 0
                THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.1' ELSE '' END
               AS text
      FROM documents
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_PHONE}')) AS BIGINT) AS n_phones,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_IP}')) AS BIGINT) AS n_ips,
           MD5(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
             text, '{PII_EMAIL}', '<EMAIL>', 'g'),
                   '{PII_PHONE}', '<PHONE>', 'g'),
                   '{PII_IP}', '<IP>', 'g')) AS redacted_md5
    FROM planted
    """,
    description="PII scrub: count + redact planted emails/phones/IPs (shared Java/RE2-safe regexes)",
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redaction runs as three chained ``regexp_replace`` column
    expressions — whole-stage codegen, map-side only, no shuffle at any
    scale. Redaction-order is part of the contract (email, phone, IP):
    the phone pattern could otherwise bite into an already-redacted
    longer match."""
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 4 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com"),
                ),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") % 7 == 0, F.lit(" call 555-123-4567")).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.concat(
                    F.lit(" from 10.0."),
                    (F.col("doc_id") % 256).cast("string"),
                    F.lit(".1"),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), PII_EMAIL, "<EMAIL>"),
            PII_PHONE,
            "<PHONE>",
        ),
        PII_IP,
        "<IP>",
    )
    return planted.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(PII_PHONE), F.lit(0))).cast("bigint").alias("n_phones"),
        F.size(F.regexp_extract_all("text", F.lit(PII_IP), F.lit(0))).cast("bigint").alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


# ------------------------------------------------------ decontamination
# Benchmark decontamination: docs sharing 3-token shingles with a held-
# out "benchmark" subset (doc_id % 97 == 0 stands in for an external
# eval set) are flagged. The shingle inventory of the benchmark side is
# tiny — at cluster scale it broadcasts — so contamination checking is
# one map-side semi-join over the corpus shingle stream, never O(n²).
DECON_BENCH_MOD = 97
DECON_MIN_OVERLAP = 3


@register_query(
    "text_decontaminate",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_SPLIT_REGEX}'), t -> t <> '') AS toks
      FROM documents
    ),
    sh AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
               GENERATE_SERIES(1, LEN(toks) - {SHINGLE_SIZE - 1}),
               i -> CONCAT(toks[i], ' ', toks[i + 1], ' ', toks[i + 2])))) AS shingle
      FROM tokarr WHERE LEN(toks) >= {SHINGLE_SIZE}
    ),
    bench AS (
      SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_BENCH_MOD} = 0
    )
    SELECT s.doc_id,
           COUNT(*) AS n_overlapping_shingles,
           CAST(CASE WHEN COUNT(*) >= {DECON_MIN_OVERLAP} THEN 1 ELSE 0 END AS BIGINT)
             AS contaminated
    FROM sh s JOIN bench b ON s.shingle = b.shingle
    WHERE s.doc_id % {DECON_BENCH_MOD} <> 0
    GROUP BY s.doc_id
    """,
    description=f"benchmark decontamination: {SHINGLE_SIZE}-gram overlap vs a held-out subset, flag at >={DECON_MIN_OVERLAP}",
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_REGEX), lambda t: t != F.lit("")
    )
    shingle_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - (SHINGLE_SIZE - 1)),
            lambda i: F.concat_ws(
                " ",
                F.element_at("toks", i),
                F.element_at("toks", i + 1),
                F.element_at("toks", i + 2),
            ),
        )
    )
    sh = (
        docs.select("doc_id", toks.alias("toks"))
        .filter(F.size("toks") >= SHINGLE_SIZE)
        .select("doc_id", F.explode(shingle_arr).alias("shingle"))
    )
    bench = sh.filter(F.col("doc_id") % DECON_BENCH_MOD == 0).select("shingle").distinct()
    return (
        sh.filter(F.col("doc_id") % DECON_BENCH_MOD != 0)
        .join(bench, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlapping_shingles"))
        .select(
            "doc_id",
            "n_overlapping_shingles",
            F.when(F.col("n_overlapping_shingles") >= DECON_MIN_OVERLAP, 1)
            .otherwise(0)
            .cast("bigint")
            .alias("contaminated"),
        )
    )


# ------------------------------------------------------------ vocabulary
VOCAB_TOP_K = 20


@register_query(
    "vocab_top_tokens_per_lang",
    oracle=f"""
    WITH tok AS ({_TOK_SQL}),
    counts AS (
      SELECT lang, token, COUNT(*) AS n
      FROM tok GROUP BY lang, token
    )
    SELECT lang, token, n, rk FROM (
      SELECT lang, token, n,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rk
      FROM counts
    ) ranked WHERE rk <= {VOCAB_TOP_K}
    """,
    description=f"vocabulary extraction: top-{VOCAB_TOP_K} tokens per language by frequency (tokenizer-prep primitive)",
)
def vocab_top_tokens_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The vocabulary-building primitive behind tokenizer training:
    corpus-wide token counts, top-k per shard. Counting is a map-side
    partial aggregate (token space is Zipf-bounded, so the shuffle moves
    one row per distinct (lang, token), not per occurrence); top-k is a
    per-lang window over the already-aggregated counts. Deterministic
    tiebreak on the token string keeps ranks engine-stable."""
    tok = _tok(spark, sf_dir)
    counts = tok.groupBy("lang", "token").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), "token")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= VOCAB_TOP_K)
        .select("lang", "token", "n", "rk")
    )


COLLOC_MIN_COUNT = 5
COLLOC_TOP_K = 10


@register_query(
    "collocation_top_bigrams_per_lang",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id, lang,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_SPLIT_REGEX}'), t -> t <> '') AS toks
      FROM documents
    ),
    uni AS (
      SELECT lang, u.token, COUNT(*) AS c FROM tokarr, LATERAL UNNEST(toks) AS u(token)
      GROUP BY lang, u.token
    ),
    totals AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_total FROM uni GROUP BY lang),
    big AS (
      SELECT lang, b.bg, COUNT(*) AS c_xy FROM (
        SELECT doc_id, lang,
               UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
                 i -> CONCAT(toks[i], ' ', toks[i + 1]))) AS bg
        FROM tokarr WHERE LEN(toks) >= 2
      ) b GROUP BY lang, b.bg
    ),
    scored AS (
      SELECT big.lang, big.bg AS bigram, big.c_xy,
             ROUND(CAST(big.c_xy * t.n_total AS DOUBLE)
                   / CAST(u1.c * u2.c AS DOUBLE), 6) AS lift
      FROM big
      JOIN totals t ON t.lang = big.lang
      JOIN uni u1 ON u1.lang = big.lang AND u1.token = STRING_SPLIT(big.bg, ' ')[1]
      JOIN uni u2 ON u2.lang = big.lang AND u2.token = STRING_SPLIT(big.bg, ' ')[2]
      WHERE big.c_xy >= {COLLOC_MIN_COUNT}
    )
    SELECT lang, bigram, c_xy, lift, rk FROM (
      SELECT lang, bigram, c_xy, lift,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY lift DESC, bigram) AS rk
      FROM scored
    ) r WHERE rk <= {COLLOC_TOP_K}
    """,
    description=f"collocation mining: top-{COLLOC_TOP_K} bigrams per language by PMI-style lift (exact integer counts, ratio not log)",
)
def collocation_top_bigrams_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining over corpus bigrams: lift = c_xy * N /
    (c_x * c_y) — the PMI numerator/denominator as an exact-integer
    ratio (no log: libm log rounding differs across engines; the
    monotone ratio ranks identically). Unigram and bigram counting are
    both map-side partial aggregates; the three joins move only the
    Zipf-bounded count tables, never token occurrences."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_REGEX), lambda t: t != F.lit("")
    )
    tokarr = docs.select("doc_id", "lang", toks.alias("toks"))
    # ONE tokenize pass: the naive rendering (separate unigram count,
    # bigram count, totals, and two unigram join sides) re-scans and
    # re-tokenizes documents four times as four plan subtrees. Instead,
    # explode unigrams and bigrams together as tagged terms, count them
    # in one map-side-combined groupBy, and pin the Zipf-bounded count
    # table once — every downstream frame (uni, totals, both join
    # sides, bigrams) is then a cheap filter over the materialized
    # counts (guide §2.3 aggregate-before-shuffle + §3.3 materialize
    # the shared intermediate).
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    unigram_terms = F.transform(
        "toks", lambda t: F.struct(F.lit(0).alias("kind"), t.alias("term"))
    )
    bigram_terms = F.when(
        F.size("toks") >= 2,
        F.transform(
            bigrams, lambda b: F.struct(F.lit(1).alias("kind"), b.alias("term"))
        ),
    ).otherwise(F.array().cast("array<struct<kind:int,term:string>>"))
    counts = (
        tokarr.select(
            "lang", F.explode(F.concat(unigram_terms, bigram_terms)).alias("t")
        )
        .groupBy("lang", F.col("t.kind").alias("kind"), F.col("t.term").alias("term"))
        .agg(F.count("*").alias("c"))
        .localCheckpoint()
    )
    uni = counts.filter(F.col("kind") == 0).select(
        "lang", F.col("term").alias("token"), "c"
    )
    totals = uni.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n_total"))
    big = (
        counts.filter(F.col("kind") == 1)
        .select("lang", F.col("term").alias("bg"), F.col("c").alias("c_xy"))
        .filter(F.col("c_xy") >= COLLOC_MIN_COUNT)
    )
    w1 = F.split(F.col("bg"), " ").getItem(0)
    w2 = F.split(F.col("bg"), " ").getItem(1)
    u1 = uni.select(F.col("lang").alias("l1"), F.col("token").alias("t1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("lang").alias("l2"), F.col("token").alias("t2"), F.col("c").alias("c2"))
    scored = (
        big.withColumn("w1", w1)
        .withColumn("w2", w2)
        .join(totals, "lang")
        .join(u1, (F.col("lang") == F.col("l1")) & (F.col("w1") == F.col("t1")))
        .join(u2, (F.col("lang") == F.col("l2")) & (F.col("w2") == F.col("t2")))
        .select(
            "lang",
            F.col("bg").alias("bigram"),
            "c_xy",
            F.round(
                (F.col("c_xy") * F.col("n_total")).cast("double")
                / (F.col("c1") * F.col("c2")).cast("double"),
                6,
            ).alias("lift"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.desc("lift"), "bigram")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= COLLOC_TOP_K)
        .select("lang", "bigram", "c_xy", "lift", "rk")
    )


# -------------------------------------------------- bigram fluency
# LM-style corpus quality signal without a model: a doc is "fluent"
# when its bigrams are common CONTINUATIONS in the corpus — the
# integer-ratio rendering of average bigram log-likelihood. No log and
# no float product: p(y|x) is (c_xy * SCALE) DIV c_x (c_x = bigrams
# starting with x, so probabilities are self-consistent), and the doc
# score is the integer mean of those ratios — order-independent exact
# arithmetic both engines reproduce bit-for-bit. Template/boilerplate
# docs score high, token-salad scores near zero; corpus filters cut
# the low tail.
FLUENCY_SCALE = 1_000_000


@register_query(
    "text_bigram_fluency",
    oracle=f"""
    WITH tokarr AS (
      SELECT doc_id,
             LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '{TOKEN_SPLIT_REGEX}'), t -> t <> '') AS toks
      FROM documents
    ),
    doc_bigrams AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(toks) - 1),
               i -> CONCAT(toks[i], ' ', toks[i + 1]))) AS bg
      FROM tokarr WHERE LEN(toks) >= 2
    ),
    big AS (SELECT bg, COUNT(*) AS c_xy FROM doc_bigrams GROUP BY bg),
    first_tok AS (
      SELECT STRING_SPLIT(bg, ' ')[1] AS tok, CAST(SUM(c_xy) AS BIGINT) AS c_x
      FROM big GROUP BY 1
    )
    SELECT d.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(b.c_xy * {FLUENCY_SCALE} // f.c_x) // COUNT(*) AS BIGINT)
             AS fluency_scaled
    FROM doc_bigrams d
    JOIN big b ON b.bg = d.bg
    JOIN first_tok f ON f.tok = STRING_SPLIT(d.bg, ' ')[1]
    GROUP BY d.doc_id
    """,
    description=(
        "LM-style fluency score: per-doc integer mean of corpus bigram "
        "continuation ratios (c_xy*SCALE div c_x) — the quality filter signal, "
        "exact cross-engine (no log, no float product)"
    ),
)
def text_bigram_fluency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fluency from corpus bigram statistics. The bigram and
    first-token count tables are vocabulary-sized (Zipf-bounded, AQE
    broadcasts them); the per-doc aggregation shuffles doc_id only.
    Same tokenization as every text operator."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.split(F.lower("text"), TOKEN_SPLIT_REGEX), lambda t: t != F.lit("")
    )
    tokarr = docs.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size("toks") - 1),
        lambda i: F.concat_ws(" ", F.element_at("toks", i), F.element_at("toks", i + 1)),
    )
    # big feeds the first-token rollup and the scored join; pin the
    # vocabulary-sized count table once. doc_bg itself stays unpinned:
    # it is occurrence-sized and materializing it was measured slower
    # than re-running the tokenize pass (guide §5 caching caveat).
    doc_bg = tokarr.select("doc_id", F.explode(bigrams).alias("bg"))
    big = doc_bg.groupBy("bg").agg(F.count("*").alias("c_xy")).localCheckpoint()
    first_tok = (
        big.withColumn("tok", F.split("bg", " ").getItem(0))
        .groupBy("tok")
        .agg(F.sum("c_xy").cast("bigint").alias("c_x"))
    )
    scored = (
        doc_bg.join(big, "bg")
        .withColumn("tok", F.split("bg", " ").getItem(0))
        .join(first_tok, "tok")
        .withColumn("ratio", F.expr(f"c_xy * {FLUENCY_SCALE} DIV c_x"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.expr("SUM(ratio) DIV COUNT(*)").cast("bigint").alias("fluency_scaled"),
    )
