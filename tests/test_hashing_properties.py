"""Cross-engine exactness of the shared hashing/arithmetic SQL layer.

Every dedup/similarity oracle assumes a set of SQL expressions evaluate
bit-identically in Spark and DuckDB (md5, INSTR, integer division above
2^53, hex-slice minhash components). These tests batch-evaluate each
shared expression over seeded random inputs in BOTH engines and against
a pure-Python model, so a semantic divergence (like FLOOR-over-double
dropping low bits of a 60-bit value) fails here, not in a 100-query
oracle run.
"""

import hashlib
import random

import duckdb
import pytest

from iceberg_catalog_migrator_spark.operators.dedup import (
    SIMHASH_HAM_BAND_BITS,
    SIMHASH_HAM_BANDS,
    SIMHASH_HAM_BITS,
    _simhash_band_expr,
)
from iceberg_catalog_migrator_spark.operators.hashing import (
    MINHASH_MD5_GROUPS,
    NUM_HASHES,
    minhash_expr,
    simhash_assemble_expr,
    simhash_hexval_expr,
)

RNG = random.Random(0xC0FFEE)


def _spark_sql_col(spark, values_sql: str, expr: str):
    return [r[0] for r in spark.sql(f"SELECT {expr} FROM {values_sql}").collect()]


def _duck_col(values_sql: str, expr: str):
    return [r[0] for r in duckdb.sql(f"SELECT {expr} FROM {values_sql}").fetchall()]


def test_band_extraction_exact_above_2_53(spark):
    # 60-bit fingerprints exceed the exact-double range; the per-engine
    # integer-division spellings must agree with bit-shift ground truth
    vals = [RNG.getrandbits(SIMHASH_HAM_BITS) for _ in range(200)]
    # force the dangerous region: high bits set
    vals += [(1 << 60) - 1 - i for i in range(20)]
    rows = ", ".join(f"({v})" for v in vals)
    values = f"(VALUES {rows}) AS t(simhash)"
    for band in range(SIMHASH_HAM_BANDS):
        mask = (1 << SIMHASH_HAM_BAND_BITS) - 1
        expect = [(v >> (SIMHASH_HAM_BAND_BITS * band)) & mask for v in vals]
        assert _spark_sql_col(spark, values, _simhash_band_expr(band, "spark")) == expect
        assert _duck_col(values, _simhash_band_expr(band, "duckdb")) == expect


def test_md5_and_hex_char_values_agree(spark):
    # the bedrock assumption: MD5 and INSTR-based hex decoding are
    # engine-identical, and match hashlib
    strs = ["".join(RNG.choices("abcdefgh 0123", k=RNG.randint(1, 30))) for _ in range(50)]
    rows = ", ".join("('{}')".format(s.replace("'", "''")) for s in strs)
    values = f"(VALUES {rows}) AS t(s)"
    expect_md5 = [hashlib.md5(s.encode()).hexdigest() for s in strs]
    assert _spark_sql_col(spark, values, "MD5(s)") == expect_md5
    assert _duck_col(values, "MD5(s)") == expect_md5
    # hex char -> 0..15 decoding over every md5 char position
    md5_rows = ", ".join(f"('{h}')" for h in expect_md5)
    md5_values = f"(VALUES {md5_rows}) AS t(mh)"
    for idx in (0, 7, 15, 31):
        expect = [int(h[idx], 16) for h in expect_md5]
        assert _spark_sql_col(spark, md5_values, simhash_hexval_expr(idx)) == expect
        assert _duck_col(md5_values, simhash_hexval_expr(idx)) == expect


def test_simhash_assemble_matches_python_model(spark):
    # random +/- bit sums -> assembled fingerprint must equal the Python
    # sign-bit fold, and stay inside a signed BIGINT
    n = SIMHASH_HAM_BITS
    sums = [[RNG.randint(-5, 5) for _ in range(n)] for _ in range(100)]
    rows = ", ".join("(" + ", ".join(str(b) for b in row) + ")" for row in sums)
    cols = ", ".join(f"b{j}" for j in range(n))
    values = f"(VALUES {rows}) AS t({cols})"
    expect = [sum((1 << j) for j in range(n) if row[j] > 0) for row in sums]
    assert all(v < (1 << 62) for v in expect)
    expr = simhash_assemble_expr(n_bits=n)
    assert _spark_sql_col(spark, values, expr) == expect
    assert _duck_col(values, expr) == expect


def test_minhash_components_are_disjoint_slices():
    # structural: the 16 components tile the 4 seeded md5s exactly, with
    # no overlap and no gap — an off-by-one here silently weakens LSH
    seen = set()
    for i in range(NUM_HASHES):
        e = minhash_expr(i)
        group, start = i // 4, i % 4 * 8 + 1
        assert e == f"MIN(SUBSTR(mh{group}, {start}, 8))"
        span = {(group, pos) for pos in range(start, start + 8)}
        assert not (span & seen)
        seen |= span
    assert len(seen) == MINHASH_MD5_GROUPS * 32


def test_minhash_min_agrees_cross_engine(spark):
    # lexicographic MIN over hex slices: batch a grouped min in both
    # engines over the same (doc, shingle-hash) rows
    docs = [(d, hashlib.md5(f"{g}:{d}-{s}".encode()).hexdigest())
            for d in range(8) for s in range(20) for g in [0]]
    rows = ", ".join(f"({d}, '{h}')" for d, h in docs)
    values = f"(VALUES {rows}) AS t(doc_id, mh0)"
    q = f"SELECT doc_id, {minhash_expr(0)} AS m FROM {values} GROUP BY doc_id ORDER BY doc_id"
    expect = {}
    for d, h in docs:
        expect[d] = min(expect.get(d, "g"), h[:8])
    spark_rows = [(r[0], r[1]) for r in spark.sql(q).collect()]
    duck_rows = list(duckdb.sql(q).fetchall())
    model = sorted(expect.items())
    assert spark_rows == model
    assert duck_rows == model
