"""Theta/KMV distinct-count sketches: the vectorized long path against
the scalar murmur3 reference, estimation accuracy, the compact binary
layout (preamble pinned byte-by-byte), union semantics, and the
distributed one-pass construction over a Spark frame."""

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.sources.sketches import (
    _MAX_THETA,
    DEFAULT_UPDATE_SEED,
    SketchError,
    ThetaSketch,
    dataframe_ndv_sketches,
    hash63_bytes,
    hash63_longs,
    murmur3_x64_128,
    seed_hash,
)


# ------------------------------------------------------------- hashing
@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1), max_size=50))
def test_vectorized_long_hash_equals_scalar(vals):
    """The numpy tail-only pipeline must agree with the scalar
    reference implementation bit for bit."""
    arr = np.array(vals, dtype=np.int64)
    vec = hash63_longs(arr)
    ref = np.array(
        [
            murmur3_x64_128(struct.pack("<q", int(v)), DEFAULT_UPDATE_SEED)[0] >> 1
            for v in vals
        ],
        dtype=np.uint64,
    )
    assert np.array_equal(vec, ref)


def test_scalar_hash_block_and_tail_paths():
    """Exercise every murmur3 path: full 16-byte blocks, a >8-byte
    tail, a short tail, empty input; determinism and seed
    sensitivity."""
    for data in (b"", b"a", b"12345678", b"123456789", b"x" * 16, b"y" * 37):
        a = murmur3_x64_128(data, 0)
        b = murmur3_x64_128(data, 0)
        assert a == b
        assert murmur3_x64_128(data, 1) != a or data == b""
    assert murmur3_x64_128(b"", 0) == (0, 0)  # published: empty/seed-0 is zero


def test_string_hash_matches_scalar():
    items = [b"alpha", b"beta", b"", b"\xf0\x9f\x8c\x8d utf8"]
    got = hash63_bytes(items)
    want = [murmur3_x64_128(b, DEFAULT_UPDATE_SEED)[0] >> 1 for b in items]
    assert got.tolist() == want


def test_seed_hash_nonzero_and_stable():
    assert seed_hash() == seed_hash(DEFAULT_UPDATE_SEED) != 0


# ------------------------------------------------------------ estimates
def test_exact_mode_under_k():
    h = hash63_longs(np.arange(1000, dtype=np.int64))
    sk = ThetaSketch.from_hashes(h, k=4096)
    assert sk.theta == _MAX_THETA
    assert sk.estimate() == 1000.0


def test_estimation_accuracy_100k():
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2**62, size=100_000, dtype=np.int64)
    exact = len(np.unique(vals))
    sk = ThetaSketch.from_hashes(hash63_longs(vals), k=4096)
    assert sk.theta < _MAX_THETA
    assert abs(sk.estimate() - exact) <= 0.05 * exact


def test_union_of_disjoint_halves():
    a = ThetaSketch.from_hashes(
        hash63_longs(np.arange(0, 50_000, dtype=np.int64)), k=2048
    )
    b = ThetaSketch.from_hashes(
        hash63_longs(np.arange(25_000, 100_000, dtype=np.int64)), k=2048
    )
    u = a.union(b)
    assert abs(u.estimate() - 100_000) <= 0.08 * 100_000


# -------------------------------------------------------- serialization
def test_compact_bytes_roundtrip_and_preamble():
    h = hash63_longs(np.arange(10, dtype=np.int64))
    sk = ThetaSketch.from_hashes(h, k=4096)
    raw = sk.to_bytes()
    # preamble pinned: 2 pre-longs (exact mode), serial version 3,
    # family 3 (compact theta), flags = READ_ONLY|COMPACT|ORDERED
    assert raw[0] == 2 and raw[1] == 3 and raw[2] == 3
    assert raw[5] == 2 | 8 | 16
    assert struct.unpack_from("<H", raw, 6)[0] == seed_hash()
    assert struct.unpack_from("<I", raw, 8)[0] == 10
    back = ThetaSketch.from_bytes(raw)
    assert back.theta == _MAX_THETA
    assert np.array_equal(back.hashes, sk.hashes)
    assert back.estimate() == 10.0


def test_compact_bytes_estimating_mode():
    rng = np.random.default_rng(7)
    sk = ThetaSketch.from_hashes(
        hash63_longs(rng.integers(0, 2**62, 50_000, dtype=np.int64)), k=1024
    )
    raw = sk.to_bytes()
    assert raw[0] == 3  # 3 pre-longs: theta long present
    back = ThetaSketch.from_bytes(raw)
    assert back.theta == sk.theta and len(back.hashes) == 1024
    assert back.estimate() == sk.estimate()


def test_empty_sketch_bytes():
    sk = ThetaSketch.from_hashes(np.empty(0, np.uint64))
    raw = sk.to_bytes()
    assert raw[0] == 1 and raw[5] & 4  # 1 pre-long, EMPTY flag
    assert len(raw) == 8
    back = ThetaSketch.from_bytes(raw)
    assert back.is_empty() and back.estimate() == 0.0


def test_seed_mismatch_refuses():
    sk = ThetaSketch.from_hashes(hash63_longs(np.arange(5, dtype=np.int64)))
    raw = bytearray(sk.to_bytes())
    raw[6] ^= 0xFF
    with pytest.raises(SketchError, match="seed"):
        ThetaSketch.from_bytes(bytes(raw))


def test_zero_hash_excluded():
    h = np.array([0, 5, 9], dtype=np.uint64)
    sk = ThetaSketch.from_hashes(h)
    assert sk.estimate() == 2.0


# ----------------------------------------------------------- distributed
def test_dataframe_ndv_sketches(spark):
    df = (
        spark.range(0, 60_000)
        .selectExpr(
            "id % 5000 AS ints",
            "CAST(id % 300 AS STRING) AS strs",
            "CAST(id % 77 AS DOUBLE) / 7 AS dbls",
            "CASE WHEN id % 10 = 0 THEN NULL ELSE id % 1234 END AS with_nulls",
        )
        .repartition(8)
    )
    sks = dataframe_ndv_sketches(df, ["ints", "strs", "dbls", "with_nulls"])
    assert abs(sks["ints"].estimate() - 5000) <= 0.05 * 5000
    assert sks["strs"].estimate() == 300.0  # under k: exact
    assert sks["dbls"].estimate() == 77.0
    assert sks["with_nulls"].estimate() == 1234.0  # nulls don't count


def test_dataframe_ndv_matches_driver_side_single_pass(spark):
    """The distributed pool (k+1 partials) equals a driver-side sketch
    over all values — the mergeability claim, pinned."""
    df = spark.range(0, 30_000).selectExpr("id % 9000 AS v").repartition(6)
    sks = dataframe_ndv_sketches(df, ["v"], k=512)
    direct = ThetaSketch.from_hashes(
        hash63_longs(np.arange(9000, dtype=np.int64) % 9000), k=512
    )
    assert sks["v"].theta == direct.theta
    assert np.array_equal(sks["v"].hashes, direct.hashes)


def test_unsupported_type_refuses(spark):
    df = spark.range(3).selectExpr("array(id) AS a")
    with pytest.raises(SketchError, match="unsupported"):
        dataframe_ndv_sketches(df, ["a"])


def test_nullable_bigint_above_2_53_exact(spark):
    """Nullable huge bigints must hash exactly: a pandas hop would
    deliver the null-carrying partitions as float64 and mangle values
    above 2^53, splitting/merging distincts. Arrow-native batches
    keep them int64."""
    base = 9_007_199_254_740_993  # 2^53 + 1: not representable as f64
    df = spark.range(0, 20_000).selectExpr(
        f"CASE WHEN id % 7 = 0 THEN NULL ELSE CAST({base} AS BIGINT) + id % 1000 END AS v"
    ).repartition(8)
    sks = dataframe_ndv_sketches(df, ["v"])
    assert sks["v"].estimate() == 1000.0  # exact: under k


def test_intersect_exact_and_estimating():
    a_vals = np.arange(0, 60_000, dtype=np.int64)
    b_vals = np.arange(40_000, 120_000, dtype=np.int64)
    a = ThetaSketch.from_hashes(hash63_longs(a_vals), k=2048)
    b = ThetaSketch.from_hashes(hash63_longs(b_vals), k=2048)
    i = a.intersect(b)
    assert abs(i.estimate() - 20_000) <= 0.12 * 20_000
    # exact mode: both under k -> intersection exact
    a2 = ThetaSketch.from_hashes(hash63_longs(np.arange(100, dtype=np.int64)))
    b2 = ThetaSketch.from_hashes(
        hash63_longs(np.arange(60, 160, dtype=np.int64))
    )
    assert a2.intersect(b2).estimate() == 40.0
    # disjoint
    c = ThetaSketch.from_hashes(
        hash63_longs(np.arange(10**6, 10**6 + 50, dtype=np.int64))
    )
    assert a2.intersect(c).estimate() == 0.0


# --------------------------------------- hand-crafted byte fixtures
# Assembled with struct.pack directly from the published DataSketches
# compact-theta preamble layout (preamble_longs, serial_version=3,
# family=3, lg_nom, lg_arr, flags, seed_hash; retained-count int at 8;
# theta long at 16 when preamble_longs == 3) — NEVER via to_bytes — so
# the encoder and decoder cannot share a wrong layout assumption (the
# test_puffin.py rule applied to sketches).

_RO, _EM, _CP, _OR = 2, 4, 8, 16  # READ_ONLY / EMPTY / COMPACT / ORDERED


def _hand_preamble(pre_longs, lg_k, flags):
    return struct.pack("<BBBBBBH", pre_longs, 3, 3, lg_k, 0, flags, seed_hash())


def test_hand_crafted_empty_fixture():
    raw = _hand_preamble(1, 12, _RO | _EM | _CP | _OR)
    sk = ThetaSketch.from_bytes(raw)
    assert sk.is_empty() and sk.estimate() == 0.0
    # and the writer emits byte-identical output for the same state
    assert ThetaSketch.from_hashes(np.empty(0, np.uint64), k=4096).to_bytes() == raw


def test_hand_crafted_single_item_fixture():
    """Apache DataSketches serializes a compact single-item sketch as
    preamble_longs=1, EMPTY clear, ONE hash long at offset 8 (no
    retained-count int). Decoding it as empty would report ndv 0 for
    a one-distinct-value column in a foreign stats file."""
    h = murmur3_x64_128(struct.pack("<q", 7), DEFAULT_UPDATE_SEED)[0] >> 1
    raw = _hand_preamble(1, 12, _RO | _CP | _OR) + struct.pack("<Q", h)
    sk = ThetaSketch.from_bytes(raw)
    assert not sk.is_empty()
    assert sk.estimate() == 1.0
    assert sk.hashes.tolist() == [h]
    # and the writer emits the SAME single-item form, byte for byte
    one = ThetaSketch.from_hashes(
        hash63_longs(np.array([7], np.int64)), k=4096
    )
    assert one.to_bytes() == raw


def test_hand_crafted_single_item_truncated_refuses():
    raw = _hand_preamble(1, 12, _RO | _CP | _OR)  # no hash long follows
    with pytest.raises(SketchError, match="single-item"):
        ThetaSketch.from_bytes(raw)


def test_hand_crafted_exact_mode_fixture():
    """Exact mode (retained < k): preamble_longs=2, retained count at
    offset 8, hashes from offset 16, theta implicitly MAX. Hash values
    derive from the scalar murmur3 reference (itself pinned against
    the vectorized path elsewhere in this file), sorted ascending as
    the ORDERED flag requires."""
    vals = [0, 1, -5, 2**62, -(2**63)]
    hs = sorted(
        murmur3_x64_128(struct.pack("<q", v), DEFAULT_UPDATE_SEED)[0] >> 1
        for v in vals
    )
    raw = (
        _hand_preamble(2, 12, _RO | _CP | _OR)
        + struct.pack("<If", len(hs), 1.0)  # retained, sampling p=1.0
        + b"".join(struct.pack("<Q", h) for h in hs)
    )
    sk = ThetaSketch.from_bytes(raw)
    assert sk.theta == _MAX_THETA
    assert sk.estimate() == float(len(vals))
    assert sk.hashes.tolist() == hs
    # writer agreement, byte for byte
    assert (
        ThetaSketch.from_hashes(hash63_longs(np.array(vals, np.int64)), k=4096)
        .to_bytes()
        == raw
    )


def test_hand_crafted_estimating_mode_fixture():
    """Estimation mode: preamble_longs=3, theta long at offset 16,
    hashes from offset 24, estimate = retained / (theta / 2^63)."""
    hs = [100, 200, 300, 400]
    theta = _MAX_THETA // 2
    raw = (
        _hand_preamble(3, 2, _RO | _CP | _OR)
        + struct.pack("<If", len(hs), 1.0)  # retained, sampling p=1.0
        + struct.pack("<Q", theta)
        + b"".join(struct.pack("<Q", h) for h in hs)
    )
    sk = ThetaSketch.from_bytes(raw)
    assert sk.theta == theta
    assert abs(sk.estimate() - 8.0) < 1e-9
    assert sk.hashes.tolist() == hs
