"""Portable deterministic hashing shared by the dedup/similarity
operators AND their DuckDB oracles.

Everything is built on ``md5`` of explicit strings — the one hash both
engines (and any engine) compute identically — so operator output is
bit-reproducible across Spark, the oracle, and any future backend.
Where an expression must be evaluated by both engines, it is generated
HERE as a single SQL string (Spark runs it via ``F.expr``, DuckDB
verbatim), so the two sides cannot drift.
"""

from __future__ import annotations

# MinHash configuration: 16 hashes = 8 bands x 2 rows.
NUM_HASHES = 16
LSH_BANDS = 8
LSH_ROWS = 2
SHINGLE_SIZE = 3

# SimHash configuration: 32 bits, 4 bits per md5 hex char.
SIMHASH_BITS = 32

TOKEN_SPLIT_REGEX = r"\s+"

_HEX = "0123456789abcdef"


# each md5 (32 hex chars = 128 bits) yields 4 independent 32-bit
# components, so 16 hashes need 4 seeded md5s per shingle — not 16.
MINHASH_MD5_GROUPS = NUM_HASHES * 8 // 32


def minhash_md5_expr(group: int, col: str = "shingle") -> str:
    """the ``group``-th seeded md5 of a shingle (materialized once per
    shingle row in a projection, then sliced by :func:`minhash_expr`)."""
    return f"MD5(CONCAT('{group}:', {col}))"


def minhash_expr(component: int) -> str:
    """min-over-set of one MinHash component.

    Component ``i`` takes its own disjoint 8-hex-char (32-bit) slice of
    precomputed md5 column ``mh{i // 4}``, so the 16 components are
    independent uniform hashes while each shingle is hashed only 4
    times. Lexicographic MIN over hex strings is a valid min-hash (the
    hex alphabet is ordered), identical in both engines.
    """
    return f"MIN(SUBSTR(mh{component // 4}, {component % 4 * 8 + 1}, 8))"


def band_key_expr(band: int) -> str:
    """LSH band key: md5 over the band's row signature components."""
    parts = ", ".join(
        f"h{band * LSH_ROWS + r}" for r in range(LSH_ROWS)
    )
    return f"MD5(CONCAT({parts}))"


def simhash_hexval_expr(char_idx: int, col: str = "mh") -> str:
    """value 0-15 of one md5 hex char, materialized once per token row
    so the 32 bit-aggregates below stay pure integer arithmetic.
    INSTR/SUBSTR behave identically in Spark SQL and DuckDB."""
    return f"INSTR('{_HEX}', SUBSTR({col}, {char_idx + 1}, 1)) - 1"


def simhash_bit_contrib_expr(bit: int) -> str:
    """+1/-1 contribution of one token to one SimHash bit, reading the
    precomputed hex-char value column ``hc{bit // 4}`` (no string ops
    inside the aggregate). FLOOR/% behave identically in both engines."""
    sub_bit = 1 << (bit % 4)
    return f"(FLOOR(hc{bit // 4} / {sub_bit}) % 2) * 2 - 1"


def simhash_assemble_expr(prefix: str = "b", n_bits: int = SIMHASH_BITS) -> str:
    """Fold ``n_bits`` per-bit sums into one BIGINT SimHash value
    (``n_bits`` must stay below 63 so the value fits a signed BIGINT)."""
    terms = " + ".join(
        f"(CASE WHEN {prefix}{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(n_bits)
    )
    return f"CAST({terms} AS BIGINT)"
