"""Distinct-count (theta/KMV) sketches + the murmur3 x64-128 hash —
the engine's Iceberg table-statistics payload (puffin blob type
``apache-datasketches-theta-v1``).

Everything here derives from PUBLIC specifications:

- MurmurHash3 x64 128 (Austin Appleby's public-domain reference:
  constants 0x87c37b91114253d5 / 0x4cf5ad432745937f, rotations
  31/27/33/31, the 0xff51afd7ed558ccd / 0xc4ceb9fe1a85ec53 finalizer).
- The Apache DataSketches theta model and compact serialization
  (serial version 3, family 3: an 8-byte preamble, retained-count /
  theta preamble longs, then the sorted 63-bit hash values; default
  update seed 9001, stored value = high-half >>> 1, zero excluded).
- Iceberg's statistics-file spec (puffin blobs carrying an ``ndv``
  property per column).

The DISTRIBUTED construction is Spark-first: one ``mapInArrow`` pass
emits each partition's k smallest column hashes (a bounded ~32 KiB
array per partition per column — mergeable partial sketches, the only
shape that scales a distinct count past one pass at 100 TB), and the
driver unions bounded arrays. Batches stay ARROW end to end (a
pandas hop would deliver nullable bigints as float64 and mangle
values above 2^53); numeric columns hash fully vectorized in numpy
(an 8-byte input is all murmur tail, so the whole block pipeline
reduces to vector ops); only string hashing walks Python bytes.

Byte-level validation: the ``ndv`` blob property (what engines
actually consume) is exact interop; the sketch BYTES are checked
against HAND-CRAFTED fixtures assembled with struct.pack directly
from the published DataSketches compact-theta preamble layout
(empty / single-item / exact / estimating modes,
``tests/test_sketches.py``), so the encoder and decoder cannot share
a wrong layout assumption. No Apache DataSketches runtime exists in
this offline environment for a live cross-read, but the layout
constants (preamble longs, family 3, flag bits, float ``p`` at
offset 12, theta long at 16) are pinned byte-by-byte.

Reference parity: the reference CLI moves table pointers verbatim and
never touches statistics files (CatalogMigrator.java:243); stats
export/import is this engine's analytics extension.
"""

from __future__ import annotations

import struct

import numpy as np

_M64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F
DEFAULT_UPDATE_SEED = 9001
_MAX_THETA = (1 << 63) - 1  # Long.MAX_VALUE: theta of an exact sketch
THETA_BLOB_TYPE = "apache-datasketches-theta-v1"

# compact-theta flag bits (PreambleUtil)
_F_READ_ONLY, _F_EMPTY, _F_COMPACT, _F_ORDERED = 2, 4, 8, 16


class SketchError(ValueError):
    """Malformed or unsupported sketch bytes."""


# ------------------------------------------------------- murmur3 x64 128
def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _M64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _M64
    k ^= k >> 33
    return k


def murmur3_x64_128(data: bytes, seed: int = 0) -> tuple[int, int]:
    """The scalar reference implementation (both 64-bit halves)."""
    h1 = h2 = seed & _M64
    nblocks = len(data) // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<QQ", data, i * 16)
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _M64
        h1 = (h1 * 5 + 0x52DCE729) & _M64
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _M64
        h2 = (h2 * 5 + 0x38495AB5) & _M64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    if len(tail) > 8:
        for i in range(len(tail) - 1, 7, -1):
            k2 = (k2 << 8) | tail[i]
        k2 = (k2 * _C2) & _M64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _M64
        h2 ^= k2
    if tail:
        for i in range(min(len(tail), 8) - 1, -1, -1):
            k1 = (k1 << 8) | tail[i]
        k1 = (k1 * _C1) & _M64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _M64
        h1 ^= k1
    h1 ^= len(data)
    h2 ^= len(data)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _M64
    h2 = (h2 + h1) & _M64
    return h1, h2


def _rotl_vec(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _fmix_vec(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> np.uint64(33))
    k = k * np.uint64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> np.uint64(33))


def hash63_longs(vals: np.ndarray, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Vectorized theta hash of int64/uint64 values (their 8-byte
    little-endian form — an 8-byte input is ALL murmur tail, so the
    whole pipeline is k1-tail + finalize, fully numpy): returns
    ``h1 >>> 1`` (the stored 63-bit value), zeros NOT yet removed."""
    with np.errstate(over="ignore"):
        k1 = vals.astype(np.uint64)
        k1 = k1 * np.uint64(_C1)
        k1 = _rotl_vec(k1, 31)
        k1 = k1 * np.uint64(_C2)
        h1 = np.uint64(seed) ^ k1
        h1 = h1 ^ np.uint64(8)
        h2 = np.uint64(seed) ^ np.uint64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix_vec(h1)
        h2 = _fmix_vec(h2)
        h1 = h1 + h2
    return h1 >> np.uint64(1)


def hash63_bytes(items, seed: int = DEFAULT_UPDATE_SEED) -> np.ndarray:
    """Theta hash of an iterable of byte strings (the Python-loop
    slow path — strings only; numerics take :func:`hash63_longs`)."""
    out = np.empty(len(items), dtype=np.uint64)
    for i, b in enumerate(items):
        out[i] = murmur3_x64_128(b, seed)[0] >> 1
    return out


def seed_hash(seed: int = DEFAULT_UPDATE_SEED) -> int:
    """DataSketches' 16-bit seed fingerprint: the low 16 bits of the
    murmur hash OF THE SEED ITSELF (hashed with seed 0)."""
    sh = murmur3_x64_128(struct.pack("<q", seed), 0)[0] & 0xFFFF
    if sh == 0:
        raise SketchError(f"seed {seed} hashes to the reserved 0")
    return sh


# ------------------------------------------------------------ the sketch
class ThetaSketch:
    """A compact ordered theta sketch: sorted unique 63-bit hash
    values all strictly below ``theta``; estimate = retained *
    MAX_THETA / theta. Built via k-minimum-values: keep the k smallest
    distinct hashes, theta = the (k+1)-th smallest once past k."""

    __slots__ = ("hashes", "theta", "k", "seed")

    def __init__(self, hashes: np.ndarray, theta: int, k: int, seed: int = DEFAULT_UPDATE_SEED):
        self.hashes = hashes  # sorted unique uint64, all < theta
        self.theta = int(theta)
        self.k = int(k)
        self.seed = seed

    @classmethod
    def from_hashes(cls, h: np.ndarray, k: int = 4096, seed: int = DEFAULT_UPDATE_SEED):
        h = np.unique(np.asarray(h, dtype=np.uint64))
        if len(h) and h[0] == 0:
            h = h[1:]  # DataSketches excludes the zero hash
        if len(h) <= k:
            return cls(h, _MAX_THETA, k, seed)
        return cls(h[:k], int(h[k]), k, seed)

    def estimate(self) -> float:
        if self.theta == _MAX_THETA:
            return float(len(self.hashes))
        return len(self.hashes) * _MAX_THETA / self.theta

    def union(self, other: "ThetaSketch") -> "ThetaSketch":
        theta = min(self.theta, other.theta)
        merged = np.unique(
            np.concatenate([self.hashes, other.hashes])
        )
        merged = merged[merged < np.uint64(theta)]
        if len(merged) > self.k:
            theta = int(merged[self.k])
            merged = merged[: self.k]
        return ThetaSketch(merged, theta, self.k, self.seed)

    def intersect(self, other: "ThetaSketch") -> "ThetaSketch":
        """Set-intersection estimate (the theta model's defining
        trick: both sketches are uniform samples below min(theta), so
        the shared hashes below it estimate |A ∩ B| — overlap between
        two corpora WITHOUT a join). Exact when both are exact-mode."""
        theta = min(self.theta, other.theta)
        common = np.intersect1d(self.hashes, other.hashes)
        common = common[common < np.uint64(theta)]
        return ThetaSketch(common, theta, min(self.k, other.k), self.seed)

    def is_empty(self) -> bool:
        return len(self.hashes) == 0 and self.theta == _MAX_THETA

    # -------------------------------------------------- serialization
    def to_bytes(self) -> bytes:
        """Compact ordered layout (serial version 3, family 3)."""
        sh = seed_hash(self.seed)
        lg_k = max(4, int(np.ceil(np.log2(max(self.k, 16)))))
        flags = _F_READ_ONLY | _F_COMPACT | _F_ORDERED
        if self.is_empty():
            return struct.pack("<BBBBBBH", 1, 3, 3, lg_k, 0, flags | _F_EMPTY, sh)
        if self.theta == _MAX_THETA and len(self.hashes) == 1:
            # DataSketches' SINGLE-ITEM form: preamble_longs=1, EMPTY
            # clear, the one hash long at offset 8 (no retained count)
            return struct.pack(
                "<BBBBBBH", 1, 3, 3, lg_k, 0, flags, sh
            ) + struct.pack("<Q", int(self.hashes[0]))
        if self.theta == _MAX_THETA:  # exact mode: 2 preamble longs
            pre = struct.pack("<BBBBBBH", 2, 3, 3, lg_k, 0, flags, sh)
            pre += struct.pack("<If", len(self.hashes), 1.0)
        else:  # estimating: 3 preamble longs, theta in the third
            pre = struct.pack("<BBBBBBH", 3, 3, 3, lg_k, 0, flags, sh)
            pre += struct.pack("<If", len(self.hashes), 1.0)
            pre += struct.pack("<Q", self.theta)
        return pre + self.hashes.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, data: bytes, seed: int = DEFAULT_UPDATE_SEED):
        if len(data) < 8:
            raise SketchError("theta sketch: truncated preamble")
        pre_longs, ser_ver, family, lg_k, _, flags, sh = struct.unpack_from(
            "<BBBBBBH", data, 0
        )
        if ser_ver != 3 or family != 3:
            raise SketchError(
                f"theta sketch: unsupported serial version {ser_ver} / "
                f"family {family}"
            )
        if not flags & _F_COMPACT:
            raise SketchError("theta sketch: only compact form is read")
        if sh != seed_hash(seed):
            raise SketchError(
                "theta sketch: seed hash mismatch (not the default "
                "update seed?)"
            )
        k = 1 << lg_k if 0 < lg_k < 32 else 4096
        if flags & _F_EMPTY:
            return cls(np.empty(0, np.uint64), _MAX_THETA, k, seed)
        if pre_longs == 1:
            # DataSketches' SINGLE-ITEM compact layout: preLongs=1,
            # EMPTY clear, exactly one hash long at offset 8. Treating
            # it as empty would decode a one-distinct-value column's
            # foreign stats file as ndv 0.
            if len(data) < 16:
                raise SketchError(
                    "theta sketch: single-item form needs 16 bytes, "
                    f"got {len(data)}"
                )
            h = np.frombuffer(data, "<u8", 1, 8).copy()
            return cls(h, _MAX_THETA, k, seed)
        (count,) = struct.unpack_from("<I", data, 8)
        theta = _MAX_THETA
        off = 16
        if pre_longs >= 3:
            (theta,) = struct.unpack_from("<Q", data, 16)
            off = 24
        want = off + 8 * count
        if len(data) < want:
            raise SketchError(
                f"theta sketch: {len(data)} bytes, need {want}"
            )
        h = np.frombuffer(data, "<u8", count, off).copy()
        return cls(np.sort(h), theta, k, seed)


# --------------------------------------------- distributed construction
_NDV_K = 4096  # default nominal entries: rse ~ 1/sqrt(k-2) ~ 1.6%

_HASHABLE_PREFIX = (
    "tinyint",
    "smallint",
    "int",
    "bigint",
    "float",
    "double",
    "date",
    "string",
)


def _arrow_hash63(arr, dtype: str) -> np.ndarray:
    """Theta hashes of one Arrow array under Iceberg's single-value
    representation: integral types widen to their 8-byte two's
    complement, float/double hash their IEEE-754 double bits, dates
    hash epoch days, strings hash UTF-8 bytes. Arrow-native on
    purpose — a pandas round trip would deliver a nullable bigint
    batch as float64 and silently mangle values above 2^53."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    arr = pc.drop_null(arr)
    if len(arr) == 0:
        return np.empty(0, np.uint64)
    if dtype in ("tinyint", "smallint", "int", "bigint"):
        return hash63_longs(arr.cast(pa.int64()).to_numpy())
    if dtype in ("float", "double"):
        d = arr.cast(pa.float64()).to_numpy()
        return hash63_longs(d.view(np.uint64))
    if dtype == "date":
        # date32's physical value IS epoch days
        days = arr.cast(pa.int32()).to_numpy().astype(np.int64)
        return hash63_longs(days)
    if dtype == "string":
        return hash63_bytes([v.encode("utf-8") for v in arr.to_pylist()])
    raise SketchError(f"ndv sketch: unsupported column type {dtype!r}")


def dataframe_ndv_sketches(
    df, cols: list[str], k: int = _NDV_K
) -> dict[str, ThetaSketch]:
    """One distributed pass: every partition emits its k smallest
    distinct hashes per column (bounded bytes — a mergeable partial
    sketch), the driver unions them. Returns {col: ThetaSketch}."""
    dtypes = dict(df.dtypes)
    for c in cols:
        if c not in dtypes:
            raise SketchError(f"ndv sketch: no column {c!r}")
        if not dtypes[c].startswith(_HASHABLE_PREFIX):
            raise SketchError(
                f"ndv sketch: unsupported column type {dtypes[c]!r} "
                f"for {c!r}"
            )

    col_types = [(c, dtypes[c]) for c in cols]

    def partial(batches):
        import pyarrow as pa

        acc: dict[str, np.ndarray] = {}
        for rb in batches:
            for i, (c, t) in enumerate(col_types):
                h = _arrow_hash63(rb.column(i), t)
                prev = acc.get(c)
                h = np.unique(h if prev is None else np.concatenate([prev, h]))
                if h.size and h[0] == 0:
                    h = h[1:]
                # k+1 smallest, not k: every GLOBAL rank <= k+1 hash has
                # local rank <= k+1 in its partition, so the pooled
                # arrays provably contain the global (k+1)-th smallest —
                # the final theta. Emitting only k could drop it and
                # bias the estimate low.
                acc[c] = h[: k + 1]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array([c for c, _ in col_types], pa.string()),
                pa.array(
                    [
                        acc.get(c, np.empty(0, np.uint64))
                        .astype("<u8")
                        .tobytes()
                        for c, _ in col_types
                    ],
                    pa.binary(),
                ),
            ],
            names=["col", "hashes"],
        )

    rows = (
        df.select(*cols)
        .mapInArrow(partial, "col string, hashes binary")
        .collect()
    )
    pools: dict[str, list[np.ndarray]] = {c: [] for c in cols}
    for r in rows:
        pools[r["col"]].append(np.frombuffer(r["hashes"], "<u8"))
    return {
        c: ThetaSketch.from_hashes(
            np.concatenate(parts) if parts else np.empty(0, np.uint64), k
        )
        for c, parts in pools.items()
    }
