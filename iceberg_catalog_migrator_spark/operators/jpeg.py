"""Pure-numpy baseline JPEG (JFIF) codec — no external image library.

Completes the multimodal surface's "real compressed codec" story next
to the QOI codec (`multimodal.py::encode_qoi`): the container ships no
PIL/libjpeg, so the engine carries its own standard-conforming baseline
sequential DCT codec. Both halves are self-contained:

- :func:`encode_jpeg` writes baseline JFIF: 4:4:4 (no chroma
  subsampling) or grayscale, quality-scaled quantization tables and
  the Huffman tables EMBEDDED in the stream (DQT/DHT) — correctness
  never depends on matching the spec's Annex K example tables, because
  a JPEG stream carries every table it uses. The Huffman tables are
  deliberately simple fixed-length canonical codes (12 DC symbols at 4
  bits, 162 AC symbols at 8 bits): a valid prefix code any decoder
  accepts, trading a few percent of compression for zero table-
  construction machinery.
- :func:`decode_jpeg` reads any baseline sequential stream: SOF0,
  8-bit DQT, arbitrary sampling factors (4:2:0 / 4:2:2 / 4:4:4 —
  nearest-neighbor upsampling), restart intervals, byte stuffing,
  1- or 3-component scans. Progressive (SOF2) and arithmetic coding
  refuse loudly.

Row/batch plumbing stays in ``multimodal.py`` (mapInPandas over binary
columns); this module is plain bytes -> ndarray -> bytes.

DCT is the exact orthonormal matrix transform (T @ B @ T.T) — O(8^3)
per block via two 8x8 matmuls, vectorized over all blocks at once with
one einsum per component, so encoding stays numpy-speed rather than
per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

# ----------------------------------------------------------- constants

# base quantization tables (the spec's example luminance/chrominance
# tables; ANY table is valid — it rides in DQT — these give the
# familiar quality/size trade-off)
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.float64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.float64,
)


def _zigzag_order() -> list[tuple[int, int]]:
    """The spec's zigzag scan, computed (not transcribed): diagonal s
    runs down-left for odd s and up-right for even s."""
    order = []
    for s in range(15):
        diag = [(r, s - r) for r in range(min(s, 7) + 1) if 0 <= s - r < 8]
        order.extend(diag if s % 2 else diag[::-1])
    return order


_ZIGZAG = _zigzag_order()


def _dct_matrix() -> np.ndarray:
    t = np.zeros((8, 8))
    for i in range(8):
        c = np.sqrt(1 / 8) if i == 0 else np.sqrt(2 / 8)
        for j in range(8):
            t[i, j] = c * np.cos((2 * j + 1) * i * np.pi / 16)
    return t


_DCT = _dct_matrix()

# fixed-length canonical Huffman tables (see module docstring): the
# DHT segment lists, per code length 1..16, the symbols at that length
# in canonical order — these are complete table DEFINITIONS, not
# references to spec defaults.
_DC_SYMBOLS = list(range(12))  # DC size categories 0..11, 4 bits each
_AC_SYMBOLS = [0x00, 0xF0] + [  # EOB, ZRL, then (run,size) run 0..15 size 1..10
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12  # 12 symbols at length 4
_AC_BITS = [0] * 7 + [162] + [0] * 8  # 162 symbols at length 8


def _canonical_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) for a canonical table (encoder side)."""
    out = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(_DC_BITS, _DC_SYMBOLS)
_AC_CODES = _canonical_codes(_AC_BITS, _AC_SYMBOLS)


# ----------------------------------------------------------- bit I/O


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


class _BitReader:
    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("truncated scan data")
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise ValueError("truncated scan data")
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:  # stuffed
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-read
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02X} in scan")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_past_restart(self) -> None:
        """Drop partial bits and consume one RSTn marker."""
        self._acc = 0
        self._n = 0
        n = len(self.data)
        while self.pos < n and self.data[self.pos] != 0xFF:
            self.pos += 1
        if self.pos + 1 >= n:
            raise ValueError("truncated scan data: no restart marker before EOF")
        if not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError(
                f"expected RSTn marker, found 0xFF{self.data[self.pos + 1]:02X}"
            )
        self.pos += 2


class _RestartMarker(Exception):
    pass


# ----------------------------------------------------------- encoder


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    q = min(100, max(1, int(quality)))
    scale = 5000 / q if q < 50 else 200 - 2 * q
    luma = np.clip(np.floor((_Q_LUMA * scale + 50) / 100), 1, 255)
    chroma = np.clip(np.floor((_Q_CHROMA * scale + 50) / 100), 1, 255)
    return luma, chroma


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255)


def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length() if v < 0 else 0


def _amplitude(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


def _encode_block(writer: _BitWriter, block: np.ndarray, dc_pred: int) -> int:
    """Entropy-code one quantized zigzag block; returns the new DC
    predictor."""
    dc = int(block[0])
    diff = dc - dc_pred
    size = _size_cat(diff)
    code, length = _DC_CODES[size]
    writer.write(code, length)
    if size:
        writer.write(_amplitude(diff, size), size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if block[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(block[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = _AC_CODES[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size = _size_cat(v)
        code, length = _AC_CODES[(run << 4) | size]
        writer.write(code, length)
        writer.write(_amplitude(v, size), size)
        run = 0
    if last_nz != 63:
        code, length = _AC_CODES[0x00]  # EOB
        writer.write(code, length)
    return dc


def _plane_blocks(
    plane: np.ndarray, ch: int, cv: int, mcus_x: int, mcus_y: int
) -> tuple[np.ndarray, int]:
    """(blocks row-major over the padded plane as (n, 8, 8), blocks per
    row) — padded by edge replication to the MCU grid (smooth padding
    keeps edge-block AC energy low)."""
    ph, pw = mcus_y * cv * 8, mcus_x * ch * 8
    h, w = plane.shape
    plane = np.pad(plane, ((0, ph - h), (0, pw - w)), mode="edge")
    blocks = (
        plane.reshape(ph // 8, 8, pw // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, pw // 8


def _refine_padded(
    blocks: np.ndarray,
    quant: np.ndarray,
    qtable: np.ndarray,
    shape: tuple[int, int],
    bx: int,
) -> np.ndarray:
    """Alternating-projection refinement of blocks that contain padded
    pixels. The padded region is don't-care: re-quantizing with the
    previous reconstruction substituted there (real pixels pinned)
    lets the encoder spend the block's coefficient budget on the real
    pixels instead of the replication artifact. Only edge blocks are
    touched; full blocks (and flat edge blocks, whose reconstruction
    is their own fixed point) are byte-identical to the direct path.
    Keeps the best-seen candidate per block by real-pixel SSE, so the
    result is never worse than the unrefined encoding."""
    h, w = shape
    n = blocks.shape[0]
    by = n // bx
    mask = np.zeros((by * 8, bx * 8), dtype=bool)
    mask[:h, :w] = True
    mblocks = (
        mask.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    edge = ~mblocks.all(axis=(1, 2))
    if not edge.any():
        return quant
    idx = np.nonzero(edge)[0]
    orig = blocks[idx]
    m = mblocks[idx].astype(np.float64)
    cand = quant[idx].astype(np.float64)
    best = quant[idx].copy()
    best_err = np.full(idx.shape[0], np.inf)
    for _ in range(8):
        recon = np.einsum("ji,njk,kl->nil", _DCT, cand * qtable, _DCT)
        err = (((recon - orig) ** 2) * m).sum(axis=(1, 2))
        better = err < best_err
        best[better] = cand[better].astype(np.int32)
        best_err = np.minimum(best_err, err)
        refit = orig * m + recon * (1.0 - m)
        freq = np.einsum("ij,njk,lk->nil", _DCT, refit, _DCT)
        # clamp to the baseline Huffman amplitude range (size <= 10 for
        # AC, and |DC| <= 1023 keeps DC diffs within size 11): at q~100
        # the reconstruction can overshoot the legal pixel range and
        # requantize past what _encode_block can emit
        nxt = np.clip(np.round(freq / qtable), -1023, 1023)
        if np.array_equal(nxt, cand):
            break
        cand = nxt
    if not best_err.any():
        out = quant.copy()
        out[idx] = best
        return out
    # greedy integer coordinate descent: the projection's fixed point
    # is often reachable in one step yet far from the lattice optimum
    # for tiny masks, so sweep the coefficients and take any quantized
    # step that lowers the masked SSE (amplitudes clamped to the
    # baseline Huffman tables' size-10 range).
    cand = best.astype(np.float64)
    recon = np.einsum("ji,njk,kl->nil", _DCT, cand * qtable, _DCT)
    resid = (recon - orig) * m
    for _ in range(3):
        changed = False
        for u in range(8):
            for v in range(8):
                q = qtable[u, v]
                basis = np.outer(_DCT[u], _DCT[v])
                mb = m * basis
                g = (resid * basis).sum(axis=(1, 2))
                d = (mb * basis).sum(axis=(1, 2))
                safe = d > 1e-9
                delta = np.zeros_like(g)
                np.divide(-g, d * q, out=delta, where=safe)
                delta = np.round(delta)
                delta = np.clip(
                    delta, -1023 - cand[:, u, v], 1023 - cand[:, u, v]
                )
                dq = delta * q
                gain = 2 * dq * g + dq * dq * d
                take = safe & (gain < -1e-6) & (delta != 0)
                if take.any():
                    changed = True
                    cand[take, u, v] += delta[take]
                    resid[take] += dq[take, None, None] * mb[take]
        if not changed:
            break
    err = (resid**2).sum(axis=(1, 2))
    better = err < best_err
    best[better] = cand[better].astype(np.int32)
    out = quant.copy()
    out[idx] = best
    return out


def _box_downsample(plane: np.ndarray, fy: int, fx: int) -> np.ndarray:
    h, w = plane.shape
    plane = np.pad(plane, ((0, -h % fy), (0, -w % fx)), mode="edge")
    hh, ww = plane.shape
    return plane.reshape(hh // fy, fy, ww // fx, fx).mean(axis=(1, 3))


def encode_jpeg(img: np.ndarray, quality: int = 75, subsampling: str = "444") -> bytes:
    """Baseline JFIF bytes for ``img`` (H, W, 3 uint8 RGB, or (H, W)
    grayscale). ``subsampling``: '444' (every component full
    resolution) or '420' (chroma box-downsampled 2x2, the real-world
    default — MCUs interleave 4 luma + 1 Cb + 1 Cr blocks)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    sub = (2, 2) if (subsampling == "420" and not gray) else (1, 1)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        ycc = _rgb_to_ycbcr(img.astype(np.float64))
        planes = [ycc[..., i] for i in range(3)]
    h, w = planes[0].shape
    if not (0 < h <= 65535 and 0 < w <= 65535):
        raise ValueError(f"unencodable dimensions {h}x{w}")
    hmax, vmax = sub
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    factors = [(hmax, vmax)] + [(1, 1)] * (len(planes) - 1)
    if sub != (1, 1):
        planes = [planes[0]] + [_box_downsample(p, vmax, hmax) for p in planes[1:]]
    luma_q, chroma_q = _quality_tables(quality)
    qtables = [luma_q] + ([chroma_q] if not gray else [])
    zr = np.array([r for r, _ in _ZIGZAG])
    zc = np.array([c for _, c in _ZIGZAG])
    comps = []
    for ci, plane in enumerate(planes):
        ch, cv = factors[ci]
        blocks, bx = _plane_blocks(plane - 128.0, ch, cv, mcus_x, mcus_y)
        # one einsum per component: T @ B @ T.T over all blocks
        freq = np.einsum("ij,njk,lk->nil", _DCT, blocks, _DCT)
        quant = np.round(freq / qtables[min(ci, 1)]).astype(np.int32)
        quant = _refine_padded(
            blocks, quant, qtables[min(ci, 1)], plane.shape, bx
        )
        comps.append({"zz": quant[:, zr, zc], "bx": bx, "ch": ch, "cv": cv})
    out = bytearray()
    out += b"\xff\xd8"  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for ti, q in enumerate(qtables):
        zzq = q[zr, zc].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([ti]) + bytes(zzq)
    ncomp = len(planes)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        ch, cv = factors[ci]
        sof += bytes([ci + 1, (ch << 4) | cv, min(ci, 1)])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: DC class 0 + AC class 1, table id 0, shared by all components
    dc_body = bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMBOLS)
    ac_body = bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMBOLS)
    out += b"\xff\xc4" + struct.pack(">H", len(dc_body) + 2) + dc_body
    out += b"\xff\xc4" + struct.pack(">H", len(ac_body) + 2) + ac_body
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0 / AC table 0
    sos += bytes([0, 63, 0])  # full spectral selection, no approx
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    writer = _BitWriter()
    pred = [0] * ncomp
    for m in range(mcus_x * mcus_y):
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            for v in range(c["cv"]):
                for hh in range(c["ch"]):
                    bi = (my * c["cv"] + v) * c["bx"] + mx * c["ch"] + hh
                    pred[ci] = _encode_block(writer, c["zz"][bi], pred[ci])
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ----------------------------------------------------------- decoder


def _decode_huffman_tables(body: bytes) -> dict[tuple[int, int], dict]:
    """One DHT segment may carry several tables: (class, id) ->
    {(code, length): symbol}."""
    tables = {}
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        tc, th = tc_th >> 4, tc_th & 0x0F
        bits = list(body[pos + 1 : pos + 17])
        n = sum(bits)
        symbols = list(body[pos + 17 : pos + 17 + n])
        lut = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(code, length)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
        tables[(tc, th)] = lut
        pos += 17 + n
    return tables


def _read_symbol(reader: _BitReader, lut: dict) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = lut.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, size: int) -> int:
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode baseline JFIF bytes to (H, W, 3) uint8 RGB (grayscale
    streams replicate to 3 channels). Handles arbitrary baseline
    sampling factors and restart intervals; refuses progressive and
    arithmetic-coded streams loudly."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    zr = np.array([r for r, _ in _ZIGZAG])
    zc = np.array([c for _, c in _ZIGZAG])
    while pos < len(content):
        if content[pos] != 0xFF:
            pos += 1
            continue
        # spec-legal fill: any number of 0xFF bytes may pad before the
        # marker code (T.81 B.1.1.2) — consume them
        while pos + 1 < len(content) and content[pos + 1] == 0xFF:
            pos += 1
        marker = content[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        if pos + 4 > len(content):
            raise ValueError("truncated JPEG stream (segment header cut)")
        seg_len = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        body = content[pos + 4 : pos + 2 + seg_len]
        if len(body) != seg_len - 2:
            raise ValueError("truncated JPEG stream (segment body cut)")
        if marker == 0xDB:  # DQT (possibly several tables)
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                if prec != 0:
                    raise ValueError("16-bit DQT not supported (baseline is 8)")
                tbl = np.zeros((8, 8))
                vals = body[b + 1 : b + 65]
                tbl[zr, zc] = list(vals)
                qtables[tid] = tbl
                b += 65
        elif marker == 0xC4:  # DHT
            htables.update(_decode_huffman_tables(body))
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, h, w, ncomp = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            comps = []
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported SOF 0xFF{marker:02X}: only baseline "
                "sequential (SOF0/SOF1) streams decode"
            )
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan_tabs = {}
            for si in range(ns):
                cs, tdta = body[1 + 2 * si], body[2 + 2 * si]
                scan_tabs[cs] = (tdta >> 4, tdta & 0x0F)
            data_pos = pos + 2 + seg_len
            return _decode_scan(
                content,
                data_pos,
                frame,
                qtables,
                htables,
                scan_tabs,
                restart_interval,
            )
        pos += 2 + seg_len
    raise ValueError("no scan data found (truncated stream?)")


def _decode_scan(
    data: bytes,
    pos: int,
    frame: dict,
    qtables: dict,
    htables: dict,
    scan_tabs: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        ph = mcus_y * c["v"] * 8
        pw = mcus_x * c["h"] * 8
        planes.append(np.zeros((ph, pw)))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    zr = np.array([r for r, _ in _ZIGZAG])
    zc = np.array([c for _, c in _ZIGZAG])
    n_mcus = mcus_x * mcus_y
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            reader.align_past_restart()
            pred = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, c in enumerate(comps):
            dc_lut = htables[(0, scan_tabs[c["id"]][0])]
            ac_lut = htables[(1, scan_tabs[c["id"]][1])]
            q = qtables[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64)
                    try:
                        size = _read_symbol(reader, dc_lut)
                        diff = _extend(reader.read_bits(size), size) if size else 0
                        pred[ci] += diff
                        zz[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = _read_symbol(reader, ac_lut)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run == 15:  # ZRL
                                    k += 16
                                    continue
                                break
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                    except _RestartMarker:
                        raise ValueError(
                            "restart marker inside an MCU (corrupt stream)"
                        ) from None
                    block = np.zeros((8, 8))
                    block[zr, zc] = zz
                    pix = _DCT.T @ (block * q) @ _DCT + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        full.append(p[: mcus_y * vmax * 8, : mcus_x * hmax * 8])
    stacked = np.stack(full, axis=-1)[:h, :w]
    if len(comps) == 1:
        rgb = np.repeat(np.clip(stacked, 0, 255), 3, axis=-1)
    else:
        rgb = _ycbcr_to_rgb(stacked)
    return (rgb + 0.5).astype(np.uint8)
