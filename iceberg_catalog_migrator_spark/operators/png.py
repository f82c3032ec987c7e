"""Pure-Python PNG codec (stdlib ``zlib`` + numpy) — no image library.

Third real compressed image codec next to QOI and baseline JPEG:
PNG's heavy lifting is DEFLATE, which the Python standard library
ships, so a standard-conforming subset fits in one small module:

- :func:`encode_png`: 8-bit RGB (color type 2), non-interlaced, one
  IDAT, per-row filter 0 (None) — a valid stream any decoder reads.
- :func:`decode_png`: 8-bit gray (0), RGB (2), palette (3), gray+alpha
  (4), RGBA (6); all five scanline filters (None/Sub/Up/Average/
  Paeth); multiple IDAT chunks; tRNS ignored and alpha channels
  DROPPED after unfiltering (RGBA keeps its RGB planes, gray+alpha
  replicates the gray plane) — compositing is out of scope.
  Interlaced (Adam7) and 16-bit streams refuse loudly.

Returns (h, w, 3) uint8 RGB like the sibling decoders (alpha dropped
after unfiltering; palette expanded). CRCs are written correctly on
encode and NOT validated on decode — same stance as most fast paths
(zlib's adler32 already guards the pixel data).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# samples per pixel by color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(kind: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + kind
        + payload
        + struct.pack(">I", zlib.crc32(kind + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """8-bit RGB non-interlaced PNG for ``img`` (H, W, 3 uint8)."""
    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("encode_png expects (H, W, 3) uint8 RGB")
    h, w, _ = img.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 per scanline
    raw = b"".join(b"\x00" + img[r].tobytes() for r in range(h))
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse the five PNG scanline filters. ``raw`` is (h, 1+stride)
    with the filter byte leading each row; returns (h, stride)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for r in range(h):
        ftype = int(raw[r, 0])
        line = raw[r, 1:].astype(np.int32)
        prev = out[r - 1].astype(np.int32) if r else np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            out[r] = line.astype(np.uint8)
        elif ftype == 2:  # Up
            out[r] = ((line + prev) & 0xFF).astype(np.uint8)
        elif ftype == 1:
            # Sub: cur[x] = line[x] + cur[x-bpp] — a per-channel prefix
            # sum mod 256, fully vectorized (cumsum per channel column)
            cols = line.reshape(-1, bpp)
            out[r] = (np.cumsum(cols, axis=0) & 0xFF).astype(np.uint8).reshape(-1)
        elif ftype in (3, 4):
            # Average/Paeth genuinely recur on the in-progress row
            # (cur[x-bpp] feeds cur[x] through a nonlinear predictor),
            # so this is a sequential per-BYTE Python loop — the honest
            # cost of foreign-encoder streams; the engine's own encoder
            # emits filter 0 only
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    c = prev[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                cur[x] = (line[x] + pred) & 0xFF
            out[r] = cur.astype(np.uint8)
        else:
            raise ValueError(f"unknown PNG filter type {ftype} on row {r}")
    return out


def decode_png(content: bytes) -> np.ndarray:
    """Decode to (H, W, 3) uint8 RGB (gray replicated, palette
    expanded, alpha dropped). Refuses interlaced and 16-bit streams."""
    if content[:8] != _SIG:
        raise ValueError("not a PNG stream (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette: np.ndarray | None = None
    while pos + 8 <= len(content):
        length, kind = struct.unpack(">I4s", content[pos : pos + 8])
        payload = content[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if kind == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif kind == b"PLTE":
            palette = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif kind == b"IDAT":
            idat += payload
        elif kind == b"IEND":
            break
        pos += 12 + length  # length + type + payload + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR or IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported (depth {depth})")
    if interlace:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if comp or filt:
        raise ValueError("nonstandard compression/filter method")
    if ctype not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {ctype}")
    ch = _CHANNELS[ctype]
    stride = w * ch
    expected = h * (stride + 1)
    if expected > 1 << 30:
        raise ValueError(f"PNG dimensions too large ({w}x{h})")
    # cap the inflate at the declared size: a decompression bomb (tiny
    # IDAT, huge expansion) must not allocate past IHDR's own claim
    dec = zlib.decompressobj()
    data = dec.decompress(bytes(idat), expected + 1)
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size != expected or (dec.decompress(b"", 1) or not dec.eof):
        raise ValueError("PNG pixel data size mismatch")
    px = _unfilter(raw.reshape(h, stride + 1), h, stride, ch).reshape(h, w, ch)
    if ctype == 3:
        if palette is None:
            raise ValueError("palette PNG without PLTE")
        return palette[px[..., 0]]
    if ctype == 0:
        return np.repeat(px, 3, axis=-1)
    if ctype == 4:
        return np.repeat(px[..., :1], 3, axis=-1)
    return px[..., :3].copy()
