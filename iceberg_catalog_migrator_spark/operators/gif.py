"""Pure-Python GIF codec (LZW + palettes + interlace + disposal) — no
image library, stdlib + numpy only.

Fourth real compressed image codec next to QOI, baseline JPEG and PNG
(GIF is ubiquitous in web-crawl multimodal data, so the magic-byte
router should not refuse it):

- :func:`encode_gif`: GIF89a, global 256-entry palette, one image per
  frame (full canvas or a sub-rectangle), REAL variable-width LZW
  compression (dictionary growth to 12 bits, table reset at 4096),
  optional per-frame interlace, graphic-control extensions with
  disposal + transparency.
- :func:`decode_gif_frames`: yields every frame COMPOSITED onto the
  canvas per the GIF89a disposal model (1/0 draw-over, 2 restore to
  background, 3 restore to previous), transparent index honored,
  global + local color tables, both interlaced and sequential rows,
  87a and 89a signatures. :func:`decode_gif` returns the first frame
  as (h, w, 3) uint8 RGB like the sibling decoders.

Bomb cap, same stance as the PNG decoder: LZW output is capped at the
frame rectangle's own declared pixel count and the logical screen is
capped at ``MAX_PIXELS`` — a tiny stream claiming a huge expansion
refuses loudly instead of allocating.

Malformed streams (bad signature, truncated sub-blocks, missing image
data, code overruns) raise ``ValueError`` — never silent garbage.
"""

from __future__ import annotations

import struct

import numpy as np

_SIG87 = b"GIF87a"
_SIG89 = b"GIF89a"
MAX_PIXELS = 1 << 26  # 64 Mpx logical screen cap

# Adam-style GIF interlace passes: (row offset, row step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list[int]:
    order = []
    for off, step in _INTERLACE_PASSES:
        order.extend(range(off, h, step))
    return order


# --------------------------------------------------------------- LZW


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: LSB-first variable-width codes, CLEAR/END,
    width bumps when the next free code needs it, table reset at 4096."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = n_bits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, n_bits
        acc |= code << n_bits
        n_bits += width
        while n_bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n_bits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = end + 1
    emit(clear, width)
    data = indices.ravel().tolist()
    if not data:
        raise ValueError("cannot LZW-encode an empty frame")
    cur = data[0]
    for k in data[1:]:
        if (cur, k) in table:
            cur = table[(cur, k)]
            continue
        emit(cur, width)
        if next_code < 4096:
            table[(cur, k)] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            next_code = end + 1
        cur = k
    emit(cur, width)
    # END edge of the width dance: the decoder's early-change bump
    # fires after its add for the final data code (it cannot know no
    # further add follows), so when the table lands exactly on
    # 2^width - 1 the decoder reads END one bit wider — emit it so
    if next_code == (1 << width) - 1 and width < 12:
        width += 1
    emit(end, width)
    if n_bits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, max_pixels: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`, with the KwKwK special case and
    a hard output cap (decompression-bomb guard)."""
    clear = 1 << min_code_size
    end = clear + 1
    base = [(i,) for i in range(clear)] + [(), ()]
    table = list(base)
    width = min_code_size + 1
    out: list[int] = []
    acc = n_bits = pos = 0
    prev: tuple[int, ...] | None = None
    n = len(data)
    while True:
        while n_bits < width:
            if pos >= n:
                raise ValueError("truncated LZW stream (no END code)")
            acc |= data[pos] << n_bits
            pos += 1
            n_bits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n_bits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table) or not table[code]:
                raise ValueError(f"invalid first LZW code {code}")
            entry = table[code]
        elif code < len(table) and table[code]:
            entry = table[code]
        elif code == len(table):
            entry = prev + (prev[0],)  # KwKwK
        else:
            raise ValueError(f"LZW code {code} out of range")
        out.extend(entry)
        if len(out) > max_pixels:
            raise ValueError(
                f"LZW output exceeds frame's declared {max_pixels} pixels"
            )
        if prev is not None and len(table) < 4096:
            table.append(prev + (entry[0],))
            # "early change": the decoder's table lags the encoder's by
            # one pending entry, so the width bump fires one code early
            if len(table) == (1 << width) - 1 and width < 12:
                width += 1
        prev = entry
    return np.array(out, dtype=np.uint8)


# ----------------------------------------------------------- encoder

GRAY_PALETTE = np.stack([np.arange(256, dtype=np.uint8)] * 3, axis=1)


def encode_gif(
    frames: list[np.ndarray],
    palette: np.ndarray | None = None,
    delays_cs: list[int] | None = None,
    disposal: int = 1,
    transparent: int | None = None,
    interlace_frames: tuple[int, ...] = (),
    rects: list[tuple[int, int]] | None = None,
) -> bytes:
    """Write a GIF89a stream. ``frames`` are (h, w) uint8 palette
    INDEX arrays; ``palette`` is (256, 3) uint8 (grayscale identity
    by default). ``rects`` optionally places frame i at (top, left)
    on the canvas of frame 0's size."""
    if not frames:
        raise ValueError("need at least one frame")
    palette = GRAY_PALETTE if palette is None else palette
    if palette.shape != (256, 3):
        raise ValueError("palette must be (256, 3) uint8")
    H, W = frames[0].shape
    out = bytearray()
    out += _SIG89
    # packed: GCT present (0x80) | color resolution 7 (<<4) | size 7 → 256
    out += struct.pack("<HHBBB", W, H, 0x80 | (7 << 4) | 7, 0, 0)
    out += palette.astype(np.uint8).tobytes()
    for i, frame in enumerate(frames):
        h, w = frame.shape
        top, left = (rects[i] if rects else (0, 0))
        if top + h > H or left + w > W:
            raise ValueError(f"frame {i} rect exceeds canvas")
        delay = delays_cs[i] if delays_cs else 4
        packed_gce = (disposal & 7) << 2 | (transparent is not None)
        out += bytes([0x21, 0xF9, 4, packed_gce])
        out += struct.pack("<HB", delay, transparent or 0)
        out += b"\x00"
        interlaced = i in interlace_frames
        out += bytes([0x2C]) + struct.pack(
            "<HHHHB", left, top, w, h, 0x40 if interlaced else 0
        )
        px = frame[np.array(_interlace_order(h)), :] if interlaced else frame
        out += bytes([8])  # LZW min code size for a 256-entry palette
        lzw = _lzw_encode(px, 8)
        for j in range(0, len(lzw), 255):
            block = lzw[j : j + 255]
            out += bytes([len(block)]) + block
        out += b"\x00"
    out += b"\x3B"
    return bytes(out)


# ----------------------------------------------------------- decoder


def _sub_blocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a sub-block chain starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    n = len(content)
    while True:
        if pos >= n:
            raise ValueError("truncated sub-block chain")
        size = content[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        if pos + size > n:
            raise ValueError("truncated sub-block")
        chunks.append(content[pos : pos + size])
        pos += size


def decode_gif_frames(content: bytes):
    """Yield every frame composited to (H, W, 3) uint8 RGB per the
    GIF89a disposal model. See module docstring for coverage."""
    if content[:6] not in (_SIG87, _SIG89):
        raise ValueError("not a GIF stream (bad signature)")
    if len(content) < 13:
        raise ValueError("truncated GIF header")
    W, H, packed, bg, _aspect = struct.unpack("<HHBBB", content[6:13])
    if W == 0 or H == 0 or W * H > MAX_PIXELS:
        raise ValueError(f"GIF dimensions unsupported ({W}x{H})")
    pos = 13
    gct: np.ndarray | None = None
    if packed & 0x80:
        size = 2 << (packed & 7)
        gct = np.frombuffer(content[pos : pos + 3 * size], dtype=np.uint8)
        if gct.size != 3 * size:
            raise ValueError("truncated global color table")
        gct = gct.reshape(size, 3)
        pos += 3 * size
    canvas = np.zeros((H, W, 3), dtype=np.uint8)
    if gct is not None and bg < len(gct):
        canvas[:] = gct[bg]
    bg_rgb = canvas[0, 0].copy()
    transparent: int | None = None
    disposal = 0
    n = len(content)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF (no trailer)")
        block = content[pos]
        pos += 1
        if block == 0x3B:  # trailer
            return
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated extension")
            label = content[pos]
            pos += 1
            data, pos = _sub_blocks(content, pos)
            if label == 0xF9 and len(data) >= 4:
                gce_packed = data[0]
                disposal = (gce_packed >> 2) & 7
                transparent = data[3] if gce_packed & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02X}")
        if pos + 9 > n:
            raise ValueError("truncated image descriptor")
        left, top, w, h, ipacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        if left + w > W or top + h > H or w == 0 or h == 0:
            raise ValueError("frame rectangle outside logical screen")
        pal = gct
        if ipacked & 0x80:  # local color table
            size = 2 << (ipacked & 7)
            pal = np.frombuffer(content[pos : pos + 3 * size], dtype=np.uint8)
            if pal.size != 3 * size:
                raise ValueError("truncated local color table")
            pal = pal.reshape(size, 3)
            pos += 3 * size
        if pal is None:
            raise ValueError("frame has no color table (neither GCT nor LCT)")
        if pos >= n:
            raise ValueError("missing LZW minimum code size")
        min_code = content[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"invalid LZW minimum code size {min_code}")
        lzw, pos = _sub_blocks(content, pos)
        idx = _lzw_decode(lzw, min_code, w * h)
        if idx.size != w * h:
            raise ValueError(
                f"LZW yielded {idx.size} pixels for a {w}x{h} frame"
            )
        idx = idx.reshape(h, w)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            seq = np.empty_like(idx)
            seq[np.array(_interlace_order(h)), :] = idx
            idx = seq
        if int(idx.max()) >= len(pal):
            raise ValueError("palette index out of range")
        saved = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + h, left : left + w]
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        yield canvas.copy()
        if disposal == 2:
            canvas[top : top + h, left : left + w] = bg_rgb
        elif disposal == 3 and saved is not None:
            canvas = saved
        # GIF89a scoping: a graphic control extension governs ONLY the
        # rendering block that follows it — a later GCE-less frame must
        # not inherit this frame's transparency/disposal
        transparent = None
        disposal = 0


def decode_gif(content: bytes) -> np.ndarray:
    """First composited frame as (h, w, 3) uint8 RGB — the sibling
    decoders' contract (the router's still-image path)."""
    for frame in decode_gif_frames(content):
        return frame
    raise ValueError("GIF contains no image data")
