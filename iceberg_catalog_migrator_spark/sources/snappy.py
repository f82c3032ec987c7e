"""Pure-Python Snappy block format — written from the public format
description (google/snappy ``format_description.txt``), no library.

Real-world Iceberg trees ship Avro manifests compressed with snappy
(one of the Avro spec's named codecs, alongside null/deflate/bzip2/xz/
zstandard); this decoder lets the importer read such foreign trees
offline. The format:

- preamble: uncompressed length, little-endian varint (7 bits/byte,
  MSB = continuation);
- then elements, each starting with a tag byte whose low 2 bits select:

  =====  ==========================================================
  00     literal. ``(tag>>2) < 60`` → length ``(tag>>2)+1``; 60-63 →
         that many (1-4) following little-endian bytes hold
         ``length-1``.
  01     copy, 1-byte offset: length ``((tag>>2) & 7) + 4`` (4-11),
         offset ``((tag>>5) << 8) | next_byte`` (11 bits, 1-2047).
  10     copy, 2-byte little-endian offset; length ``(tag>>2)+1``.
  11     copy, 4-byte little-endian offset; length ``(tag>>2)+1``.
  =====  ==========================================================

Copies may reach back less than their length (offset < length): the
output repeats — decoded byte-at-a-time exactly like the reference
implementation.

The compressor is a greedy single-entry hash-table matcher (the
reference implementation's shape): 4-byte anchors hash into a table,
matches extend forward and emit the narrowest copy element that fits
(1-byte offsets for short near copies, else 2/4-byte), literals cover
the gaps. Output is spec-legal for any decoder and genuinely
compresses repetitive manifest payloads; ratio is not tuned — the
engine's own trees default to Avro deflate. Byte-level behavior is
pinned by HAND-CRAFTED fixtures in ``tests/test_snappy.py`` (the
``tests/test_puffin.py`` rule: encoder and decoder must not share a
wrong assumption).

Reference parity: the reference CLI never decodes manifests (it moves
the metadata pointer only, ``CatalogMigrator.java:212-213``); manifest
codecs matter to this engine's analytics import plane.
"""

from __future__ import annotations


class SnappyError(ValueError):
    pass


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    out = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise SnappyError("snappy: truncated varint preamble")
        b = data[pos]
        pos += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, pos
        shift += 7
        if shift > 35:
            raise SnappyError("snappy: varint overflow")


def decompress(data: bytes) -> bytes:
    """Decode one snappy block-format buffer."""
    want, pos = _read_varint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        kind = tag & 0x3
        if kind == 0:  # literal
            ln = tag >> 2
            if ln >= 60:
                extra = ln - 59
                if pos + extra > n:
                    raise SnappyError("snappy: truncated literal length")
                ln = int.from_bytes(data[pos : pos + extra], "little")
                pos += extra
            ln += 1
            if pos + ln > n:
                raise SnappyError("snappy: truncated literal body")
            out += data[pos : pos + ln]
            pos += ln
            continue
        if kind == 1:  # copy, 1-byte offset
            ln = ((tag >> 2) & 0x7) + 4
            if pos >= n:
                raise SnappyError("snappy: truncated copy offset")
            off = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif kind == 2:  # copy, 2-byte offset
            ln = (tag >> 2) + 1
            if pos + 2 > n:
                raise SnappyError("snappy: truncated copy offset")
            off = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            ln = (tag >> 2) + 1
            if pos + 4 > n:
                raise SnappyError("snappy: truncated copy offset")
            off = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if off == 0 or off > len(out):
            raise SnappyError(
                f"snappy: copy offset {off} outside window ({len(out)})"
            )
        if off >= ln:
            start = len(out) - off
            out += out[start : start + ln]
        else:
            # overlapping copy: the output repeats, byte at a time
            start = len(out) - off
            for i in range(ln):
                out.append(out[start + i])
    if len(out) != want:
        raise SnappyError(
            f"snappy: decoded {len(out)} bytes, preamble declared {want}"
        )
    return bytes(out)


_MAX_LITERAL = (1 << 32) - 1  # 4-byte extended literal length bound


def _write_varint(v: int) -> bytes:
    out = bytearray()
    while v >= 0x80:
        out.append((v & 0x7F) | 0x80)
        v >>= 7
    out.append(v)
    return bytes(out)


def _emit_literal(out: bytearray, chunk: bytes) -> None:
    ln = len(chunk) - 1
    if ln < 60:
        out.append(ln << 2)
    else:
        extra = (ln.bit_length() + 7) // 8
        out.append((59 + extra) << 2)
        out += ln.to_bytes(extra, "little")
    out += chunk


def _emit_copy(out: bytearray, off: int, ln: int) -> None:
    """One copy element, narrowest encoding that fits; lengths above
    64 split (the format caps a single copy's length at 64)."""
    while ln > 0:
        step = min(ln, 64)
        if ln - step in (1, 2, 3):
            step -= 4  # never leave a sub-4 remainder a copy can't encode
        if 4 <= step <= 11 and off < 2048:
            out.append(((off >> 8) << 5) | ((step - 4) << 2) | 1)
            out.append(off & 0xFF)
        elif off < 65536:
            out.append(((step - 1) << 2) | 2)
            out += off.to_bytes(2, "little")
        else:
            out.append(((step - 1) << 2) | 3)
            out += off.to_bytes(4, "little")
        ln -= step


def compress(data: bytes) -> bytes:
    """Greedy hash-match snappy: spec-legal elements, real copies."""
    n = len(data)
    out = bytearray(_write_varint(n))
    if n == 0:
        return bytes(out)
    # fixed-size table (the reference implementation's shape): O(16K)
    # memory regardless of input size — an unbounded dict would grow
    # one entry per input position on a 100 MB manifest block
    table = [0] * (1 << 14)  # stores pos+1; 0 = empty
    pos = 0
    lit_start = 0
    while pos + 4 <= n:
        key = int.from_bytes(data[pos : pos + 4], "little")
        slot = (key * 0x1E35A7BD) >> 18 & 0x3FFF
        cand = table[slot] - 1
        table[slot] = pos + 1
        if (
            cand >= 0
            and pos - cand <= 0xFFFFFFFF  # 4-byte offset field bound
            and data[cand : cand + 4] == data[pos : pos + 4]
        ):
            # extend the match forward
            ln = 4
            while (
                pos + ln < n
                and data[cand + ln] == data[pos + ln]
                and ln < 1 << 16
            ):
                ln += 1
            if pos > lit_start:
                _emit_literal(out, data[lit_start:pos])
            _emit_copy(out, pos - cand, ln)
            pos += ln
            lit_start = pos
            continue
        pos += 1
    if lit_start < n:
        tail = data[lit_start:]
        for i in range(0, len(tail), _MAX_LITERAL):
            _emit_literal(out, tail[i : i + _MAX_LITERAL])
    return bytes(out)
