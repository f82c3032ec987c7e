"""Pure-Python zstd (RFC 8878) COMPRESSOR — the write-path counterpart
of :mod:`.zstd`'s decoder, closing the export half of the interop story
(Avro manifests and Puffin blobs in the most common modern codec).

Spec-legal subset, chosen for bounded complexity at real compression:

- single-segment frames with an exact frame-content-size and the
  xxHash64 content checksum;
- HUFFMAN literals when they win (direct 4-bit weight descriptions,
  canonical codes, 1- and 4-stream layouts), RAW literals otherwise;
  greedy LZ77 matches encoded as sequences over the PREDEFINED FSE
  distributions (symbol compression mode 0 for all three tables, the
  one mode every decoder must ship), with the spec's REPEAT-OFFSET
  window maintained exactly as the decoder replays it (offset_value
  1/2/3 shortcuts when a match repeats a recent stride);
- blocks capped at the spec's 128 KiB regenerated maximum, with
  matches allowed to reach across block boundaries (single-segment
  window = content size);
- a block whose compressed form would not beat RAW is emitted as a RAW
  block (the reference encoder's fallback), all-same-byte blocks as
  RLE.

No dictionaries, no FSE-compressed weight descriptions or sequence
tables, no treeless literals blocks: every omitted feature is an
ENCODER-side choice that any conforming decoder — including the
reference CLI — accepts.

House independence rule (tests/test_zstd.py): this module re-derives
its constants (predefined distributions, literal/match length code
tables) from RFC 8878 §3.1.1.3.2.1-2 rather than importing the
decoder's copies, so the two directions cannot share a typo; the
round-trip tests pin encoder output against the decoder AND against
hand-assembled expected bytes.

Reference parity: the reference migrator ships no compression code of
its own (it delegates to the Iceberg/Avro libraries); this module
exists for the engine's export plane (`sources/iceberg_format.py`)."""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528

# ------------------------------------------------------------ constants
# RFC 8878 §3.1.1.3.2.1.1: literal-length codes (code → baseline, bits)
_LL_BASE = list(range(16)) + [
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048,
    4096, 8192, 16384, 32768, 65536,
]
_LL_BITS = [0] * 16 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
# RFC 8878 §3.1.1.3.2.1.1: match-length codes (lengths start at 3)
_ML_BASE = [i + 3 for i in range(32)] + [
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027,
    2051, 4099, 8195, 16387, 32771, 65539,
]
_ML_BITS = [0] * 32 + [
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16,
]
# RFC 8878 §3.1.1.3.2.2: predefined FSE distributions (AL 6 / 5 / 6)
_LL_DEF = [
    4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1,
    -1, -1, -1, -1,
]
_ML_DEF = [
    1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, -1, -1,
    -1, -1, -1, -1, -1,
]
_OF_DEF = [
    1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1,
]

_BLOCK_MAX = 128 * 1024  # spec Block_Maximum_Size (window >= 128 KiB)
_MIN_MATCH = 4  # we only hash 4-byte prefixes; codes allow >= 3
# the predefined offset table tops out at of_code 28, i.e.
# offset_value < 2^29; larger back-references (inputs > ~512 MiB)
# must be skipped during matching, not crash the code lookup
_MAX_OFFSET = (1 << 29) - 4  # offset_value = offset + 3 <= 2^29 - 1


def _code_for(value: int, bases: list[int]) -> int:
    """Largest code whose baseline is <= value (tables are sorted)."""
    lo, hi = 0, len(bases) - 1
    while lo < hi:
        mid = (lo + hi + 1) >> 1
        if bases[mid] <= value:
            lo = mid
        else:
            hi = mid - 1
    return lo


class _FseEncoder:
    """FSE encoding table for one predefined distribution: the decode
    table's spread (RFC 8878 §4.1.1, re-derived here) inverted into
    per-symbol sub-range lookup. For symbol ``s`` with normalized
    frequency ``f`` the states assigned to it carry counters
    ``x ∈ [f, 2f)`` whose ranges ``[(x<<nb)-size, ((x+1)<<nb)-size)``
    exactly tile the state space — so for any successor state there is
    exactly ONE predecessor per symbol."""

    __slots__ = ("accuracy_log", "size", "freq", "state_of", "first")

    def __init__(self, accuracy_log: int, freqs: list[int]):
        self.accuracy_log = accuracy_log
        size = 1 << accuracy_log
        self.size = size
        symbols = [0] * size
        high = size
        for s, f in enumerate(freqs):
            if f == -1:
                high -= 1
                symbols[high] = s
        step = (size >> 1) + (size >> 3) + 3
        mask = size - 1
        pos = 0
        for s, f in enumerate(freqs):
            if f <= 0:
                continue
            for _ in range(f):
                symbols[pos] = s
                pos = (pos + step) & mask
                while pos >= high:
                    pos = (pos + step) & mask
        if pos != 0:
            raise ValueError("FSE spread did not return to zero")
        # effective frequency: the spec's -1 (less-than-one) symbols
        # occupy exactly one state and update with AL bits
        self.freq = [1 if f == -1 else f for f in freqs]
        # walk states in index order handing out counters f, f+1, ...
        counters = list(self.freq)
        self.state_of: list[dict[int, int]] = [dict() for _ in freqs]
        self.first = [None] * len(freqs)
        for i in range(size):
            s = symbols[i]
            self.state_of[s][counters[s]] = i
            counters[s] += 1
            if self.first[s] is None:
                self.first[s] = i

    def transition(self, symbol: int, next_state: int) -> tuple[int, int, int]:
        """(state, update_value, update_nbits): the unique state that
        emits ``symbol`` and reaches ``next_state`` with its update
        read."""
        f = self.freq[symbol]
        nb_hi = self.accuracy_log - (f.bit_length() - 1)
        for nb in (nb_hi, nb_hi - 1):
            if nb < 0:
                continue
            x = (next_state + self.size) >> nb
            if f <= x < 2 * f:
                base = (x << nb) - self.size
                if base <= next_state < base + (1 << nb):
                    return self.state_of[symbol][x], next_state - base, nb
        raise ValueError(
            f"no FSE transition for symbol {symbol} -> state {next_state}"
        )


_ENCODERS: dict[str, _FseEncoder] = {}


def _encoders() -> tuple[_FseEncoder, _FseEncoder, _FseEncoder]:
    if not _ENCODERS:
        # build fully, publish once: a concurrent first caller must
        # never observe a partially populated dict
        built = {
            "ll": _FseEncoder(6, _LL_DEF),
            "of": _FseEncoder(5, _OF_DEF),
            "ml": _FseEncoder(6, _ML_DEF),
        }
        _ENCODERS.update(built)
    return _ENCODERS["ll"], _ENCODERS["of"], _ENCODERS["ml"]


def _pack_backward(items: list[tuple[int, int]]) -> bytes:
    """RFC 8878 §3.1.1.4 backward bitstream: items listed in DECODE
    (read) order land under the 1-bit sentinel, padded to a byte.

    Walks the items in REVERSE so each lands above everything already
    accumulated and finished low bytes flush immediately — the
    accumulator stays word-sized and the pack is O(total bits), where
    the naive single-big-int shift is O(bits^2) (real cost at a 128 KiB
    block's tens of thousands of sequence items)."""
    out = bytearray()
    acc = 0
    nbits = 0
    for v, n in reversed(items):
        acc |= v << nbits
        nbits += n
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    acc |= 1 << nbits  # the sentinel bit, above every data bit
    nbits += 1
    while nbits > 0:
        out.append(acc & 0xFF)
        acc >>= 8
        nbits -= 8
    return bytes(out)


# ------------------------------------------------------------- matching
def _find_matches(data: bytes, start: int, end: int, table: dict) -> list:
    """Greedy LZ77 over ``data[start:end]``: 4-byte-prefix hash table
    (shared across blocks — matches may reach any earlier offset in
    the frame, which the single-segment window allows). Returns
    ``[(lit_start, lit_len, offset, match_len), ...]`` covering the
    region; trailing literals are the caller's remainder."""
    seqs = []
    lit_start = i = start
    last4 = end - 4
    misses = 0  # LZ4-style skip acceleration over matchless regions
    while i <= last4:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is None or i - j > _MAX_OFFSET:
            # after 64 consecutive misses start stepping 2, then 3...
            # — incompressible regions stop costing one dict probe per
            # byte; skipped anchors only thin the match candidates,
            # never correctness
            misses += 1
            i += 1 + (misses >> 6)
            continue
        # verify (hashless dict keys are exact) and extend in chunks
        ml = 4
        limit = end - i
        while ml < limit:
            span = min(64, limit - ml)
            if data[j + ml : j + ml + span] == data[i + ml : i + ml + span]:
                ml += span
                continue
            a, b = data[j + ml : j + ml + span], data[i + ml : i + ml + span]
            for k in range(span):
                if a[k] != b[k]:
                    break
                ml += 1
            break
        if ml == 4 and i - j > 1024:
            # a minimal match at a far offset costs ~3 bytes of
            # sequence to save ~1 of literals — not worth the sequence
            # (and the per-sequence encode time) on barely-compressible
            # data; treat as a miss
            misses += 1
            i += 1 + (misses >> 6)
            continue
        misses = 0  # only an ACCEPTED match resets the ramp
        seqs.append((lit_start, i - lit_start, i - j, ml))
        # seed a few positions inside the match so later data can
        # reference it (full seeding is O(ml); every 16th is enough)
        for p in range(i + 1, min(i + ml, last4), 16):
            table[data[p : p + 4]] = p
        i += ml
        lit_start = i
    return seqs


# ------------------------------------------------------------ sequences
def _encode_sequences(
    seqs: list[tuple[int, int, int]], reps: list[int]
) -> bytes:
    """The sequences-section bitstream for ``[(ll, offset, ml), ...]``
    over the predefined tables: states chosen BACKWARDS (the classic
    FSE encoder walk), then everything packed in decode order.

    ``reps`` is the frame's live repeat-offset window (RFC 8878
    §3.1.1.5), MUTATED in place exactly as the decoder will replay it:
    an offset matching rep0/rep1/rep2 emits offset_value 1/2/3 (zero
    or one extra bit instead of log2(offset)) — on record-structured
    data most matches repeat one stride, so this is the single biggest
    ratio lever after matching itself. The ll==0 case has a SHIFTED
    value mapping in the spec; it always takes the literal-offset form
    here (correct, merely never shortened)."""
    ll_enc, of_enc, ml_enc = _encoders()
    codes = []
    for ll, offset, ml in seqs:
        ll_code = _code_for(ll, _LL_BASE)
        ml_code = _code_for(ml, _ML_BASE)
        if ll != 0 and offset == reps[0]:
            offset_value = 1  # rep0: window unchanged
        elif ll != 0 and offset == reps[1]:
            offset_value = 2
            reps[:] = [reps[1], reps[0], reps[2]]
        elif ll != 0 and offset == reps[2]:
            offset_value = 3
            reps[:] = [reps[2], reps[0], reps[1]]
        else:
            offset_value = offset + 3
            reps[:] = [offset, reps[0], reps[1]]
        of_code = offset_value.bit_length() - 1
        codes.append(
            (
                ll_code,
                ll - _LL_BASE[ll_code],
                of_code,
                offset_value - (1 << of_code),
                ml_code,
                ml - _ML_BASE[ml_code],
            )
        )
    n = len(codes)
    ll_states, of_states, ml_states = [0] * n, [0] * n, [0] * n
    ll_upd: list[tuple[int, int]] = [None] * (n - 1)  # type: ignore[list-item]
    ml_upd: list[tuple[int, int]] = [None] * (n - 1)  # type: ignore[list-item]
    of_upd: list[tuple[int, int]] = [None] * (n - 1)  # type: ignore[list-item]
    ll_states[-1] = ll_enc.first[codes[-1][0]]
    of_states[-1] = of_enc.first[codes[-1][2]]
    ml_states[-1] = ml_enc.first[codes[-1][4]]
    for i in range(n - 2, -1, -1):
        ll_states[i], v, nb = ll_enc.transition(
            codes[i][0], ll_states[i + 1]
        )
        ll_upd[i] = (v, nb)
        of_states[i], v, nb = of_enc.transition(
            codes[i][2], of_states[i + 1]
        )
        of_upd[i] = (v, nb)
        ml_states[i], v, nb = ml_enc.transition(
            codes[i][4], ml_states[i + 1]
        )
        ml_upd[i] = (v, nb)
    items: list[tuple[int, int]] = [
        (ll_states[0], 6),
        (of_states[0], 5),
        (ml_states[0], 6),
    ]
    for i, (ll_code, ll_x, of_code, of_x, ml_code, ml_x) in enumerate(codes):
        # decode order: offset extra, match extra, literals extra
        items.append((of_x, of_code))
        items.append((ml_x, _ML_BITS[ml_code]))
        items.append((ll_x, _LL_BITS[ll_code]))
        if i < n - 1:
            # then the state updates: literals, match, offset
            items.append(ll_upd[i])
            items.append(ml_upd[i])
            items.append(of_upd[i])
    return _pack_backward(items)


def _nseq_header(n: int) -> bytes:
    """RFC 8878 §3.1.1.3.2.1 sequence-count encoding."""
    if n < 128:
        return bytes([n])
    if n < 0x7F00:
        return bytes([128 + (n >> 8), n & 0xFF])
    rest = n - 0x7F00
    return bytes([255, rest & 0xFF, rest >> 8])


# -------------------------------------------------------------- Huffman
def _huffman_lengths(freq: list[int]) -> list[int] | None:
    """Optimal prefix-code lengths for the non-zero entries of
    ``freq`` (classic two-queue Huffman over a heap), or None when any
    length would exceed the spec's 11-bit Huffman cap (the caller
    falls back to raw literals rather than length-limit)."""
    import heapq

    heap = [(f, sym, 0, None, None) for sym, f in enumerate(freq) if f]
    if len(heap) < 2:
        return None
    heapq.heapify(heap)
    counter = 256  # tiebreaker for merged nodes: deterministic builds
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        heapq.heappush(heap, (a[0] + b[0], counter, 0, a, b))
        counter += 1
    lengths = [0] * 256
    stack = [(heap[0], 0)]
    while stack:
        node, depth = stack.pop()
        if node[3] is None:
            lengths[node[1]] = max(depth, 1)
        else:
            stack.append((node[3], depth + 1))
            stack.append((node[4], depth + 1))
    if max(lengths) > 11:
        return None
    return lengths


def _huffman_literals(literals: bytes) -> bytes | None:
    """A COMPRESSED-type (2) literals section for ``literals`` —
    direct-representation Huffman weights + canonical codes in the
    decoder's table order (symbols fill increasing-weight, ties by
    index; a symbol's code is the top ``nb`` bits of its range) — or
    None when Huffman cannot express or cannot win: fewer than two
    distinct symbols, a symbol above 127 (direct weights carry at most
    128 entries), an >11-bit code, or no size gain over raw."""
    n = len(literals)
    if n < 64:
        return None  # a tree description cannot pay for itself
    freq = [0] * 256
    for b in literals:
        freq[b] += 1
    max_sym = max(i for i, f in enumerate(freq) if f)
    if max_sym > 127:
        return None
    lengths = _huffman_lengths(freq)
    if lengths is None:
        return None
    max_bits = max(lengths)
    weights = [
        (max_bits + 1 - lengths[s]) if freq[s] else 0 for s in range(256)
    ]
    # canonical codes from the decoder's spread: ascending weight
    # (longest codes first), ties by symbol; range start >> gap = code
    codes = [0] * 256
    nbits = [0] * 256
    pos = 0
    for w in range(1, max_bits + 1):
        for sym in range(max_sym + 1):
            if weights[sym] != w:
                continue
            nb = max_bits + 1 - w
            codes[sym] = pos >> (max_bits - nb)
            nbits[sym] = nb
            pos += 1 << (w - 1)
    # tree description: direct 4-bit weights for symbols 0..max_sym-1
    # (the last used symbol's weight is implied by the Kraft total)
    tw = weights[:max_sym]
    tree = bytearray([127 + len(tw)])
    for i in range(0, len(tw), 2):
        hi = tw[i] << 4
        lo = tw[i + 1] if i + 1 < len(tw) else 0
        tree.append(hi | lo)

    def stream(chunk: bytes) -> bytes:
        return _pack_backward([(codes[b], nbits[b]) for b in chunk])

    # profitability decided BEFORE the O(n) pack: the exact stream
    # size is sum(freq * length) + 1 sentinel bit, byte-rounded per
    # stream — incompressible-but-ascii literals then cost O(256)
    # here, not a discarded full encode
    raw_total = _raw_cost(n) + n
    total_bits = sum(freq[s] * lengths[s] for s in range(256) if freq[s])
    if n <= 1023:
        stream_bytes = (total_bits + 8) // 8
        comp = len(tree) + stream_bytes
        if comp > 1023 or comp + 3 >= raw_total:
            return None
        payload = bytes(tree) + stream(literals)
        h = 2 | (0 << 2) | (n << 4) | (comp << 14)
        return h.to_bytes(3, "little") + payload
    per = (n + 3) // 4
    chunks = [literals[i * per : (i + 1) * per] for i in range(3)]
    chunks.append(literals[3 * per :])
    # exact: each chunk's packed size is its code-bit sum + sentinel,
    # byte-rounded — so the whole section (tree + jump table + streams
    # + the 4/5-byte literals header) compares against raw before any
    # packing happens
    comp = len(tree) + 6 + sum(
        (sum(nbits[b] for b in c) + 8) // 8 for c in chunks
    )
    hdr_len = 4 if (n <= 16383 and comp <= 16383) else 5
    if comp + hdr_len >= raw_total:
        return None
    enc = [stream(c) for c in chunks]
    payload = (
        bytes(tree)
        + struct.pack("<HHH", len(enc[0]), len(enc[1]), len(enc[2]))
        + b"".join(enc)
    )
    comp = len(payload)
    if n <= 16383 and comp <= 16383:
        h = 2 | (2 << 2) | (n << 4) | (comp << 18)
        return h.to_bytes(4, "little") + payload
    h = 2 | (3 << 2) | (n << 4) | (comp << 22)
    return h.to_bytes(5, "little") + payload


def _raw_cost(size: int) -> int:
    """Raw-literals header size for ``size`` bytes — derived from the
    one header builder so the thresholds can never drift."""
    return len(_raw_literals_header(size))


def _literals_section(literals: bytes) -> bytes:
    """The smallest spec-legal literals section for ``literals``:
    Huffman-compressed when it wins, raw otherwise."""
    huf = _huffman_literals(literals)
    if huf is not None:
        return huf
    return _raw_literals_header(len(literals)) + literals


def _raw_literals_header(size: int) -> bytes:
    """Raw-literals section header (block type 0) in the smallest
    size format."""
    if size < 32:
        return bytes([size << 3])
    if size < 4096:
        return bytes([(1 << 2) | ((size & 0xF) << 4), size >> 4])
    return bytes([
        (3 << 2) | ((size & 0xF) << 4),
        (size >> 4) & 0xFF,
        size >> 12,
    ])


def _compress_block(
    data: bytes, start: int, end: int, table: dict, reps: list[int]
) -> tuple[bytes, list[int]]:
    """``(block content, advanced repeat-offset window)`` for one
    COMPRESSED-type block, or ``(b'', reps-unchanged)`` when
    compression would not beat RAW — the caller commits the advanced
    window ONLY when it emits the compressed form (a RAW/RLE fallback
    leaves the decoder's window untouched)."""
    size = end - start
    seqs_abs = _find_matches(data, start, end, table)
    if not seqs_abs:
        return b"", reps
    literals = bytearray()
    seqs = []
    covered = start
    for lit_start, lit_len, offset, ml in seqs_abs:
        literals += data[lit_start : lit_start + lit_len]
        seqs.append((lit_len, offset, ml))
        covered = lit_start + lit_len + ml
    literals += data[covered:end]
    new_reps = list(reps)
    body = (
        _literals_section(bytes(literals))
        + _nseq_header(len(seqs))
        + b"\x00"  # all three tables in predefined mode
        + _encode_sequences(seqs, new_reps)
    )
    if len(body) >= size:
        return b"", reps
    return body, new_reps


def _block_header(size: int, btype: int, last: bool) -> bytes:
    return struct.pack("<I", (size << 3) | (btype << 1) | int(last))[:3]


# Single-segment frames declare Window_Size = content size, and stock
# decoders (libzstd, the zstd CLI) enforce a 128 MiB default window
# limit (ZSTD_WINDOWLOG_LIMIT_DEFAULT = 27): a larger payload would
# produce a frame that default-configured reference decoders REJECT
# even though it is spec-legal. Refuse loudly instead of emitting
# bytes a consumer cannot read (ADVICE r15).
MAX_SINGLE_SEGMENT_INPUT = 128 << 20


def compress(data: bytes) -> bytes:
    """``data`` as one single-segment zstd frame (exact content size,
    xxHash64 content checksum), spec-legal for any RFC 8878 decoder."""
    from .zstd import xxh64  # checksum only: no format logic shared

    n = len(data)
    if n > MAX_SINGLE_SEGMENT_INPUT:
        raise ValueError(
            f"compress() emits single-segment frames (window = content "
            f"size); {n} bytes exceeds the 128 MiB default window limit "
            "stock decoders enforce — split the payload into <=128 MiB "
            "frames or extend the encoder with a windowed frame header"
        )
    # frame header: single-segment + checksum, smallest FCS field
    if n <= 255:
        fhd, fcs = 0x24, struct.pack("<B", n)
    elif n <= 65791:
        fhd, fcs = 0x64, struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fhd, fcs = 0xA4, struct.pack("<I", n)
    else:
        fhd, fcs = 0xE4, struct.pack("<Q", n)
    out = bytearray(struct.pack("<I", _MAGIC))
    out.append(fhd)
    out += fcs
    if n == 0:
        out += _block_header(0, 0, True)
    else:
        table: dict = {}
        reps = [1, 4, 8]  # the spec's initial repeat-offset window
        for start in range(0, n, _BLOCK_MAX):
            end = min(start + _BLOCK_MAX, n)
            last = end == n
            chunk = data[start:end]
            if len(chunk) > 1 and chunk.count(chunk[0]) == len(chunk):
                out += _block_header(len(chunk), 1, last)
                out.append(chunk[0])
                continue
            body, reps = _compress_block(data, start, end, table, reps)
            if body:
                out += _block_header(len(body), 2, last)
                out += body
            else:
                out += _block_header(len(chunk), 0, last)
                out += chunk
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)
