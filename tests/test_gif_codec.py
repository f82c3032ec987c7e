"""GIF codec: LZW round trips (incl. width growth, table reset,
KwKwK), interlace, the GIF89a disposal model, transparency, local
color tables, and loud refusals on malformed/bomb streams."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from iceberg_catalog_migrator_spark.operators.gif import (
    GRAY_PALETTE,
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


class TestLZW:
    def test_round_trip_random_sizes(self):
        rng = np.random.default_rng(7)
        for size in (1, 2, 255, 5000, 70000):
            data = rng.integers(0, 256, size=size).astype(np.uint8)
            assert (_lzw_decode(_lzw_encode(data, 8), 8, size) == data).all()

    def test_round_trip_compressible_exercises_table_reset(self):
        # > 4096 dictionary entries forces at least one CLEAR/reset
        data = np.tile(np.arange(17, dtype=np.uint8), 40000)
        assert (_lzw_decode(_lzw_encode(data, 8), 8, data.size) == data).all()

    def test_kwkwk_case(self):
        # 'aaaa...' drives the code==next_code special case immediately
        data = np.zeros(64, dtype=np.uint8)
        assert (_lzw_decode(_lzw_encode(data, 8), 8, 64) == data).all()

    @given(
        data=st.lists(st.integers(0, 3), min_size=1, max_size=400),
        mcs=st.integers(2, 4),
    )
    @settings(max_examples=60)
    def test_round_trip_property_small_alphabet(self, data, mcs):
        arr = np.array(data, dtype=np.uint8)
        assert (_lzw_decode(_lzw_encode(arr, mcs), mcs, arr.size) == arr).all()

    def test_bomb_cap(self):
        data = np.zeros(10_000, dtype=np.uint8)
        enc = _lzw_encode(data, 8)
        with pytest.raises(ValueError, match="exceeds frame's declared"):
            _lzw_decode(enc, 8, 100)

    def test_truncated_stream(self):
        enc = _lzw_encode(np.arange(64, dtype=np.uint8), 8)
        with pytest.raises(ValueError, match="truncated LZW"):
            _lzw_decode(enc[:-2], 8, 64)


class TestGifRoundTrip:
    def test_multiframe_with_interlace(self):
        rng = np.random.default_rng(11)
        frames = [
            rng.integers(0, 256, size=(16, 24)).astype(np.uint8)
            for _ in range(3)
        ]
        out = list(decode_gif_frames(encode_gif(frames, interlace_frames=(1,))))
        assert len(out) == 3
        for f, o in zip(frames, out):
            assert (o == GRAY_PALETTE[f]).all()

    def test_custom_palette(self):
        pal = np.roll(GRAY_PALETTE, 3, axis=0)
        frame = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
        (out,) = decode_gif_frames(encode_gif([frame], palette=pal))
        assert (out == pal[frame]).all()

    def test_first_frame_contract(self):
        frame = np.full((4, 4), 9, dtype=np.uint8)
        img = decode_gif(encode_gif([frame, frame + 1]))
        assert img.shape == (4, 4, 3)
        assert (img == 9).all()


class TestDisposalModel:
    base = np.full((8, 8), 200, dtype=np.uint8)

    def overlay(self):
        o = np.full((4, 4), 50, dtype=np.uint8)
        o[0, 0] = 7
        return o

    def test_disposal1_draw_over_with_transparency(self):
        b = encode_gif(
            [self.base, self.overlay()],
            disposal=1, transparent=7, rects=[(0, 0), (2, 2)],
        )
        f0, f1 = decode_gif_frames(b)
        assert (f0 == 200).all()
        # (2,2) is the overlay's transparent corner: base shows through
        assert (f1[2, 2] == 200).all() and (f1[3, 3] == 50).all()
        assert (f1[0, 0] == 200).all()

    def test_disposal2_restores_background(self):
        b = encode_gif(
            [self.base, self.overlay()],
            disposal=2, transparent=7, rects=[(0, 0), (2, 2)],
        )
        _, f1 = decode_gif_frames(b)
        # frame 0's rect was restored to background (palette[0] = black)
        assert (f1[0, 0] == 0).all() and (f1[2, 2] == 0).all()
        assert (f1[3, 3] == 50).all()

    def test_disposal3_restores_previous(self):
        b = encode_gif(
            [self.base, self.overlay(), self.base],
            disposal=3, rects=[(0, 0), (2, 2), (0, 0)],
        )
        frames = list(decode_gif_frames(b))
        assert (frames[2] == 200).all()


class TestRefusals:
    def test_bad_signature(self):
        with pytest.raises(ValueError, match="bad signature"):
            decode_gif(b"NOTAGIF" + b"\x00" * 16)

    def test_truncated(self):
        b = encode_gif([np.zeros((4, 4), dtype=np.uint8)])
        with pytest.raises(ValueError):
            decode_gif(b[:20])

    def test_huge_screen_refused(self):
        hdr = b"GIF89a" + struct.pack("<HHBBB", 0xFFFF, 0xFFFF, 0, 0, 0)
        with pytest.raises(ValueError, match="dimensions unsupported"):
            decode_gif(hdr + b"\x3B")

    def test_frame_outside_screen(self):
        b = bytearray(encode_gif([np.zeros((4, 4), dtype=np.uint8)]))
        # image descriptor comes after header (13) + GCT (768) + GCE (8);
        # searching from 0 would hit palette bytes that equal 0x2C
        i = bytes(b).index(b"\x2C", 13 + 768)
        b[i + 5 : i + 7] = struct.pack("<H", 9)  # frame w=9 > screen 4
        with pytest.raises(ValueError, match="outside logical screen"):
            decode_gif(bytes(b))

    def test_gif87a_signature_accepted(self):
        b = bytearray(encode_gif([np.full((2, 2), 5, dtype=np.uint8)]))
        b[0:6] = b"GIF87a"
        (out,) = decode_gif_frames(bytes(b))
        assert (out == 5).all()


def test_router_and_query_fixture():
    from iceberg_catalog_migrator_spark.operators.multimodal import (
        GIF_CHARS,
        decode_image,
        detect_image_format,
        synthesize_gif,
    )

    text = "The quick brown fox jumps over the lazy dog 0123456789 etc etc!"
    text = (text * 3)[:GIF_CHARS]
    b = synthesize_gif(text)
    assert detect_image_format(b) == "gif"
    img = decode_image(b)  # router finds the GIF decoder itself
    codes = np.frombuffer(text[:24].encode(), dtype=np.uint8)
    assert (img[..., 0].ravel() == codes).all()
