"""Real-decoder tests: pure-numpy PPM/WAV parsing, no Spark needed.

These pin the decode kernels themselves; the distributed plumbing and
oracle parity of the decode-stats queries are covered by the
correctness gate (multimodal_image_decode_stats / _audio_decode_stats).
"""

import struct

import numpy as np
import pytest

from iceberg_catalog_migrator_spark.operators.multimodal import (
    IMG_H,
    IMG_PIXEL_BYTES,
    IMG_W,
    WAV_RATE,
    WAV_SAMPLES,
    decode_image,
    decode_ppm,
    decode_wav,
    synthesize_ppm,
    synthesize_wav,
)

TEXT = "The quick brown fox jumps over the lazy dog, repeatedly and verbosely!"


def test_ppm_roundtrip_matches_text_bytes():
    img = decode_ppm(synthesize_ppm(TEXT))
    assert img.shape == (IMG_H, IMG_W, 3)
    assert img.dtype == np.uint8
    expected = np.frombuffer(TEXT[:IMG_PIXEL_BYTES].encode(), dtype=np.uint8)
    assert (img.reshape(-1) == expected).all()


def test_ppm_header_tolerates_comments_and_whitespace():
    raw = b"P6 # c\n# another comment\n 2\t1 \n255\n" + bytes(range(6))
    img = decode_ppm(raw)
    assert img.shape == (1, 2, 3)
    assert img.reshape(-1).tolist() == [0, 1, 2, 3, 4, 5]


def test_ppm_rejects_bad_magic_maxval_and_truncation():
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n1 1\n65535\n" + bytes(6))
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x01")


def test_wav_roundtrip_rate_and_sample_formula():
    rate, samples = decode_wav(synthesize_wav(TEXT))
    assert rate == WAV_RATE
    assert len(samples) == WAV_SAMPLES
    expected = (
        np.frombuffer(TEXT[:WAV_SAMPLES].encode(), dtype=np.uint8).astype(np.int16)
        - 96
    ) * 256
    assert (samples == expected).all()


def test_wav_chunk_walk_skips_unknown_and_odd_sized_chunks():
    # hand-build a container with a junk odd-length chunk before fmt/data
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    pcm = struct.pack("<3h", -5, 0, 7)
    body = (
        b"WAVE"
        + b"junk" + struct.pack("<I", 3) + b"abc" + b"\x00"  # padded to even
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    rate, samples = decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)
    assert rate == 8000
    assert samples.tolist() == [-5, 0, 7]


def test_wav_rejects_non_riff_and_stereo():
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    with pytest.raises(ValueError, match="mono"):
        decode_wav(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_decode_image_seam_routes_and_injects():
    # magic-byte routing covers every built-in decoder with NO injected
    # callable; formats the engine doesn't carry refuse honestly
    from iceberg_catalog_migrator_spark.operators.multimodal import (
        detect_image_format,
        synthesize_bmp,
    )

    img = decode_image(synthesize_ppm(TEXT))
    assert img.shape == (IMG_H, IMG_W, 3)
    assert decode_image(synthesize_bmp(TEXT)).shape[2] == 3
    assert detect_image_format(b"GIF89a....") == "gif"
    # lossless WebP now routes to the VP8L decoder; LOSSY WebP is the
    # remaining honest refusal (plus inter-frame video)
    import numpy as np

    from iceberg_catalog_migrator_spark.operators.webp import (
        encode_webp_lossless,
    )

    rgb = np.arange(27, dtype=np.uint8).reshape(3, 3, 3)
    assert np.array_equal(decode_image(encode_webp_lossless(rgb)), rgb)
    import struct as _struct

    lossy = b"WEBP" + b"VP8 " + _struct.pack("<I", 4) + b"\x00" * 4
    with pytest.raises(NotImplementedError, match="lossy WebP"):
        decode_image(b"RIFF" + _struct.pack("<I", len(lossy)) + lossy)
    # PNG routes to the real zlib-backed decoder
    from iceberg_catalog_migrator_spark.operators.multimodal import (
        PNG_H,
        PNG_W,
        synthesize_png,
    )

    assert decode_image(synthesize_png(TEXT)).shape == (PNG_H, PNG_W, 3)
    # explicit injection still wins over the router
    img = decode_image(synthesize_ppm(TEXT), decoder=decode_ppm)
    assert img.shape == (IMG_H, IMG_W, 3)
    # the router reaches the real JPEG codec
    from iceberg_catalog_migrator_spark.operators.multimodal import (
        synthesize_jpeg,
    )

    assert decode_image(synthesize_jpeg("Hello, lakehouse! ")).shape == (16, 48, 3)


# --------------------------------------------------------- BMP decode
from iceberg_catalog_migrator_spark.operators.multimodal import (  # noqa: E402
    BMP_H,
    BMP_PIXEL_BYTES,
    BMP_W,
    decode_bmp,
    synthesize_bmp,
)


def test_bmp_roundtrip_reverses_padding_bgr_and_row_order():
    img = decode_bmp(synthesize_bmp(TEXT))
    assert img.shape == (BMP_H, BMP_W, 3)
    assert img.dtype == np.uint8
    expected = np.frombuffer(TEXT[:BMP_PIXEL_BYTES].encode(), dtype=np.uint8)
    assert (img.reshape(-1) == expected).all()


def test_bmp_top_down_negative_height_decodes_identically():
    import struct

    raw = bytearray(synthesize_bmp(TEXT))
    stride = (BMP_W * 3 + 3) & ~3
    rows = [bytes(raw[54 + i * stride : 54 + (i + 1) * stride]) for i in range(BMP_H)]
    raw[54:] = b"".join(reversed(rows))
    raw[22:26] = struct.pack("<i", -BMP_H)
    expected = np.frombuffer(TEXT[:BMP_PIXEL_BYTES].encode(), dtype=np.uint8)
    assert (decode_bmp(bytes(raw)).reshape(-1) == expected).all()


def test_bmp_rejects_bad_magic_depth_and_truncation():
    raw = synthesize_bmp(TEXT)
    with pytest.raises(ValueError, match="BMP"):
        decode_bmp(b"XX" + raw[2:])
    with pytest.raises(ValueError, match="truncated BMP header"):
        decode_bmp(raw[:20])
    import struct

    shallow = bytearray(raw)
    shallow[28:30] = struct.pack("<H", 8)  # 8-bit palette BMP
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(shallow))
    with pytest.raises(ValueError, match="truncated BMP pixel"):
        decode_bmp(raw[:-4])


def _bmp_bytes(w, h, rgb, top_down=False):
    """Build a 24-bit BMP of arbitrary dimensions for decoder testing
    (the fixture synthesizer is fixed-size; the decoder is not)."""
    import struct

    stride = (w * 3 + 3) & ~3
    pad = b"\xAA" * (stride - w * 3)  # non-zero pad: decoder must ignore it
    order = range(h) if top_down else range(h - 1, -1, -1)
    pixels = b"".join(rgb[r, :, ::-1].tobytes() + pad for r in order)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0, len(pixels), 0, 0, 0, 0
    )
    return struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54) + info + pixels


def test_bmp_decoder_roundtrips_arbitrary_dims():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=40, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=13),
        h=st.integers(min_value=1, max_value=9),
        top_down=st.booleans(),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
    )
    def check(w, h, top_down, seed):
        rng = np.random.default_rng(seed)
        rgb = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        out = decode_bmp(_bmp_bytes(w, h, rgb, top_down))
        assert out.shape == (h, w, 3)
        assert np.array_equal(out, rgb)

    check()


def test_video_container_roundtrip_and_validation():
    import numpy as np
    import pytest

    from iceberg_catalog_migrator_spark.operators.multimodal import (
        BMP_PIXEL_BYTES,
        VIDEO_FRAMES,
        decode_video_frames,
        synthesize_bmp_video,
    )

    text = "".join(chr(32 + (i * 7) % 90) for i in range(VIDEO_FRAMES * BMP_PIXEL_BYTES))
    blob = synthesize_bmp_video(text)
    frames = dict(decode_video_frames(blob, stride=1))
    assert set(frames) == set(range(VIDEO_FRAMES))
    for f, img in frames.items():
        want = np.frombuffer(
            text[f * BMP_PIXEL_BYTES : (f + 1) * BMP_PIXEL_BYTES].encode("ascii"),
            dtype=np.uint8,
        )
        assert img.flatten().tolist() == want.tolist()
    # strided sampling decodes exactly every 2nd frame
    assert [f for f, _ in decode_video_frames(blob, stride=2)] == [0, 2]
    with pytest.raises(ValueError, match="not a VID0"):
        list(decode_video_frames(b"JUNK" + blob[4:]))
    with pytest.raises(ValueError, match="truncated"):
        list(decode_video_frames(blob[:20]))


class TestQoiCodec:
    def test_roundtrip_random_images(self):
        import numpy as np

        from iceberg_catalog_migrator_spark.operators.multimodal import (
            decode_qoi,
            encode_qoi,
        )

        rng = np.random.default_rng(1234)
        for shape in [(1, 1), (3, 21), (13, 7), (5, 62), (9, 64)]:
            img = rng.integers(0, 256, (*shape, 3), dtype=np.uint8)
            assert (decode_qoi(encode_qoi(img)) == img).all()

    def test_every_op_path_fires_and_compresses(self):
        import numpy as np

        from iceberg_catalog_migrator_spark.operators.multimodal import (
            decode_qoi,
            encode_qoi,
        )

        # long flat run -> RUN ops dominate and the stream compresses
        flat = np.full((16, 16, 3), 77, dtype=np.uint8)
        enc = encode_qoi(flat)
        assert len(enc) < 16 * 16 * 3 // 10
        assert (decode_qoi(enc) == flat).all()
        # gradient -> DIFF/LUMA ops; alternating colors -> INDEX ops
        grad = (np.arange(8 * 8 * 3, dtype=np.uint32) % 256).astype(np.uint8)
        grad = grad.reshape(8, 8, 3)
        assert (decode_qoi(encode_qoi(grad)) == grad).all()
        alt = np.tile(
            np.array([[10, 20, 30], [200, 100, 50]], dtype=np.uint8), (6, 3, 1)
        )
        assert (decode_qoi(encode_qoi(alt)) == alt).all()

    def test_hypothesis_roundtrip(self):
        import numpy as np
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from iceberg_catalog_migrator_spark.operators.multimodal import (
            decode_qoi,
            encode_qoi,
        )

        @settings(max_examples=40, deadline=None)
        @given(
            st.integers(1, 6),
            st.integers(1, 70),
            st.integers(0, 2**32 - 1),
            st.sampled_from(["random", "runs", "few_colors"]),
        )
        def check(h, w, seed, kind):
            rng = np.random.default_rng(seed)
            if kind == "random":
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            elif kind == "runs":
                img = np.repeat(
                    rng.integers(0, 256, (h, max(1, w // 7), 3), dtype=np.uint8),
                    7,
                    axis=1,
                )[:, :w]
            else:
                palette = rng.integers(0, 256, (3, 3), dtype=np.uint8)
                img = palette[rng.integers(0, 3, (h, w))]
            assert (decode_qoi(encode_qoi(img)) == img).all()

        check()

    def test_rejects_non_qoi(self):
        import pytest

        from iceberg_catalog_migrator_spark.operators.multimodal import decode_qoi

        with pytest.raises(ValueError, match="not a QOI payload"):
            decode_qoi(b"P6 4 3 255 ...")


class TestJPEGSeam:
    def test_synthesized_jpeg_levels_recover_exactly(self):
        """The oracle contract behind multimodal_jpeg_decode_stats:
        flat multiple-of-32 blocks survive quality-90 quantization
        within the snap-back bound, so decoded levels equal the text's
        codes exactly for every printable document prefix."""
        import numpy as np

        from iceberg_catalog_migrator_spark.operators.jpeg import decode_jpeg
        from iceberg_catalog_migrator_spark.operators.multimodal import (
            JPEG_BLOCKS,
            _jpeg_gray_levels,
            _snap_levels,
            synthesize_jpeg,
        )

        for text in ("Hello, lakehouse! ", "aAzZ09 !~%& pq-__ ", " " * 12):
            expected = _jpeg_gray_levels(text)
            img = decode_jpeg(synthesize_jpeg(text))
            got = _snap_levels(img)
            blocks = got.reshape(2, 8, 6, 8).transpose(0, 2, 1, 3).reshape(12, 64)
            assert (blocks == expected.reshape(JPEG_BLOCKS, 1)).all()
