"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched Pandas UDFs over ``mapInPandas``.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked stub (`NotImplementedError` unless a decoder is
injected) with a deterministic fake used by tests and the oracle. What
IS real — and what matters at 100 TB — is the Spark-side plumbing this
module exercises end-to-end:

- schema: ``(doc_id, content binary, meta struct<format,width,height>)``;
- partition-parallel ``mapInPandas`` with bounded Arrow batches (the
  worker never materializes more than one batch of blobs);
- feature extraction emits a narrow row per blob, so downstream
  aggregation shuffles features, never payloads.

Swapping the fake decoder for PIL/ffmpeg changes one injected function.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..queries.registry import register_query
from ..sources import load_table

FEATURE_SCHEMA = "doc_id bigint, n_bytes bigint, content_md5 string, format string"


def attach_binary_content(docs: DataFrame) -> DataFrame:
    """Materialize an opaque binary payload column + typed metadata.

    Real pipelines read blobs from object storage; here the payload is
    the utf-8 text (deterministic, so the oracle can recompute it)."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("content"),
        F.struct(
            F.lit("fake/blob").alias("format"),
            F.length("text").cast("int").alias("width"),
            F.lit(1).cast("int").alias("height"),
        ).alias("meta"),
    )


def decode_image(content: bytes, decoder: Callable[[bytes], object] | None = None):
    """STUB: real image decode requires a codec library not present in
    this container. Inject ``decoder`` (e.g. PIL.Image.open) on a real
    cluster."""
    if decoder is None:
        raise NotImplementedError(
            "image decode is stubbed: no codec library in this environment; "
            "inject a decoder (e.g. PIL.Image.open) to enable"
        )
    return decoder(content)


def extract_features(blobs: DataFrame, batch_size_conf: str = "1000") -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The fake 'decode' derives (n_bytes, md5) — deterministic stand-ins
    for (pixels, perceptual hash). Batches stream through the Python
    worker; peak memory is one Arrow batch of blobs per core."""

    def extract(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["content"].map(len).astype("int64"),
                    "content_md5": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "format": pdf["meta"].map(lambda m: m["format"]),
                }
            )

    return blobs.mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = "doc_id bigint, format string, width int, height int, content_md5 string"
FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_md5 string"
FRAME_CHARS = 64  # fake frame = 64 chars of payload
FRAME_STRIDE = 4  # sample every 4th frame


def resize_blobs(blobs: DataFrame) -> DataFrame:
    """'Resize' each blob to half width (fake: keep the first half of
    the payload; a real kernel calls PIL.Image.resize). Same
    ``mapInPandas`` batch shape as a real resampler: blob in, smaller
    blob + updated metadata out, one Arrow batch resident per core."""

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            widths = pdf["meta"].map(lambda m: m["width"]).astype("int64")
            new_w = -(-widths // 2)  # ceil(width/2)
            resized = [
                c.decode("utf-8")[:w].encode("utf-8")
                for c, w in zip(pdf["content"], new_w)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["meta"].map(lambda m: m["format"]),
                    "width": new_w.astype("int32"),
                    "height": pdf["meta"].map(lambda m: m["height"]).astype("int32"),
                    "content_md5": [hashlib.md5(r).hexdigest() for r in resized],
                }
            )

    return blobs.mapInPandas(resize, schema=RESIZE_SCHEMA)


def sample_frames(blobs: DataFrame) -> DataFrame:
    """Frame sampling: split each payload into fixed-size 'frames' and
    keep every ``FRAME_STRIDE``-th — the UDTF shape (one input row →
    many output rows) a video pipeline needs, as ``mapInPandas``."""

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                text = content.decode("utf-8")
                for fi in range(0, len(text) // FRAME_CHARS, FRAME_STRIDE):
                    frame = text[fi * FRAME_CHARS : (fi + 1) * FRAME_CHARS]
                    ids.append(doc_id)
                    idxs.append(fi)
                    hashes.append(hashlib.md5(frame.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return blobs.mapInPandas(sample, schema=FRAME_SCHEMA)


@register_query(
    "multimodal_resize",
    oracle="""
    SELECT doc_id, 'fake/blob' AS format,
           CAST(CEIL(LEN(text) / 2.0) AS INT) AS width,
           1 AS height,
           MD5(SUBSTR(text, 1, CAST(CEIL(LEN(text) / 2.0) AS INT))) AS content_md5
    FROM documents
    """,
    description="blob resize plumbing: mapInPandas blob->smaller blob + updated metadata (kernel stubbed deterministically)",
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return resize_blobs(attach_binary_content(docs))


@register_query(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT d.doc_id, CAST(fi AS INT) AS frame_idx,
           MD5(SUBSTR(d.text, CAST(fi AS INT) * {FRAME_CHARS} + 1, {FRAME_CHARS})) AS frame_md5
    FROM documents d,
         LATERAL UNNEST(GENERATE_SERIES(0, CAST(FLOOR(LEN(d.text) / {FRAME_CHARS}) AS INT) - 1, {FRAME_STRIDE})) AS g(fi)
    """,
    description=f"frame sampling plumbing: one blob -> every {FRAME_STRIDE}th {FRAME_CHARS}-char frame via mapInPandas (UDTF shape)",
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sample_frames(attach_binary_content(docs))


@register_query(
    "multimodal_feature_extract",
    oracle="""
    SELECT doc_id,
           CAST(OCTET_LENGTH(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           MD5(text) AS content_md5,
           'fake/blob' AS format
    FROM documents
    """,
    description="binary-column pipeline: attach blob + metadata, Arrow-batched mapInPandas feature extraction (decode stubbed)",
)
def multimodal_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return extract_features(attach_binary_content(docs))


# --------------------------------------------------- audio windowing
AUDIO_WINDOW = 64  # fake samples (chars) per analysis window
AUDIO_HOP = 32  # hop < window: 50% overlap, the audio-pipeline shape
AUDIO_SCHEMA = "doc_id bigint, win_idx int, win_md5 string"


def window_audio(blobs: DataFrame) -> DataFrame:
    """Overlapping-window extraction — the access pattern audio feature
    pipelines (STFT/mel frames) need, distinct from video frame sampling
    because hop < window duplicates payload regions. Runs as the same
    bounded-batch mapInPandas; each input blob emits ~len/hop narrow
    rows, never payload bytes."""

    def windows(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for doc_id, content in zip(pdf["doc_id"], pdf["content"]):
                text = content.decode("utf-8")
                n = (len(text) - AUDIO_WINDOW) // AUDIO_HOP
                for wi in range(0, n + 1):
                    win = text[wi * AUDIO_HOP : wi * AUDIO_HOP + AUDIO_WINDOW]
                    ids.append(doc_id)
                    idxs.append(wi)
                    hashes.append(hashlib.md5(win.encode("utf-8")).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(idxs, dtype="int32"),
                    "win_md5": pd.Series(hashes, dtype="object"),
                }
            )

    return blobs.mapInPandas(windows, schema=AUDIO_SCHEMA)


@register_query(
    "multimodal_audio_windows",
    oracle=f"""
    SELECT d.doc_id, CAST(wi AS INT) AS win_idx,
           MD5(SUBSTR(d.text, CAST(wi AS INT) * {AUDIO_HOP} + 1, {AUDIO_WINDOW})) AS win_md5
    FROM documents d,
         LATERAL UNNEST(GENERATE_SERIES(0,
           CAST(FLOOR((LEN(d.text) - {AUDIO_WINDOW}) / {AUDIO_HOP}) AS INT))) AS g(wi)
    WHERE LEN(d.text) >= {AUDIO_WINDOW}
    """,
    description=f"audio windowing plumbing: overlapping {AUDIO_WINDOW}-sample windows at hop {AUDIO_HOP} via mapInPandas",
)
def multimodal_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return window_audio(attach_binary_content(docs))
