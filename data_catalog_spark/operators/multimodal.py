"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` UDF signatures.  AUDIO decode is REAL (stdlib
``wave`` PCM parsing — no third-party package needed; ``decode_audio``
raises ValueError on non-WAV bytes and ``window_audio`` falls back to
bytes-as-samples for them).  IMAGE/VIDEO decode stays STUBBED
(pillow/ffmpeg are not in this container): ``decode_image`` raises
NotImplementedError unless ``fake=True``, in which case a deterministic
fake decoder (byte-histogram features) stands in so the distributed
pipeline is exercisable end-to-end.

Scale notes: media bytes stay in executor-side Arrow batches — never
collected, never shuffled whole (feature extraction projects binary →
small vectors BEFORE any shuffle).  ``spark.sql.files.maxPartitionBytes``
governs scan parallelism; for many-small-blob layouts, pack blobs into
parquet (as here) rather than one-file-per-object so the scan doesn't
degenerate into per-file tasks.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..io import read_table
from .registry import register

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), nullable=False),
        T.StructField("kind", T.StringType(), nullable=False),  # image|audio|video
        T.StructField("content", T.BinaryType(), nullable=False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("sample_rate", T.IntegerType()),
                    T.StructField("n_frames", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
        T.StructField("features", T.ArrayType(T.DoubleType())),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_bytes", T.BinaryType()),
    ]
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table derived from documents: content = utf-8
    bytes of the text (an opaque blob as far as the pipeline cares), kind
    cycled, metadata derived from doc stats."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            (F.col("n_chars") % 640 + 16).cast("int").alias("width"),
            (F.col("n_chars") % 480 + 16).cast("int").alias("height"),
            F.lit(16000).alias("sample_rate"),
            (F.col("n_chars") % 8 + 1).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_image(content: bytes, *, fake: bool = False) -> list[float]:
    """Decode an image blob to features.  REAL DECODE NOT AVAILABLE: pillow
    is not installed in this environment — the real path raises; the fake
    path is a deterministic byte-histogram standing in for pixel stats."""
    if not fake:
        raise NotImplementedError(
            "real image decode requires pillow/opencv (not installed); "
            "pass fake=True for the deterministic stand-in"
        )
    return _byte_histogram(content)


def decode_audio(content: bytes) -> list[float]:
    """REAL WAV decode via stdlib ``wave`` (no third-party package needed —
    unlike the image path, which stays pillow-gated): parse the RIFF
    container, read the PCM frames, average channels to mono, normalize by
    bit depth to [-1, 1].  Raises ValueError for non-WAV bytes (callers
    that window arbitrary blobs catch it and fall back to bytes-as-samples,
    see ``window_audio``)."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(content)) as w:
            n_channels = w.getnchannels()
            sampwidth = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV blob: {e}") from e
    if sampwidth == 1:  # unsigned 8-bit
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64)
        samples = (samples - 128.0) / 128.0
    elif sampwidth == 2:  # signed 16-bit little-endian
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sampwidth == 4:  # signed 32-bit little-endian
        samples = (
            np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
        )
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_channels > 1:
        samples = samples[: len(samples) - len(samples) % n_channels]
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    return [float(x) for x in samples]


def _byte_histogram(content: bytes, bins: int = 4) -> list[float]:
    """Deterministic fake 'features': normalized byte-value histogram."""
    if not content:
        return [0.0] * bins
    counts = [0] * bins
    for b in content:
        counts[b * bins // 256] += 1
    return [c / len(content) for c in counts]


def extract_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """binary → small feature vectors via mapInPandas (Arrow-batched; one
    pandas DataFrame per batch, never per-row Python)."""
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": content.map(
                        lambda b: decode_image(bytes(b), fake=fake_decode)
                    ),
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Video frame sampling plumbing: split each blob into meta.n_frames
    equal chunks ("frames") — one output row per frame.  The chunking is the
    stub; the batch/explode shape is the real thing being exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                n = max(int(row["n_frames"]), 1)
                step = max(len(blob) // n, 1)
                for i in range(n):
                    out_id.append(row["media_id"])
                    out_idx.append(i)
                    out_frame.append(blob[i * step : (i + 1) * step])
            yield pd.DataFrame(
                {"media_id": out_id, "frame_idx": out_idx, "frame_bytes": out_frame}
            )

    videos = media.where(F.col("kind") == "video").select(
        "media_id", "content", F.col("meta.n_frames").alias("n_frames")
    )
    return videos.mapInPandas(run, schema=FRAME_SCHEMA)


# -- driver-contract entries -------------------------------------------------
# The fake decoder is deterministic, so the PLUMBING (Arrow batch shape,
# binary handling, frame chunking) is oracle-checkable: byte length, md5 of
# the blob, and the chunk arithmetic are all SQL-expressible in DuckDB.


def media_feature_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The extract_features pipeline end-to-end via mapInPandas, projected
    to its SQL-checkable columns (the feature vector itself is the fake
    byte-histogram; its invariant — sums to 1 — is pinned in pytest)."""
    feats = extract_features(synth_media(spark, sf_dir))
    return feats.select("media_id", "kind", "n_bytes", "content_md5").orderBy(
        "media_id"
    )


MEDIA_FEATURES_ORACLE = """
SELECT doc_id AS media_id,
       CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
            ELSE 'video' END                    AS kind,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text)                                AS content_md5
FROM documents
ORDER BY media_id
"""


def media_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sample_frames plumbing: per-video frame count + total sampled bytes
    (each of the n frames is exactly floor(len/n) bytes)."""
    frames = sample_frames(synth_media(spark, sf_dir))
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.sum(F.length("frame_bytes")).alias("total_bytes"),
        )
        .orderBy("media_id")
    )


MEDIA_FRAMES_ORACLE = """
SELECT doc_id AS media_id,
       CAST(n_chars % 8 + 1 AS BIGINT) AS n_frames,
       CAST((n_chars % 8 + 1) * (octet_length(encode(text)) // (n_chars % 8 + 1))
            AS BIGINT) AS total_bytes
FROM documents
WHERE doc_id % 3 = 2
ORDER BY media_id
"""


register("media_feature_stats", media_feature_stats, MEDIA_FEATURES_ORACLE)
register("media_frame_stats", media_frame_stats, MEDIA_FRAMES_ORACLE)


# -- resize ------------------------------------------------------------------

RESIZE_W, RESIZE_H = 224, 224
RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("new_width", T.IntegerType()),
        T.StructField("new_height", T.IntegerType()),
        T.StructField("n_in", T.LongType()),
        T.StructField("n_out", T.LongType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame) -> DataFrame:
    """Resize plumbing for image blobs via mapInPandas: target RESIZE_W ×
    RESIZE_H, never upscaling.  REAL RESAMPLING NOT AVAILABLE (no
    pillow/opencv in this environment) — the stand-in keeps the byte
    budget of the target resolution by taking the proportional PREFIX of
    the blob (deterministic, SQL-checkable); the Arrow batch shape,
    binary handling, and metadata arithmetic are the real thing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                w, h = int(row["width"]), int(row["height"])
                nw, nh = min(w, RESIZE_W), min(h, RESIZE_H)
                n_in = len(blob)
                n_out = max(1, (n_in * nw * nh) // (w * h))
                rows["media_id"].append(row["media_id"])
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["n_in"].append(n_in)
                rows["n_out"].append(n_out)
                rows["resized"].append(blob[:n_out])
            yield pd.DataFrame(rows)

    images = media.where(F.col("kind") == "image").select(
        "media_id",
        "content",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )
    return images.mapInPandas(run, schema=RESIZE_SCHEMA)


def media_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """resize_images end-to-end, projected to SQL-checkable columns (the
    synthetic blobs are ASCII text bytes, so the DuckDB oracle reproduces
    the prefix slice + md5 with substr)."""
    resized = resize_images(synth_media(spark, sf_dir))
    return resized.select(
        "media_id",
        "width",
        "height",
        "new_width",
        "new_height",
        "n_in",
        "n_out",
        F.md5("resized").alias("out_md5"),
    ).orderBy("media_id")


MEDIA_RESIZE_ORACLE = f"""
WITH img AS (
  SELECT doc_id AS media_id,
         CAST(n_chars % 640 + 16 AS INTEGER) AS width,
         CAST(n_chars % 480 + 16 AS INTEGER) AS height,
         text,
         octet_length(encode(text)) AS n_in
  FROM documents WHERE doc_id % 3 = 0
), dims AS (
  SELECT *,
         CAST(least(width, {RESIZE_W}) AS INTEGER) AS new_width,
         CAST(least(height, {RESIZE_H}) AS INTEGER) AS new_height
  FROM img
)
SELECT media_id, width, height, new_width, new_height,
       CAST(n_in AS BIGINT) AS n_in,
       CAST(greatest(1, (n_in * new_width * new_height) // (width * height))
            AS BIGINT) AS n_out,
       md5(substr(text, 1,
           CAST(greatest(1, (n_in * new_width * new_height) // (width * height))
                AS INTEGER))) AS out_md5
FROM dims
ORDER BY media_id
"""


register("media_resize_stats", media_resize_stats, MEDIA_RESIZE_ORACLE)


# -- audio: fixed-size sample windows (waveform chunking plumbing) ------------

AUDIO_WINDOW = 64  # fake samples (bytes) per analysis window


def window_audio(media: DataFrame) -> DataFrame:
    """Waveform windowing: one row per fixed-size window of the decoded
    sample stream with its mean energy.  A blob that parses as a real PCM
    WAV goes through the stdlib ``wave`` decode (``decode_audio`` — real
    samples, mean |amplitude| energy); any other blob falls back to the
    deterministic bytes-as-samples view (the synthetic corpus path, which
    keeps this pipeline exact-oracle-checkable).  Either way the real thing
    exercised is the batch-explode shape every audio pipeline needs
    (blob → per-window rows, windows*media >> media)."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("win", T.IntegerType()),
            T.StructField("n_samples", T.IntegerType()),
            T.StructField("mean_energy", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_w, out_n, out_e = [], [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                try:
                    # real decode: normalized [-1, 1] floats; energy = mean |x|
                    samples = np.abs(np.asarray(decode_audio(blob)))
                    scale = 1.0
                except ValueError:
                    # bytes-as-samples fallback (synthetic blobs): uint8
                    # values, energy normalized by the byte range
                    samples = np.frombuffer(blob, dtype=np.uint8)
                    scale = 255.0
                # ceil-division: every window in range is non-empty (an
                # empty blob simply yields no windows)
                for w in range((len(samples) + AUDIO_WINDOW - 1) // AUDIO_WINDOW):
                    chunk = samples[w * AUDIO_WINDOW : (w + 1) * AUDIO_WINDOW]
                    out_id.append(row["media_id"])
                    out_w.append(w)
                    out_n.append(len(chunk))
                    out_e.append(round(float(chunk.sum(dtype=np.float64)) / len(chunk) / scale, 6))
            yield pd.DataFrame(
                {"media_id": out_id, "win": out_w, "n_samples": out_n, "mean_energy": out_e}
            )

    audio = media.where(F.col("kind") == "audio").select("media_id", "content")
    return audio.mapInPandas(run, schema=schema)


def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver entry: the windowing pipeline over the synthetic audio blobs.
    The fake 'samples' are the utf-8 bytes, so window sums are ascii-code
    sums — fully SQL-expressible, making even this mapInPandas pipeline
    exact-oracle checkable."""
    return window_audio(synth_media(spark, sf_dir)).orderBy("media_id", "win")


# BYTE-true oracle: samples are parsed from hex(encode(text)) two chars at a
# time, so offsets and values are utf-8 BYTES exactly like Spark's
# np.frombuffer — NOT characters (ascii(substr(text,...)) would silently
# diverge on any non-ASCII text: char offsets misalign and codepoints
# replace bytes).
MEDIA_AUDIO_ORACLE = f"""
WITH a AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 1
),
w AS (
  SELECT media_id, CAST(i AS INT) AS win,
         [('0x' || substr(h, CAST(2 * j + 1 AS INT), 2))::BIGINT
          for j in range(i * {AUDIO_WINDOW},
                         least((i + 1) * {AUDIO_WINDOW}, n))] AS samples
  FROM a, LATERAL unnest(range(0, CAST(ceil(n / {AUDIO_WINDOW}.0) AS BIGINT))) r(i)
)
SELECT media_id, win,
       CAST(len(samples) AS INT) AS n_samples,
       round(list_sum(samples) / len(samples) / 255.0, 6) AS mean_energy
FROM w
ORDER BY media_id, win
"""


register("media_audio_windows", media_audio_windows, MEDIA_AUDIO_ORACLE)
