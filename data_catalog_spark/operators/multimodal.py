"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested — schema, partitioning, Arrow
batch shape, ``mapInPandas`` UDF signatures.  AUDIO decode is REAL (stdlib
``wave`` PCM parsing; ``decode_audio`` raises ValueError on non-WAV bytes
and ``window_audio`` falls back to bytes-as-samples for them).  IMAGE
decode is REAL for PNG (stdlib ``zlib`` inflate + scanline unfiltering in
``decode_png``, re-encode in ``encode_png``) AND for baseline +
progressive JPEG (``operators.jpeg``: Huffman + dequant + numpy IDCT,
4:4:4/4:2:2/4:2:0, restart intervals, SOF2 spectral-selection /
successive-approximation scans — no third-party package needed) AND for
GIF (``operators.gif``: full LZW + interlace + multi-frame compositing);
remaining image formats (TIFF/WebP/…) and VIDEO frame
decode stay STUBBED (pillow/ffmpeg are not in this container):
``decode_image`` raises NotImplementedError on them unless ``fake=True``, whose
deterministic byte-histogram stands in so the distributed pipeline is
exercisable end-to-end.  Undecodable media is never SILENT: every
feature row carries ``decode_status`` + ``decode_fmt`` and
``media_decode_report`` counts the reject lane per (kind, fmt) — the
100 TB honesty contract: a progressive-JPEG-heavy corpus shows up as a
low real_fraction, not as fake features.

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
from . import bmp, gif, jpeg
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
        # 'real' when the blob decoded through a REAL stdlib decoder
        # (PNG/baseline-JPEG for images, PCM WAV for audio); 'reject'
        # otherwise — the counted reject lane: at 100 TB a job must REPORT
        # undecodable media, never silently substitute the stand-in
        T.StructField("decode_status", T.StringType()),
        # which real decoder accepted the blob: png | jpeg | wav | none
        T.StructField("decode_fmt", T.StringType()),
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


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def decode_png(content: bytes):
    """REAL PNG decode in pure stdlib (zlib inflate + per-scanline
    unfiltering) — no pillow needed for the PNG case.  Supports the
    non-interlaced 8-bit color types (gray / gray+alpha / RGB / RGBA);
    palette/16-bit/interlaced raise ValueError (deployment images route
    through pillow, documented).  Returns (width, height, channels,
    pixels) with pixels an (h, w, channels) uint8 numpy array.

    Unfiltering note: Sub/Average/Paeth carry a left-pixel dependency, so
    rows decode with a per-byte loop — fine for the thumbnail-scale blobs
    feature extraction handles; at decode-heavy deployment scale the same
    mapInPandas slot takes a vectorized decoder."""
    import struct
    import zlib

    import numpy as np

    if not content.startswith(_PNG_MAGIC):
        raise ValueError("not a PNG blob")
    pos, width = len(_PNG_MAGIC), None
    idat = b""
    while pos + 8 <= len(content):
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        ctype = content[pos + 4 : pos + 8]
        if pos + 12 + length > len(content):
            raise ValueError("truncated PNG chunk")
        data = content[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            try:
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", data
                )
            except struct.error as e:
                raise ValueError(f"malformed PNG IHDR: {e}") from e
            if depth != 8 or interlace != 0 or color not in (0, 2, 4, 6):
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color={color}, "
                    f"interlace={interlace}) — 8-bit non-interlaced "
                    f"gray/ga/rgb/rgba only"
                )
            channels = {0: 1, 2: 3, 4: 2, 6: 4}[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    try:
        raw = zlib.decompress(idat)
    except zlib.error as e:
        raise ValueError(f"corrupt PNG IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            pass
        elif ftype == 2:  # Up — no left dependency, vectorize
            line = bytearray(
                (np.frombuffer(bytes(line), dtype=np.uint8) + prev).astype(np.uint8)
            )
        else:
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = int(prev[i])
                if ftype == 1:  # Sub
                    line[i] = (line[i] + a) & 0xFF
                elif ftype == 3:  # Average
                    line[i] = (line[i] + ((a + b) >> 1)) & 0xFF
                elif ftype == 4:  # Paeth
                    c = int(prev[i - bpp]) if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    line[i] = (line[i] + pred) & 0xFF
                else:
                    raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = np.frombuffer(bytes(line), dtype=np.uint8)
    return width, height, channels, out.reshape(height, width, channels)


def encode_png(pixels) -> bytes:
    """Minimal PNG writer (filter 0 scanlines + zlib): the re-encode half
    of the real PNG path.  ``pixels`` is an (h, w, channels) uint8 array
    with 1/2/3/4 channels."""
    import struct
    import zlib

    import numpy as np

    pixels = np.asarray(pixels, dtype=np.uint8)
    h, w, channels = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + pixels[y].tobytes() for y in range(h))
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _luma_hist(px, channels: int) -> list[float]:
    """Normalized 4-bin luminance histogram of decoded pixels — the
    shared feature shape for both real image decoders."""
    import numpy as np

    # luminance = mean over COLOR channels only: gray/GA use the single
    # gray plane, RGB/RGBA the three color planes — alpha never votes
    color_ch = 1 if channels <= 2 else 3
    lum = px[:, :, :color_ch].mean(axis=2)
    counts, _ = np.histogram(lum, bins=4, range=(0, 256))
    total = counts.sum()
    return [float(c) / total for c in counts] if total else [0.0] * 4


def _png_luma_hist(content: bytes) -> list[float]:
    """Decoded-pixel features of a decodable PNG (raises ValueError for
    anything decode_png rejects)."""
    _, _, channels, px = decode_png(content)
    return _luma_hist(px, channels)


def _image_features(content: bytes) -> tuple[list[float], str] | None:
    """ONE real-decode attempt: (pixel features, fmt) for a decodable
    PNG or baseline JPEG, None otherwise — the single-pass primitive
    extract_features uses so a blob is never decoded twice (once for
    features, once for status)."""
    if content.startswith(_PNG_MAGIC):
        try:
            return _png_luma_hist(content), "png"
        except ValueError:
            return None
    if content.startswith(jpeg.JPEG_MAGIC):
        try:
            _, _, channels, px = jpeg.decode_jpeg(content)
            return _luma_hist(px, channels), "jpeg"
        except ValueError:
            return None
    if content.startswith(gif.GIF_MAGIC):
        try:
            _, _, channels, px = gif.decode_gif(content)
            return _luma_hist(px, channels), "gif"
        except ValueError:
            return None
    if content.startswith(bmp.BMP_MAGIC):
        try:
            _, _, channels, px = bmp.decode_bmp(content)
            return _luma_hist(px, channels), "bmp"
        except ValueError:
            return None
    return None


def decode_image(content: bytes, *, fake: bool = False) -> list[float]:
    """Decode an image blob to features.  Decodable PNG blobs get the REAL
    stdlib decode (``decode_png``), decodable baseline JPEGs the REAL
    stdlib+numpy decode (``jpeg.decode_jpeg``), and decodable GIFs the
    REAL stdlib LZW decode (``gif.decode_gif``), and decodable 24bpp
    BMPs the REAL stdlib+numpy decode (``bmp.decode_bmp``) — features are the
    normalized 4-bin luminance histogram of the actual pixels (alpha
    excluded for GA/RGBA).  Everything else — other formats (TIFF/WebP
    etc., which need pillow), and the variants/corruption the real
    decoders reject (arithmetic-coded JPEG, 16-bit PNG, …) — raises unless
    ``fake=True``, whose deterministic byte-histogram stands in; the fake
    path therefore NEVER raises, which the mapInPandas pipelines rely on
    (one bad blob must not fail the job)."""
    real = _image_features(content)
    if real is not None:
        return real[0]
    if fake:
        return _byte_histogram(content)
    if content.startswith(_PNG_MAGIC):
        decode_png(content)  # raises the specific ValueError
    if content.startswith(jpeg.JPEG_MAGIC):
        jpeg.decode_jpeg(content)  # raises the specific ValueError
    if content.startswith(gif.GIF_MAGIC):
        gif.decode_gif(content)  # raises the specific ValueError
    if content.startswith(bmp.BMP_MAGIC):
        bmp.decode_bmp(content)  # raises the specific ValueError
    raise NotImplementedError(
        "image decode beyond PNG/JPEG/GIF/24bpp-BMP requires pillow/opencv "
        "(not installed); pass fake=True for the deterministic stand-in"
    )


_RIFF = b"RIFF"
_AVI = b"AVI "


def encode_avi_mjpeg(frames: list[bytes]) -> bytes:
    """Minimal RIFF/AVI writer: a LIST('movi') of '00dc' frame chunks
    (even-padded, per the RIFF rule) — the MJPEG-in-AVI layout, which is
    just independent per-frame blobs in a chunked container.  Paired with
    ``decode_avi_frames`` it makes video FRAME EXTRACTION real container
    parsing; only the per-frame image decode stays format-gated."""
    import struct

    body = b""
    for fr in frames:
        body += b"00dc" + struct.pack("<I", len(fr)) + fr
        if len(fr) % 2:
            body += b"\x00"  # RIFF chunks are word-aligned
    movi = b"LIST" + struct.pack("<I", 4 + len(body)) + b"movi" + body
    return _RIFF + struct.pack("<I", 4 + len(movi)) + _AVI + movi


def decode_avi_frames(content: bytes) -> list[bytes]:
    """REAL RIFF/AVI container parse in pure stdlib: validate the RIFF
    header, walk the chunk tree to LIST('movi'), and return the video
    frame payloads ('xxdc'/'xxdb' chunks INSIDE movi lists only — a
    vendor chunk elsewhere is not a frame).  Raises ValueError for
    non-AVI or truncated containers — callers route those to the counted
    reject lane.  The walk is iterative (an explicit stack): a crafted
    deeply-nested LIST blob must surface as a ValueError-class reject,
    never a RecursionError that kills the task.  Only the DECLARED riff
    payload is parsed — real-world trailing padding is ignored, and
    undeclared tail bytes can never become phantom frames."""
    import struct

    if len(content) < 12 or content[:4] != _RIFF or content[8:12] != _AVI:
        raise ValueError("not a RIFF/AVI container")
    (riff_size,) = struct.unpack("<I", content[4:8])
    if 8 + riff_size > len(content):
        raise ValueError("truncated RIFF container")
    frames: list[bytes] = []
    # stack of (buffer, position, in_movi); payload bounded by riff_size
    stack: list[tuple[bytes, int, bool]] = [(content[12 : 8 + riff_size], 0, False)]
    while stack:
        buf, pos, in_movi = stack.pop()
        while pos + 8 <= len(buf):
            cid = buf[pos : pos + 4]
            (size,) = struct.unpack("<I", buf[pos + 4 : pos + 8])
            data = buf[pos + 8 : pos + 8 + size]
            if len(data) != size:
                raise ValueError("truncated AVI chunk")
            nxt = pos + 8 + size + (size % 2)  # word alignment
            if cid == b"LIST":
                if len(stack) >= 64:
                    raise ValueError("AVI LIST nesting too deep")
                # resume the current level later; descend into the list
                stack.append((buf, nxt, in_movi))
                stack.append((data[4:], 0, in_movi or data[:4] == b"movi"))
                break
            if in_movi and cid[2:4] in (b"dc", b"db"):
                frames.append(data)
            pos = nxt
    return frames


def _fallback_chunks(blob: bytes, n_frames: int) -> list[bytes]:
    """The equal-chunk frame stand-in, defined ONCE: three call sites
    (sample_frames, media_video_report, synth_mixed_media's AVI builder)
    must stay bit-identical for the construction-arithmetic oracles to
    hold."""
    n = max(int(n_frames), 1)
    step = max(len(blob) // n, 1)
    return [blob[i * step : (i + 1) * step] for i in range(n)]


def _avi_frames_or_none(blob: bytes) -> list[bytes] | None:
    """One parse attempt: the frame list for a well-formed AVI with at
    least one frame, else None (empty containers route to the fallback so
    every video keeps its ≥1-output-row invariant)."""
    try:
        frames = decode_avi_frames(blob)
    except ValueError:
        return None
    return frames or None


def decode_audio(content: bytes) -> list[float]:
    """REAL WAV decode via stdlib ``wave``; list-of-floats public contract
    (the numpy-array core is ``_decode_audio_array`` — hot mapInPandas
    loops use it directly so a multi-minute waveform is never boxed into
    millions of Python floats only to be re-arrayed)."""
    return [float(x) for x in _decode_audio_array(content)]


def _decode_audio_array(content: bytes):
    """REAL WAV decode via stdlib ``wave`` (no third-party package needed —
    unlike the image path, which stays pillow-gated): parse the RIFF
    container, read the PCM frames, average channels to mono, normalize by
    bit depth to [-1, 1].  Returns a float64 numpy array; raises ValueError
    for non-WAV bytes (callers that window arbitrary blobs catch it and
    fall back to bytes-as-samples, see ``window_audio``)."""
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
    return samples


def _byte_histogram(content: bytes, bins: int = 4) -> list[float]:
    """Deterministic fake 'features': normalized byte-value histogram."""
    if not content:
        return [0.0] * bins
    counts = [0] * bins
    for b in content:
        counts[b * bins // 256] += 1
    return [c / len(content) for c in counts]


def classify_decode(kind: str, content: bytes) -> str:
    """Reject-lane classification: 'real' iff the blob decodes through a
    REAL stdlib decoder for its kind (PNG / JPEG / GIF / 24bpp BMP for
    images, PCM WAV for audio; video is always 'reject' — ffmpeg-gated).  The
    classification is by ATTEMPTING the decode, not by sniffing magic
    bytes, so a corrupt PNG or a still-unsupported JPEG variant
    (arithmetic-coded or 12-bit) lands in the reject lane too."""
    if kind == "image":
        return "real" if _image_features(content) is not None else "reject"
    if kind == "audio":
        try:
            _decode_audio_array(content)
            return "real"
        except ValueError:
            return "reject"
    return "reject"


def extract_features(media: DataFrame, *, fake_decode: bool = True) -> DataFrame:
    """binary → small feature vectors via mapInPandas (Arrow-batched; one
    pandas DataFrame per batch, never per-row Python).  Every row carries
    ``decode_status`` ('real'/'reject'): rejected blobs still get the
    deterministic stand-in features so one bad blob never fails the job,
    but the lane is COUNTED, not silent (media_decode_report)."""
    import hashlib

    def one_row(kind: str, blob: bytes) -> tuple[list[float], str, str]:
        # ONE decode attempt per blob: the PNG/JPEG/WAV decoders run once
        # and serve features, status AND fmt (decoding twice — once for
        # each — doubled the dominant per-byte Python cost)
        img = _image_features(blob)
        if img is not None:
            features, fmt = img
        elif not fake_decode:
            features = decode_image(blob, fake=False)  # raises, documented
            fmt = "none"
        else:
            features, fmt = _byte_histogram(blob), "none"
        if kind == "image":
            status = "real" if img is not None else "reject"
        elif kind == "audio":
            fmt = "none"
            try:
                _decode_audio_array(blob)
                status, fmt = "real", "wav"
            except ValueError:
                status = "reject"
        else:
            status, fmt = "reject", "none"
        return features, status, fmt

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            decoded = [
                one_row(k, bytes(b)) for k, b in zip(pdf["kind"], content)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": content.map(len),
                    "content_md5": content.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "features": [d[0] for d in decoded],
                    "decode_status": [d[1] for d in decoded],
                    "decode_fmt": [d[2] for d in decoded],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame) -> DataFrame:
    """Video frame extraction: blobs that parse as RIFF/AVI get REAL
    container parsing (``decode_avi_frames`` — one output row per movi
    frame chunk); anything else falls back to splitting the blob into
    meta.n_frames equal chunks (the documented stand-in for containers
    that need ffmpeg).  One output row per frame either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                frames = _avi_frames_or_none(blob) or _fallback_chunks(
                    blob, row["n_frames"]
                )
                for i, fb in enumerate(frames):
                    out_id.append(row["media_id"])
                    out_idx.append(i)
                    out_frame.append(fb)
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


def synth_mixed_media(
    spark: SparkSession, sf_dir: str, only_kind: str | None = None
) -> DataFrame:
    """synth_media with a deterministic REAL-decodable subset: image rows
    with media_id % 6 == 0 become genuine 4×4 gray PNGs (encode_png over
    the text's first bytes), image rows with media_id % 12 == 3 genuine
    8×8 gray baseline JPEGs (jpeg.encode_jpeg over the text's first
    bytes), image rows with media_id % 24 == 9 genuine 4×6 interlaced
    gray GIFs (gif.encode_gif), image rows with media_id % 48 == 21
    genuine 1×5 RGB 24bpp BMPs (bmp.encode_bmp; % 48 == 45 stays a raw
    reject so the image reject lane never empties), audio rows with
    media_id % 6 == 1
    genuine 16-bit PCM WAVs, and video rows with media_id % 6 == 2
    genuine RIFF/AVI containers
    whose frames are exactly the byte-chunks the fallback sampler would
    produce — everything else keeps the raw utf-8 blob.  The real/reject
    split is therefore pure id arithmetic, which is what makes
    media_decode_report's / media_video_report's outcomes SQL-expressible
    while the Spark side proves them by actually decoding/parsing."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        import numpy as np

        for pdf in batches:
            out = pdf.copy()
            new_content = []
            for mid, kind, blob, meta in zip(
                out["media_id"], out["kind"], out["content"], out["meta"]
            ):
                raw = bytes(blob)
                if kind == "image" and mid % 6 == 0:
                    px = np.frombuffer((raw + b"\x00" * 16)[:16], dtype=np.uint8)
                    new_content.append(encode_png(px.reshape(4, 4, 1)))
                elif kind == "image" and mid % 12 == 3:
                    px = np.frombuffer((raw + b"\x00" * 64)[:64], dtype=np.uint8)
                    # half the jpeg slot is PROGRESSIVE (mid % 24 == 15):
                    # both variants decode to fmt='jpeg', so the oracle is
                    # untouched while the distributed lane exercises the
                    # SOF2 multi-scan path
                    new_content.append(
                        jpeg.encode_jpeg(
                            px.reshape(8, 8, 1), progressive=(mid % 24 == 15)
                        )
                    )
                elif kind == "image" and mid % 24 == 9:
                    px = np.frombuffer((raw + b"\x00" * 24)[:24], dtype=np.uint8)
                    new_content.append(
                        gif.encode_gif(px.reshape(4, 6), interlace=True)
                    )
                elif kind == "image" and mid % 48 == 21:
                    px = np.frombuffer((raw + b"\x00" * 15)[:15], dtype=np.uint8)
                    new_content.append(bmp.encode_bmp(px.reshape(1, 5, 3)))
                elif kind == "audio" and mid % 6 == 1:
                    buf = io.BytesIO()
                    with wave.open(buf, "wb") as w:
                        w.setnchannels(1)
                        w.setsampwidth(2)
                        w.setframerate(16000)
                        pcm = (raw + b"\x00" * 32)[:32]
                        w.writeframes(pcm[: len(pcm) - len(pcm) % 2])
                    new_content.append(buf.getvalue())
                elif kind == "video" and mid % 6 == 2:
                    new_content.append(
                        encode_avi_mjpeg(_fallback_chunks(raw, meta["n_frames"]))
                    )
                else:
                    new_content.append(raw)
            out["content"] = new_content
            yield out

    base = synth_media(spark, sf_dir)
    if only_kind is not None:
        # filter BEFORE the mixing UDF: predicates don't push through
        # mapInPandas, and a caller wanting one kind must not pay the
        # PNG/WAV/AVI encode cost of the other two-thirds of the corpus
        base = base.where(F.col("kind") == only_kind)
    return base.mapInPandas(run, schema=MEDIA_SCHEMA)


def media_decode_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The counted reject lane, end-to-end: run extract_features over the
    mixed media table and report per kind how much of the corpus REALLY
    decoded vs landed in the reject lane.  This is the honesty contract a
    100 TB media job needs — undecodable blobs are counted and reported,
    never silently replaced by the stand-in features.  The Spark side
    earns 'real' by decoding (extract_features attempts the stdlib
    PNG/JPEG/WAV decoders); the oracle predicts the same counts from the
    mixed table's construction arithmetic.  Grouped by (kind, fmt) so a
    format mix is visible per lane — the round-5 report could only say
    'image rejected', not 'your corpus is JPEG and the PNG decoder is
    why'."""
    feats = extract_features(synth_mixed_media(spark, sf_dir))
    real = F.sum((F.col("decode_status") == "real").cast("bigint"))
    return (
        feats.groupBy("kind", F.col("decode_fmt").alias("fmt"))
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            real.alias("n_real"),
            (F.count(F.lit(1)) - real).alias("n_rejected"),
            F.round(
                real.cast("double") / F.count(F.lit(1)), 6
            ).alias("real_fraction"),
        )
        .orderBy("kind", "fmt")
    )


MEDIA_DECODE_ORACLE = """
WITH m AS (
  SELECT doc_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
              ELSE 'video' END AS kind,
         CASE WHEN doc_id % 6 = 0 THEN 'png'
              WHEN doc_id % 12 = 3 THEN 'jpeg'
              WHEN doc_id % 24 = 9 THEN 'gif'
              WHEN doc_id % 48 = 21 THEN 'bmp'
              WHEN doc_id % 6 = 1 THEN 'wav'
              ELSE 'none' END AS fmt,
         CASE WHEN doc_id % 6 IN (0, 1) OR doc_id % 12 = 3 OR doc_id % 24 = 9
                   OR doc_id % 48 = 21
              THEN 1 ELSE 0 END AS is_real
  FROM documents
)
SELECT kind, fmt, CAST(count(*) AS BIGINT) AS n_media,
       CAST(SUM(is_real) AS BIGINT) AS n_real,
       CAST(count(*) - SUM(is_real) AS BIGINT) AS n_rejected,
       round(CAST(SUM(is_real) AS DOUBLE) / count(*), 6) AS real_fraction
FROM m GROUP BY kind, fmt ORDER BY kind, fmt
"""


VIDEO_REPORT_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("container", T.StringType()),  # real | reject
        T.StructField("n_frames", T.LongType()),
        T.StructField("total_frame_bytes", T.LongType()),
    ]
)


def media_video_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-video container report over the mixed table: blobs that parse
    as RIFF/AVI get their frames REALLY extracted (container='real');
    everything else is counted into the reject lane and sampled with the
    fallback chunker.  The mixed table constructs AVI frames as exactly
    the fallback's byte-chunks, so frame counts and byte totals are pure
    id/length arithmetic for the oracle while the Spark side earns
    'real' by parsing the container."""
    videos = synth_mixed_media(spark, sf_dir, only_kind="video").select(
        "media_id", "content", F.col("meta.n_frames").alias("n_frames")
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, stats, counts, totals = [], [], [], []
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                frames = _avi_frames_or_none(blob)
                status = "real" if frames is not None else "reject"
                if frames is None:
                    frames = _fallback_chunks(blob, row["n_frames"])
                mids.append(row["media_id"])
                stats.append(status)
                counts.append(len(frames))
                totals.append(sum(len(fb) for fb in frames))
            yield pd.DataFrame(
                {
                    "media_id": mids,
                    "container": stats,
                    "n_frames": counts,
                    "total_frame_bytes": totals,
                }
            )

    return videos.mapInPandas(run, schema=VIDEO_REPORT_SCHEMA).orderBy("media_id")


# total bytes mirror the chunker exactly, including the max(step, 1)
# guard: a blob shorter than its frame count yields 1-byte slices that
# run off the end (total = len), not n * 0
MEDIA_VIDEO_ORACLE = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 6 = 2 THEN 'real' ELSE 'reject' END AS container,
       CAST(n_chars % 8 + 1 AS BIGINT) AS n_frames,
       CAST(CASE WHEN octet_length(encode(text)) >= n_chars % 8 + 1
                 THEN (n_chars % 8 + 1)
                      * (octet_length(encode(text)) // (n_chars % 8 + 1))
                 ELSE octet_length(encode(text)) END
            AS BIGINT) AS total_frame_bytes
FROM documents
WHERE doc_id % 3 = 2
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


# same max(step, 1) guard as MEDIA_VIDEO_ORACLE: sub-frame-count blobs
# total their own length, not n * 0
MEDIA_FRAMES_ORACLE = """
SELECT doc_id AS media_id,
       CAST(n_chars % 8 + 1 AS BIGINT) AS n_frames,
       CAST(CASE WHEN octet_length(encode(text)) >= n_chars % 8 + 1
                 THEN (n_chars % 8 + 1)
                      * (octet_length(encode(text)) // (n_chars % 8 + 1))
                 ELSE octet_length(encode(text)) END
            AS BIGINT) AS total_bytes
FROM documents
WHERE doc_id % 3 = 2
ORDER BY media_id
"""


register("media_feature_stats", media_feature_stats, MEDIA_FEATURES_ORACLE)
register("media_frame_stats", media_frame_stats, MEDIA_FRAMES_ORACLE)
register("media_decode_report", media_decode_report, MEDIA_DECODE_ORACLE)
register("media_video_report", media_video_report, MEDIA_VIDEO_ORACLE)


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
    """Resize image blobs via mapInPandas: target RESIZE_W × RESIZE_H,
    never upscaling.  PNG blobs get REAL nearest-neighbor resampling
    (stdlib decode → index-sampled pixels → stdlib re-encode; dims come
    from the actual IHDR).  Non-PNG blobs (the synthetic corpus) keep the
    deterministic SQL-checkable stand-in — the proportional byte-budget
    PREFIX of the blob; either way the Arrow batch shape, binary handling,
    and metadata arithmetic are the real thing."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in RESIZE_SCHEMA.fieldNames()}
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                n_in = len(blob)
                decoded = None
                if blob.startswith(_PNG_MAGIC):
                    try:
                        decoded = decode_png(blob)
                    except ValueError:
                        decoded = None  # undecodable PNG → stand-in path
                if decoded is not None:
                    w, h, _, px = decoded
                    nw, nh = min(w, RESIZE_W), min(h, RESIZE_H)
                    xs = (np.arange(nw) * w) // nw
                    ys = (np.arange(nh) * h) // nh
                    resized = encode_png(px[ys][:, xs])
                    n_out = len(resized)
                else:
                    w, h = int(row["width"]), int(row["height"])
                    nw, nh = min(w, RESIZE_W), min(h, RESIZE_H)
                    n_out = max(1, (n_in * nw * nh) // (w * h))
                    resized = blob[:n_out]
                rows["media_id"].append(row["media_id"])
                rows["width"].append(w)
                rows["height"].append(h)
                rows["new_width"].append(nw)
                rows["new_height"].append(nh)
                rows["n_in"].append(n_in)
                rows["n_out"].append(n_out)
                rows["resized"].append(resized)
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
                    samples = np.abs(_decode_audio_array(blob))
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


# -- PNG round-trip (real stdlib codec under the driver gate) -----------------


def media_png_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-trip proof of the REAL PNG path inside the oracle gate: each
    image-kind doc's utf-8 bytes become a 1×n grayscale PNG (``encode_png``),
    ``decode_png``/``decode_image`` recover dims and pixels, and the
    luminance histogram reported here must equal the byte histogram DuckDB
    computes from the raw text bytes — any unfaithfulness in the stdlib
    encode→decode cycle breaks the hash match."""
    import numpy as np

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("f0", T.DoubleType()),
            T.StructField("f1", T.DoubleType()),
            T.StructField("f2", T.DoubleType()),
            T.StructField("f3", T.DoubleType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        # SQL round() is half-AWAY-FROM-ZERO; python round() is half-even —
        # shares like 105/128 land exactly on the 6dp boundary, so the rule
        # must match the oracle's
        def r6(x: float) -> float:
            return math.floor(x * 1e6 + 0.5) / 1e6

        for pdf in batches:
            rows = {k: [] for k in schema.fieldNames()}
            for _, row in pdf.iterrows():
                blob = bytes(row["content"])
                if not blob:
                    continue
                px = np.frombuffer(blob, dtype=np.uint8).reshape(1, -1, 1)
                png = encode_png(px)
                w, h, _, _ = decode_png(png)
                f = decode_image(png)
                rows["media_id"].append(row["media_id"])
                rows["width"].append(w)
                rows["height"].append(h)
                for i in range(4):
                    rows[f"f{i}"].append(r6(f[i]))
            yield pd.DataFrame(rows)

    images = synth_media(spark, sf_dir).where(F.col("kind") == "image").select(
        "media_id", "content"
    )
    return images.mapInPandas(run, schema=schema).orderBy("media_id")


# Byte-true oracle (hex-pair parsing, same technique as MEDIA_AUDIO_ORACLE):
# the 4-bin histogram of byte//64 over the utf-8 bytes, normalized.
MEDIA_PNG_ORACLE = """
WITH a AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n
  FROM documents WHERE doc_id % 3 = 0 AND octet_length(encode(text)) > 0
),
b AS (
  SELECT media_id, n,
         ('0x' || substr(hx, CAST(2 * j + 1 AS INT), 2))::BIGINT // 64 AS bin
  FROM a, LATERAL unnest(range(0, n)) r(j)
)
SELECT media_id, CAST(MAX(n) AS INT) AS width, 1 AS height,
       round(SUM(CASE WHEN bin = 0 THEN 1 ELSE 0 END) * 1.0 / MAX(n), 6) AS f0,
       round(SUM(CASE WHEN bin = 1 THEN 1 ELSE 0 END) * 1.0 / MAX(n), 6) AS f1,
       round(SUM(CASE WHEN bin = 2 THEN 1 ELSE 0 END) * 1.0 / MAX(n), 6) AS f2,
       round(SUM(CASE WHEN bin = 3 THEN 1 ELSE 0 END) * 1.0 / MAX(n), 6) AS f3
FROM b GROUP BY media_id ORDER BY media_id
"""


register("media_png_features", media_png_features, MEDIA_PNG_ORACLE)
