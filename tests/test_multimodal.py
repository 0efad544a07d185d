"""Multimodal plumbing: schema, Arrow-batch UDF shape, deterministic fake
decode, real-decode stub behavior."""

from __future__ import annotations

import pytest

from data_catalog_spark.operators import multimodal as mm

from conftest import assert_same


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    df = mm.synth_media(spark, sf_dir)
    df.cache()
    return df


def test_media_schema(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "kind", "content", "meta"]
    assert media.schema["content"].dataType.typeName() == "binary"
    kinds = {r.kind for r in media.select("kind").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_extract_features_shape_and_determinism(media):
    feats = mm.extract_features(media).collect()
    assert len(feats) == media.count()
    for r in feats[:20]:
        assert len(r.features) == 4
        assert abs(sum(r.features) - 1.0) < 1e-9  # normalized histogram
        assert len(r.content_md5) == 32
        assert r.n_bytes > 0
    again = mm.extract_features(media).collect()
    assert sorted(feats, key=lambda r: r.media_id) == sorted(again, key=lambda r: r.media_id)


def test_decode_report_counts_reject_lane(spark, sf_dir, ddb):
    """The counted reject lane: mixed-table rows flagged 'real' actually
    decode through the stdlib decoders, rejects are counted per kind, and
    the report matches the construction-arithmetic oracle."""
    assert_same(mm.media_decode_report(spark, sf_dir), ddb, mm.MEDIA_DECODE_ORACLE)
    mixed = mm.synth_mixed_media(spark, sf_dir)
    sample = mixed.where("media_id % 6 = 0 AND kind = 'image'").limit(3).collect()
    assert sample
    for r in sample:
        w, h, ch, px = mm.decode_png(bytes(r.content))
        assert (w, h, ch) == (4, 4, 1)
    wavs = mixed.where("media_id % 6 = 1 AND kind = 'audio'").limit(3).collect()
    assert wavs
    for r in wavs:
        assert len(mm.decode_audio(bytes(r.content))) > 0


def test_avi_roundtrip_and_video_report(spark, sf_dir, ddb):
    """RIFF/AVI frame extraction is real container parsing: encode →
    decode round-trips frame bytes exactly (incl. odd-length padding),
    truncated/non-AVI blobs raise, sample_frames extracts the true
    frames for AVI rows, and the per-video report matches the
    construction-arithmetic oracle."""
    frames = [b"abc", b"de", b"f" * 7, b""]
    blob = mm.encode_avi_mjpeg(frames)
    assert mm.decode_avi_frames(blob) == frames
    with pytest.raises(ValueError):
        mm.decode_avi_frames(b"RIFFxxxxAVI ")  # header only, no size room
    with pytest.raises(ValueError):
        mm.decode_avi_frames(b"not a container")
    with pytest.raises(ValueError):
        mm.decode_avi_frames(blob[:-3])  # truncated chunk

    # adversarial containers (review-pass pins):
    import struct

    # 1. deep LIST nesting must be a ValueError-class reject, never a
    #    RecursionError that kills the task
    inner = b""
    for _ in range(200):
        inner = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"movi" + inner
    deep = mm._RIFF + struct.pack("<I", 4 + len(inner)) + mm._AVI + inner
    with pytest.raises(ValueError, match="nesting"):
        mm.decode_avi_frames(deep)
    # 2. trailing padding after the declared riff size is tolerated...
    assert mm.decode_avi_frames(blob + b"\x00" * 9) == frames
    # 3. ...and undeclared tail bytes can never become phantom frames
    tail = b"00dc" + struct.pack("<I", 4) + b"ZZZZ"
    assert mm.decode_avi_frames(blob + tail) == frames
    # 4. dc-suffixed chunks OUTSIDE a movi list are not frames
    stray = b"00dc" + struct.pack("<I", 3) + b"abc" + b"\x00"
    hdr_only = mm._RIFF + struct.pack("<I", 4 + len(stray)) + mm._AVI + stray
    assert mm.decode_avi_frames(hdr_only) == []
    # 5. a valid but frameless container routes to the fallback lane
    empty = mm.encode_avi_mjpeg([])
    assert mm.decode_avi_frames(empty) == []
    assert mm._avi_frames_or_none(empty) is None

    assert_same(mm.media_video_report(spark, sf_dir), ddb, mm.MEDIA_VIDEO_ORACLE)

    # sample_frames really parses the container for the AVI subset
    mixed = mm.synth_mixed_media(spark, sf_dir)
    avi_row = mixed.where("kind = 'video' AND media_id % 6 = 2").limit(1).collect()[0]
    want = mm.decode_avi_frames(bytes(avi_row.content))
    got = (
        mm.sample_frames(mixed.where(f"media_id = {avi_row.media_id}"))
        .orderBy("frame_idx")
        .collect()
    )
    assert [bytes(r.frame_bytes) for r in got] == want


def test_classify_decode_attempts_not_sniffs():
    """A blob with the PNG magic but corrupt payload must land in the
    reject lane — classification is by decode attempt, not magic bytes."""
    assert mm.classify_decode("image", b"\x89PNG\r\n\x1a\njunk") == "reject"
    assert mm.classify_decode("video", b"anything") == "reject"
    import numpy as np

    png = mm.encode_png(np.zeros((2, 2, 3), dtype=np.uint8))
    assert mm.classify_decode("image", png) == "real"


def test_non_png_image_decode_is_stubbed_audio_is_real():
    # "\x89PNG..." is NOT the full 8-byte PNG signature — treated as an
    # unsupported (non-PNG) image format, which needs pillow
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"\x89PNG...")
    with pytest.raises(ValueError):
        mm.decode_audio(b"RIFF...")  # truncated RIFF is not a valid WAV
    assert mm.decode_image(b"abc", fake=True) == mm.decode_image(b"abc", fake=True)


def _make_wav(samples, *, sampwidth=2, n_channels=1, framerate=16000) -> bytes:
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        fmt = {1: "B", 2: "<h", 4: "<i"}[sampwidth]
        w.writeframes(b"".join(struct.pack(fmt, s) for s in samples))
    return buf.getvalue()


def test_decode_audio_real_wav_16bit():
    """Round-trip: write a PCM WAV with stdlib wave, decode it back —
    normalized [-1, 1] samples in order, no fake path involved."""
    raw = [0, 16384, -16384, 32767, -32768]
    got = mm.decode_audio(_make_wav(raw))
    want = [s / 32768.0 for s in raw]
    assert got == pytest.approx(want, abs=1e-9)


def test_decode_audio_8bit_and_stereo_downmix():
    got8 = mm.decode_audio(_make_wav([128, 255, 0], sampwidth=1))
    assert got8 == pytest.approx([0.0, 127 / 128.0, -1.0], abs=1e-9)
    # stereo 16-bit: channels average to mono
    stereo = _make_wav([1000, 3000, -2000, -4000], n_channels=2)
    assert mm.decode_audio(stereo) == pytest.approx(
        [2000 / 32768.0, -3000 / 32768.0], abs=1e-9
    )


def test_window_audio_decodes_real_wav_blobs(spark):
    """A genuine WAV blob routed through window_audio gets the REAL decode:
    mean |amplitude| of the normalized samples, windowed at AUDIO_WINDOW."""
    import pandas as pd

    samples = [16384] * mm.AUDIO_WINDOW + [-32768] * 10
    wav = _make_wav(samples)
    media = spark.createDataFrame(
        pd.DataFrame({"media_id": [7], "kind": ["audio"], "content": [wav]})
    )
    rows = {r.win: r for r in mm.window_audio(media).collect()}
    assert rows[0].n_samples == mm.AUDIO_WINDOW
    assert rows[0].mean_energy == pytest.approx(0.5, abs=1e-6)
    assert rows[1].n_samples == 10
    assert rows[1].mean_energy == pytest.approx(1.0, abs=1e-6)


def test_frame_sampling(media):
    frames = mm.sample_frames(media)
    rows = frames.collect()
    n_videos = media.where("kind = 'video'").count()
    assert len(rows) >= n_videos  # >=1 frame per video
    # frame counts match meta.n_frames
    by_media = {}
    for r in rows:
        by_media.setdefault(r.media_id, []).append(r.frame_idx)
    metas = {
        r.media_id: r.n_frames
        for r in media.where("kind = 'video'")
        .selectExpr("media_id", "meta.n_frames AS n_frames")
        .collect()
    }
    for mid, idxs in by_media.items():
        assert sorted(idxs) == list(range(metas[mid]))
    # frames are real byte slices
    assert all(isinstance(r.frame_bytes, (bytes, bytearray)) for r in rows[:10])


def test_media_feature_stats_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators.multimodal import (
        MEDIA_FEATURES_ORACLE,
        media_feature_stats,
    )
    from conftest import assert_same

    assert_same(media_feature_stats(spark, sf_dir), ddb, MEDIA_FEATURES_ORACLE)


def test_media_frame_stats_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators.multimodal import (
        MEDIA_FRAMES_ORACLE,
        media_frame_stats,
    )
    from conftest import assert_same

    assert_same(media_frame_stats(spark, sf_dir), ddb, MEDIA_FRAMES_ORACLE)


def test_resize_parity(spark, sf_dir, ddb):
    assert_same(mm.media_resize_stats(spark, sf_dir), ddb, mm.MEDIA_RESIZE_ORACLE)


def test_resize_never_upscales(spark, sf_dir):
    rows = mm.resize_images(mm.synth_media(spark, sf_dir)).collect()
    assert rows
    for r in rows:
        assert r.new_width <= min(r.width, mm.RESIZE_W)
        assert r.new_height <= min(r.height, mm.RESIZE_H)
        assert 1 <= r.n_out <= r.n_in
        assert len(r.resized) == r.n_out


def test_audio_windows_parity(spark, sf_dir, ddb):
    from data_catalog_spark.operators import multimodal as mm

    assert_same(mm.media_audio_windows(spark, sf_dir), ddb, mm.MEDIA_AUDIO_ORACLE)


def test_audio_windows_cover_all_samples(spark, sf_dir):
    """Window sample counts per blob must sum to the blob length, and every
    non-final window is exactly AUDIO_WINDOW samples."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from data_catalog_spark.operators import multimodal as mm

    rows = mm.media_audio_windows(spark, sf_dir).collect()
    by_media = defaultdict(list)
    for r in rows:
        by_media[r.media_id].append(r)
    sizes = {
        r.media_id: r.n
        for r in mm.synth_media(spark, sf_dir)
        .where(F.col("kind") == "audio")
        .select("media_id", F.length("content").alias("n"))
        .collect()
    }
    assert set(by_media) == set(sizes)
    for mid, ws in by_media.items():
        ws.sort(key=lambda r: r.win)
        assert sum(r.n_samples for r in ws) == sizes[mid]
        for r in ws[:-1]:
            assert r.n_samples == mm.AUDIO_WINDOW
        for r in ws:
            assert 0.0 <= r.mean_energy <= 1.0


def _filtered_png(pixels, filters):
    """Test-side PNG writer with EXPLICIT per-row filter types — forward
    filtering here, so decode_png's unfiltering of every type is pinned."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, ch = px.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y, ftype in zip(range(h), filters):
        line = px[y].reshape(-1).astype(np.int32)
        out = bytearray()
        for i in range(w * ch):
            a = int(line[i - ch]) if i >= ch else 0
            b = int(prev[i])
            c = int(prev[i - ch]) if i >= ch else 0
            if ftype == 0:
                pred = 0
            elif ftype == 1:
                pred = a
            elif ftype == 2:
                pred = b
            elif ftype == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            out.append((int(line[i]) - pred) & 0xFF)
        raw += bytes([ftype]) + bytes(out)
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (mm._PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def test_png_decode_recovers_every_filter_type():
    import numpy as np

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)
    blob = _filtered_png(px, filters=[0, 1, 2, 3, 4])
    w, h, ch, got = mm.decode_png(blob)
    assert (w, h, ch) == (7, 5, 3)
    assert (got == px).all()


def test_png_roundtrip_all_channel_counts():
    import numpy as np

    rng = np.random.default_rng(4)
    for ch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(3, 4, ch), dtype=np.uint8)
        w, h, ch2, got = mm.decode_png(mm.encode_png(px))
        assert (w, h, ch2) == (4, 3, ch)
        assert (got == px).all()


def test_decode_image_png_is_real():
    """A black/white PNG's luminance histogram: half lowest bin, half
    highest — computed from DECODED pixels, not blob bytes."""
    import numpy as np

    px = np.zeros((2, 4, 3), dtype=np.uint8)
    px[:, 2:, :] = 255
    feats = mm.decode_image(mm.encode_png(px))
    assert feats == [0.5, 0.0, 0.0, 0.5]
    # magic bytes that fail to decode are a CORRUPT blob of that format
    # (ValueError, for all three real decoders); formats with no real
    # decoder at all still raise NotImplementedError without the fake
    # stand-in
    import pytest as _pytest

    with _pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff JPEG-ish")
    with _pytest.raises(ValueError):
        mm.decode_image(b"GIF87a not-actually-decodable")
    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"II*\x00 TIFF-ish, no decoder")


def test_resize_images_real_png_path(spark):
    """A 300-wide PNG routed through resize_images gets REAL
    nearest-neighbor resampling: output re-decodes to the index-sampled
    pixels at the capped target width."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, size=(2, 300, 3), dtype=np.uint8)
    blob = mm.encode_png(px)
    media = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_id": [1],
                "kind": ["image"],
                "content": [blob],
                "width": [300],
                "height": [2],
            }
        )
    ).selectExpr(
        "media_id", "kind", "content",
        "named_struct('width', CAST(width AS INT), 'height', CAST(height AS INT), "
        "'sample_rate', CAST(NULL AS INT), 'n_frames', CAST(NULL AS INT)) AS meta",
    )
    row = mm.resize_images(media).collect()[0]
    assert (row.width, row.height) == (300, 2)
    assert (row.new_width, row.new_height) == (mm.RESIZE_W, 2)
    w, h, ch, got = mm.decode_png(bytes(row.resized))
    assert (w, h, ch) == (mm.RESIZE_W, 2, 3)
    xs = (np.arange(mm.RESIZE_W) * 300) // mm.RESIZE_W
    assert (got == px[:, xs]).all()


def test_media_png_features_parity(spark, sf_dir, ddb):
    assert_same(mm.media_png_features(spark, sf_dir), ddb, mm.MEDIA_PNG_ORACLE)


def test_fake_path_never_raises_on_bad_png_magic():
    """The mapInPandas contract: fake=True must survive ANY blob —
    including truncated/unsupported bytes that carry the full PNG magic."""
    bad = mm._PNG_MAGIC + b"\x00\x00\x00\x0dIHDR-truncated"
    assert mm.decode_image(bad, fake=True) == mm._byte_histogram(bad)
    with pytest.raises(ValueError):
        mm.decode_image(bad)  # the real path still surfaces the corruption


def test_gray_alpha_luminance_excludes_alpha():
    """A fully-opaque all-black gray+alpha PNG is BLACK: alpha must not
    vote in the luminance histogram."""
    import numpy as np

    px = np.zeros((2, 3, 2), dtype=np.uint8)
    px[:, :, 1] = 255  # opaque alpha
    assert mm.decode_image(mm.encode_png(px)) == [1.0, 0.0, 0.0, 0.0]


def test_resize_falls_back_on_undecodable_png_magic(spark):
    import pandas as pd

    bad = mm._PNG_MAGIC + b"\x00" * 40
    media = spark.createDataFrame(
        pd.DataFrame(
            {"media_id": [1], "kind": ["image"], "content": [bad],
             "width": [100], "height": [100]}
        )
    ).selectExpr(
        "media_id", "kind", "content",
        "named_struct('width', CAST(width AS INT), 'height', CAST(height AS INT), "
        "'sample_rate', CAST(NULL AS INT), 'n_frames', CAST(NULL AS INT)) AS meta",
    )
    row = mm.resize_images(media).collect()[0]
    # stand-in path: proportional byte prefix of the blob
    assert bytes(row.resized) == bad[: row.n_out]
