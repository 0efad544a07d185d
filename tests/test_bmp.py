"""24bpp BMP codec (operators/bmp.py)."""

from __future__ import annotations

import numpy as np
import pytest

from data_catalog_spark.operators.bmp import decode_bmp, encode_bmp


def test_bmp_roundtrip_rgb():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (1, 5), (3, 4), (7, 3), (16, 16)]:
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_bmp(px)
        ww, hh, ch, out = decode_bmp(blob)
        assert (ww, hh, ch) == (w, h, 3)
        assert np.array_equal(out, px)


def test_bmp_roundtrip_gray_maps_to_rgb():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    w, h, ch, out = decode_bmp(encode_bmp(px))
    assert (w, h, ch) == (4, 3, 3)
    assert np.array_equal(out, np.repeat(px[:, :, None], 3, axis=2))


def test_bmp_row_padding_is_correct():
    """Widths whose 3w is not a multiple of 4 exercise the pad bytes."""
    for w in (1, 2, 3, 5, 6, 7):
        px = np.full((2, w, 3), 200, dtype=np.uint8)
        _, _, _, out = decode_bmp(encode_bmp(px))
        assert np.array_equal(out, px)


def test_bmp_top_down_height():
    """Negative height = top-down row order (valid per the spec)."""
    import struct

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    blob = bytearray(encode_bmp(px))
    h = struct.unpack("<i", blob[22:26])[0]
    blob[22:26] = struct.pack("<i", -h)
    # flip the stored rows so the image is identical when read top-down
    off = struct.unpack("<I", blob[10:14])[0]
    row_len = (4 * 3 + 3) & ~3
    rows = [bytes(blob[off + i * row_len : off + (i + 1) * row_len]) for i in range(h)]
    blob[off:] = b"".join(reversed(rows))
    _, _, _, out = decode_bmp(bytes(blob))
    assert np.array_equal(out, px)


def test_malformed_bmp_raises_valueerror_never_struct_error():
    bad = [
        b"BM" + b"\x00" * 10,  # truncated header
        b"BM" + b"\x00" * 52,  # zero dims
        encode_bmp(np.zeros((4, 4, 3), dtype=np.uint8))[:-8],  # short pixels
    ]
    for blob in bad:
        with pytest.raises(ValueError):
            decode_bmp(blob)
    # unsupported variants
    blob = bytearray(encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
    blob[28] = 8  # bpp=8 (palettized)
    with pytest.raises(ValueError):
        decode_bmp(bytes(blob))


def test_bmp_blobs_decode_real_in_the_media_lane(spark, sf_dir):
    """Every % 48 == 21 image row decodes REAL with fmt='bmp'; the
    % 48 == 45 image slot stays in the reject lane."""
    from data_catalog_spark.operators.multimodal import (
        extract_features,
        synth_mixed_media,
    )

    rows = (
        extract_features(synth_mixed_media(spark, sf_dir, only_kind="image"))
        .select("media_id", "decode_status", "decode_fmt")
        .collect()
    )
    assert any(r.media_id % 48 == 21 for r in rows)
    for r in rows:
        if r.media_id % 48 == 21:
            assert (r.decode_status, r.decode_fmt) == ("real", "bmp"), r
        elif r.media_id % 48 == 45:
            assert (r.decode_status, r.decode_fmt) == ("reject", "none"), r
