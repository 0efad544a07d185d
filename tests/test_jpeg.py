"""Baseline JPEG codec (operators/jpeg.py): decoder internals against
first-principles arithmetic, encoder→decoder round-trips across sampling /
restart configurations, reject lanes, and the multimodal integration."""

from __future__ import annotations

import numpy as np
import pytest

from data_catalog_spark.operators import jpeg
from data_catalog_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _smooth(h, w, ch):
    xx, yy = np.meshgrid(np.linspace(0, 200, w), np.linspace(0, 180, h))
    if ch == 1:
        return ((xx + yy) / 2).astype(np.uint8)[:, :, None]
    return np.stack([xx, yy, (xx + yy) / 2], axis=2).astype(np.uint8)


# -- decoder internals, no encoder in the loop --------------------------------


def test_zigzag_is_the_standard_walk():
    """First/last diagonals of the T.81 zigzag, stated independently of
    the generator."""
    z = jpeg._ZIGZAG
    assert z[:10] == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert z[-4:] == [47, 55, 62, 63]
    assert sorted(z) == list(range(64))


def test_dct_basis_is_orthonormal():
    a = jpeg._A
    assert np.allclose(a @ a.T, np.eye(8), atol=1e-12)
    # DC row is the constant 1/(2√2): IDCT of a DC-only block is flat
    flat = a.T @ (np.eye(8) * 0)[:8, :8] @ a
    assert np.allclose(flat, 0)


def test_dc_only_block_decodes_flat():
    """Hand-build the entropy segment for a single 8×8 block whose only
    coefficient is DC — the decoded block must be the flat value
    128 + dc·q₀/8 (DC basis is 1/8 per pixel pair of matmuls).  This pins
    Huffman table reconstruction, EXTEND, dequant and IDCT without the
    encoder in the loop."""
    import struct

    q0 = 16  # luma table, quality 50 → base value at DC
    dc = 24  # DC coefficient (category 5)

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    qtab = bytes([0]) + bytes(
        int(jpeg._scaled_q(jpeg._Q_LUMA, 50)[z]) for z in jpeg._ZIGZAG
    )
    blob = bytearray(b"\xff\xd8")
    blob += seg(0xDB, qtab)
    blob += seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
    blob += seg(0xC4, bytes([0x00]) + bytes(jpeg._DC_BITS) + bytes(jpeg._DC_SYMS))
    blob += seg(0xC4, bytes([0x10]) + bytes(jpeg._AC_BITS) + bytes(jpeg._AC_SYMS))
    blob += seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    bw = jpeg._BitWriter()
    s = jpeg._category(dc)
    code, length = jpeg._DC_ENC[s]
    bw.write(code, length)
    bw.write(jpeg._magnitude_bits(dc, s), s)
    c, ln = jpeg._AC_ENC[0x00]  # EOB
    bw.write(c, ln)
    blob += bw.flush() + b"\xff\xd9"

    w, h, ch, px = decode_jpeg(bytes(blob))
    assert (w, h, ch) == (8, 8, 1)
    expect = round(128 + dc * jpeg._scaled_q(jpeg._Q_LUMA, 50)[0] / 8)
    assert px.min() == px.max() == expect


def test_extend_matches_t81_f221():
    assert jpeg._extend(0, 0) == 0
    assert jpeg._extend(1, 1) == 1
    assert jpeg._extend(0, 1) == -1
    assert jpeg._extend(0b101, 3) == 5
    assert jpeg._extend(0b010, 3) == -5  # low half maps to negatives


# -- round-trips ---------------------------------------------------------------


@pytest.mark.parametrize("ch", [1, 3])
@pytest.mark.parametrize("hw", [(8, 8), (13, 9), (29, 37)])
def test_roundtrip_tolerance(ch, hw):
    img = _smooth(*hw, ch)
    w, h, c, px = decode_jpeg(encode_jpeg(img, quality=92))
    assert (w, h, c) == (hw[1], hw[0], ch)
    assert np.abs(px.astype(int) - img.astype(int)).max() <= 6


def test_roundtrip_subsampled_and_restarts():
    img = _smooth(29, 37, 3)
    for kw in (
        {"subsample": True},
        {"restart_interval": 3},
        {"subsample": True, "restart_interval": 2},
    ):
        w, h, c, px = decode_jpeg(encode_jpeg(img, quality=92, **kw))
        assert (w, h, c) == (37, 29, 3)
        d = np.abs(px.astype(int) - img.astype(int))
        assert d.mean() < 4 and d.max() <= 24, kw


def test_flat_image_is_exact():
    f = np.full((16, 16, 1), 77, dtype=np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(f))
    assert px.min() == px.max() == 77


def test_byte_stuffing_survives():
    """An image engineered to emit 0xFF entropy bytes round-trips (the
    unstuffing path): many high-frequency blocks make FF bytes likely;
    assert only on successful decode + shape."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (48, 48, 1)).astype(np.uint8)
    blob = encode_jpeg(img, quality=90)
    scan = blob[blob.find(b"\xff\xda") :]
    assert b"\xff\x00" in scan  # stuffing actually exercised
    w, h, c, px = decode_jpeg(blob)
    assert (w, h, c) == (48, 48, 1)


# -- reject lanes ---------------------------------------------------------------


def test_rejects_are_valueerrors():
    for bad in (
        b"",
        b"hello",
        b"\x89PNG\r\n\x1a\n",
        b"\xff\xd8\xff truncated",
        encode_jpeg(_smooth(8, 8, 1))[:-20],  # truncated entropy data
    ):
        with pytest.raises(ValueError):
            decode_jpeg(bad)


def test_relabeled_sof2_rejected_as_malformed():
    """Swap SOF0→SOF2 in a valid BASELINE blob: the single full-band scan
    is illegal under progressive rules (a progressive scan may not mix DC
    and AC) — must reject, not misdecode."""
    blob = bytearray(encode_jpeg(_smooth(8, 8, 1)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2
    with pytest.raises(ValueError, match="mixes DC and AC"):
        decode_jpeg(bytes(blob))


def test_lossless_marker_rejected():
    blob = bytearray(encode_jpeg(_smooth(8, 8, 1)))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC3  # lossless sequential
    with pytest.raises(ValueError, match="progressive JPEG"):
        decode_jpeg(bytes(blob))


# -- multimodal integration ------------------------------------------------------


def test_decode_image_jpeg_features_from_pixels():
    """decode_image on a black/white JPEG: histogram mass sits in the
    outer bins (computed from DECODED pixels; quantization ringing at the
    edge may leak a little into inner bins)."""
    from data_catalog_spark.operators import multimodal as mm

    px = np.zeros((16, 16, 1), dtype=np.uint8)
    px[:, 8:, :] = 255
    feats = mm.decode_image(encode_jpeg(px, quality=95))
    assert abs(sum(feats) - 1.0) < 1e-9
    assert feats[0] + feats[3] > 0.9


def test_classify_decode_jpeg_real():
    from data_catalog_spark.operators.multimodal import classify_decode

    good = encode_jpeg(_smooth(8, 8, 1))
    assert classify_decode("image", good) == "real"
    assert classify_decode("image", good[:-15]) == "reject"  # corrupt
    assert classify_decode("audio", good) == "reject"  # wrong kind


# -- progressive (SOF2) -------------------------------------------------------


def test_progressive_matches_baseline_pixels_444():
    """Progressive encode carries the SAME quantized coefficients as
    baseline, so the decode must be pixel-IDENTICAL — on noisy content
    that drives ZRL, EOB runs and every refinement branch."""
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, size=(24, 40, 1), dtype=np.uint8)
    b = decode_jpeg(encode_jpeg(img, quality=95))[3]
    p = decode_jpeg(encode_jpeg(img, quality=95, progressive=True))[3]
    assert np.array_equal(b, p)


def test_progressive_matches_baseline_pixels_420_color():
    rng = np.random.RandomState(11)
    img = rng.randint(0, 256, size=(40, 56, 3), dtype=np.uint8)
    b = decode_jpeg(encode_jpeg(img, quality=85, subsample=True))[3]
    p = decode_jpeg(
        encode_jpeg(img, quality=85, subsample=True, progressive=True)
    )[3]
    assert np.array_equal(b, p)


def test_progressive_smooth_round_trip_quality():
    img = _smooth(17, 23, 3)
    w, h, ch, px = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert (w, h, ch) == (23, 17, 3)
    assert np.mean((px.astype(float) - img.astype(float)) ** 2) < 10


def test_progressive_flat_image_long_eob_runs():
    """A flat 64×64 image leaves every AC band empty: the AC scans are
    pure cross-block EOB runs (64 blocks → multi-bit run lengths)."""
    img = np.full((64, 64, 1), 128, dtype=np.uint8)
    _, _, _, px = decode_jpeg(encode_jpeg(img, quality=90, progressive=True))
    assert np.array_equal(px[:, :, 0], img[:, :, 0])


def test_progressive_blob_is_sof2_multi_scan():
    blob = encode_jpeg(_smooth(16, 16, 3), progressive=True)
    assert b"\xff\xc2" in blob and b"\xff\xc0" not in blob
    # DC first + DC refine + 2 bands x 3 comps + 3 refine = 11 SOS scans
    assert blob.count(b"\xff\xda") == 11


def test_progressive_truncated_scan_raises():
    blob = encode_jpeg(_smooth(16, 16, 1), progressive=True)
    with pytest.raises(ValueError):
        decode_jpeg(blob[: len(blob) // 2] + b"\xff\xd9")


def test_progressive_in_multimodal_lane():
    """_image_features must earn fmt='jpeg' for a progressive blob by
    actually decoding it."""
    from data_catalog_spark.operators import multimodal as mm

    img = _smooth(8, 8, 1)
    feats, fmt = mm._image_features(encode_jpeg(img, progressive=True))
    assert fmt == "jpeg"
    _, _, _, px = decode_jpeg(encode_jpeg(img, progressive=True))
    assert feats == mm._luma_hist(px, 1)


def test_malformed_jpeg_raises_valueerror_never_struct_error():
    """Truncated segment headers must surface as ValueError (the reject
    lane's contract), not struct.error/IndexError escaping mapInPandas."""
    import pytest

    from data_catalog_spark.operators.jpeg import decode_jpeg

    bad = [
        b"\xff\xd8\xff\xc0\x00\x04\x08\x01" + b"\x00" * 16,  # short SOF body
        b"\xff\xd8\xff\xc0\x00\x02" + b"\x00" * 16,  # empty SOF body
        b"\xff\xd8\xff\xdd\x00\x03\x00" + b"\x00" * 8,  # short DRI body
        b"\xff\xd8\xff\xda\x00\x02" + b"\x00" * 8,  # empty SOS body
    ]
    for blob in bad:
        with pytest.raises(ValueError):
            decode_jpeg(blob)
