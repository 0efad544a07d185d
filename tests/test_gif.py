"""GIF codec (operators/gif.py): LZW decoder against a hand-built stream,
encoder→decoder round-trips (gray / RGB palette / interlace / animation /
width-growth / dict-clear), disposal + transparency compositing, reject
lanes, and the multimodal integration."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from data_catalog_spark.operators import gif
from data_catalog_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
)


def _rng():
    return np.random.RandomState(1234)


# -- LZW against a hand-built stream (no encoder in the loop) ----------------


def test_lzw_decode_hand_built_stream():
    """min_code_size=2 → clear=4, eoi=5, width starts at 3.  Codes
    [clear, 1, 1, 2, eoi]: the second 1 adds table entry (1,1) and the 2
    adds (1,2); output is pixels [1, 1, 2]."""
    codes = [(4, 3), (1, 3), (1, 3), (2, 3), (5, 3)]
    acc = bits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    assert bytes(gif._lzw_decode(bytes(out), 2, 3)) == bytes([1, 1, 2])


def test_lzw_kwkwk_case():
    """The code-equals-next-entry (KwKwK) case: stream clear,0,6 where 6
    is exactly the not-yet-added entry → decodes to [0, 0, 0]."""
    codes = [(4, 3), (0, 3), (6, 3), (5, 3)]
    acc = bits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    assert bytes(gif._lzw_decode(bytes(out), 2, 3)) == bytes([0, 0, 0])


def test_lzw_rejects_code_beyond_table():
    # code 7 with an empty table (only clear emitted) is invalid
    codes = [(4, 3), (7, 3)]
    acc = bits = 0
    out = bytearray()
    for code, w in codes:
        acc |= code << bits
        bits += w
    out.append(acc & 0xFF)
    with pytest.raises(ValueError, match="beyond table"):
        gif._lzw_decode(bytes(out), 2, 4)


def test_lzw_truncation_raises():
    with pytest.raises(ValueError, match="truncated|underflow"):
        gif._lzw_decode(b"\x04", 2, 100)


# -- round-trips --------------------------------------------------------------


def test_gray_round_trip_exact():
    g = _rng().randint(0, 256, size=(23, 17), dtype=np.uint8)
    w, h, ch, px = decode_gif(encode_gif(g))
    assert (w, h, ch) == (17, 23, 3)
    for c in range(3):  # gray ramp palette: every channel equals the input
        assert np.array_equal(px[:, :, c], g)


def test_rgb_palette_round_trip_exact():
    rng = _rng()
    colors = rng.randint(0, 256, size=(40, 3), dtype=np.uint8)
    img = colors[rng.randint(0, 40, size=(31, 29))]
    _, _, _, px = decode_gif(encode_gif(img))
    assert np.array_equal(px, img)


def test_interlaced_round_trip_exact():
    g = _rng().randint(0, 256, size=(37, 11), dtype=np.uint8)
    blob = encode_gif(g, interlace=True)
    # interlace flag actually set on the image descriptor (header is
    # 13 bytes + the 256-entry gray GCT; no GCE for a single frame)
    sep = 13 + 256 * 3
    assert blob[sep] == 0x2C and blob[sep + 9] & 0x40
    _, _, _, px = decode_gif(blob)
    assert np.array_equal(px[:, :, 0], g)


def test_width_growth_and_dict_clear_round_trip():
    """200×300 random bytes force the code width up to 12 bits and past
    the 4096-entry ceiling (encoder emits a mid-stream clear)."""
    big = _rng().randint(0, 256, size=(200, 300), dtype=np.uint8)
    _, _, _, px = decode_gif(encode_gif(big))
    assert np.array_equal(px[:, :, 0], big)


def test_animation_frames_round_trip():
    rng = _rng()
    f1 = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    f2 = rng.randint(0, 256, size=(9, 13), dtype=np.uint8)
    w, h, frames = decode_gif_frames(encode_gif([f1, f2]))
    assert (w, h) == (13, 9) and len(frames) == 2
    assert np.array_equal(frames[0][:, :, 0], f1)
    assert np.array_equal(frames[1][:, :, 0], f2)
    # decode_gif takes only the first frame and never reads past it
    _, _, _, px = decode_gif(encode_gif([f1, f2]))
    assert np.array_equal(px[:, :, 0], f1)


# -- compositing: transparency + disposal ------------------------------------


def _gce(disposal=0, transparent=None, delay=0):
    flags = (disposal & 7) << 2 | (1 if transparent is not None else 0)
    return bytes([0x21, 0xF9, 4, flags]) + struct.pack("<H", delay) + bytes(
        [transparent or 0, 0]
    )


def _frame_bytes(idx: np.ndarray, left=0, top=0, mcs=2) -> bytes:
    h, w = idx.shape
    out = bytearray([0x2C]) + struct.pack("<HHHHB", left, top, w, h, 0)
    out.append(mcs)
    out += gif._write_subblocks(gif._lzw_encode(idx.tobytes(), mcs))
    return bytes(out)


def _gct(colors: list[tuple[int, int, int]], bits: int) -> bytes:
    table = bytearray()
    for c in colors:
        table += bytes(c)
    table += b"\x00" * (3 * (2 << (bits - 1)) - len(table))
    return bytes(table)


def _screen(w, h, gct_bits, bg=0) -> bytes:
    return b"GIF89a" + struct.pack("<HHBBB", w, h, 0x80 | (gct_bits - 1), bg, 0)


def test_transparent_pixels_keep_canvas():
    """Frame 2 paints index 1 with index 0 transparent: frame-1 pixels
    show through where frame 2 is transparent."""
    colors = [(10, 10, 10), (200, 200, 200), (0, 0, 0), (0, 0, 0)]
    f1 = np.full((2, 2), 1, dtype=np.uint8)
    f2 = np.array([[0, 1], [1, 0]], dtype=np.uint8)
    blob = (
        _screen(2, 2, 2)
        + _gct(colors, 2)
        + _frame_bytes(f1)
        + _gce(transparent=0)
        + _frame_bytes(f2)
        + b"\x3b"
    )
    _, _, frames = decode_gif_frames(blob)
    assert len(frames) == 2
    # transparent slots of f2 keep f1's gray 200; painted slots become 200 too
    assert frames[1][0, 0, 0] == 200 and frames[1][0, 1, 0] == 200


def test_disposal_restore_background():
    """Disposal 2 on frame 1 restores the rect to the background color
    before frame 2 (which is transparent there) composites."""
    colors = [(7, 7, 7), (250, 250, 250), (0, 0, 0), (0, 0, 0)]
    f1 = np.full((2, 2), 1, dtype=np.uint8)
    f2 = np.full((2, 2), 0, dtype=np.uint8)  # all transparent
    blob = (
        _screen(2, 2, 2, bg=0)
        + _gct(colors, 2)
        + _gce(disposal=2)
        + _frame_bytes(f1)
        + _gce(transparent=0)
        + _frame_bytes(f2)
        + b"\x3b"
    )
    _, _, frames = decode_gif_frames(blob)
    assert frames[0][0, 0, 0] == 250
    assert frames[1][0, 0, 0] == 7  # background restored, f2 transparent


def test_subframe_placement():
    colors = [(0, 0, 0), (255, 255, 255), (0, 0, 0), (0, 0, 0)]
    sub = np.full((1, 2), 1, dtype=np.uint8)
    blob = (
        _screen(4, 3, 2)
        + _gct(colors, 2)
        + _frame_bytes(sub, left=2, top=1)
        + b"\x3b"
    )
    w, h, ch, px = decode_gif(blob)
    assert (w, h) == (4, 3)
    assert px[1, 2, 0] == 255 and px[1, 3, 0] == 255
    assert px[0, 0, 0] == 0 and px[2, 3, 0] == 0


# -- reject lanes -------------------------------------------------------------


@pytest.mark.parametrize(
    "blob",
    [
        b"",
        b"GIF8",
        b"notagif-bytes-here",
        b"GIF85a" + b"\x00" * 20,  # unknown version
        b"GIF89a" + struct.pack("<HHBBB", 0, 4, 0, 0, 0) + b"\x3b",  # zero dim
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0),  # no trailer
        b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0, 0, 0) + b"\x3b",  # no frame
    ],
)
def test_corrupt_gifs_raise_value_error(blob):
    with pytest.raises(ValueError):
        decode_gif(blob)


def test_frame_exceeding_screen_raises():
    colors = [(0, 0, 0)] * 4
    blob = (
        _screen(2, 2, 2)
        + _gct(colors, 2)
        + _frame_bytes(np.zeros((4, 4), dtype=np.uint8))
        + b"\x3b"
    )
    with pytest.raises(ValueError, match="exceeds logical screen"):
        decode_gif(blob)


def test_palette_overflow_raises():
    rng = _rng()
    with pytest.raises(ValueError, match="palette overflow"):
        encode_gif(rng.randint(0, 256, size=(30, 30, 3), dtype=np.uint8))


# -- multimodal integration ---------------------------------------------------


def test_image_features_recognizes_gif():
    from data_catalog_spark.operators import multimodal as mm

    g = _rng().randint(0, 256, size=(8, 8), dtype=np.uint8)
    feats, fmt = mm._image_features(encode_gif(g))
    assert fmt == "gif"
    assert len(feats) == 4 and abs(sum(feats) - 1.0) < 1e-9
    # features are the luma hist of the REAL pixels
    expected = mm._luma_hist(np.stack([g] * 3, axis=2), 3)
    assert feats == expected


def test_decode_image_gif_and_reject():
    from data_catalog_spark.operators import multimodal as mm

    g = _rng().randint(0, 256, size=(5, 7), dtype=np.uint8)
    assert len(mm.decode_image(encode_gif(g))) == 4
    # a truncated GIF raises ValueError (the specific decoder error)
    with pytest.raises(ValueError):
        mm.decode_image(encode_gif(g)[:20])
    assert mm.classify_decode("image", encode_gif(g)) == "real"
    assert mm.classify_decode("image", encode_gif(g)[:20]) == "reject"


def test_malformed_gif_raises_valueerror_never_struct_error():
    import pytest

    from data_catalog_spark.operators.gif import decode_gif

    bad = [
        b"GIF89a" + b"\x00" * 7 + b"\x2c" + b"\x00" * 3,  # truncated image desc
        b"GIF89a\x02\x00\x02\x00\x80\x00\x00",  # GCT declared, missing bytes
    ]
    for blob in bad:
        with pytest.raises(ValueError):
            decode_gif(blob)
