"""Minimal stdlib+numpy BMP codec — 24-bit uncompressed BI_RGB (the
format virtually every BMP in a crawl is), used by the multimodal lane
the same way jpeg.py/gif.py are: a REAL decode for the engine side, an
encoder only so tests can round-trip without fixture files.

Layout (Windows BITMAPINFOHEADER): 14-byte file header ("BM", file size,
pixel-data offset) + 40-byte DIB header (dims, planes=1, bpp=24,
compression=0) + pixel rows bottom-up (top-down when height < 0), each
row BGR triples padded to a 4-byte boundary.

Same error contract as the other codecs: malformed/truncated streams
raise ValueError — never struct.error/IndexError — so the multimodal
reject lane's ``except ValueError`` catches every bad blob.
"""

from __future__ import annotations

import struct

import numpy as np

BMP_MAGIC = b"BM"


def encode_bmp(pixels) -> bytes:
    """(h, w[, 1|3]) uint8 gray or RGB → 24bpp BI_RGB bytes."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    if px.shape[2] != 3:
        raise ValueError(f"BMP encoder expects gray or RGB, got {px.shape}")
    h, w, _ = px.shape
    row_len = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = px[y, :, ::-1].tobytes()  # RGB → BGR
        body += row + b"\x00" * (row_len - len(row))
    dib = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", BMP_MAGIC, 14 + len(dib) + len(body), 0, 0, 14 + len(dib))
    return header + dib + bytes(body)


def decode_bmp(content: bytes):
    """(width, height, channels=3, pixels (h, w, 3) uint8 RGB) — the
    decode_png/decode_gif contract.  24bpp BI_RGB only; anything else
    (palettized, RLE, 32bpp with alpha, BITMAPV5 gradients) raises
    ValueError like the other codecs' unsupported modes."""
    try:
        return _decode_bmp(content)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed BMP stream: {e}") from e


def _decode_bmp(content: bytes):
    if not content.startswith(BMP_MAGIC):
        raise ValueError("not a BMP blob")
    if len(content) < 54:
        raise ValueError("truncated BMP header")
    _, _fsize, _, _, offset = struct.unpack("<2sIHHI", content[:14])
    dib_size = struct.unpack("<I", content[14:18])[0]
    if dib_size < 40:
        raise ValueError(f"unsupported DIB header size {dib_size}")
    (w, h_signed, planes, bpp, compression) = struct.unpack(
        "<iiHHI", content[18:34]
    )
    if planes != 1:
        raise ValueError(f"bad BMP plane count {planes}")
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP variant (bpp={bpp}, compression={compression})"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h <= 0:
        raise ValueError("BMP with non-positive dimensions")
    row_len = (w * 3 + 3) & ~3
    need = offset + row_len * h
    if need > len(content):
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(
        content[offset : offset + row_len * h], dtype=np.uint8
    ).reshape(h, row_len)[:, : w * 3]
    px = rows.reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    if not top_down:
        px = px[::-1]
    return w, h, 3, np.ascontiguousarray(px)
