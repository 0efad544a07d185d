"""GIF87a/89a codec in pure stdlib + numpy.

Completes the still-image lane of the multimodal pipeline (the reference
has no media surface; this is north-star LLM-data-pipeline scope): after
round 5's PNG and round 6's baseline JPEG, GIF was the last common crawled
still-image format routed entirely to the counted reject lane.

Decoder (``decode_gif``): full block walk — logical screen descriptor,
global/local color tables, graphic-control / comment / plain-text /
application extensions (sub-block skipped; GCE transparency and disposal
honored), image descriptors with interlace support — and a from-scratch
GIF-variant LZW decompressor (variable 3..12-bit codes, deferred width
change, clear/EOI handling, KwKwK case, 4096-entry table with deferred
clear).  ``decode_gif_frames`` composites every frame onto the logical
screen honoring disposal methods 0/1 (leave), 2 (restore background) and
3 (restore previous); ``decode_gif`` returns the first composited frame
in the same ``(width, height, channels, pixels)`` shape as
``multimodal.decode_png`` so the feature lane treats all three real
decoders uniformly.  Pixels are palette-expanded RGB (3 channels).

Encoder (``encode_gif``): single- or multi-frame GIF89a writer with a
global color table built from the frames' pixels (gray ramp for 1-channel
input, exact unique-color palette for RGB — >256 distinct colors raises,
which is GIF's own limit), optional interlacing (so decoder interlace
support is round-trip tested, not transcribed), per-frame graphic-control
extensions for animations, and a matched LZW compressor whose width-bump
timing mirrors the decoder's deferred change.

Entropy coding is per-blob sequential Python by design, same as
``jpeg.py``: callers are the Arrow-batched mapInPandas lanes in
operators/multimodal.py where blobs are thumbnail-scale.
"""

from __future__ import annotations

import struct

import numpy as np

GIF_MAGIC = b"GIF8"  # GIF87a / GIF89a both start here

_TRAILER = 0x3B
_EXTENSION = 0x21
_IMAGE_SEP = 0x2C
_GCE_LABEL = 0xF9

_MAX_CODE = 4096  # LZW table ceiling (12-bit codes)


# ---------------------------------------------------------------------------
# sub-block plumbing


def _read_subblocks(content: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate a GIF sub-block sequence starting at ``pos``; returns
    (data, position after the 0x00 terminator)."""
    chunks = []
    while True:
        if pos >= len(content):
            raise ValueError("truncated GIF sub-block sequence")
        n = content[pos]
        pos += 1
        if n == 0:
            return b"".join(chunks), pos
        if pos + n > len(content):
            raise ValueError("truncated GIF sub-block payload")
        chunks.append(content[pos : pos + n])
        pos += n


def _write_subblocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        block = data[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)
    return bytes(out)


# ---------------------------------------------------------------------------
# LZW (GIF variant: LSB-first bit packing, deferred code-width change)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytearray:
    """Decode a GIF LZW stream to exactly ``n_pixels`` palette indices.
    Raises ValueError on codes beyond the table, truncation, or a stream
    that ends before yielding enough pixels."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad GIF LZW min code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = bits = pos = 0
    prev: int | None = None
    while len(out) < n_pixels:
        while bits < width:
            if pos >= len(data):
                raise ValueError("GIF LZW stream truncated before EOI")
            acc |= data[pos] << bits
            bits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        bits -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = table[prev] + table[prev][:1]  # KwKwK
        else:
            raise ValueError(f"GIF LZW code {code} beyond table size {len(table)}")
        out += entry
        if prev is not None and len(table) < _MAX_CODE:
            table.append(table[prev] + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1  # deferred change: bump AFTER the table fills
        prev = code
    if len(out) < n_pixels:
        raise ValueError(
            f"GIF frame underflow: {len(out)} of {n_pixels} pixels decoded"
        )
    del out[n_pixels:]  # tolerate (rare) encoder overshoot past the raster
    return out


def _lzw_encode(indices: bytes, min_code_size: int) -> bytes:
    """GIF LZW compressor matched to ``_lzw_decode``'s deferred width
    change (encoder bumps one add LATER than a greedy early-change
    encoder would, mirroring the decoder's post-fill bump)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    codes: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out = bytearray()
    acc = bits = 0

    def emit(code: int, w: int) -> None:
        nonlocal acc, bits
        acc |= code << bits
        bits += w
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8

    emit(clear, width)
    prev = b""
    for b in indices:
        cand = prev + bytes([b])
        if cand in codes:
            prev = cand
            continue
        emit(codes[prev], width)
        codes[cand] = next_code
        next_code += 1
        # deferred change: the DECODER reads the code we just emitted
        # before its own table add, so we may only widen once next_code
        # EXCEEDS the current capacity (not when it reaches it)
        if next_code > (1 << width) and width < 12:
            width += 1
        if next_code == _MAX_CODE:
            emit(clear, width)
            codes = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        prev = bytes([b])
    if prev:
        emit(codes[prev], width)
    emit(eoi, width)
    if bits:
        out.append(acc & 0xFF)
    return bytes(out)


# ---------------------------------------------------------------------------
# decoding


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))  # (first row, step)


def _deinterlace(rows: np.ndarray) -> np.ndarray:
    h = rows.shape[0]
    out = np.empty_like(rows)
    src = 0
    for first, step in _INTERLACE_PASSES:
        for y in range(first, h, step):
            out[y] = rows[src]
            src += 1
    return out


def _read_color_table(content: bytes, pos: int, n: int) -> tuple[np.ndarray, int]:
    end = pos + 3 * n
    if end > len(content):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(content[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def decode_gif_frames(content: bytes, max_frames: int | None = None):
    """Decode a GIF to ``(width, height, frames)`` with ``frames`` a list
    of (h, w, 3) uint8 RGB arrays, each the full logical screen after
    compositing that frame (transparency + disposal honored).  Raises
    ValueError on malformed/truncated streams — never struct.error or
    IndexError (same normalization as jpeg.decode_jpeg, so the
    multimodal reject lane's ``except ValueError`` catches every bad
    blob)."""
    try:
        return _decode_gif_frames(content, max_frames)
    except (struct.error, IndexError) as e:
        raise ValueError(f"malformed GIF stream: {e}") from e


def _decode_gif_frames(content: bytes, max_frames: int | None = None):
    if not content.startswith(GIF_MAGIC) or len(content) < 13:
        raise ValueError("not a GIF blob")
    version = content[4:6]
    if version not in (b"7a", b"9a"):
        raise ValueError(f"unknown GIF version GIF8{version!r}")
    width, height, packed, bg_index, _aspect = struct.unpack(
        "<HHBBB", content[6:13]
    )
    if width == 0 or height == 0:
        raise ValueError("GIF with zero logical screen dimension")
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(content, pos, 2 << (packed & 0x07))
    if gct is not None and bg_index < len(gct):
        canvas = np.tile(gct[bg_index], (height, width, 1)).astype(np.uint8)
    else:
        canvas = np.zeros((height, width, 3), dtype=np.uint8)

    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0
    while True:
        if pos >= len(content):
            raise ValueError("GIF ended without trailer")
        block = content[pos]
        pos += 1
        if block == _TRAILER:
            break
        if block == _EXTENSION:
            if pos >= len(content):
                raise ValueError("truncated GIF extension")
            label = content[pos]
            data, pos = _read_subblocks(content, pos + 1)
            if label == _GCE_LABEL and len(data) >= 4:
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                transparent = data[3] if flags & 0x01 else None
            continue
        if block != _IMAGE_SEP:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        if pos + 9 > len(content):
            raise ValueError("truncated GIF image descriptor")
        left, top, fw, fh, fpacked = struct.unpack("<HHHHB", content[pos : pos + 9])
        pos += 9
        if fw == 0 or fh == 0 or left + fw > width or top + fh > height:
            raise ValueError("GIF frame exceeds logical screen")
        palette = gct
        if fpacked & 0x80:
            palette, pos = _read_color_table(content, pos, 2 << (fpacked & 0x07))
        if palette is None:
            raise ValueError("GIF frame with no color table")
        if pos >= len(content):
            raise ValueError("truncated GIF before LZW data")
        min_code_size = content[pos]
        data, pos = _read_subblocks(content, pos + 1)
        idx = np.frombuffer(
            bytes(_lzw_decode(data, min_code_size, fw * fh)), dtype=np.uint8
        ).reshape(fh, fw)
        if fpacked & 0x40:
            idx = _deinterlace(idx)
        if int(idx.max()) >= len(palette):
            raise ValueError("GIF pixel index beyond color table")
        rgb = palette[idx]  # (fh, fw, 3)
        before = canvas.copy() if disposal == 3 else None
        region = canvas[top : top + fh, left : left + fw]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:  # restore the frame rect to background
            if gct is not None and bg_index < len(gct):
                canvas[top : top + fh, left : left + fw] = gct[bg_index]
            else:
                canvas[top : top + fh, left : left + fw] = 0
        elif disposal == 3 and before is not None:
            canvas = before
        transparent, disposal = None, 0
        if max_frames is not None and len(frames) >= max_frames:
            break
    if not frames:
        raise ValueError("GIF with no image data")
    return width, height, frames


def decode_gif(content: bytes):
    """First composited frame in ``decode_png``'s shape: (width, height,
    channels, pixels) with pixels (h, w, 3) uint8 RGB."""
    width, height, frames = decode_gif_frames(content, max_frames=1)
    return width, height, 3, frames[0]


# ---------------------------------------------------------------------------
# encoding


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """(palette, per-frame index rasters).  1-channel input maps onto a
    full 256-entry gray ramp (index == gray value); RGB input gets an
    exact unique-color palette, raising past GIF's 256-color limit."""
    if frames[0].ndim == 2 or frames[0].shape[2] == 1:
        ramp = np.arange(256, dtype=np.uint8)
        palette = np.stack([ramp, ramp, ramp], axis=1)
        rasters = [np.asarray(f, dtype=np.uint8).reshape(f.shape[:2]) for f in frames]
        return palette, rasters
    colors = np.unique(
        np.concatenate([f.reshape(-1, 3) for f in frames], axis=0), axis=0
    )
    if len(colors) > 256:
        raise ValueError(f"GIF palette overflow: {len(colors)} distinct colors > 256")
    lut = {tuple(c): i for i, c in enumerate(colors)}
    rasters = []
    for f in frames:
        flat = f.reshape(-1, 3)
        rasters.append(
            np.array([lut[tuple(p)] for p in flat], dtype=np.uint8).reshape(
                f.shape[:2]
            )
        )
    return colors.astype(np.uint8), rasters


def _interlace_rows(idx: np.ndarray) -> np.ndarray:
    order = [
        y for first, step in _INTERLACE_PASSES for y in range(first, idx.shape[0], step)
    ]
    return idx[order]


def encode_gif(
    pixels, *, interlace: bool = False, delay_cs: int = 4
) -> bytes:
    """GIF89a writer.  ``pixels`` is one (h, w[, 1|3]) uint8 array or a
    list of same-shaped arrays (an animation: one image descriptor per
    frame, each preceded by a GCE carrying ``delay_cs``)."""
    frames = (
        [np.asarray(f, dtype=np.uint8) for f in pixels]
        if isinstance(pixels, (list, tuple))
        else [np.asarray(pixels, dtype=np.uint8)]
    )
    if not frames or any(f.shape[:2] != frames[0].shape[:2] for f in frames):
        raise ValueError("encode_gif needs ≥1 same-shaped frame")
    h, w = frames[0].shape[:2]
    palette, rasters = _build_palette(frames)
    gct_bits = max(1, (len(palette) - 1).bit_length())
    gct = np.zeros((2 << (gct_bits - 1), 3), dtype=np.uint8)
    gct[: len(palette)] = palette
    min_code_size = max(2, gct_bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((gct_bits - 1) & 0x07), 0, 0)
    out += gct.tobytes()
    animated = len(frames) > 1
    for idx in rasters:
        if animated:
            out += bytes([_EXTENSION, _GCE_LABEL, 4, 0x00])
            out += struct.pack("<H", delay_cs) + bytes([0, 0])
        fpacked = 0x40 if interlace else 0x00
        out += bytes([_IMAGE_SEP]) + struct.pack("<HHHHB", 0, 0, w, h, fpacked)
        raster = _interlace_rows(idx) if interlace else idx
        out.append(min_code_size)
        out += _write_subblocks(_lzw_encode(raster.tobytes(), min_code_size))
    out.append(_TRAILER)
    return bytes(out)
