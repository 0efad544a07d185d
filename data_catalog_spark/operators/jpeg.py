"""Baseline-sequential JPEG (JFIF) codec in pure stdlib + numpy.

The reference has no media surface at all; this is north-star scope for the
LLM-data-pipeline lane (crawled corpora are mostly JPEG), closing round 5's
last "real data" gap: ``multimodal.extract_features`` used to route every
non-PNG image to the counted reject lane.

Decoder (``decode_jpeg``): full baseline DCT, Huffman-coded, 8-bit
(SOF0/SOF1) — marker walk, DQT (8/16-bit precision), any valid DHT
(canonical code reconstruction from BITS/HUFFVAL), interleaved MCUs with
per-component sampling factors up to 2×2 (4:4:4 / 4:2:2 / 4:2:0), restart
intervals, byte-unstuffing, dequant → dezigzag → 8×8 IDCT (orthonormal
DCT-II basis, one numpy matmul pair per block), chroma upsample and
BT.601 YCbCr→RGB — AND full progressive (SOF2): coefficients accumulate
across scans (spectral selection, successive approximation, DC/AC first
and refinement passes, cross-block EOB runs, interleaved DC +
non-interleaved AC geometry; the scan router mirrors libjpeg's
jdphuff.c structure) and reconstruct once at EOI.  Arithmetic coding,
12-bit, lossless and hierarchical modes raise ValueError — at deployment
scale those route through pillow/libjpeg; the counted reject lane stays
honest about them.

Encoder (``encode_jpeg``): baseline 4:4:4 for 1- or 3-channel uint8
arrays, quality-scaled Annex-K quantization matrices, and SELF-BUILT
flat-length canonical Huffman tables (12 DC symbols at 4 bits, 162 AC
run/size symbols at 8 bits) written into DHT — valid per the spec, a few
percent less compact than the Annex-K defaults, and deliberately
independent of them: the decoder must reconstruct whatever canonical
tables the DHT declares, so round-trip tests cannot silently rely on a
shared hard-coded table.

Entropy coding is per-blob sequential Python by design: callers are the
Arrow-batched mapInPandas lanes in operators/multimodal.py, where the
blobs are thumbnail-scale.  The numpy IDCT/DCT does the arithmetic-heavy
part vectorized per block.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_MAGIC = b"\xff\xd8\xff"


def _zigzag_order() -> list[int]:
    """Scan-order index i → raster position (row*8+col), the standard
    zigzag walk (generated, not transcribed — no typo surface)."""
    order, r, c = [], 0, 0
    for _ in range(64):
        order.append(r * 8 + c)
        if (r + c) % 2 == 0:  # heading up-right
            if c == 7:
                r += 1
            elif r == 0:
                c += 1
            else:
                r -= 1
                c += 1
        else:  # heading down-left
            if r == 7:
                c += 1
            elif c == 0:
                r += 1
            else:
                r += 1
                c -= 1
    return order


_ZIGZAG = _zigzag_order()
_UNZIGZAG = np.argsort(np.array(_ZIGZAG))  # raster position → scan index


def _dct_basis() -> np.ndarray:
    """Orthonormal 8×8 DCT-II matrix A: forward F = A·f·Aᵀ, inverse
    f = Aᵀ·F·A (A·Aᵀ = I)."""
    n = np.arange(8)
    a = np.cos((2 * n[None, :] + 1) * n[:, None] * np.pi / 16) / 2.0
    a[0, :] = 1.0 / (2.0 * np.sqrt(2.0))
    return a


_A = _dct_basis()

# Annex-K base quantization matrices (public ITU T.81 Table K.1/K.2),
# raster order.
_Q_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex-K base table."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * s + 50) // 100, 1, 255).astype(np.int64)


# -- Huffman ------------------------------------------------------------------


def _canonical_codes(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """(length, code) → symbol from a DHT's BITS/HUFFVAL declaration —
    the canonical assignment of T.81 Annex C."""
    table: dict[tuple[int, int], int] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            if k >= len(values):
                raise ValueError("DHT declares more codes than values")
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first bit reader over unstuffed entropy bytes."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("truncated JPEG entropy data")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: dict[tuple[int, int], int]) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy data")


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map a t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# -- decoder ------------------------------------------------------------------


def decode_jpeg(content: bytes):
    """Decode a baseline OR progressive (SOF2) JFIF blob.  Returns
    (width, height, channels, pixels) with pixels an (h, w, channels)
    uint8 array — the same contract as ``multimodal.decode_png``.
    Progressive images accumulate coefficients across every SOS scan
    (spectral selection + successive approximation, DC/AC first and
    refinement passes, EOB runs) and reconstruct once at EOI.  Raises
    ValueError for non-JPEG bytes, truncated/malformed streams, and the
    remaining unsupported modes (arithmetic coding, lossless,
    hierarchical, 12-bit) — NEVER struct.error/IndexError, so callers'
    reject lanes (multimodal `except ValueError`) catch every bad blob."""
    try:
        return _decode_jpeg(content)
    except (struct.error, IndexError) as e:
        # truncated segment headers surface as short-buffer unpacks or
        # out-of-range byte indexing deep in the parser; normalize them
        # to the documented contract
        raise ValueError(f"malformed JPEG stream: {e}") from e


def _decode_jpeg(content: bytes):
    if not content.startswith(JPEG_MAGIC):
        raise ValueError("not a JPEG blob")
    qt: dict[int, np.ndarray] = {}  # id → 64 ints, SCAN order
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → code table
    frame = None  # (height, width, comps)
    progressive = False
    coeffs = None  # cid → (bh_pad, bw_pad, 64) int array, SCAN order
    restart_interval = 0
    pos = 2
    n = len(content)
    while pos + 4 <= n:
        if content[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = content[pos + 1]
        pos += 2
        if marker == 0xFF:  # fill byte (T.81 allows FF padding) — re-sync
            pos -= 1
            continue
        if marker == 0xD9:  # EOI before any scan
            break
        (seglen,) = struct.unpack(">H", content[pos : pos + 2])
        if seglen < 2 or pos + seglen > n:
            raise ValueError("truncated JPEG segment")
        seg = content[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT
            s = 0
            while s < len(seg):
                pq, tq = seg[s] >> 4, seg[s] & 0x0F
                s += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[s : s + 64], dtype=np.uint8).astype(np.int64)
                    s += 64
                elif pq == 1:
                    tbl = np.frombuffer(seg[s : s + 128], dtype=">u2").astype(np.int64)
                    s += 128
                else:
                    raise ValueError(f"bad DQT precision {pq}")
                if len(tbl) != 64:
                    raise ValueError("truncated DQT table")
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            s = 0
            while s + 17 <= len(seg):
                tc, th = seg[s] >> 4, seg[s] & 0x0F
                bits = list(seg[s + 1 : s + 17])
                nv = sum(bits)
                values = seg[s + 17 : s + 17 + nv]
                if len(values) != nv:
                    raise ValueError("truncated DHT values")
                huff[(tc, th)] = _canonical_codes(bits, values)
                s += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/SOF1 sequential, SOF2 prog.
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                h, v = hv >> 4, hv & 0x0F
                if not (1 <= h <= 2 and 1 <= v <= 2):
                    raise ValueError(f"unsupported sampling factors {h}x{v}")
                comps.append({"id": cid, "h": h, "v": v, "tq": tq})
            if width == 0 or height == 0:
                raise ValueError("empty JPEG frame")
            frame = (height, width, comps)
            progressive = marker == 0xC2
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline/extended-sequential and progressive JPEG "
                "are supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not progressive:
                return _decode_scan(
                    content, pos, seg, frame, qt, huff, restart_interval
                )
            if coeffs is None:
                coeffs = _alloc_coeffs(frame)
            pos = _decode_progressive_scan(
                content, pos, seg, frame, huff, coeffs, restart_interval
            )
        # APPn / COM / others: skipped
    if coeffs is not None:
        return _reconstruct(frame, qt, coeffs)
    raise ValueError("JPEG has no scan data")


def _entropy_segments(content: bytes, pos: int) -> tuple[list[bytes], int]:
    """Unstuff FF00, split on RSTn, stop at the next marker; returns
    (restart-delimited segments, position of the terminating marker)."""
    segments: list[bytes] = []
    cur = bytearray()
    i, n = pos, len(content)
    while i < n:
        b = content[i]
        if b == 0xFF:
            nxt = content[i + 1] if i + 1 < n else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _decode_scan(content, pos, sos, frame, qt, huff, restart_interval):
    height, width, comps = frame
    ns = sos[0]
    if ns != len(comps):
        raise ValueError("non-interleaved JPEG scans are not supported")
    tables = {}
    for i in range(ns):
        cid, tt = sos[1 + 2 * i : 3 + 2 * i]
        tables[cid] = (tt >> 4, tt & 0x0F)
    segments, _ = _entropy_segments(content, pos)

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    }
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        dc_t, ac_t = tables[c["id"]]
        if (0, dc_t) not in huff or (1, ac_t) not in huff:
            raise ValueError("missing Huffman table for scan component")

    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {c["id"]: 0 for c in comps}
    n_mcu = mcux * mcuy
    for m in range(n_mcu):
        if restart_interval and m and m % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {c["id"]: 0 for c in comps}
        my, mx = divmod(m, mcux)
        for c in comps:
            dc_t, ac_t = tables[c["id"]]
            dct, act = huff[(0, dc_t)], huff[(1, ac_t)]
            q = qt[c["tq"]]
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    t = reader.read_huff(dct)
                    if t > 11:
                        raise ValueError("bad DC category")
                    pred[c["id"]] += _extend(reader.read_bits(t), t)
                    zz[0] = pred[c["id"]]
                    k = 1
                    while k < 64:
                        rs = reader.read_huff(act)
                        r, s = rs >> 4, rs & 0x0F
                        if s == 0:
                            if r == 15:  # ZRL: 16 zeros
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("AC coefficient index overflow")
                        zz[k] = _extend(reader.read_bits(s), s)
                        k += 1
                    block = np.zeros(64, dtype=np.float64)
                    block[_ZIGZAG] = zz * q  # dequant + dezigzag
                    px = _A.T @ block.reshape(8, 8) @ _A + 128.0
                    y0 = (my * c["v"] + by) * 8
                    x0 = (mx * c["h"] + bx) * 8
                    planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px

    out = []
    for c in comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:height, :width])
    if len(out) == 1:
        pixels = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return width, height, 1, pixels
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pixels = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return width, height, 3, pixels


# -- progressive decoder ------------------------------------------------------


def _frame_geometry(frame):
    """(hmax, vmax, mcux, mcuy) + per-component padded/used block grids."""
    height, width, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    grids = {}
    for c in comps:
        cw = -(-width * c["h"] // hmax)  # comp samples (T.81 A.1.1)
        ch = -(-height * c["v"] // vmax)
        grids[c["id"]] = {
            "bw_pad": mcux * c["h"],
            "bh_pad": mcuy * c["v"],
            "bw_used": -(-cw // 8),
            "bh_used": -(-ch // 8),
        }
    return hmax, vmax, mcux, mcuy, grids


def _alloc_coeffs(frame):
    """Per-component coefficient store (padded MCU grid, SCAN order)."""
    _, _, _, _, grids = _frame_geometry(frame)
    return {
        cid: np.zeros((g["bh_pad"], g["bw_pad"], 64), dtype=np.int64)
        for cid, g in grids.items()
    }


def _decode_progressive_scan(
    content, pos, sos, frame, huff, coeffs, restart_interval
):
    """One SOS of a progressive frame: route each data unit to the right
    pass (DC/AC × first/refinement — T.81 G.1.2 / the libjpeg
    jdphuff.c structure) and accumulate into ``coeffs``.  Returns the
    stream position of the marker that ended the scan."""
    height, width, comps = frame
    by_id = {c["id"]: c for c in comps}
    ns = sos[0]
    scan_comps = []
    for i in range(ns):
        cid, tt = sos[1 + 2 * i : 3 + 2 * i]
        if cid not in by_id:
            raise ValueError("scan references unknown component")
        scan_comps.append((cid, tt >> 4, tt & 0x0F))
    ss, se, a = sos[1 + 2 * ns : 4 + 2 * ns]
    ah, al = a >> 4, a & 0x0F
    if not (0 <= ss <= se <= 63):
        raise ValueError("bad progressive spectral band")
    if ss == 0 and se != 0:
        raise ValueError("progressive scan mixes DC and AC")
    if ss > 0 and ns != 1:
        raise ValueError("progressive AC scans must be non-interleaved")

    segments, end = _entropy_segments(content, pos)
    _, _, mcux, mcuy, grids = _frame_geometry(frame)

    # the unit sequence: (cid, by, bx) per restart-counted unit
    if ns > 1:  # interleaved (DC) — frame MCU walk
        def units():
            for m in range(mcux * mcuy):
                my, mx = divmod(m, mcux)
                blocks = []
                for cid, _, _ in scan_comps:
                    c = by_id[cid]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blocks.append(
                                (cid, my * c["v"] + by, mx * c["h"] + bx)
                            )
                yield blocks
    else:
        g = grids[scan_comps[0][0]]

        def units():
            for b in range(g["bh_used"] * g["bw_used"]):
                by, bx = divmod(b, g["bw_used"])
                yield [(scan_comps[0][0], by, bx)]

    dc_tables = {}
    ac_table = None
    for cid, td, ta in scan_comps:
        if ss == 0 and ah == 0:  # DC first needs a Huffman table
            if (0, td) not in huff:
                raise ValueError("missing DC Huffman table")
            dc_tables[cid] = huff[(0, td)]
        if ss > 0:
            if (1, ta) not in huff:
                raise ValueError("missing AC Huffman table")
            ac_table = huff[(1, ta)]

    seg_idx = 0
    reader = _BitReader(segments[0])
    pred = {cid: 0 for cid, _, _ in scan_comps}
    eobrun = 0
    p1, m1 = 1 << al, -1 << al
    for u, blocks in enumerate(units()):
        if restart_interval and u and u % restart_interval == 0:
            seg_idx += 1
            if seg_idx >= len(segments):
                raise ValueError("missing JPEG restart segment")
            reader = _BitReader(segments[seg_idx])
            pred = {cid: 0 for cid, _, _ in scan_comps}
            eobrun = 0
        for cid, by, bx in blocks:
            zz = coeffs[cid][by, bx]
            if ss == 0 and ah == 0:  # DC first
                t = reader.read_huff(dc_tables[cid])
                if t > 11:
                    raise ValueError("bad DC category")
                pred[cid] += _extend(reader.read_bits(t), t)
                zz[0] = pred[cid] << al
            elif ss == 0:  # DC refinement: one appended bit per block
                if reader.read_bit():
                    zz[0] |= p1
            elif ah == 0:  # AC first (with EOB runs)
                if eobrun > 0:
                    eobrun -= 1
                    continue
                k = ss
                while k <= se:
                    rs = reader.read_huff(ac_table)
                    r, s = rs >> 4, rs & 0x0F
                    if s == 0:
                        if r == 15:  # ZRL
                            k += 16
                            continue
                        eobrun = (1 << r) - 1
                        if r:
                            eobrun += reader.read_bits(r)
                        break
                    k += r
                    if k > se:
                        raise ValueError("AC coefficient index overflow")
                    zz[k] = _extend(reader.read_bits(s), s) << al
                    k += 1
            else:  # AC refinement (libjpeg decode_mcu_AC_refine shape)
                k = ss
                if eobrun == 0:
                    while k <= se:
                        rs = reader.read_huff(ac_table)
                        r, s = rs >> 4, rs & 0x0F
                        val = 0
                        if s:
                            if s != 1:
                                raise ValueError(
                                    "bad AC refinement magnitude"
                                )
                            val = p1 if reader.read_bit() else m1
                        elif r < 15:
                            eobrun = 1 << r
                            if r:
                                eobrun += reader.read_bits(r)
                            break
                        # s == 0, r == 15: ZRL — 16 zero-history skips
                        while k <= se:
                            if zz[k] != 0:
                                if reader.read_bit() and not (zz[k] & p1):
                                    zz[k] += p1 if zz[k] >= 0 else m1
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val and k <= se:
                            zz[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if zz[k] != 0:
                            if reader.read_bit() and not (zz[k] & p1):
                                zz[k] += p1 if zz[k] >= 0 else m1
                        k += 1
                    eobrun -= 1
    return end


def _reconstruct(frame, qt, coeffs):
    """Dequantize + IDCT the accumulated coefficient store and assemble
    the image — the shared tail of the progressive path (same math as
    the baseline per-block path)."""
    height, width, comps = frame
    hmax, vmax, _, _, grids = _frame_geometry(frame)
    out = []
    for c in comps:
        if c["tq"] not in qt:
            raise ValueError(f"missing quantization table {c['tq']}")
        q = qt[c["tq"]]
        g = grids[c["id"]]
        plane = np.zeros((g["bh_pad"] * 8, g["bw_pad"] * 8), dtype=np.float64)
        store = coeffs[c["id"]]
        for by in range(g["bh_pad"]):
            for bx in range(g["bw_pad"]):
                block = np.zeros(64, dtype=np.float64)
                block[_ZIGZAG] = store[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _A.T @ block.reshape(8, 8) @ _A + 128.0
                )
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        out.append(plane[:height, :width])
    if len(out) == 1:
        pixels = np.clip(np.rint(out[0]), 0, 255).astype(np.uint8)[:, :, None]
        return width, height, 1, pixels
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pixels = np.clip(np.rint(np.stack([r, g, b], axis=2)), 0, 255).astype(np.uint8)
    return width, height, 3, pixels


# -- encoder ------------------------------------------------------------------

# Flat-length canonical tables: 12 DC categories at 4 bits, the 162
# baseline AC run/size symbols at 8 bits.  Valid DHT declarations (no
# all-ones code of length 16 is minted) — see module docstring for why
# these are NOT the Annex-K code tables.
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_BITS = [0] * 7 + [162] + [0] * 8


def _encode_table(bits: list[int], syms: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) for the encoder side of a canonical table."""
    dec = _canonical_codes(bits, bytes(syms))
    return {sym: (code, length) for (length, code), sym in dec.items()}


_DC_ENC = _encode_table(_DC_BITS, _DC_SYMS)
_AC_ENC = _encode_table(_AC_BITS, _AC_SYMS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
            self.acc &= (1 << self.nbits) - 1

    def byte_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per T.81

    def raw_marker(self, marker: int) -> None:
        """Emit a marker into the entropy stream (RSTn) — byte-aligned,
        never stuffed."""
        self.byte_align()
        self.buf += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.byte_align()
        return bytes(self.buf)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _magnitude_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(bw: _BitWriter, blk: np.ndarray, q: np.ndarray, pred: int) -> int:
    """DCT → quantize → zigzag → Huffman one 8×8 block; returns the new DC
    predictor."""
    coef = _A @ (blk - 128.0) @ _A.T
    quant = np.rint(coef / q).astype(np.int64)
    zz = quant.reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred
    s = _category(diff)
    code, length = _DC_ENC[s]
    bw.write(code, length)
    if s:
        bw.write(_magnitude_bits(diff, s), s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = _AC_ENC[0xF0]  # ZRL
            bw.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = _AC_ENC[(run << 4) | s]
        bw.write(c, ln)
        bw.write(_magnitude_bits(v, s), s)
        run = 0
    if run:
        c, ln = _AC_ENC[0x00]  # EOB
        bw.write(c, ln)
    return int(zz[0])


# Progressive AC table: every (run, size) symbol including the EOB-run
# codes 0x10..0xE0 (which baseline never uses) — flat 8-bit canonical
# lengths, 176 symbols, valid DHT space.
_AC_SYMS_PROG = [(r << 4) | s for r in range(16) for s in range(11)]
_AC_BITS_PROG = [0] * 7 + [176] + [0] * 8
_AC_ENC_PROG = _encode_table(_AC_BITS_PROG, _AC_SYMS_PROG)


class _ProgScanWriter:
    """One progressive scan's entropy state: cross-block EOB-run
    accumulation and the refinement-bit buffer (the jcphuff.c shape)."""

    def __init__(self):
        self.bw = _BitWriter()
        self.eobrun = 0
        self.be: list[int] = []

    def sym(self, s: int) -> None:
        code, ln = _AC_ENC_PROG[s]
        self.bw.write(code, ln)

    def flush_eob(self) -> None:
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            if r:
                self.bw.write(self.eobrun - (1 << r), r)
        for bit in self.be:
            self.bw.write(bit, 1)
        self.eobrun = 0
        self.be = []

    def bump_eob(self) -> None:
        self.eobrun += 1
        if self.eobrun == 0x7FFF:
            self.flush_eob()


def _prog_ac_first(w: _ProgScanWriter, zz, ss: int, se: int, al: int) -> None:
    """AC first pass: encode the point-transformed band (sign-magnitude
    shift, T.81 G.1.2.2) with ZRL and cross-block EOB runs."""
    r = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al
        if t == 0:
            r += 1
            continue
        w.flush_eob()
        emitted = True
        while r > 15:
            w.sym(0xF0)
            r -= 16
        s = _category(t)
        w.sym((r << 4) | s)
        w.bw.write(_magnitude_bits(t if v > 0 else -t, s), s)
        r = 0
    if r or not emitted:
        w.bump_eob()


def _prog_ac_refine(w: _ProgScanWriter, zz, ss: int, se: int, ah: int, al: int) -> None:
    """AC refinement pass — the correction-bit algorithm (T.81 G.1.2.3,
    structured like jcphuff.c's encode_mcu_AC_refine).  TWO bit buffers,
    exactly as libjpeg keeps them: ``br`` holds correction bits since the
    last emitted symbol of the CURRENT block (they ride after the next
    ZRL / newly-significant symbol), while ``w.be`` holds bits owned by
    the cross-block pending EOB run (emitted after the EOB symbol) —
    mixing them desynchronizes the decoder's advance loop.  Zero runs
    past the last newly-significant coefficient fold into the EOB run,
    never a ZRL."""
    tvals = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    keob = ss - 1
    for k in range(ss, se + 1):
        if tvals[k - ss] == 1:
            keob = k
    r = 0
    br: list[int] = []
    for k in range(ss, se + 1):
        t = tvals[k - ss]
        if t == 0:
            r += 1
            continue
        while r > 15 and k <= keob:
            w.flush_eob()
            w.sym(0xF0)
            r -= 16
            for bit in br:
                w.bw.write(bit, 1)
            br = []
        if t > 1:  # already significant: buffer the correction bit
            br.append(t & 1)
            continue
        # newly significant
        w.flush_eob()
        w.sym((r << 4) | 1)
        w.bw.write(1 if int(zz[k]) > 0 else 0, 1)
        for bit in br:
            w.bw.write(bit, 1)
        br = []
        r = 0
    if r > 0 or br:
        w.eobrun += 1
        w.be.extend(br)
        if w.eobrun == 0x7FFF:
            w.flush_eob()


def _encode_progressive(planes, samp, qtabs, qsel, h, w):
    """Progressive (SOF2) writer: quantize every block once, then emit
    the scan script described in ``encode_jpeg``'s docstring."""
    nch = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    coeffs = []  # per comp: (bh_pad, bw_pad, 64) quantized SCAN-order ints
    used = []  # per comp: (bh_used, bw_used)
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        pad = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        )
        q = qtabs[qsel[ci]].reshape(8, 8)
        store = np.zeros((mcuy * sv, mcux * sh, 64), dtype=np.int64)
        for by in range(mcuy * sv):
            for bx in range(mcux * sh):
                blk = pad[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                coef = _A @ (blk - 128.0) @ _A.T
                store[by, bx] = np.rint(coef / q).astype(np.int64).reshape(64)[
                    _ZIGZAG
                ]
        coeffs.append(store)
        cw, ch = -(-w * sh // hmax), -(-h * sv // vmax)
        used.append((-(-ch // 8), -(-cw // 8)))

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, q in enumerate(qtabs if nch == 3 else qtabs[:1]):
        out += seg(0xDB, bytes([tq]) + bytes(int(q[z]) for z in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i in range(nch):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += seg(0xC2, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS_PROG) + bytes(_AC_SYMS_PROG))

    def sos_header(comps: list[int], td_ta, ss, se, ah, al) -> bytes:
        body = bytes([len(comps)])
        for c in comps:
            body += bytes([c + 1, td_ta])
        return seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # scan 1: DC first, interleaved, Al=1
    out += sos_header(list(range(nch)), 0x00, 0, 0, 0, 1)
    bw = _BitWriter()
    pred = [0] * nch
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nch):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    dc = int(coeffs[ci][my * sv + by, mx * sh + bx, 0]) >> 1
                    diff = dc - pred[ci]
                    pred[ci] = dc
                    s = _category(diff)
                    code, ln = _DC_ENC[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(_magnitude_bits(diff, s), s)
    out += bw.flush()

    # scan 2: DC refinement (Ah=1 → Al=0): one appended bit per block
    out += sos_header(list(range(nch)), 0x00, 0, 0, 1, 0)
    bw = _BitWriter()
    for m in range(mcux * mcuy):
        my, mx = divmod(m, mcux)
        for ci in range(nch):
            sh, sv = samp[ci]
            for by in range(sv):
                for bx in range(sh):
                    bw.write(int(coeffs[ci][my * sv + by, mx * sh + bx, 0]) & 1, 1)
    out += bw.flush()

    # scans 3..: per-component AC spectral bands at Al=1, then refinement
    for bands in ((1, 5), (6, 63)):
        for ci in range(nch):
            out += sos_header([ci], 0x10, bands[0], bands[1], 0, 1)
            wtr = _ProgScanWriter()
            bh_used, bw_used = used[ci]
            for by in range(bh_used):
                for bx in range(bw_used):
                    _prog_ac_first(wtr, coeffs[ci][by, bx], bands[0], bands[1], 1)
            wtr.flush_eob()
            out += wtr.bw.flush()
    for ci in range(nch):
        out += sos_header([ci], 0x10, 1, 63, 1, 0)
        wtr = _ProgScanWriter()
        bh_used, bw_used = used[ci]
        for by in range(bh_used):
            for bx in range(bw_used):
                _prog_ac_refine(wtr, coeffs[ci][by, bx], 1, 63, 1, 0)
        wtr.flush_eob()
        out += wtr.bw.flush()
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg(
    pixels,
    quality: int = 90,
    *,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """Encode an (h, w, 1|3) uint8 array as baseline JFIF — or, with
    ``progressive=True``, as a progressive (SOF2) JPEG whose scan script
    exercises every progressive decode path: an interleaved DC-first scan
    at Al=1, a DC refinement scan, per-component AC spectral-selection
    scans (bands 1–5 and 6–63) at Al=1 with cross-block EOB runs, and
    per-component AC refinement scans (Ah=1 → Al=0, the correction-bit
    algorithm).  3-channel input is taken as RGB and converted to BT.601
    YCbCr; ``subsample`` uses 4:2:0 (2×2 luma sampling, chroma averaged
    over each 2×2 pixel quad); ``restart_interval`` emits DRI + RSTn
    markers every that many MCUs (baseline mode only) — these exist
    chiefly so the decoder's paths have genuine in-repo test vectors."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("encode_jpeg wants an (h, w, 1|3) uint8 array")
    h, w, nch = px.shape
    if h == 0 or w == 0:
        raise ValueError("empty image")
    if subsample and nch != 3:
        raise ValueError("4:2:0 subsampling needs a 3-channel image")
    if nch == 3:
        rgb = px.astype(np.float64)
        y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
        cb = 128.0 - 0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2]
        cr = 128.0 + 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2]
        planes = [y, cb, cr]
        qsel = [0, 1, 1]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * 3
    else:
        planes = [px[:, :, 0].astype(np.float64)]
        qsel = [0]
        samp = [(1, 1)]
    if subsample:
        # chroma planes live at half resolution: average each 2×2 quad
        he, we = h + h % 2, w + w % 2
        for i in (1, 2):
            p = np.pad(planes[i], ((0, he - h), (0, we - w)), mode="edge")
            planes[i] = (
                p.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            )
    qtabs = [_scaled_q(_Q_LUMA, quality), _scaled_q(_Q_CHROMA, quality)]
    if progressive:
        if restart_interval:
            raise ValueError(
                "restart intervals are unsupported in progressive encode"
            )
        return _encode_progressive(planes, samp, qtabs, qsel, h, w)

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")  # APP0
    used_q = qtabs if nch == 3 else qtabs[:1]
    for tq, q in enumerate(used_q):
        out += seg(0xDB, bytes([tq]) + bytes(int(q[z]) for z in _ZIGZAG))
    sof = struct.pack(">BHHB", 8, h, w, nch)
    for i in range(nch):
        sof += bytes([i + 1, (samp[i][0] << 4) | samp[i][1], qsel[i]])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nch]) + b"".join(bytes([i + 1, 0x00]) for i in range(nch))
    out += seg(0xDA, sos + bytes([0, 63, 0]))

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * sv * 8, mcux * sh * 8
        padded.append(
            np.pad(p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge")
        )
    bw = _BitWriter()
    pred = [0] * nch
    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            bw.raw_marker(0xD0 + rst % 8)
            rst += 1
            pred = [0] * nch
        my, mx = divmod(m, mcux)
        for ci in range(nch):
            sh, sv = samp[ci]
            q = qtabs[qsel[ci]].reshape(8, 8)
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    blk = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                    pred[ci] = _encode_block(bw, blk, q, pred[ci])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)
