"""Baseline JPEG (ITU-T T.81 sequential DCT) codec in pure numpy.

The container has no PIL/libjpeg, so this closes the last
NotImplementedError media path (media_codec.jpeg_dimensions gave header
dims only): a real entropy decoder — marker parse, DQT/DHT tables,
Huffman-coded MCU scan with byte unstuffing and restart markers,
dequantize, dezigzag, 8×8 IDCT, chroma upsampling, YCbCr→RGB — plus the
matching encoder used to build test fixtures and synthetic-media sinks.

Supported on decode: SOF0/SOF1 (baseline / extended sequential), 8-bit
precision, 1- or 3-component scans, any sampling factors ≤ 4, 8/16-bit
quantization tables, restart intervals. Progressive (SOF2) and the
arithmetic/hierarchical SOFs raise MediaDecodeError per row — honest,
like the rest of media_codec.

Determinism: the IDCT runs in float64 with a fixed orthonormal basis
matrix and half-up rounding (floor(x+0.5)), so decoded pixels are
bit-identical everywhere; constant-color fixtures round-trip EXACTLY
(a constant block is DC-only, and the DC path is integer end-to-end at
quantizer 1), which is what the analytic oracles pin.

Row-at-a-time byte parsing is acceptable here for the same reason as
media_codec: decode cost is dominated by payload bytes, and the
parallel axis is media objects, which Spark partitions (mapInPandas).

Reference scope note: the reference engine (dalmatinerdb/dqe) has no
media surface; this module is part of the beyond-reference
LLM-pipeline path (SURVEY.md §7 M6).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg_baseline"]

#: zigzag[i] = natural (row-major) index of the i-th coefficient in
#: zigzag scan order (T.81 figure A.6)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

#: orthonormal DCT-II basis: T[u, x] = 0.5·C(u)·cos((2x+1)uπ/16);
#: forward F = T B Tᵀ, inverse B = Tᵀ F T
_T = np.array([
    [0.5 * (1 / np.sqrt(2) if u == 0 else 1.0)
     * np.cos((2 * x + 1) * u * np.pi / 16)
     for x in range(8)]
    for u in range(8)
], dtype=np.float64)


class MediaDecodeError(ValueError):
    """Re-exported by media_codec; defined here to avoid a cycle."""


def _half_up(x: np.ndarray) -> np.ndarray:
    """Deterministic round-half-up (JPEG leaves ties unspecified; we
    pin floor(x+0.5) so fixtures and oracles replay bit-for-bit)."""
    return np.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Huffman table plumbing


def _build_decode_table(bits: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman: {(length, code): symbol}."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _build_encode_table(bits: list[int], symbols: bytes) -> dict:
    """Canonical JPEG Huffman: {symbol: (code, length)}."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _flat_table(symbols: list[int]) -> tuple[list[int], bytes]:
    """Fixed-length canonical table covering ``symbols``: every symbol
    gets a code of length ⌈log₂(n+1)⌉ — legal (incomplete tree, no
    all-ones code), trivially correct, and self-describing in DHT, so
    the decoder needs no out-of-band convention. Compression is not
    the point of the fixture encoder."""
    n = len(symbols)
    length = max(2, int(np.ceil(np.log2(n + 1))))
    bits = [0] * 16
    bits[length - 1] = n
    return bits, bytes(symbols)


# ---------------------------------------------------------------------------
# bit IO


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any non-stuffing marker (caller handles RST)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise MediaDecodeError("JPEG entropy data truncated")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2  # stuffed 0xFF data byte
            else:
                raise _MarkerReached(nxt)
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def byte_align(self) -> None:
        self.acc = 0
        self.nbits = 0


class _MarkerReached(Exception):
    def __init__(self, marker):
        self.marker = marker


def _decode_symbol(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise MediaDecodeError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map the s received bits to the signed value."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# decode


def decode_jpeg(data: bytes) -> dict:
    """Full baseline-JPEG decode → pixels + metadata (same dict shape
    as media_codec.decode_png: kind/width/height/channels/pixels/
    mean_luma). Raises MediaDecodeError for progressive (SOF2),
    arithmetic-coded, 12-bit, and malformed payloads."""
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("bad JPEG SOI")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    frame = None
    ri = 0
    pos = 2
    scan_pos = None
    scan_comps = None
    while pos + 2 <= len(data):
        if data[pos] != 0xFF:
            raise MediaDecodeError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            continue  # standalone
        (seglen,) = struct.unpack_from(">H", data, pos)
        seg = data[pos + 2 : pos + seglen]
        body_end = pos + seglen
        pos = body_end
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    zz = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    zz = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                nat = np.empty(64, dtype=np.int64)
                nat[ZIGZAG] = zz
                quant[tq] = nat
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                syms = seg[p + 17 : p + 17 + n]
                huff[(tc, th)] = _build_decode_table(bits, syms)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 / SOF1
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise MediaDecodeError(
                "progressive JPEG (SOF2) not supported — baseline "
                "sequential only"
            )
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"unsupported JPEG frame type SOF marker 0x{marker:02x}"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                scan_comps.append({"cs": cs, "td": tt >> 4, "ta": tt & 15})
            scan_pos = body_end
            break  # entropy-coded data follows
    if frame is None or scan_pos is None:
        raise MediaDecodeError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # scan order follows SOS component order
    order = []
    for sc in scan_comps:
        (c,) = [c for c in comps if c["id"] == sc["cs"]]
        order.append({**c, **sc})
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    r = _BitReader(data, scan_pos)
    Tt = _T.T
    mcu_done = 0
    my = mx = 0
    while my < mcuy:
        try:
            for c in order:
                q = quant.get(c["tq"])
                if q is None:
                    raise MediaDecodeError(f"missing DQT {c['tq']}")
                dc_t = huff.get((0, c["td"]))
                ac_t = huff.get((1, c["ta"]))
                if dc_t is None or ac_t is None:
                    raise MediaDecodeError("missing DHT for scan")
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coef = np.zeros(64, dtype=np.int64)
                        s = _decode_symbol(r, dc_t)
                        diff = _extend(r.receive(s), s) if s else 0
                        pred[c["id"]] += diff
                        coef[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(r, ac_t)
                            rr, ss = rs >> 4, rs & 15
                            if ss == 0:
                                if rr == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += rr
                            if k > 63:
                                raise MediaDecodeError("AC run past block")
                            coef[ZIGZAG[k]] = _extend(r.receive(ss), ss)
                            k += 1
                        block = (coef * q).reshape(8, 8).astype(np.float64)
                        px = Tt @ block @ _T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_done += 1
            mx += 1
            if mx == mcux:
                mx = 0
                my += 1
            if ri and mcu_done % ri == 0 and my < mcuy:
                # expect a restart marker; predictors reset
                r.byte_align()
                if r.data[r.pos] != 0xFF or not (
                    0xD0 <= r.data[r.pos + 1] <= 0xD7
                ):
                    raise MediaDecodeError("missing JPEG restart marker")
                r.pos += 2
                pred = {c["id"]: 0 for c in comps}
        except _MarkerReached as m:
            raise MediaDecodeError(
                f"unexpected marker 0x{m.marker:02x} inside JPEG scan"
            ) from None
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # nearest-neighbor chroma upsample
            p = np.repeat(np.repeat(p, fy, axis=0), fx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        pixels = np.clip(_half_up(out_planes[0]), 0, 255).astype(np.uint8)
        pixels = pixels[:, :, None]
        nch = 1
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        rch = y + 1.402 * (cr - 128.0)
        gch = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bch = y + 1.772 * (cb - 128.0)
        pixels = np.stack(
            [np.clip(_half_up(ch), 0, 255) for ch in (rch, gch, bch)], axis=2
        ).astype(np.uint8)
        nch = 3
    else:
        raise MediaDecodeError(
            f"unsupported JPEG component count {len(out_planes)}"
        )
    color = pixels.astype(np.float64)
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "channels": nch,
        "pixels": pixels if nch > 1 else pixels[:, :, 0][:, :, None],
        "mean_luma": float(color.mean()),
    }


# ---------------------------------------------------------------------------
# encode (fixture/sink half — baseline sequential, self-describing DHT)


def _rgb_to_ycbcr(px: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return y, cb, cr


def _pad_to_blocks(plane: np.ndarray, bh: int, bw: int) -> np.ndarray:
    """Edge-replicate pad to multiples of (bh, bw)."""
    h, w = plane.shape
    ph = (-h) % bh
    pw = (-w) % bw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per T.81


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(
    w: _BitWriter, coef_zz: np.ndarray, pred: int, dc_t: dict, ac_t: dict
) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = dc_t[s]
    w.write(code, ln)
    if s:
        w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_t[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_t[0x00]  # EOB
        w.write(code, ln)
    return dc


def encode_jpeg_baseline(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 pixels as a
    baseline sequential JPEG. ``quant`` is the natural-order 64-entry
    quantization table for every component (default all-ones: constant
    blocks then round-trip EXACTLY, which the analytic oracles use);
    ``subsample=(v, h)`` box-downsamples the chroma planes (2, 2) =
    4:2:0. Huffman tables are fixed-length canonical tables emitted in
    DHT (self-describing — any T.81 decoder reads them)."""
    if quant is None:
        quant = np.ones(64, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    px = np.asarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2 or px.shape[2] == 1
    sv, sh = subsample if not gray else (1, 1)
    if gray:
        planes = [px.reshape(px.shape[0], px.shape[1]).astype(np.float64)]
        factors = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px)
        if sv > 1 or sh > 1:
            def box(p):
                p = _pad_to_blocks(p, sv, sh)
                return p.reshape(
                    p.shape[0] // sv, sv, p.shape[1] // sh, sh
                ).mean(axis=(1, 3))
            cb, cr = box(cb), box(cr)
        planes = [y, cb, cr]
        factors = [(sv, sh), (1, 1), (1, 1)]
    h, w = px.shape[0], px.shape[1]
    vmax = max(f[0] for f in factors)
    hmax = max(f[1] for f in factors)
    mcuy = -(-h // (8 * vmax))
    mcux = -(-w // (8 * hmax))
    # pad each plane to its MCU grid
    padded = []
    for p, (fv, fh) in zip(planes, factors):
        padded.append(_pad_to_blocks(p, mcuy * fv * 8, mcux * fh * 8)[
            : mcuy * fv * 8, : mcux * fh * 8
        ])
    qnat = quant
    qzz = np.empty(64, dtype=np.int64)
    qzz[:] = qnat[ZIGZAG]
    # forward DCT + quantize per plane, blockwise
    coefs = []  # per plane: (by, bx) -> zigzag int64[64]
    for p, (fv, fh) in zip(padded, factors):
        H, W = p.shape
        c = {}
        for y0 in range(0, H, 8):
            for x0 in range(0, W, 8):
                blk = p[y0 : y0 + 8, x0 : x0 + 8] - 128.0
                F = _T @ blk @ _T.T
                qd = _half_up(F / qnat.reshape(8, 8)).astype(np.int64)
                c[(y0 // 8, x0 // 8)] = qd.reshape(64)[ZIGZAG]
        coefs.append(c)
    # tables: DC categories 0..11, AC symbols = EOB + ZRL + (run,size)
    dc_bits, dc_syms = _flat_table(list(range(12)))
    ac_syms_list = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    ac_bits, ac_syms = _flat_table(ac_syms_list)
    dc_t = _build_encode_table(dc_bits, dc_syms)
    ac_t = _build_encode_table(ac_bits, ac_syms)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qzz))
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i, (fv, fh) in enumerate(factors):
        sof += bytes([i + 1, (fh << 4) | fv, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_syms)
    out += seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_syms)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * ncomp
    mcu_done = 0
    rst = 0
    total = mcuy * mcux
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fv, fh) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        zz = coefs[ci][(my * fv + by, mx * fh + bx)]
                        pred[ci] = _encode_block(bw, zz, pred[ci], dc_t, ac_t)
            mcu_done += 1
            if (
                restart_interval
                and mcu_done % restart_interval == 0
                and mcu_done < total
            ):
                bw.flush()
                bw.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) & 7
                pred = [0] * ncomp
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
