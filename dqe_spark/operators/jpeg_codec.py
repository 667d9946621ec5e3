"""JPEG (ITU-T T.81) codec in pure numpy — baseline AND progressive.

The container has no PIL/libjpeg, so this closes the media path that
media_codec.jpeg_dimensions only metadata-scanned: a real entropy
decoder — marker parse, DQT/DHT tables, Huffman-coded scans with byte
unstuffing and restart markers, dequantize, dezigzag, 8×8 IDCT, chroma
upsampling, YCbCr→RGB — plus matching encoders used to build test
fixtures and synthetic-media sinks.

Decode supports:
  * SOF0/SOF1 — baseline / extended sequential, 1- or 3-component
    interleaved scans, any sampling factors ≤ 4, restart intervals;
  * SOF2 — PROGRESSIVE: multiple scans refining a persistent
    per-component coefficient store, with spectral selection (Ss/Se),
    successive approximation (Ah/Al) for both DC and AC (including
    the AC refinement correction-bit algorithm, T.81 G.1.2.3), EOB
    runs (EOBn), non-interleaved per-component block walks, and
    restart markers resetting predictors and the EOB run;
  * SOF9/SOF10 — ARITHMETIC sequential and progressive, via the
    T.81 QM coder in operators/jpeg_arith (round 8);
  * SOF3 — LOSSLESS (Annex H): predictor + Huffman-coded modulo-2^16
    differences, exact sample round-trip, precisions 2..16;
  * 8/16-bit quantization tables, tables redefined between scans.
Hierarchical and arithmetic-lossless (SOF11) payloads raise
MediaDecodeError per row — honest, like the rest of media_codec.

Determinism: the IDCT runs in float64 with a fixed orthonormal basis
matrix and half-up rounding (floor(x+0.5)), so decoded pixels are
bit-identical everywhere; constant-color fixtures round-trip EXACTLY
(a constant block is DC-only, and the DC path is integer end-to-end at
quantizer 1), which is what the analytic oracles pin. A progressive
encode carries the SAME quantized coefficients as the baseline encode
of the same pixels, so the two decodes must be bit-identical — the
round-trip test that keeps both scan machines honest.

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

__all__ = ["decode_jpeg", "encode_jpeg_baseline",
           "encode_jpeg_progressive", "encode_jpeg_lossless"]

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
    the point of the fixture encoders."""
    n = len(symbols)
    length = max(2, int(np.ceil(np.log2(n + 1))))
    bits = [0] * 16
    bits[length - 1] = n
    return bits, bytes(symbols)


def _fixture_tables(precision: int = 8) -> tuple:
    """(dc_bits, dc_syms, ac_bits, ac_syms) shared by both encoders.
    DC: categories 0..11 (8-bit) or 0..15 (12-bit — T.81 Table F.1
    extends DIFF to ±32767). AC: EOBn symbols (r<<4 for r 0..14 —
    EOB0 is the plain EOB, the rest batch progressive EOB runs), ZRL,
    and every (run, size) pair (sizes to 10 for 8-bit samples, to 14
    for 12-bit)."""
    dc_bits, dc_syms = _flat_table(list(range(16 if precision > 8 else 12)))
    max_sz = 15 if precision > 8 else 11
    ac_syms = [r << 4 for r in range(15)] + [0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, max_sz)
    ]
    ac_bits, ac_syms_b = _flat_table(ac_syms)
    return dc_bits, dc_syms, ac_bits, ac_syms_b


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

    def expect_restart(self) -> None:
        """Consume an RSTn marker at the current (byte-aligned) point."""
        self.byte_align()
        d = self.data
        if (
            self.pos + 1 >= len(d)
            or d[self.pos] != 0xFF
            or not (0xD0 <= d[self.pos + 1] <= 0xD7)
        ):
            raise MediaDecodeError("missing JPEG restart marker")
        self.pos += 2

    def skip_to_marker(self) -> int:
        """Scan forward past any pad bytes to the next real marker;
        returns the position OF the 0xFF byte."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and d[p + 1] != 0x00:
                return p
            p += 1
        raise MediaDecodeError("JPEG scan ran past end of data")


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
# decode — scan machines


def _block_baseline(r, coef, dc_t, ac_t, pred, cid) -> None:
    s = _decode_symbol(r, dc_t)
    diff = _extend(r.receive(s), s) if s else 0
    pred[cid] += diff
    coef[0] = pred[cid]
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


def _block_ac_first(r, coef, ac_t, ss, se, al, box) -> None:
    """Progressive AC, first scan of the band (Ah=0): run-length plus
    EOBn runs; values arrive at magnitude scale 2^Al."""
    if box["eob"] > 0:
        box["eob"] -= 1
        return
    k = ss
    while k <= se:
        rs = _decode_symbol(r, ac_t)
        rr, s = rs >> 4, rs & 15
        if s == 0:
            if rr == 15:
                k += 16
                continue
            box["eob"] = (1 << rr) - 1
            if rr:
                box["eob"] += r.receive(rr)
            break
        k += rr
        if k > se:
            raise MediaDecodeError("AC run past spectral band")
        coef[ZIGZAG[k]] = _extend(r.receive(s), s) << al
        k += 1


def _refine_nonzero(r, coef, z, p1, m1) -> None:
    if r.read_bit():
        if (coef[z] & p1) == 0:  # Al bit not set yet
            coef[z] += p1 if coef[z] > 0 else m1


def _block_ac_refine(r, coef, ac_t, ss, se, al, box) -> None:
    """Progressive AC refinement (Ah=Al+1 → Al): correction bits for
    already-nonzero coefficients, newly-significant ±2^Al insertions,
    EOB runs that still carry corrections (T.81 G.1.2.3 / the
    classic jdphuff structure)."""
    p1 = 1 << al
    m1 = -(1 << al)
    k = ss
    if box["eob"] == 0:
        while k <= se:
            rs = _decode_symbol(r, ac_t)
            rr, s = rs >> 4, rs & 15
            val = 0
            if s == 0:
                if rr < 15:
                    # EOBn covers n blocks INCLUDING this one; the
                    # correction pass below consumes this block's
                    # remainder and decrements
                    box["eob"] = 1 << rr
                    if rr:
                        box["eob"] += r.receive(rr)
                    break  # EOB-run correction pass below
                # rr == 15 → ZRL: run of 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise MediaDecodeError("bad AC-refinement size")
                val = p1 if r.read_bit() else m1
            while k <= se:
                z = ZIGZAG[k]
                if coef[z] != 0:
                    _refine_nonzero(r, coef, z, p1, m1)
                else:
                    if rr == 0:
                        break
                    rr -= 1
                k += 1
            if val and k <= se:
                coef[ZIGZAG[k]] = val
            k += 1
    if box["eob"] > 0:
        while k <= se:
            z = ZIGZAG[k]
            if coef[z] != 0:
                _refine_nonzero(r, coef, z, p1, m1)
            k += 1
        box["eob"] -= 1


def _decode_scan(
    data, start, scan, frame_geo, coefs, quant, huff, ri, progressive,
    ss, se, ah, al,
) -> int:
    """Decode one scan's entropy data; returns the stream position of
    the next marker. ``scan`` carries the in-scan components (with
    their td/ta and grid geometry); coefficient stores persist across
    scans for progressive frames."""
    r = _BitReader(data, start)
    pred = {c["id"]: 0 for c in scan}
    box = {"eob": 0}
    interleaved = len(scan) > 1

    def block_of(c, by, bx):
        return coefs[c["id"]][by, bx]

    def tables(c):
        dc_t = huff.get((0, c["td"]))
        ac_t = huff.get((1, c["ta"]))
        return dc_t, ac_t

    def decode_unit_blocks(blocks):
        for c, by, bx in blocks:
            dc_t, ac_t = tables(c)
            coef = block_of(c, by, bx)
            if not progressive:
                if dc_t is None or ac_t is None:
                    raise MediaDecodeError("missing DHT for scan")
                _block_baseline(r, coef, dc_t, ac_t, pred, c["id"])
            elif ss == 0 and ah == 0:  # DC, first scan
                if dc_t is None:
                    raise MediaDecodeError("missing DC DHT for scan")
                s = _decode_symbol(r, dc_t)
                diff = _extend(r.receive(s), s) if s else 0
                pred[c["id"]] += diff
                coef[0] = pred[c["id"]] << al
            elif ss == 0:  # DC refinement: one raw bit per block
                if r.read_bit():
                    coef[0] |= 1 << al
            elif ah == 0:
                if ac_t is None:
                    raise MediaDecodeError("missing AC DHT for scan")
                _block_ac_first(r, coef, ac_t, ss, se, al, box)
            else:
                if ac_t is None:
                    raise MediaDecodeError("missing AC DHT for scan")
                _block_ac_refine(r, coef, ac_t, ss, se, al, box)

    try:
        if interleaved:
            mcux, mcuy = frame_geo["mcux"], frame_geo["mcuy"]
            total = mcux * mcuy
            done = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    blocks = [
                        (c, my * c["v"] + by, mx * c["h"] + bx)
                        for c in scan
                        for by in range(c["v"])
                        for bx in range(c["h"])
                    ]
                    decode_unit_blocks(blocks)
                    done += 1
                    if ri and done % ri == 0 and done < total:
                        r.expect_restart()
                        pred = {c["id"]: 0 for c in scan}
                        box["eob"] = 0
        else:
            (c,) = scan
            bw, bh = c["bw"], c["bh"]  # REAL block grid, not MCU-padded
            total = bw * bh
            done = 0
            for by in range(bh):
                for bx in range(bw):
                    decode_unit_blocks([(c, by, bx)])
                    done += 1
                    if ri and done % ri == 0 and done < total:
                        r.expect_restart()
                        pred = {c["id"]: 0 for c in scan}
                        box["eob"] = 0
    except _MarkerReached as m:
        raise MediaDecodeError(
            f"unexpected marker 0x{m.marker:02x} inside JPEG scan"
        ) from None
    return r.skip_to_marker()


def decode_jpeg(data: bytes) -> dict:
    """Full JPEG decode (baseline SOF0/SOF1, progressive SOF2, and
    ARITHMETIC SOF9/SOF10 via operators/jpeg_arith) → pixels +
    metadata (same dict shape as media_codec.decode_png:
    kind/width/height/channels/pixels/mean_luma). 12-bit (extended
    sequential SOF1/SOF9 / progressive SOF2) decodes too — level
    shift 2048, clamp 0..4095, output normalized to uint8 by dropping
    the 4 low-order bits. LOSSLESS SOF3 decodes to exact samples (no
    color transform, components as stored). Raises MediaDecodeError
    for hierarchical, arithmetic-lossless (SOF11), and malformed
    payloads (and for the illegal 12-bit SOF0 combination)."""
    if data[:2] != b"\xff\xd8":
        raise MediaDecodeError("bad JPEG SOI")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class 0=DC/1=AC, id) -> table
    dc_cond: dict[int, tuple[int, int]] = {}  # DAC: tbl -> (L, U)
    ac_cond: dict[int, int] = {}  # DAC: tbl -> Kx
    frame = None
    progressive = False
    arith = False
    lossless = False
    ll_planes: dict[int, np.ndarray] = {}
    ri = 0
    coefs: dict[int, np.ndarray] | None = None
    frame_geo: dict = {}
    any_scan = False
    pos = 2
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
        pos += seglen
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
        elif marker in (0xC0, 0xC1, 0xC2, 0xC9, 0xCA):  # SOF0/1/2/9/10
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec not in (8, 12):
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            if prec == 12 and marker == 0xC0:
                # T.81 baseline is 8-bit only; 12-bit rides extended
                # sequential (SOF1/SOF9) or progressive (SOF2/SOF10)
                raise MediaDecodeError("12-bit sample precision in SOF0")
            progressive = marker in (0xC2, 0xCA)
            arith = marker in (0xC9, 0xCA)
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prec": prec}
        elif marker == 0xC3:  # SOF3: lossless (Annex H)
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if not 2 <= prec <= 16:
                raise MediaDecodeError(f"unsupported JPEG precision {prec}")
            lossless = True
            comps = []
            for i in range(nc):
                cid, hv, tq = struct.unpack_from(">BBB", seg, 6 + 3 * i)
                if hv != 0x11:
                    raise MediaDecodeError(
                        "subsampled lossless JPEG unsupported"
                    )
                comps.append({"id": cid, "h": 1, "v": 1, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps, "prec": prec}
        elif marker in (0xC5, 0xC6, 0xC7, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise MediaDecodeError(
                f"unsupported JPEG frame type SOF marker 0x{marker:02x}"
            )
        elif marker == 0xCC:  # DAC: arithmetic conditioning (B.2.4.3)
            p = 0
            while p + 1 < len(seg):
                tc, tb = seg[p] >> 4, seg[p] & 15
                cs = seg[p + 1]
                p += 2
                if tc == 0:
                    dc_cond[tb] = (cs & 0x0F, cs >> 4)  # (L, U)
                else:
                    ac_cond[tb] = cs  # Kx
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise MediaDecodeError("JPEG SOS before SOF")
            comps = frame["comps"]
            if lossless:
                if ri:
                    raise MediaDecodeError(
                        "restart intervals in lossless JPEG unsupported"
                    )
                ns = seg[0]
                scan = []
                for i in range(ns):
                    cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                    (c,) = [c for c in comps if c["id"] == cs]
                    scan.append({**c, "td": tt >> 4})
                psel = seg[1 + 2 * ns]
                pt = seg[3 + 2 * ns] & 15
                for c in scan:
                    ll_planes.setdefault(
                        c["id"],
                        np.zeros((frame["h"], frame["w"]), np.int64),
                    )
                pos = _decode_scan_lossless(
                    data, pos, scan, frame, huff, psel, pt, ll_planes
                )
                frame["pt"] = pt
                any_scan = True
                continue
            if coefs is None:
                w, h = frame["w"], frame["h"]
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                frame_geo = {"mcux": mcux, "mcuy": mcuy,
                             "hmax": hmax, "vmax": vmax}
                for c in comps:
                    # real (non-interleaved) block grid of the component
                    cw = -(-w * c["h"] // hmax)
                    ch = -(-h * c["v"] // vmax)
                    c["bw"] = -(-cw // 8)
                    c["bh"] = -(-ch // 8)
                coefs = {
                    c["id"]: np.zeros(
                        (mcuy * c["v"], mcux * c["h"], 64), np.int64
                    )
                    for c in comps
                }
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                (c,) = [c for c in comps if c["id"] == cs]
                scan.append({**c, "td": tt >> 4, "ta": tt & 15})
            ss, se, a = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            ah, al = a >> 4, a & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            if arith and progressive:
                from dqe_spark.operators import jpeg_arith

                pos = jpeg_arith.decode_scan_arith_progressive(
                    data, pos, scan, frame_geo, coefs, ri,
                    dc_cond, ac_cond, ss, se, ah, al,
                )
            elif arith:
                from dqe_spark.operators import jpeg_arith

                pos = jpeg_arith.decode_scan_arith(
                    data, pos, scan, frame_geo, coefs, ri,
                    dc_cond, ac_cond,
                )
            else:
                pos = _decode_scan(
                    data, pos, scan, frame_geo, coefs, quant, huff, ri,
                    progressive, ss, se, ah, al,
                )
            any_scan = True
        # else: APPn/COM/DNL — skipped
    if frame is None or not any_scan:
        raise MediaDecodeError("JPEG missing SOF/SOS")
    comps = frame["comps"]
    w, h = frame["w"], frame["h"]
    prec = frame.get("prec", 8)
    if lossless:
        # exact samples, no color transform (T.81 defines none for
        # lossless); normalize to uint8 by dropping extra precision
        pt = frame.get("pt", 0)
        planes = [
            (ll_planes[c["id"]] << pt) for c in comps
            if c["id"] in ll_planes
        ]
        if len(planes) != len(comps):
            raise MediaDecodeError("lossless JPEG scan missing components")
        wide = np.stack(planes, axis=2)
        pixels = (
            (wide >> (prec - 8)).astype(np.uint8) if prec > 8
            else wide.astype(np.uint8)
        )
        return {
            "kind": "image",
            "width": w,
            "height": h,
            "channels": len(planes),
            "pixels": pixels,
            "mean_luma": float(pixels.astype(np.float64).mean()),
        }
    half = float(1 << (prec - 1))
    maxv = (1 << prec) - 1
    hmax, vmax = frame_geo["hmax"], frame_geo["vmax"]
    Tt = _T.T
    out_planes = []
    for c in comps:
        q = quant.get(c["tq"])
        if q is None:
            raise MediaDecodeError(f"missing DQT {c['tq']}")
        grid = coefs[c["id"]]
        by_n, bx_n = grid.shape[0], grid.shape[1]
        plane = np.empty((by_n * 8, bx_n * 8), np.float64)
        qm = q.reshape(8, 8).astype(np.float64)
        for by in range(by_n):
            for bx in range(bx_n):
                block = grid[by, bx].reshape(8, 8).astype(np.float64) * qm
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    Tt @ block @ _T + half
                )
        fy, fx = vmax // c["v"], hmax // c["h"]
        if fy > 1 or fx > 1:  # nearest-neighbor chroma upsample
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        out_planes.append(plane[:h, :w])
    if len(out_planes) == 1:
        wide = np.clip(_half_up(out_planes[0]), 0, maxv).astype(np.int64)
        wide = wide[:, :, None]
        nch = 1
    elif len(out_planes) == 3:
        y, cb, cr = out_planes
        rch = y + 1.402 * (cr - half)
        gch = y - 0.344136 * (cb - half) - 0.714136 * (cr - half)
        bch = y + 1.772 * (cb - half)
        wide = np.stack(
            [np.clip(_half_up(ch), 0, maxv) for ch in (rch, gch, bch)], axis=2
        ).astype(np.int64)
        nch = 3
    else:
        raise MediaDecodeError(
            f"unsupported JPEG component count {len(out_planes)}"
        )
    # the decode contract is uint8 pixels (media_codec.decode_png
    # shape); 12-bit samples normalize by dropping the 4 extra
    # low-order bits (floor — deterministic, range-exact for values
    # on the 16-step grid the 12-bit fixtures use)
    pixels = (wide >> (prec - 8)).astype(np.uint8) if prec > 8 else (
        wide.astype(np.uint8)
    )
    color = pixels.astype(np.float64)
    return {
        "kind": "image",
        "width": w,
        "height": h,
        "channels": nch,
        "pixels": pixels,
        "mean_luma": float(color.mean()),
    }


# ---------------------------------------------------------------------------
# shared encoder plumbing


def _rgb_to_ycbcr(
    px: np.ndarray, center: float = 128.0
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = px[:, :, 0].astype(np.float64)
    g = px[:, :, 1].astype(np.float64)
    b = px[:, :, 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = center - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = center + 0.5 * r - 0.418687589 * g - 0.081312411 * b
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
        if length == 0:
            return
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


def _prepare_coefs(
    pixels: np.ndarray,
    quant: np.ndarray | None,
    subsample: tuple[int, int],
    precision: int = 8,
):
    """Shared front half of both encoders: color transform, chroma
    box-downsample, MCU padding, forward DCT, quantization, zigzag.
    Returns (coefs per component: dict[(by,bx)] → zigzag int64[64],
    factors, geometry dict, quant natural + zigzag, gray flag).
    ``precision`` 8 or 12: sets the level shift (2^(P−1)), the chroma
    center and the legal sample range."""
    if quant is None:
        quant = np.ones(64, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    maxv = (1 << precision) - 1
    half = float(1 << (precision - 1))
    px = np.asarray(pixels)
    if px.min() < 0 or px.max() > maxv:
        raise ValueError(
            f"pixels out of range for {precision}-bit JPEG (0..{maxv})"
        )
    px = px.astype(np.int64)
    gray = px.ndim == 2 or px.shape[2] == 1
    sv, sh = subsample if not gray else (1, 1)
    if gray:
        planes = [px.reshape(px.shape[0], px.shape[1]).astype(np.float64)]
        factors = [(1, 1)]
    else:
        y, cb, cr = _rgb_to_ycbcr(px, center=half)
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
    qnat = quant
    qzz = qnat[ZIGZAG]
    coefs = []
    for p, (fv, fh) in zip(planes, factors):
        padded = _pad_to_blocks(p, mcuy * fv * 8, mcux * fh * 8)[
            : mcuy * fv * 8, : mcux * fh * 8
        ]
        H, W = padded.shape
        c = {}
        for y0 in range(0, H, 8):
            for x0 in range(0, W, 8):
                blk = padded[y0 : y0 + 8, x0 : x0 + 8] - half
                F = _T @ blk @ _T.T
                qd = _half_up(F / qnat.reshape(8, 8)).astype(np.int64)
                c[(y0 // 8, x0 // 8)] = qd.reshape(64)[ZIGZAG]
        coefs.append(c)
    geo = {"w": w, "h": h, "mcux": mcux, "mcuy": mcuy,
           "hmax": hmax, "vmax": vmax, "gray": gray}
    return coefs, factors, geo, qnat, qzz


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _headers(
    sof_marker: int, geo, factors, qzz, restart_interval: int,
    precision: int = 8,
) -> bytearray:
    dc_bits, dc_syms, ac_bits, ac_syms = _fixture_tables(precision)
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(v) for v in qzz))
    ncomp = 1 if geo["gray"] else 3
    sof = struct.pack(">BHHB", precision, geo["h"], geo["w"], ncomp)
    for i, (fv, fh) in enumerate(factors):
        sof += bytes([i + 1, (fh << 4) | fv, 0])
    out += _seg(sof_marker, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_syms)
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_syms)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    return out


def _sos(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])
    body += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, body)


def _encode_block_full(w, coef_zz, pred, dc_t, ac_t) -> int:
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
    precision: int = 8,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB pixels as a
    sequential JPEG. ``quant`` is the natural-order 64-entry
    quantization table for every component (default all-ones: constant
    blocks then round-trip EXACTLY, which the analytic oracles use);
    ``subsample=(v, h)`` box-downsamples the chroma planes (2, 2) =
    4:2:0. Huffman tables are fixed-length canonical tables emitted in
    DHT (self-describing — any T.81 decoder reads them).
    ``precision=12`` writes EXTENDED sequential (SOF1 — T.81 requires
    baseline SOF0 to be 8-bit): samples 0..4095, level shift 2048,
    DC categories to 15 / AC sizes to 14 in the emitted tables."""
    if precision not in (8, 12):
        raise ValueError(f"JPEG precision must be 8 or 12, got {precision}")
    coefs, factors, geo, _qnat, qzz = _prepare_coefs(
        pixels, quant, subsample, precision
    )
    dc_bits, dc_syms, ac_bits, ac_syms = _fixture_tables(precision)
    dc_t = _build_encode_table(dc_bits, dc_syms)
    ac_t = _build_encode_table(ac_bits, ac_syms)
    out = _headers(
        0xC0 if precision == 8 else 0xC1, geo, factors, qzz,
        restart_interval, precision,
    )
    ncomp = 1 if geo["gray"] else 3
    out += _sos(list(range(1, ncomp + 1)), 0, 63, 0, 0)
    bw = _BitWriter()
    pred = [0] * ncomp
    mcu_done = 0
    rst = 0
    total = geo["mcuy"] * geo["mcux"]
    for my in range(geo["mcuy"]):
        for mx in range(geo["mcux"]):
            for ci, (fv, fh) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        zz = coefs[ci][(my * fv + by, mx * fh + bx)]
                        pred[ci] = _encode_block_full(bw, zz, pred[ci], dc_t, ac_t)
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


# ---------------------------------------------------------------------------
# progressive encoder (fixture half): DC first (Al=1) → DC refine →
# per-component AC first (Al=1, EOB runs) → per-component AC refine


class _ACRefineState:
    """Pending EOB run + its buffered correction bits (jcphuff BE)."""

    def __init__(self, w: _BitWriter, ac_t: dict):
        self.w = w
        self.ac_t = ac_t
        self.eob_run = 0
        self.bits: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eob_run > 0:
            n = self.eob_run
            nb = n.bit_length() - 1
            code, ln = self.ac_t[nb << 4]
            self.w.write(code, ln)
            if nb:
                self.w.write(n - (1 << nb), nb)
            self.eob_run = 0
        for b in self.bits:
            self.w.write(b, 1)
        self.bits = []


def _encode_ac_first(st: _ACRefineState, zz, ss, se, al) -> None:
    w, ac_t = st.w, st.ac_t
    # AC point transform is on the MAGNITUDE: sign · (|v| >> Al)
    vals = [int(zz[k]) >> al if int(zz[k]) >= 0 else -((-int(zz[k])) >> al)
            for k in range(64)]
    last_nz = 0
    for k in range(se, ss - 1, -1):
        if vals[k]:
            last_nz = k
            break
    if all(vals[k] == 0 for k in range(ss, se + 1)):
        st.eob_run += 1
        if st.eob_run == 0x7FFF:
            st.flush_eobrun()
        return
    st.flush_eobrun()
    run = 0
    for k in range(ss, last_nz + 1):
        v = vals[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_t[0xF0]
            w.write(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_t[(run << 4) | s]
        w.write(code, ln)
        w.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < se:
        st.eob_run += 1
        if st.eob_run == 0x7FFF:
            st.flush_eobrun()


def _encode_ac_refine(st: _ACRefineState, zz, ss, se, al) -> None:
    """jcphuff encode_mcu_AC_refine structure: correction bits buffer
    (BE) rides along zero-history runs and EOB runs."""
    w, ac_t = st.w, st.ac_t
    absv = [abs(int(zz[k])) >> al for k in range(64)]
    eob = 0  # last newly-significant position
    for k in range(ss, se + 1):
        if absv[k] == 1:
            eob = k
    run = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            run += 1
            continue
        if t > 1:
            # already-significant: correction bit, does NOT break runs
            pending.append(abs(int(zz[k])) >> al & 1)
            continue
        # newly significant (t == 1)
        while run > 15 and k <= eob:
            st.flush_eobrun()
            code, ln = ac_t[0xF0]
            w.write(code, ln)
            run -= 16
            for b in pending:
                w.write(b, 1)
            pending = []
        st.flush_eobrun()
        code, ln = ac_t[(run << 4) | 1]
        w.write(code, ln)
        w.write(1 if int(zz[k]) > 0 else 0, 1)
        for b in pending:
            w.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        st.eob_run += 1
        st.bits.extend(pending)
        if st.eob_run == 0x7FFF:
            st.flush_eobrun()


def encode_jpeg_progressive(
    pixels: np.ndarray,
    quant: np.ndarray | None = None,
    subsample: tuple[int, int] = (1, 1),
) -> bytes:
    """Encode as PROGRESSIVE JPEG (SOF2) with a 2 + 2-per-component
    scan script exercising the full progressive machinery: interleaved
    first DC scan at Al=1, DC refinement (raw bits), per-component AC
    spectral band 1..63 at Al=1 (EOB-run batched), per-component AC
    refinement to Al=0 (correction bits). The quantized coefficients
    are IDENTICAL to encode_jpeg_baseline's, so both payloads must
    decode to bit-identical pixels — the fixture contract
    tests/test_multimodal.py pins."""
    coefs, factors, geo, _qnat, qzz = _prepare_coefs(pixels, quant, subsample)
    dc_bits, dc_syms, ac_bits, ac_syms = _fixture_tables()
    dc_t = _build_encode_table(dc_bits, dc_syms)
    ac_t = _build_encode_table(ac_bits, ac_syms)
    out = _headers(0xC2, geo, factors, qzz, 0)
    ncomp = 1 if geo["gray"] else 3
    comp_ids = list(range(1, ncomp + 1))
    mcuy, mcux = geo["mcuy"], geo["mcux"]

    # scan 1: DC first, interleaved, Al=1
    out += _sos(comp_ids, 0, 0, 0, 1)
    w = _BitWriter()
    pred = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fv, fh) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        dc = int(coefs[ci][(my * fv + by, mx * fh + bx)][0])
                        # T.81: the DC point transform is an ARITHMETIC
                        # right shift of the signed value (unlike AC's
                        # magnitude shift)
                        v = dc >> 1
                        diff = v - pred[ci]
                        pred[ci] = v
                        s = _category(diff)
                        code, ln = dc_t[s]
                        w.write(code, ln)
                        if s:
                            w.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    w.flush()
    out += w.out

    # scan 2: DC refinement Ah=1 → Al=0 (raw bits, interleaved)
    out += _sos(comp_ids, 0, 0, 1, 0)
    w = _BitWriter()
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (fv, fh) in enumerate(factors):
                for by in range(fv):
                    for bx in range(fh):
                        dc = int(coefs[ci][(my * fv + by, mx * fh + bx)][0])
                        w.write(dc & 1, 1)
    w.flush()
    out += w.out

    # per-component AC scans (non-interleaved, raster over the REAL
    # block grid of the component)
    for ci, (fv, fh) in enumerate(factors):
        cw = -(-geo["w"] * fh // geo["hmax"])
        ch = -(-geo["h"] * fv // geo["vmax"])
        bw_n, bh_n = -(-cw // 8), -(-ch // 8)
        # scan: AC 1..63 first pass at Al=1
        out += _sos([ci + 1], 1, 63, 0, 1)
        w = _BitWriter()
        st = _ACRefineState(w, ac_t)
        for by in range(bh_n):
            for bx in range(bw_n):
                _encode_ac_first(st, coefs[ci][(by, bx)], 1, 63, 1)
        st.flush_eobrun()
        w.flush()
        out += w.out
        # scan: AC refinement Ah=1 → Al=0
        out += _sos([ci + 1], 1, 63, 1, 0)
        w = _BitWriter()
        st = _ACRefineState(w, ac_t)
        for by in range(bh_n):
            for bx in range(bw_n):
                _encode_ac_refine(st, coefs[ci][(by, bx)], 1, 63, 0)
        st.flush_eobrun()
        w.flush()
        out += w.out

    out += b"\xff\xd9"
    return bytes(out)


# ---------------------------------------------------------------------------
# lossless JPEG (SOF3, T.81 Annex H): predictor + Huffman-coded
# modulo-2^16 differences — no DCT, exact sample round-trip


#: T.81 Table H.1 predictor selections (Ss field of the scan header)
def _predict(plane: np.ndarray, y: int, x: int, psel: int, default: int):
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(plane[0, x - 1])  # first line: Ra
    if x == 0:
        return int(plane[y - 1, 0])  # first column: Rb
    ra = int(plane[y, x - 1])
    rb = int(plane[y - 1, x])
    rc = int(plane[y - 1, x - 1])
    if psel == 1:
        return ra
    if psel == 2:
        return rb
    if psel == 3:
        return rc
    if psel == 4:
        return ra + rb - rc
    if psel == 5:
        return ra + ((rb - rc) >> 1)
    if psel == 6:
        return rb + ((ra - rc) >> 1)
    if psel == 7:
        return (ra + rb) >> 1
    raise MediaDecodeError(f"lossless JPEG predictor {psel} out of range")


def _decode_scan_lossless(
    data, start, scan, frame, huff, psel, pt, planes
) -> int:
    """Decode one lossless scan (interleaved h=v=1 components or a
    single component) into ``planes`` (cid → int32 (h, w)); returns
    the next-marker position. Differences are DC-style Huffman
    categories with SSSS=16 meaning 32768 and reconstruction is
    modulo 2^16 (T.81 H.1.2.1). Restart intervals are not emitted by
    the fixture encoder and rejected here — mid-line prediction reset
    semantics would otherwise be convention, not spec."""
    r = _BitReader(data, start)
    prec = frame["prec"]
    default = 1 << (prec - 1 - pt)
    h, w = frame["h"], frame["w"]

    def sample(c, y, x):
        pl = planes[c["id"]]
        t = huff.get((0, c["td"]))
        if t is None:
            raise MediaDecodeError("missing DHT for lossless scan")
        s = _decode_symbol(r, t)
        if s == 16:
            diff = 32768
        elif s:
            diff = _extend(r.receive(s), s)
        else:
            diff = 0
        pl[y, x] = (_predict(pl, y, x, psel, default) + diff) & 0xFFFF

    try:
        for y in range(h):
            for x in range(w):
                for c in scan:
                    sample(c, y, x)
    except _MarkerReached as m:
        raise MediaDecodeError(
            f"unexpected marker 0x{m.marker:02x} inside lossless scan"
        ) from None
    return r.skip_to_marker()


def encode_jpeg_lossless(
    pixels: np.ndarray,
    predictor: int = 4,
    precision: int = 8,
    point_transform: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB pixels as LOSSLESS
    JPEG (SOF3): predictor-based modulo-2^16 differences, DC-style
    Huffman categories 0..16 in a self-describing flat DHT, no color
    transform (lossless components are stored as-is — T.81 defines
    none). decode_jpeg must reproduce the input samples EXACTLY
    (shifted by ``point_transform`` if nonzero). ``precision`` up to
    16; all components full-resolution (h=v=1)."""
    if not 2 <= precision <= 16:
        raise ValueError(f"lossless precision must be 2..16: {precision}")
    if not 1 <= predictor <= 7:
        raise ValueError(f"lossless predictor must be 1..7: {predictor}")
    px = np.asarray(pixels).astype(np.int64)
    gray = px.ndim == 2
    if gray:
        px = px[:, :, None]
    h, w, ncomp = px.shape
    bits, syms = _flat_table(list(range(17)))
    enc_t = _build_encode_table(bits, syms)
    out = bytearray(b"\xff\xd8")
    sof = struct.pack(">BHHB", precision, h, w, ncomp)
    for i in range(ncomp):
        sof += bytes([i + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(bits) + syms)
    body = bytes([ncomp])
    for cid in range(1, ncomp + 1):
        body += bytes([cid, 0x00])
    body += bytes([predictor, 0, point_transform])
    out += _seg(0xDA, body)

    wtr = _BitWriter()
    default = 1 << (precision - 1 - point_transform)
    shifted = px >> point_transform
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                pred = _predict(
                    shifted[:, :, ci], y, x, predictor, default
                )
                d = (int(shifted[y, x, ci]) - pred + 32768) % 65536 - 32768
                if d == -32768:
                    code, ln = enc_t[16]
                    wtr.write(code, ln)
                    continue
                s = _category(d)
                code, ln = enc_t[s]
                wtr.write(code, ln)
                if s:
                    wtr.write(d if d >= 0 else d + (1 << s) - 1, s)
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
