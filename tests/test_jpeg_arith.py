"""Arithmetic-coded JPEG (T.81 QM coder, SOF9) — operators/jpeg_arith.

The container has no external JPEG decoder, so correctness rests on
two legs: (1) the QM coder and each statistical model round-trip in
isolation over randomized sequences, and (2) the full SOF9 pipeline
decodes bit-identically to the Huffman twin (encode_jpeg_baseline →
decode) for the same pixels, since both encoders share
_prepare_coefs and the decode back half — one equality pins the whole
arithmetic entropy layer in both directions, the same contract
test_jpeg_progressive_decodes_identical_to_baseline uses for SOF2.
"""

import numpy as np
import pytest

from dqe_spark.operators import jpeg_codec as J
from dqe_spark.operators.jpeg_arith import (
    AC_STAT_BINS,
    DC_STAT_BINS,
    _ArithDecoder,
    _ArithEncoder,
    _decode_ac_block,
    _decode_dc,
    _encode_ac_block,
    _encode_dc,
    _QE,
    encode_jpeg_arith,
)


def test_qe_table_invariants():
    """Structural sanity of the T.81 Table D.3 transcription: 113
    adaptive rows + the fixed sign bin; probabilities below 0x8000;
    transitions in range; the fixed bin is a self-loop without MPS
    switch; switches only occur on the fastest-attenuation rows."""
    assert len(_QE) == 114
    for i, (qe, nmps, nlps, sw) in enumerate(_QE):
        assert 0 < qe < 0x8000, i
        assert 0 <= nmps < 114 and 0 <= nlps < 114, i
        assert sw in (0, 1), i
        if sw:
            # an MPS switch only makes sense where Qe ≈ 0.5
            assert qe > 0x5000, i
    assert _QE[113] == (0x5A1D, 113, 113, 0)
    assert _QE[0][0] == 0x5A1D and _QE[13][0] == 0x0001


def test_qm_coder_bit_roundtrip_randomized():
    rng = np.random.RandomState(3)
    for _ in range(25):
        n = int(rng.randint(1, 500))
        nctx = int(rng.randint(1, 9))
        bits = rng.randint(0, 2, n).tolist()
        ctxs = rng.randint(0, nctx, n).tolist()
        enc = _ArithEncoder()
        st = bytearray(nctx)
        for b, c in zip(bits, ctxs):
            enc.encode(st, c, b)
        data = enc.flush() + b"\xff\xd9"
        # entropy segments must never contain a bare 0xFF
        for i, by in enumerate(data[:-2]):
            if by == 0xFF:
                assert data[i + 1] == 0x00
        dec = _ArithDecoder(data, 0)
        st2 = bytearray(nctx)
        assert [dec.decode(st2, c) for c in ctxs] == bits


def test_qm_coder_carry_and_stuffing_paths():
    """All-MPS-then-LPS runs at high-Qe states drive C toward the
    carry/0xFF regions; the round-trip must survive them."""
    for pattern in ([1] * 400, [1, 0] * 200, [0] * 50 + [1] * 350):
        enc = _ArithEncoder()
        st = bytearray(1)
        for b in pattern:
            enc.encode(st, 0, b)
        data = enc.flush() + b"\xff\xd9"
        dec = _ArithDecoder(data, 0)
        st2 = bytearray(1)
        assert [dec.decode(st2, 0) for _ in pattern] == pattern


def test_dc_model_roundtrip():
    rng = np.random.RandomState(5)
    for _ in range(10):
        diffs = rng.randint(-16000, 16000, int(rng.randint(1, 120))).tolist()
        enc = _ArithEncoder()
        st = bytearray(DC_STAT_BINS)
        ctx = 0
        for d in diffs:
            ctx = _encode_dc(enc, st, ctx, int(d), 0, 1)
        dec = _ArithDecoder(enc.flush() + b"\xff\xd9", 0)
        st2 = bytearray(DC_STAT_BINS)
        ctx = 0
        out = []
        for _ in diffs:
            v, ctx = _decode_dc(dec, st2, ctx, 0, 1)
            out.append(v)
        assert out == diffs


def test_ac_model_roundtrip():
    rng = np.random.RandomState(6)
    for _ in range(10):
        blocks = []
        for _ in range(int(rng.randint(1, 25))):
            zz = np.zeros(64, np.int64)
            for _ in range(int(rng.randint(0, 24))):
                zz[int(rng.randint(1, 64))] = int(rng.randint(-3000, 3000))
            blocks.append(zz)
        enc = _ArithEncoder()
        st = bytearray(AC_STAT_BINS)
        fx = bytearray([113])
        for zz in blocks:
            _encode_ac_block(enc, st, fx, zz, 5)
        dec = _ArithDecoder(enc.flush() + b"\xff\xd9", 0)
        st2 = bytearray(AC_STAT_BINS)
        fx2 = bytearray([113])
        for zz in blocks:
            out = np.zeros(64, np.int64)
            _decode_ac_block(dec, st2, fx2, out, 5)
            assert np.array_equal(out[1:], zz[1:])


def test_arith_decodes_identical_to_baseline():
    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(encode_jpeg_arith(gray))["pixels"],
        J.decode_jpeg(J.encode_jpeg_baseline(gray))["pixels"],
    )
    rgb = rng.integers(0, 256, size=(22, 27, 3), dtype=np.uint8)
    for sub in ((1, 1), (2, 2), (2, 1)):
        assert np.array_equal(
            J.decode_jpeg(encode_jpeg_arith(rgb, subsample=sub))["pixels"],
            J.decode_jpeg(J.encode_jpeg_baseline(rgb, subsample=sub))[
                "pixels"
            ],
        ), sub
    # coarse quantization: long zero runs exercise the EOB/run bins
    q = np.full(64, 24, np.int64)
    assert np.array_equal(
        J.decode_jpeg(encode_jpeg_arith(rgb, quant=q, subsample=(2, 2)))[
            "pixels"
        ],
        J.decode_jpeg(
            J.encode_jpeg_baseline(rgb, quant=q, subsample=(2, 2))
        )["pixels"],
    )


def test_arith_restart_intervals():
    """RSTn boundaries flush the coder and reset statistics,
    predictions, and DC conditioning on both sides."""
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(24, 40), dtype=np.uint8)
    for ri in (1, 2, 5):
        assert np.array_equal(
            J.decode_jpeg(encode_jpeg_arith(px, restart_interval=ri))[
                "pixels"
            ],
            J.decode_jpeg(
                J.encode_jpeg_baseline(px, restart_interval=ri)
            )["pixels"],
        ), ri


def test_arith_12bit():
    rng = np.random.default_rng(13)
    px12 = (rng.integers(0, 4096, size=(18, 21)) & ~np.int64(15)).astype(
        np.int64
    )
    assert np.array_equal(
        J.decode_jpeg(encode_jpeg_arith(px12, precision=12))["pixels"],
        J.decode_jpeg(J.encode_jpeg_baseline(px12, precision=12))["pixels"],
    )
    with pytest.raises(ValueError):
        encode_jpeg_arith(px12, precision=10)


def test_arith_constant_image_exact():
    """The registry fixture contract: constant-gray at quantizer 1 is
    DC-only and integer end-to-end, so the decoded mean equals the
    painted constant EXACTLY — the analytic oracle for
    multimodal_jpeg_arith."""
    for c, (h, w) in ((0, (8, 8)), (42, (16, 24)), (255, (8, 32))):
        d = J.decode_jpeg(encode_jpeg_arith(np.full((h, w), c, np.uint8)))
        assert d["mean_luma"] == float(c)
        assert (d["width"], d["height"], d["channels"]) == (w, h, 1)


def test_arith_compresses_better_than_flat_huffman():
    """Not a spec requirement, but the expected behavior: adaptive
    QM coding beats the fixture's flat Huffman tables on random
    content (T.81 reports 5-10% over optimal Huffman; flat tables
    leave far more on the table)."""
    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, size=(48, 48), dtype=np.uint8)
    assert len(encode_jpeg_arith(px)) < len(J.encode_jpeg_baseline(px))


def test_arith_progressive_decodes_identical_to_baseline():
    """SOF10: the progressive arithmetic scan script (DC first at
    Al=1 → DC refine via the fixed bin → per-component AC first at
    Al=1 → AC refine with its own EOB/newly-significant/correction
    model) carries the same quantized coefficients as every other
    encoder, so all four JPEG flavors decode bit-identically."""
    from dqe_spark.operators.jpeg_arith import encode_jpeg_arith_progressive

    rng = np.random.default_rng(19)
    gray = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(encode_jpeg_arith_progressive(gray))["pixels"],
        J.decode_jpeg(J.encode_jpeg_baseline(gray))["pixels"],
    )
    rgb = rng.integers(0, 256, size=(21, 26, 3), dtype=np.uint8)
    for sub in ((1, 1), (2, 2), (2, 1)):
        assert np.array_equal(
            J.decode_jpeg(
                encode_jpeg_arith_progressive(rgb, subsample=sub)
            )["pixels"],
            J.decode_jpeg(J.encode_jpeg_baseline(rgb, subsample=sub))[
                "pixels"
            ],
        ), sub
    # coarse quantization: EOB-heavy bands exercise the refinement
    # model's kex/ke asymmetry and the empty-band corner
    q = np.full(64, 32, np.int64)
    assert np.array_equal(
        J.decode_jpeg(
            encode_jpeg_arith_progressive(rgb, quant=q, subsample=(2, 2))
        )["pixels"],
        J.decode_jpeg(
            J.encode_jpeg_baseline(rgb, quant=q, subsample=(2, 2))
        )["pixels"],
    )


def test_arith_ac_refine_model_roundtrip():
    """The AC refinement model in isolation: random partial
    coefficients (bits above Al placed), one refinement pass must
    reconstruct bit Al exactly."""
    from dqe_spark.operators.jpeg_arith import (
        _decode_ac_refine,
        _encode_ac_refine,
    )

    rng = np.random.RandomState(23)
    for _ in range(10):
        blocks = []
        for _ in range(int(rng.randint(1, 15))):
            full = np.zeros(64, np.int64)
            for _ in range(int(rng.randint(0, 20))):
                full[int(rng.randint(1, 64))] = int(rng.randint(-64, 64))
            blocks.append(full)
        enc = _ArithEncoder()
        st = bytearray(AC_STAT_BINS)
        fx = bytearray([113])
        for full in blocks:
            _encode_ac_refine(enc, st, fx, full, 1, 63, 0)
        dec = _ArithDecoder(enc.flush() + b"\xff\xd9", 0)
        st2 = bytearray(AC_STAT_BINS)
        fx2 = bytearray([113])
        for full in blocks:
            # decoder starts from the prior-stage state: bit 0 cleared
            part = np.array(
                [(abs(v) >> 1 << 1) * (1 if v >= 0 else -1) for v in full],
                np.int64,
            )
            _decode_ac_refine(dec, st2, fx2, part, 1, 63, 0)
            assert np.array_equal(part[1:], full[1:])
