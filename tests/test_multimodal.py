"""Real media decode: codec round-trips (pure numpy/stdlib) and the
Arrow-batched mapInPandas decode path over mixed modalities."""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pytest

from dqe_spark.operators import media_codec as mc


def _wav_bytes(samples: np.ndarray, sr: int = 8000, ch: int = 1) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((samples * 32767).astype("<i2").tobytes())
    return buf.getvalue()


def _bmp_bytes(pixels: np.ndarray) -> bytes:
    """Minimal 24-bpp bottom-up BMP writer (tests only)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    rows = b""
    for y in range(h - 1, -1, -1):  # bottom-up
        row = pixels[y, :, ::-1].astype(np.uint8).tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(rows), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(rows), 2835, 2835, 0, 0)
    return header + info + rows


def test_wav_roundtrip():
    sine = np.sin(np.linspace(0, 40 * np.pi, 4000))
    d = mc.decode_wav(_wav_bytes(sine, sr=8000))
    assert d["kind"] == "audio" and d["sample_rate"] == 8000
    assert d["channels"] == 1 and d["n_samples"] == 4000
    assert d["duration_ms"] == 500
    # RMS of a full-scale sine is 1/sqrt(2)
    assert abs(d["rms"] - 1 / np.sqrt(2)) < 0.01


def test_png_roundtrip_all_channel_counts():
    rng = np.random.default_rng(7)
    for nch in (1, 2, 3, 4):
        px = rng.integers(0, 256, size=(13, 17, nch), dtype=np.uint8)
        d = mc.decode_png(mc.encode_png(px))
        assert (d["width"], d["height"], d["channels"]) == (17, 13, nch)
        assert np.array_equal(d["pixels"], px)


def test_png_all_filter_types():
    """Hand-built IDAT exercising filters 1 (Sub), 2 (Up), 3 (Average),
    4 (Paeth) against a reference unfilter done longhand."""
    import zlib

    w, h = 5, 4
    rng = np.random.default_rng(3)
    truth = rng.integers(0, 256, size=(h, w), dtype=np.uint8)

    def filt(y, ftype):
        row = truth[y].astype(int)
        prev = truth[y - 1].astype(int) if y else np.zeros(w, int)
        out = []
        for x in range(w):
            left = row[x - 1] if x else 0
            ul = prev[x - 1] if x else 0
            if ftype == 1:
                out.append((row[x] - left) % 256)
            elif ftype == 2:
                out.append((row[x] - prev[x]) % 256)
            elif ftype == 3:
                out.append((row[x] - (left + prev[x]) // 2) % 256)
            else:
                out.append((row[x] - mc._paeth(left, prev[x], ul)) % 256)
        return bytes([ftype] + out)

    raw = b"".join(filt(y, f) for y, f in enumerate((1, 2, 3, 4)))

    def chunk(ctype, payload):
        crc = zlib.crc32(ctype + payload) & 0xFFFFFFFF
        return struct.pack(">I", len(payload)) + ctype + payload + struct.pack(">I", crc)

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    d = mc.decode_png(data)
    assert np.array_equal(d["pixels"][:, :, 0], truth)


def test_bmp_roundtrip():
    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, size=(6, 7, 3), dtype=np.uint8)
    d = mc.decode_bmp(_bmp_bytes(px))
    assert (d["width"], d["height"]) == (7, 6)
    assert np.array_equal(d["pixels"], px)


def test_jpeg_dimensions():
    # SOI + minimal SOF0 segment: precision 8, 480x640, 3 components
    sof = b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * 3, 8, 480, 640, 3) + b"\x01\x11\x00\x02\x11\x00\x03\x11\x00"
    d = mc.jpeg_dimensions(b"\xff\xd8" + sof + b"\xff\xd9")
    assert (d["width"], d["height"], d["channels"]) == (640, 480, 3)


def test_resize_nearest():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    small = mc.resize_nearest(px, 2, 2)
    assert small.shape == (2, 2) and small[0, 0] == px[0, 0]
    big = mc.resize_nearest(px, 8, 8)
    assert big.shape == (8, 8) and big[7, 7] == px[3, 3]


def test_decode_media_dispatch_errors():
    with pytest.raises(NotImplementedError):
        mc.decode_media(b"\x00" * 16, "video/mp4")
    with pytest.raises(mc.MediaDecodeError):
        mc.decode_media(b"not a png", "image/png")


def test_decode_media_features_mixed(spark):
    """End-to-end mapInPandas over a mixed-modality binary table: real
    WAV + PNG + an undecodable type in one batch; per-row errors, no
    batch failure; byte features always present."""
    from dqe_spark.operators.multimodal import decode_media_features

    wav = _wav_bytes(np.full(1600, 0.5), sr=1600)  # 1 s, constant 0.5
    png = mc.encode_png(np.full((4, 4, 3), 100, dtype=np.uint8))
    rows = [
        (1, bytearray(wav), "audio/wav"),
        (2, bytearray(png), "image/png"),
        (3, bytearray(b"\x00\x01\x02"), "video/mp4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary, media_type string")
    out = {r["doc_id"]: r for r in decode_media_features(df).collect()}
    assert out[1]["kind"] == "audio" and out[1]["duration_ms"] == 1000
    assert abs(out[1]["rms"] - 0.5) < 0.001 and out[1]["error"] is None
    assert out[2]["kind"] == "image" and (out[2]["width"], out[2]["height"]) == (4, 4)
    assert abs(out[2]["mean_luma"] - 100.0) < 1e-9
    assert out[3]["kind"] is None and "no in-container decoder" in out[3]["error"]
    assert all(r["n_bytes"] > 0 and r["digest"] for r in out.values())


def test_resize_images_end_to_end(spark):
    """Real resize through the engine: PNG and BMP payloads come back
    as normalized PNGs at the target size with exact nearest-neighbor
    pixels; undecodable payloads keep their row with an error."""
    import numpy as np

    from dqe_spark.operators import media_codec as mc
    from dqe_spark.operators.multimodal import resize_images

    px = np.arange(8 * 6 * 3, dtype=np.uint8).reshape(6, 8, 3)
    rows = [
        (1, bytearray(mc.encode_png(px))),
        (2, bytearray(_wav_bytes(np.zeros(16, dtype=np.int16)))),  # not an image
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r for r in resize_images(df, 4, 3).collect()}

    ok = out[1]
    assert (ok.media_type, ok.width, ok.height, ok.error) == ("image/png", 4, 3, None)
    d = mc.decode_png(bytes(ok.content))
    exp = px[(np.arange(3) * 6) // 3][:, (np.arange(4) * 8) // 4]
    assert (d["pixels"] == exp).all()

    bad = out[2]
    assert bad.content is None and "PNG/BMP" in bad.error

    # area downscale preserves the global mean within rounding
    area = resize_images(df.where("doc_id = 1"), 4, 3, method="area").collect()[0]
    am = mc.decode_png(bytes(area.content))["pixels"].astype(float).mean()
    assert abs(am - float(px.mean())) < 2.0


def test_sample_frames_y4m(spark):
    """Real Y4M frame sampling: exact luma planes back out for every
    Nth frame across chroma modes; compressed video raises honestly
    into the error column; decode_media reports video metadata."""
    import numpy as np

    from dqe_spark.operators import media_codec as mc
    from dqe_spark.operators.multimodal import sample_frames

    frames = [
        np.arange(4 * 6, dtype=np.uint8).reshape(4, 6) + 10 * i
        for i in range(7)
    ]
    rows = [
        (1, bytearray(mc.encode_y4m(frames, chroma="420"))),
        (2, bytearray(mc.encode_y4m(frames[:2], chroma="444"))),
        (3, bytearray(b"\x00\x00\x00\x18ftypmp42 not a y4m")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = sample_frames(df, every_n=3).collect()
    by = {}
    for r in out:
        by.setdefault(r.doc_id, []).append(r)

    got1 = {r.frame_idx: r for r in by[1]}
    assert sorted(got1) == [0, 3, 6]
    for i in (0, 3, 6):
        d = mc.decode_png(bytes(got1[i].content))
        assert (d["pixels"][:, :, 0] == frames[i]).all()
    assert [r.frame_idx for r in by[2]] == [0]
    assert by[3][0].content is None and "Y4M" in by[3][0].error

    meta = mc.decode_media(bytes(rows[0][1]), "video/x-yuv4mpeg")
    assert meta["kind"] == "video" and meta["n_frames"] == 7
    assert meta["duration_ms"] == 7 * 1000 // 25


def test_decimate_wav():
    """Exact decimation: every Nth frame survives across channel
    counts, rate divides, malformed input raises."""
    import numpy as np
    import pytest

    from dqe_spark.operators import media_codec as mc

    mono = np.arange(100, dtype=np.int16)
    out = mc.decode_wav(mc.decimate_wav(mc.encode_wav(mono, 8000), 4))
    assert out["sample_rate"] == 2000 and out["n_samples"] == 25

    stereo = np.stack([np.arange(60), np.arange(60) * -1], axis=1).astype(
        np.int16
    )
    b = mc.decimate_wav(mc.encode_wav(stereo.reshape(-1), 44100, channels=2), 3)
    d = mc.decode_wav(b)
    assert d["channels"] == 2 and d["n_samples"] == 20
    assert d["sample_rate"] == 44100 // 3
    # frames kept intact: first kept frame is (0, 0), second (3, -3)
    import io as _io
    import wave as _wave

    with _wave.open(_io.BytesIO(b), "rb") as w:
        raw = np.frombuffer(w.readframes(2), dtype="<i2").reshape(-1, 2)
    assert raw.tolist() == [[0, 0], [3, -3]]

    with pytest.raises(mc.MediaDecodeError):
        mc.decimate_wav(b"not a wav", 2)


def test_resample_audio_end_to_end(spark):
    import numpy as np

    from dqe_spark.operators import media_codec as mc
    from dqe_spark.operators.multimodal import resample_audio

    rows = [
        (1, bytearray(mc.encode_wav(np.arange(100, dtype=np.int16), 8000))),
        (2, bytearray(b"junk")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, content binary")
    out = {r.doc_id: r for r in resample_audio(df, 4).collect()}
    assert (out[1].sample_rate, out[1].n_samples) == (2000, 25)
    assert mc.decode_wav(bytes(out[1].content))["n_samples"] == 25
    assert out[2].content is None and out[2].error


def test_image_dhash_properties():
    """dHash invariants: identical images hash equal; a small luma
    perturbation moves few bits; unrelated gradients are far apart;
    re-encoding (PNG→BMP-style roundtrip) is hash-invariant."""
    import numpy as np

    from dqe_spark.operators import media_codec as mc

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h0 = mc.image_dhash(mc.encode_png(base))
    assert h0 == mc.image_dhash(mc.encode_png(base))

    tweak = base.copy()
    tweak[0, 0] = 255 - tweak[0, 0]
    h1 = mc.image_dhash(mc.encode_png(tweak))
    assert bin((h0 ^ h1) & ((1 << 64) - 1)).count("1") <= 4

    other = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    h2 = mc.image_dhash(mc.encode_png(other))
    assert bin((h0 ^ h2) & ((1 << 64) - 1)).count("1") > 10

    import pytest

    with pytest.raises(mc.MediaDecodeError):
        mc.image_dhash(b"not an image")


# -- baseline JPEG (operators/jpeg_codec) ------------------------------------


def test_jpeg_constant_roundtrip_exact():
    """Constant gray blocks are DC-only; at quantizer 1 the DC path is
    integer end-to-end, so decode(encode(c)) == c EXACTLY — the same
    analytic contract the registry oracle pins."""
    from dqe_spark.operators import jpeg_codec as J

    for c in (0, 1, 127, 128, 254, 255):
        px = np.full((16, 24), c, dtype=np.uint8)
        d = J.decode_jpeg(J.encode_jpeg_baseline(px))
        assert (d["width"], d["height"], d["channels"]) == (24, 16, 1)
        assert (d["pixels"][:, :, 0] == c).all()
        assert d["mean_luma"] == float(c)


def test_jpeg_roundtrip_error_bounds():
    """At quantizer 1 the only loss is coefficient rounding: any gray
    image round-trips within ±1; a constant-color RGB image (DC-only
    in all three planes) is exact through 4:4:4, 4:2:0 and 4:2:2
    including the color transform; restart intervals change nothing."""
    from dqe_spark.operators import jpeg_codec as J

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    d = J.decode_jpeg(J.encode_jpeg_baseline(px))
    assert np.abs(d["pixels"][:, :, 0].astype(int) - px).max() <= 1

    rgb = np.zeros((16, 16, 3), np.uint8)
    rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2] = 200, 30, 90
    for sub in ((1, 1), (2, 2), (2, 1)):
        out = J.decode_jpeg(J.encode_jpeg_baseline(rgb, subsample=sub))
        assert out["channels"] == 3
        assert np.array_equal(out["pixels"], rgb), sub

    enc = J.encode_jpeg_baseline(px, restart_interval=3)
    d2 = J.decode_jpeg(enc)
    assert np.array_equal(d2["pixels"], d["pixels"])


def test_jpeg_dispatch_and_unsupported_raises():
    """decode_media('image/jpeg') returns real pixels for all four
    DCT frame flavors (Huffman/arithmetic × sequential/progressive);
    plus exact lossless SOF3; genuinely undecodable frame types
    (arithmetic-lossless SOF11) raise MediaDecodeError per row."""
    from dqe_spark.operators import jpeg_codec as J
    from dqe_spark.operators.jpeg_arith import (
        encode_jpeg_arith,
        encode_jpeg_arith_progressive,
    )

    px = np.full((8, 8), 42, dtype=np.uint8)
    d = mc.decode_media(J.encode_jpeg_baseline(px), "image/jpeg")
    assert d["mean_luma"] == 42.0 and d["kind"] == "image"
    dp = mc.decode_media(J.encode_jpeg_progressive(px), "image/jpeg")
    assert dp["mean_luma"] == 42.0
    da = mc.decode_media(encode_jpeg_arith(px), "image/jpeg")
    assert da["mean_luma"] == 42.0
    dap = mc.decode_media(encode_jpeg_arith_progressive(px), "image/jpeg")
    assert dap["mean_luma"] == 42.0

    dl = mc.decode_media(J.encode_jpeg_lossless(px), "image/jpeg")
    assert dl["mean_luma"] == 42.0

    sof11 = (
        b"\xff\xd8"
        + b"\xff\xcb"
        + struct.pack(">HBHHB", 8 + 3, 8, 8, 8, 1)
        + b"\x01\x11\x00"
    )
    with pytest.raises(mc.MediaDecodeError, match="unsupported"):
        mc.decode_media(sof11 + b"\xff\xd9", "image/jpeg")
    # the metadata-only marker scan reads any SOF header
    sof2 = (
        b"\xff\xd8"
        + b"\xff\xc2"
        + struct.pack(">HBHHB", 8 + 3, 8, 8, 8, 1)
        + b"\x01\x11\x00"
    )
    dims = mc.jpeg_dimensions(sof2 + b"\xff\xd9")
    assert (dims["width"], dims["height"]) == (8, 8)


def test_jpeg_progressive_decodes_identical_to_baseline():
    """SOF2 decode: the progressive encoder carries the SAME quantized
    coefficients as the baseline encoder (DC Al=1 + refinement, AC
    spectral band at Al=1 with EOB runs + the correction-bit
    refinement pass), so both payloads must decode bit-identically —
    one equality pins the whole progressive scan machine in both
    directions."""
    from dqe_spark.operators import jpeg_codec as J

    rng = np.random.default_rng(7)
    gray = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(gray))["pixels"],
        J.decode_jpeg(J.encode_jpeg_baseline(gray))["pixels"],
    )
    rgb = rng.integers(0, 256, size=(22, 27, 3), dtype=np.uint8)
    for sub in ((1, 1), (2, 2), (2, 1)):
        assert np.array_equal(
            J.decode_jpeg(J.encode_jpeg_progressive(rgb, subsample=sub))["pixels"],
            J.decode_jpeg(J.encode_jpeg_baseline(rgb, subsample=sub))["pixels"],
        ), sub
    # coarse quantization maximizes zero runs (EOB-run batching) and
    # sparse newly-significant refinements
    q = np.full(64, 24, np.int64)
    assert np.array_equal(
        J.decode_jpeg(J.encode_jpeg_progressive(rgb, quant=q, subsample=(2, 2)))["pixels"],
        J.decode_jpeg(J.encode_jpeg_baseline(rgb, quant=q, subsample=(2, 2)))["pixels"],
    )


def test_jpeg_12bit_roundtrip_and_gates():
    """12-bit extended-sequential support (round 7, the last named
    media residual): a 12-bit grayscale image on the 16-step grid
    with constant 8x8 blocks round-trips EXACTLY through SOF1
    (DC-only blocks, quantizer 1, level shift 2048, output normalized
    to uint8 by dropping 4 bits); 12-bit RGB decodes within 1 code of
    the normalized source; the illegal 12-bit-in-SOF0 combination and
    out-of-range samples raise."""
    import numpy as np
    import pytest

    from dqe_spark.operators.jpeg_codec import (
        MediaDecodeError,
        decode_jpeg,
        encode_jpeg_baseline,
    )

    # constant 8x8 blocks, values on the 16-step grid
    base = (np.arange(4) * 1040).astype(np.int64)  # 0, 1040, 2080, 3120
    gray = np.repeat(np.repeat(base.reshape(2, 2), 8, 0), 8, 1)
    data = encode_jpeg_baseline(gray, precision=12)
    assert b"\xff\xc1" in data and b"\xff\xc0" not in data  # SOF1, not SOF0
    out = decode_jpeg(data)
    assert out["width"] == out["height"] == 16 and out["channels"] == 1
    assert np.array_equal(out["pixels"][:, :, 0], (gray >> 4).astype(np.uint8))

    # 12-bit RGB (smooth gradient): decode close to the >>4 source
    yy, xx = np.mgrid[0:16, 0:16]
    rgb = np.stack(
        [(yy * 255 + 16) % 4096, (xx * 233) % 4096, (yy * 31 + xx * 57) % 4096],
        axis=2,
    ).astype(np.int64)
    out = decode_jpeg(encode_jpeg_baseline(rgb, precision=12))
    assert out["channels"] == 3
    assert np.abs(
        out["pixels"].astype(np.int64) - (rgb >> 4)
    ).max() <= 2  # DCT + color-transform rounding, normalized domain

    # determinism: byte-identical encode, bit-identical decode
    assert encode_jpeg_baseline(rgb, precision=12) == encode_jpeg_baseline(
        rgb, precision=12
    )

    # gates: 12-bit SOF0 is illegal; out-of-range samples refused
    bad = bytearray(data)
    i = bytes(bad).index(b"\xff\xc1")
    bad[i + 1] = 0xC0  # flip the SOF1 marker to SOF0
    with pytest.raises(MediaDecodeError, match="SOF0"):
        decode_jpeg(bytes(bad))
    with pytest.raises(ValueError, match="out of range"):
        encode_jpeg_baseline(np.full((8, 8), 5000), precision=12)
    with pytest.raises(ValueError, match="8 or 12"):
        encode_jpeg_baseline(gray, precision=10)


def test_jpeg_lossless_roundtrip_exact():
    """SOF3 lossless: decode must reproduce the input samples EXACTLY
    for every predictor selection, gray and RGB, and the precision
    ladder (8/12/16-bit with the uint8 normalization contract)."""
    from dqe_spark.operators import jpeg_codec as J

    rng = np.random.default_rng(29)
    gray = rng.integers(0, 256, size=(19, 23), dtype=np.uint8)
    rgb = rng.integers(0, 256, size=(11, 13, 3), dtype=np.uint8)
    for pred in range(1, 8):
        d = J.decode_jpeg(J.encode_jpeg_lossless(gray, predictor=pred))
        assert np.array_equal(d["pixels"][:, :, 0], gray), pred
        d3 = J.decode_jpeg(J.encode_jpeg_lossless(rgb, predictor=pred))
        assert np.array_equal(d3["pixels"], rgb), pred
        assert d3["channels"] == 3
    px16 = rng.integers(0, 65536, size=(9, 8)).astype(np.int64)
    d = J.decode_jpeg(J.encode_jpeg_lossless(px16, precision=16))
    assert np.array_equal(d["pixels"][:, :, 0], (px16 >> 8).astype(np.uint8))
    with pytest.raises(ValueError):
        J.encode_jpeg_lossless(gray, predictor=0)
    with pytest.raises(ValueError):
        J.encode_jpeg_lossless(gray, precision=17)
