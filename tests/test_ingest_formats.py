"""CSV/JSON point connectors: schema mapping, tag parsing, corrupt-row
routing."""

from __future__ import annotations

import shutil
import tempfile
from pathlib import Path

import pytest


@pytest.fixture()
def tmp():
    d = Path(tempfile.mkdtemp(prefix="dqe_ingest_"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_csv_roundtrip(spark, tmp):
    from dqe_spark.sources.ingest_formats import corrupt_records, read_points_csv

    p = tmp / "points.csv"
    p.write_text(
        "bucket,metric,ts_ms,value,confidence,tags\n"
        "events,cpu.user,1000,0.5,1.0,host=h1|dc=east\n"
        "events,cpu.user,2000,0.7,,\n"
        "events,cpu.user,not_a_ts,xx,1.0,\n"
    )
    got = read_points_csv(spark, str(p)).collect()
    assert len(got) == 2
    byts = {r["ts_ms"]: r for r in got}
    assert byts[1000]["tags"] == {"host": "h1", "dc": "east"}
    assert byts[2000]["confidence"] == 1.0  # defaulted
    assert byts[2000]["tags"] is None
    bad = corrupt_records(spark, str(p), "csv").collect()
    assert len(bad) == 1 and "not_a_ts" in bad[0][0]


def test_json_roundtrip(spark, tmp):
    from dqe_spark.sources.ingest_formats import corrupt_records, read_points_json

    p = tmp / "points.jsonl"
    p.write_text(
        '{"bucket":"events","metric":"cpu.user","ts_ms":1000,"value":0.5,'
        '"confidence":0.9,"tags":{"host":"h1"}}\n'
        '{"bucket":"events","metric":"cpu.user","ts_ms":2000,"value":1.5}\n'
        "{not json at all\n"
    )
    got = read_points_json(spark, str(p)).collect()
    assert len(got) == 2
    byts = {r["ts_ms"]: r for r in got}
    assert byts[1000]["tags"] == {"host": "h1"}
    assert byts[2000]["confidence"] == 1.0
    bad = corrupt_records(spark, str(p), "json").collect()
    assert len(bad) == 1


def test_orc_roundtrip_matches_parquet_semantics(spark, tmp_path):
    """ORC landing files normalize to the same canonical points as the
    other readers: defaults applied, schema identical."""
    from dqe_spark.sources.ingest_formats import read_points_orc

    rows = [
        ("b", "m.a", 1000, 1.5, 0.9, {"host": "h1"}),
        ("b", "m.b", 2000, 2.5, None, None),
    ]
    src = spark.createDataFrame(
        rows,
        "bucket string, metric string, ts_ms long, value double, "
        "confidence double, tags map<string,string>",
    )
    p = str(tmp_path / "landing_orc")
    src.write.orc(p)
    got = {r["metric"]: r for r in read_points_orc(spark, p).collect()}
    assert got["m.a"]["confidence"] == 0.9 and got["m.a"]["tags"] == {"host": "h1"}
    assert got["m.b"]["confidence"] == 1.0 and got["m.b"]["tags"] is None
    assert read_points_orc(spark, p).schema.simpleString() == (
        "struct<bucket:string,metric:string,ts_ms:bigint,value:double,"
        "confidence:double,tags:map<string,string>>"
    )


def test_read_media_files_binary_source(spark, tmp_path):
    """binaryFile landing: real WAV/PNG bytes (media_codec test
    vectors) land as the multimodal convention and decode end-to-end;
    unknown extensions fall back to octet-stream; the glob filter
    prunes; ids are content-addressed (md5) so a re-landed duplicate
    file maps to the same id."""
    import numpy as np
    from pyspark.sql import functions as F

    from dqe_spark.operators.media_codec import encode_png, encode_wav
    from dqe_spark.operators.multimodal import decode_media_features
    from dqe_spark.sources.ingest_formats import read_media_files

    land = tmp_path / "media"
    land.mkdir()
    png = encode_png(np.arange(4 * 3 * 3, dtype=np.uint8).reshape(3, 4, 3))
    wav = encode_wav(
        np.linspace(-3000, 3000, 64).astype(np.int16), sample_rate=8000
    )
    (land / "a.png").write_bytes(png)
    (land / "b.wav").write_bytes(wav)
    (land / "copy_of_a.png").write_bytes(png)
    (land / "notes.xyz").write_bytes(b"opaque")

    df = read_media_files(spark, str(land))
    rows = {r.src_path.rsplit("/", 1)[-1]: r for r in df.collect()}
    assert rows["a.png"].media_type == "image/png"
    assert rows["b.wav"].media_type == "audio/wav"
    assert rows["notes.xyz"].media_type == "application/octet-stream"
    assert rows["a.png"].id == rows["copy_of_a.png"].id  # content-addressed
    assert rows["a.png"].length == len(png)

    dec = {
        r.doc_id: r
        for r in decode_media_features(
            df.where(F.col("media_type") != "application/octet-stream")
            .select(
                F.crc32(F.col("id")).alias("doc_id"), "content", "media_type"
            )
        ).collect()
    }
    d = dec[
        spark.range(1)
        .select(F.crc32(F.lit(rows["a.png"].id)))
        .first()[0]
    ]
    assert (d.width, d.height) == (4, 3) and d.error is None

    only_png = read_media_files(spark, str(land), glob="*.png")
    assert only_png.count() == 2
