"""Persisted DSIR model (sources/dsir_store.py): store-served
selection equals the inline two-pass fit, increments sum-merge
losslessly, and the layout marker governs the hashing."""

from __future__ import annotations

from pyspark.sql import functions as F

from dqe_spark.operators import text as T
from dqe_spark.sources import dsir_store as DS
from tests.conftest import SF_SMOKE


def _docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


def test_store_served_selection_equals_inline(spark):
    """dsir_select(model=persisted counts) must return the EXACT rows
    of the inline fit — the store holds the same additive counts the
    fit computes, and every downstream number is integer-deterministic."""
    docs = _docs(spark)
    DS.build_dsir_model(spark, SF_SMOKE, "en", force=True)
    inline = T.dsir_select(docs, F.col("lang") == "en", k=50).collect()
    served = T.dsir_select(
        docs,
        F.col("lang") == "en",
        k=50,
        model=DS.load_dsir_model(spark, SF_SMOKE, "en"),
    ).collect()
    assert [tuple(r) for r in inline] == [tuple(r) for r in served]
    assert len(served) == 50


def test_increment_merge_equals_full_rebuild(spark):
    """Model counts are additive: build from part A, merge part B
    through the increment path, equals the full-corpus build."""
    import shutil

    docs = _docs(spark)
    part_a = docs.where(F.col("doc_id") % 3 != 0)
    part_b = docs.where(F.col("doc_id") % 3 == 0)
    store = DS._dsir_dir(SF_SMOKE, "en")
    try:
        DS.build_dsir_model(spark, SF_SMOKE, "en", force=True)
        full = {
            r["bucket"]: (r["ct"], r["cr"])
            for r in spark.read.parquet(str(store)).collect()
        }
        # rebuild from A only (write through the same API surface)
        shutil.rmtree(store)
        b = DS.DSIR_B
        model_a = T.dsir_model_counts(
            T.dsir_bucket_counts(part_a, F.col("lang") == "en", b)
        )
        import os

        tmp = store.parent / f"_tmp_{store.name}"
        model_a.coalesce(1).write.mode("overwrite").parquet(str(tmp))
        (tmp / "_B").write_text(str(b))
        os.rename(tmp, store)
        DS.merge_dsir_increment(spark, part_b, SF_SMOKE, "en")
        merged = {
            r["bucket"]: (r["ct"], r["cr"])
            for r in spark.read.parquet(str(store)).collect()
        }
        assert merged == full and full
        assert DS.dsir_b(SF_SMOKE, "en") == b
    finally:
        DS.build_dsir_model(spark, SF_SMOKE, "en", force=True)


def test_load_is_memoized_and_invalidated(spark):
    from dqe_spark.sources import store as ST

    DS.build_dsir_model(spark, SF_SMOKE, "en")
    a = DS.load_dsir_model(spark, SF_SMOKE, "en")
    assert DS.load_dsir_model(spark, SF_SMOKE, "en") is a
    DS.merge_dsir_increment(spark, _docs(spark).limit(0), SF_SMOKE, "en")
    b = DS.load_dsir_model(spark, SF_SMOKE, "en")
    assert b is not a
    ST.invalidate_load_memo()
