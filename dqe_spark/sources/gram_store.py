"""Persisted positional k-gram store: incremental EXACT-SUBSTRING
dedup of NEWLY LANDED documents against the indexed corpus — without
re-reading or re-hashing the corpus.

This is the substring complement of the MinHash store
(minhash_store.py): where that answers "which stored docs is this new
doc NEAR-duplicate of", this answers "which token spans of this new
doc already exist verbatim in the corpus" (the Lee-et-al. cut list
for streaming ingest — new text gets its duplicated spans marked or
excised at landing time, with the corpus as the canonical owner).

Layout (same conventions as the minhash/text-index/rollup stores):

    _store/<sf>/grams/gb=<b>/part-*.parquet   (doc_id, p, gram)

  * ``gb`` = crc32(gram) mod N_GRAM_BUCKETS. The probe joins on
    (gb, gram); with a small increment, dynamic partition pruning
    reads only the buckets the new documents' grams hash to.
  * increments append via touched-bucket dynamic partition overwrite
    with last-write-wins per doc_id (a re-landed changed doc leaves
    no stale grams).

Hashing is the positional-md5 scheme from operators/dedup.py
(positional_grams), so the DuckDB oracle replays the full pipeline
(`dedup_substring_incr`).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqe_spark.operators.dedup import merge_position_islands, positional_grams
from dqe_spark.operators.partitioning import spread
from dqe_spark.sources.store import STORE_ROOT

K_GRAM = 5
N_GRAM_BUCKETS = 64


def _store_dir(sf_dir: str) -> Path:
    return STORE_ROOT / Path(sf_dir.rstrip("/")).name / "grams"


def _grams_of(docs: DataFrame, k: int = K_GRAM) -> DataFrame:
    """(doc_id, p, gram, gb) positional grams with their bucket —
    map-only."""
    _, grams = positional_grams(docs, k)
    return grams.withColumn(
        "gb", F.pmod(F.crc32(F.col("gram")), F.lit(N_GRAM_BUCKETS)).cast("int")
    )


def build_gram_store(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    k: int = K_GRAM,
    force: bool = False,
) -> Path:
    """Materialize the corpus's positional grams (idempotent, atomic
    tmp+rename). ``docs`` overrides the corpus source."""
    out = _store_dir(sf_dir)
    if not force and (out / "_SUCCESS").exists():
        return out
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    tmp = out.parent / "_tmp_grams"
    if tmp.exists():
        shutil.rmtree(tmp)
    (
        _grams_of(spread(docs), k)
        .repartition("gb")
        .sortWithinPartitions("gram", "doc_id", "p")
        .write.mode("overwrite")
        .partitionBy("gb")
        .parquet(str(tmp))
    )
    if out.exists():
        shutil.rmtree(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    import os

    try:
        os.rename(tmp, out)
    except OSError:
        if not (out / "_SUCCESS").exists():
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def merge_gram_increment(
    spark: SparkSession, sf_dir: str, new_docs: DataFrame, k: int = K_GRAM
) -> Path:
    """Fold new documents into the gram store with LAST-WRITE-WINS per
    doc_id (same contract and cost shape as merge_minhash_increment:
    old rows of re-landed docs anti-joined out, rewrite touches only
    the buckets the new keys hash to ∪ the re-landed docs' old
    buckets; the touched-bucket list is driver-sized by
    N_GRAM_BUCKETS, never by data)."""
    build_gram_store(spark, sf_dir, docs=new_docs, k=k)
    p = _store_dir(sf_dir)
    inc = _grams_of(spread(new_docs), k)
    new_ids = new_docs.select("doc_id").distinct()
    stored = spark.read.parquet(str(p))
    stale_gb = stored.join(F.broadcast(new_ids), "doc_id", "left_semi").select(
        "gb"
    )
    touched_gb = sorted(
        r["gb"]
        for r in inc.select("gb").unionByName(stale_gb).distinct().collect()
    )
    existing = stored.where(F.col("gb").isin(touched_gb)).join(
        F.broadcast(new_ids), "doc_id", "left_anti"
    )
    merged = (
        existing.select("doc_id", "p", "gram", "gb")
        .unionByName(inc)
        .distinct()
        .localCheckpoint(eager=True)
    )
    (
        merged.repartition("gb")
        .sortWithinPartitions("gram", "doc_id", "p")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gb")
        .parquet(str(p))
    )
    # dynamic overwrite cannot vacate a bucket whose merged frame is
    # empty — delete those explicitly (same hole the minhash store
    # closes; merged is checkpointed so nothing re-reads stale files)
    present = {r["gb"] for r in merged.select("gb").distinct().collect()}
    for b in touched_gb:
        if b not in present:
            shutil.rmtree(p / f"gb={b}", ignore_errors=True)
    return p


def spans_against_store(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    k: int = K_GRAM,
) -> DataFrame:
    """The cut list of ``new_docs`` against the INDEXED corpus: token
    spans of each new doc whose k-grams already exist verbatim in a
    DIFFERENT stored document (the store is canonical — landing-time
    semantics of duplicate_substring_spans, where the corpus always
    out-owns the newcomer). New docs are hashed fresh; the store is
    probed via the (gb, gram) bucket join and never re-read in full.

    Output: (doc_id, span_start, span_tokens) over the new docs."""
    p = _store_dir(sf_dir)
    nb = _grams_of(spread(new_docs), k).select(
        "doc_id", "p", "gram", "gb"
    )
    sb = spark.read.parquet(str(p)).select(
        F.col("doc_id").alias("store_id"), "gram", "gb"
    )
    cuts = (
        nb.join(sb, ["gb", "gram"])
        .where(F.col("store_id") != F.col("doc_id"))
        .select("doc_id", "p")
        .distinct()
    )
    return merge_position_islands(cuts, k)


def purge_doc_ids(
    spark: SparkSession, sf_dir: str, doc_ids: list[int]
) -> Path:
    """Takedown: remove every gram row of the given doc_ids, touching
    only the buckets that actually hold their rows (same contract as
    the minhash/text-index purges: the rewritten store equals a
    rebuild from the filtered corpus)."""
    p = _store_dir(sf_dir)
    stored = spark.read.parquet(str(p))
    gone = F.col("doc_id").isin([int(i) for i in doc_ids])
    touched = sorted(
        r["gb"] for r in stored.where(gone).select("gb").distinct().collect()
    )
    if not touched:
        return p
    kept = (
        stored.where(F.col("gb").isin(touched))
        .where(~gone)
        .localCheckpoint(eager=True)
    )
    (
        kept.repartition("gb")
        .sortWithinPartitions("gram", "doc_id", "p")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("gb")
        .parquet(str(p))
    )
    present = {r["gb"] for r in kept.select("gb").distinct().collect()}
    for b in touched:
        if b not in present:
            shutil.rmtree(p / f"gb={b}", ignore_errors=True)
    return p
