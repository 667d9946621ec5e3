"""Persisted MinHash signature store: incremental near-duplicate
detection of NEWLY LANDED documents against the indexed corpus —
without re-reading or re-hashing the corpus.

This is the daily dedup workflow at 100 TB: the corpus's band keys and
shingle sets are computed once and persisted; each increment only
hashes the new documents, probes the band store for candidates, and
exact-verifies those candidates against the stored shingle sets.

Layout (same conventions as the text index / rollup stores):

    _store/<sf>/minhash/bb=<b>/part-*.parquet   (doc_id, band, key)
    _store/<sf>/minhash/_shingles/              (doc_id, shs)

  * ``bb`` = crc32(key) mod N_KEY_BUCKETS. The candidate probe joins
    on (bb, band, key); with a small increment, dynamic partition
    pruning reads only the buckets the new documents' keys hash to.
  * ``_shingles`` backs exact Jaccard verification of candidates —
    only candidate doc_ids are ever fetched (semi-join sized by the
    candidate set, not the corpus).
  * increments append via touched-bucket dynamic partition overwrite;
    re-landing an unchanged doc is absorbed by distinct.

Hashing is the md5-derived scheme from operators/dedup.py, so the
DuckDB oracle replays the full pipeline (`dedup_minhash_incr`).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqe_spark.operators.dedup import (
    MINHASH_BANDS,
    MINHASH_K,
    _minhash_digest_cols,
    _minhash_lane_cols,
    shingle_sets,
)
from dqe_spark.operators.partitioning import spread
from dqe_spark.sources.store import STORE_ROOT

N_KEY_BUCKETS = 64


def _store_dir(sf_dir: str) -> Path:
    return STORE_ROOT / Path(sf_dir.rstrip("/")).name / "minhash"


def _bands_of(
    sets: DataFrame, id_col: str = "doc_id", k: int = MINHASH_K,
    bands: int = MINHASH_BANDS,
) -> DataFrame:
    """(id, band, key, bb) long-form band keys from a shingle-set
    frame — map-only (same lane scheme as minhash_lsh_pairs)."""
    sig = sets.select(id_col, *_minhash_digest_cols("shs", k)).select(
        id_col, *_minhash_lane_cols(k)
    )
    rows = k // bands
    band_cols = [
        F.md5(
            F.concat_ws(",", *[F.col(f"mh{b * rows + r}") for r in range(rows)])
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    stack = ", ".join(f"'{b}', band{b}" for b in range(bands))
    return (
        sig.select(id_col, *band_cols)
        .select(id_col, F.expr(f"stack({bands}, {stack}) AS (band, key)"))
        .withColumn(
            "bb", F.pmod(F.crc32(F.col("key")), F.lit(N_KEY_BUCKETS)).cast("int")
        )
    )


def build_minhash_store(
    spark: SparkSession,
    sf_dir: str,
    docs: DataFrame | None = None,
    force: bool = False,
) -> Path:
    """Materialize band keys + shingle sets for the corpus (idempotent,
    atomic tmp+rename). ``docs`` overrides the corpus source."""
    out = _store_dir(sf_dir)
    if not force and (out / "_SUCCESS").exists():
        return out
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sets = shingle_sets(spread(docs))
    tmp = out.parent / "_tmp_minhash"
    if tmp.exists():
        shutil.rmtree(tmp)
    (
        _bands_of(sets)
        .repartition("bb")
        .sortWithinPartitions("key", "doc_id")
        .write.mode("overwrite")
        .partitionBy("bb")
        .parquet(str(tmp))
    )
    sets.write.mode("overwrite").parquet(str(tmp / "_shingles"))
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


def merge_minhash_increment(
    spark: SparkSession, sf_dir: str, new_docs: DataFrame
) -> Path:
    """Fold new documents into the store with LAST-WRITE-WINS per
    doc_id: a re-landed doc's OLD rows are anti-joined out of both the
    band store and the shingle sidecar before the new rows union in,
    so re-landing a doc whose text changed leaves no stale band keys
    and a deterministic shingle set (write order no longer matters;
    an unchanged re-land is still absorbed bit-identically).

    Cost shape: finding the old rows' buckets needs one column-pruned
    (doc_id, bb) scan of the band store — read-proportional but
    map-only; the REWRITE is still only the touched buckets (new keys'
    buckets ∪ re-landed docs' old buckets) via dynamic partition
    overwrite. Increments are small by contract, so the incoming
    doc_id set broadcasts."""
    build_minhash_store(spark, sf_dir, docs=new_docs)
    p = _store_dir(sf_dir)
    inc = _bands_of(shingle_sets(spread(new_docs)))
    new_ids = new_docs.select("doc_id").distinct()
    stored = spark.read.parquet(str(p))
    stale_bb = stored.join(F.broadcast(new_ids), "doc_id", "left_semi").select(
        "bb"
    )
    # touched buckets collected driver-side — bounded by N_KEY_BUCKETS
    # (64 ints), never by data volume
    touched_bb = sorted(
        r["bb"]
        for r in inc.select("bb").unionByName(stale_bb).distinct().collect()
    )
    existing = stored.where(F.col("bb").isin(touched_bb)).join(
        F.broadcast(new_ids), "doc_id", "left_anti"
    )
    merged = (
        existing.select("doc_id", "band", "key", "bb")
        .unionByName(inc)
        .distinct()
        .localCheckpoint(eager=True)
    )
    (
        merged.repartition("bb")
        .sortWithinPartitions("key", "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bb")
        .parquet(str(p))
    )
    # Dynamic partition overwrite only rewrites partitions PRESENT in
    # the output: a touched bucket whose merged frame has zero rows
    # (the re-landed doc was its only occupant and the new text hashes
    # elsewhere) would otherwise keep its stale band keys on disk —
    # breaking the equals-rebuild contract. Delete those explicitly
    # (merged is checkpointed, so nothing re-reads the stale files).
    present = {r["bb"] for r in merged.select("bb").distinct().collect()}
    for b in touched_bb:
        if b not in present:
            shutil.rmtree(p / f"bb={b}", ignore_errors=True)
    sh_path = p / "_shingles"
    sh = (
        spark.read.parquet(str(sh_path))
        .join(F.broadcast(new_ids), "doc_id", "left_anti")
        .unionByName(shingle_sets(spread(new_docs)))
        .dropDuplicates(["doc_id"])
        .localCheckpoint(eager=True)
    )
    sh.write.mode("overwrite").parquet(str(sh_path))
    return p


def neardup_against_store(
    spark: SparkSession,
    sf_dir: str,
    new_docs: DataFrame,
    threshold: float,
    col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicates of ``new_docs`` against the INDEXED corpus:
    candidates from the (bb, band, key) probe join, exact Jaccard on
    candidates only (new side hashed fresh, store side read from the
    shingle sidecar). Output (new_id, store_id, jaccard ≥ threshold);
    a re-landed identical doc_id is excluded (it is not a duplicate of
    itself)."""
    from pyspark import StorageLevel

    p = _store_dir(sf_dir)
    new_sets = shingle_sets(spread(new_docs), col, id_col).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    nb = _bands_of(new_sets, id_col).select(
        F.col(id_col).alias("new_id"), "band", "key", "bb"
    )
    sb = spark.read.parquet(str(p)).select(
        F.col("doc_id").alias("store_id"), "band", "key", "bb"
    )
    cand = (
        sb.join(nb, ["bb", "band", "key"])
        .where(F.col("store_id") != F.col("new_id"))
        .select("new_id", "store_id")
        .distinct()
    )
    sn = new_sets.select(F.col(id_col).alias("new_id"), F.col("shs").alias("shs_n"))
    ss = spark.read.parquet(str(p / "_shingles")).select(
        F.col("doc_id").alias("store_id"), F.col("shs").alias("shs_s")
    )
    inter = F.size(F.array_intersect("shs_n", "shs_s"))
    verified = (
        cand.join(sn, "new_id")
        .join(ss, "store_id")
        .withColumn("inter", inter)
        .withColumn(
            "jaccard",
            F.col("inter")
            / (F.size("shs_n") + F.size("shs_s") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("new_id", "store_id", F.round("jaccard", 4).alias("jaccard"))
    )
    return verified


def purge_doc_ids(
    spark: SparkSession, sf_dir: str, doc_ids: DataFrame
) -> Path:
    """Remove documents from the signature store (the takedown sweep,
    mirroring text_index.purge_doc_ids): touched bb buckets rewrite
    without the purged docs' band keys; the shingle sidecar drops them
    too. A purged doc can never again appear as a candidate OR as
    verification evidence."""
    p = _store_dir(sf_dir)
    ids = F.broadcast(doc_ids.select("doc_id").distinct())
    bands = spark.read.parquet(str(p))
    touched_bb = sorted(
        r["bb"]
        for r in bands.join(ids, "doc_id", "left_semi")
        .select("bb")
        .distinct()
        .collect()
    )  # driver-side, bounded by N_KEY_BUCKETS
    kept = (
        bands.where(F.col("bb").isin(touched_bb))
        .join(ids, "doc_id", "left_anti")
        .select("doc_id", "band", "key", "bb")
        .localCheckpoint(eager=True)
    )
    (
        kept.repartition("bb")
        .sortWithinPartitions("key", "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("bb")
        .parquet(str(p))
    )
    # same empty-touched-bucket hole as merge_minhash_increment: a
    # bucket fully occupied by purged docs yields no output partition,
    # so dynamic overwrite never rewrites it — delete it explicitly or
    # the purged doc could still surface as a candidate
    present = {r["bb"] for r in kept.select("bb").distinct().collect()}
    for b in touched_bb:
        if b not in present:
            shutil.rmtree(p / f"bb={b}", ignore_errors=True)
    sh_path = p / "_shingles"
    sh = (
        spark.read.parquet(str(sh_path))
        .join(ids, "doc_id", "left_anti")
        .localCheckpoint(eager=True)
    )
    sh.write.mode("overwrite").parquet(str(sh_path))
    return p
