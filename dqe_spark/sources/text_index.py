"""Inverted token index: keyword search over the documents corpus
without a full-text scan.

A corpus filter like "every document mentioning X and Y" is a daily
operation in training-data curation; scanning 100 TB of text per query
is not. The index is the classic inverted list, laid out for Spark
partition pruning:

    _store/<sf>/text_index/tb=<b>/part-*.parquet   (token, doc_id)

  * ``tb`` = crc32(token) mod N_BUCKETS — a term lookup computes the
    same bucket driver-side, so the scan opens 1/N of the files
    (PartitionFilters; plan-asserted in tests/test_text_index.py).
  * files are token-sorted, so the token equality predicate becomes
    row-group min/max skipping within the bucket.
  * postings are doc-distinct (array_distinct before explode): index
    size is bounded by Σ distinct tokens per doc, not token
    occurrences.

Tokenization is the engine's standard word rule (lowercase,
``[^a-z0-9]+`` delimiters) — identical in the DuckDB oracle
(string_split_regex), so search results are exactly replayable.

At 100 TB: the index build is one map + one shuffle-free partitioned
write (the explode is map-side; repartition("tb") co-locates each
bucket). Search reads K pruned buckets (K = #terms), then a tiny
groupBy on doc_id — cost scales with posting-list length, never corpus
size. Incremental maintenance = append new docs' postings to their
buckets (dynamic partition overwrite), same pattern as the rollup
increments.
"""

from __future__ import annotations

import os
import re
import shutil
import zlib
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dqe_spark.sources.store import STORE_ROOT

N_BUCKETS_DEFAULT = 64

#: the word rule shared with the oracle side (and operators/text.py)
TOKEN_DELIM = "[^a-z0-9]+"


def _index_dir(sf_dir: str) -> Path:
    return STORE_ROOT / Path(sf_dir.rstrip("/")).name / "text_index"


def index_path(sf_dir: str) -> Path | None:
    p = _index_dir(sf_dir)
    return p if (p / "_SUCCESS").exists() else None


def _n_buckets(p: Path) -> int:
    marker = p / "_BUCKETS"
    return int(marker.read_text()) if marker.exists() else N_BUCKETS_DEFAULT


def _postings(docs: DataFrame, n_buckets: int) -> DataFrame:
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(F.lower(F.col("text")), TOKEN_DELIM))
            ).alias("token"),
        )
        .where(F.col("token") != "")
        .withColumn(
            "tb", F.pmod(F.crc32(F.col("token")), F.lit(n_buckets)).cast("int")
        )
    )


def build_text_index(
    spark: SparkSession,
    sf_dir: str,
    n_buckets: int = N_BUCKETS_DEFAULT,
    force: bool = False,
    docs: DataFrame | None = None,
) -> Path:
    """Materialize the inverted index (idempotent, atomic tmp+rename).
    ``docs`` overrides the corpus source (used by tests and bootstrap
    ingests); default is the sf_dir's documents table."""
    out = _index_dir(sf_dir)
    if not force and index_path(sf_dir) is not None:
        return out
    if docs is None:
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    postings = _postings(docs, n_buckets)
    tmp = out.parent / "_tmp_text_index"
    if tmp.exists():
        shutil.rmtree(tmp)
    (
        postings.repartition("tb")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .partitionBy("tb")
        .parquet(str(tmp))
    )
    (tmp / "_BUCKETS").write_text(str(n_buckets))
    if out.exists():
        shutil.rmtree(out)
    out.parent.mkdir(parents=True, exist_ok=True)
    try:
        os.rename(tmp, out)
    except OSError:
        if index_path(sf_dir) is None:
            raise
        shutil.rmtree(tmp, ignore_errors=True)
    return out


def merge_index_increment(
    spark: SparkSession, sf_dir: str, new_docs: DataFrame
) -> Path:
    """Fold newly-landed documents' postings into the index: touched
    buckets (the new postings' tb values) are rewritten as
    existing ∪ new, (token, doc_id)-distinct, via dynamic partition
    overwrite — cost proportional to the new docs' vocabulary, same
    pattern as the rollup/ANN increments.

    Contract: APPEND of new doc_ids (and idempotent re-landing of an
    unchanged doc — the distinct absorbs it). A doc whose TEXT changed
    leaves stale postings in buckets its new text no longer touches;
    changed-doc reindexing is a rebuild (or a doc-tombstone sweep), not
    this fast path."""
    build_text_index(spark, sf_dir, docs=new_docs)
    p = _index_dir(sf_dir)
    n = _n_buckets(p)
    inc = _postings(new_docs, n)
    touched = inc.select("tb").distinct()
    existing = spark.read.parquet(str(p)).join(
        F.broadcast(touched), "tb", "left_semi"
    )
    merged = (
        existing.select("doc_id", "token", "tb")
        .unionByName(inc)
        .distinct()
        .localCheckpoint(eager=True)
    )
    (
        merged.repartition("tb")
        .sortWithinPartitions("token", "doc_id")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("tb")
        .parquet(str(p))
    )
    return p


def _bucket_of(term: str, n_buckets: int) -> int:
    # zlib.crc32 == Spark's F.crc32 (standard CRC-32 over the bytes)
    return zlib.crc32(term.encode("utf-8")) % n_buckets


def keyword_search(
    spark: SparkSession, sf_dir: str, terms: list[str], mode: str = "all"
) -> DataFrame:
    """doc_ids whose text contains all (``mode="all"``) or any
    (``mode="any"``) of the terms, answered from the inverted index.

    The per-term predicate pins BOTH the bucket (partition pruning)
    and the token (row-group skipping); the AND-semantics groupBy runs
    over the union of the K posting lists only."""
    if not terms:
        raise ValueError("keyword_search needs at least one term")
    if mode not in ("all", "any"):
        raise ValueError(f"bad mode {mode!r}")
    # normalize query terms to the INDEX token rule (lowercase,
    # [a-z0-9]+): an un-normalized term ('Vector', 'foo-bar') hashes to
    # a bucket but can never equal a stored token — silent zero hits.
    # A multi-token term ('foo-bar' → foo, bar) means: the document
    # contains every one of its tokens.
    norm: list[str] = []
    for t in terms:
        toks = [x for x in re.split(TOKEN_DELIM, t.lower()) if x]
        if not toks:
            raise ValueError(
                f"term {t!r} has no indexable tokens (token rule: "
                f"lowercase [a-z0-9]+)"
            )
        norm.append(toks)
    flat = sorted({x for toks in norm for x in toks})
    build_text_index(spark, sf_dir)
    p = _index_dir(sf_dir)
    n = _n_buckets(p)
    idx = spark.read.parquet(str(p))
    pred = None
    for t in flat:
        c = (F.col("tb") == _bucket_of(t, n)) & (F.col("token") == t)
        pred = c if pred is None else (pred | c)
    hits = idx.where(pred)
    if mode == "any":
        # any term matches when ALL of that term's tokens are present
        per_doc = hits.groupBy("doc_id").agg(
            F.collect_set("token").alias("toks")
        )
        cond = None
        for toks in norm:
            c = F.lit(True)
            for x in toks:
                c = c & F.array_contains("toks", x)
            cond = c if cond is None else (cond | c)
        return per_doc.where(cond).select("doc_id")
    return (
        hits.groupBy("doc_id")
        .agg(F.count_distinct("token").alias("k"))
        .where(F.col("k") == len(flat))
        .select("doc_id")
    )
