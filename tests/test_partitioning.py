"""spread() — the input-parallelism guard for compute-bound operators.

Pins the round-6 verdict nit: the old shuffle detector
`(?<!Broadcast)Exchange` also matched "ReusedExchange", so a plan whose
only exchange was a REUSED BROADCAST exchange would incorrectly
short-circuit and skip the widening. The detector now matches the
shuffle partitioning forms explicitly, which resolves what a
ReusedExchange points at (a reused shuffle prints its referent's
"Exchange hashpartitioning(...)" and still counts; a reused broadcast
prints "BroadcastExchange ..." and doesn't).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dqe_spark.operators.partitioning import _has_shuffle_or_cache, spread

SF = "/root/testdata/sf0.001"


# --- detector unit cases: representative Spark physical-plan strings ---

SHUFFLE_PLANS = [
    # ENSURE_REQUIREMENTS hash shuffle under an aggregate
    "HashAggregate(keys=[label#2], functions=[count(1)])\n"
    "+- Exchange hashpartitioning(label#2, 32), ENSURE_REQUIREMENTS, [plan_id=16]\n"
    "   +- FileScan parquet [label#2]",
    # explicit round-robin repartition (what .repartition(n) prints)
    "Exchange RoundRobinPartitioning(32), REPARTITION_BY_NUM, [plan_id=4]\n"
    "+- FileScan parquet [vec_id#0L]",
    # range partitioning under a global sort
    "Sort [ts#1 ASC]\n+- Exchange rangepartitioning(ts#1 ASC, 32)\n"
    "   +- FileScan parquet",
    # single-partition exchange under a global limit/agg
    "Exchange SinglePartition, ENSURE_REQUIREMENTS, [plan_id=9]\n"
    "+- HashAggregate",
    # ReusedExchange whose REFERENT is a shuffle: the referent's
    # description is printed, so the plan still reads as shuffled
    "ReusedExchange [id#14L], Exchange hashpartitioning(id#5L, 32)",
    # cached-RDD scan: already has cached-block parallelism
    "InMemoryTableScan [vec_id#0L]",
]

NON_SHUFFLE_PLANS = [
    # plain scan
    "FileScan parquet [vec_id#0L,embedding#1] Batched: true",
    # broadcast join: BroadcastExchange must NOT count as a shuffle
    "BroadcastHashJoin [vec_id#0L], [vec_id#4L], LeftSemi, BuildRight\n"
    ":- FileScan parquet [vec_id#0L]\n"
    "+- BroadcastExchange HashedRelationBroadcastMode(List(input[0, bigint, "
    "false])), [plan_id=22]\n   +- FileScan parquet [vec_id#4L]",
    # the round-6 nit case: a REUSED broadcast exchange — the old
    # `(?<!Broadcast)Exchange` regex matched "ReusedExchange" here and
    # skipped the widening
    "BroadcastHashJoin [vec_id#6L], [vec_id#10L], LeftSemi, BuildRight\n"
    ":- FileScan parquet [vec_id#6L]\n"
    "+- ReusedExchange [vec_id#10L], BroadcastExchange "
    "HashedRelationBroadcastMode(List(input[0, bigint, false])), [plan_id=22]",
]


@pytest.mark.parametrize("plan", SHUFFLE_PLANS)
def test_detector_matches_shuffles(plan):
    assert _has_shuffle_or_cache(plan)


@pytest.mark.parametrize("plan", NON_SHUFFLE_PLANS)
def test_detector_ignores_broadcast_and_reused_broadcast(plan):
    assert not _has_shuffle_or_cache(plan)


# --- behavioral cases against real plans ---


def test_spread_widens_one_file_scan(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = spread(e)
    phys = out._jdf.queryExecution().sparkPlan().toString()
    assert "RoundRobinPartitioning" in phys  # the widening fired
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def test_spread_leaves_shuffled_frame_alone(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    g = e.groupBy("label").count()
    # repartition output: explicit exchange already present
    r = e.repartition(8)
    assert spread(r) is r
    # agg output carries ENSURE_REQUIREMENTS shuffle only in the
    # executed plan; sparkPlan() hides it — spread may or may not
    # widen, but must stay correct either way
    assert spread(g).count() == g.count()


def test_spread_widens_probe_side_of_reused_broadcast(spark):
    """The verdict's scenario: a frame whose ONLY exchanges are a
    broadcast and its reuse must still widen — broadcast parallelism
    says nothing about the probe side's input splits."""
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    dim = spark.range(5).select(F.col("id").alias("vec_id"))
    j = e.join(F.broadcast(dim), "vec_id", "left_semi").union(
        e.join(F.broadcast(dim), "vec_id", "left_semi")
    )
    phys = j._jdf.queryExecution().sparkPlan().toString()
    assert not _has_shuffle_or_cache(phys), phys  # precondition
    out = spread(j)
    assert (
        "RoundRobinPartitioning"
        in out._jdf.queryExecution().sparkPlan().toString()
    )
