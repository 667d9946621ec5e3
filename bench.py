"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": N, "unit": "sec", "queries":
{...}, "sf": ...}.

Timing is end-to-end per query: plan construction + execution +
collect. A warmup query first absorbs JVM/codegen startup so the
numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: headline queries: one per operator family, weighted toward the
#: shapes that dominate real workloads (window aggs, scans, top-k).
HEADLINE = [
    "get_points",
    "glob_avg_1m",
    "aggr_avg_1m",
    "aggr_percentile_90_5m",
    "aggr_count_above_5m",
    "trans_derivate",
    "comb_quotient",
    "hist_percentile_99",
    "group_by_host_avg_1m",
    "top2_by_avg",
    "shift_1d_avg_1h",
    "events_filter",
    "li_weekly_sum",
    "li_top1_daily",
]

# extension headliners are appended when present in the registry
EXT_HEADLINE = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "text_lang_id",
    "knn_bruteforce",
    "knn_srp",
    "ord_daily_count",
    "dql_avg_1m",
    "rollup_avg_1h",
    "rollup_p90_1h",
    "asof_error_click",
    "sessionize_clicks",
]


def main() -> None:
    from dqe_spark.entry import all_queries
    from dqe_spark.session import get_spark

    spark = get_spark("dqe-spark-bench")
    qs = all_queries()
    names = [n for n in HEADLINE if n in qs] + [n for n in EXT_HEADLINE if n in qs]

    # build the physical metric store (partition-pruned scans); ingest
    # is a pipeline step, not a query — excluded from per-query timing
    from dqe_spark.sources import rollup, store

    store.ingest(spark, SF_DIR)
    rollup.build_rollup(spark, SF_DIR, 60_000)
    rollup.build_hist_rollup(spark, SF_DIR, 60_000)

    # warmup: JVM + whole-stage codegen + parquet footer reads, plus
    # the Arrow python-worker pool (first pandas UDF pays its startup)
    qs["aggr_avg_1m"](spark, SF_DIR).collect()
    import pandas as pd
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm(s):
        return pd.Series([0] * len(s))

    spark.range(32).select(_warm("id")).collect()

    times: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        t0 = time.perf_counter()
        out = qs[name](spark, SF_DIR).collect()
        times[name] = round(time.perf_counter() - t0, 3)
        rows[name] = len(out)

    total = round(sum(times.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline-suite-wall",
                "value": total,
                "unit": "sec",
                "queries": times,
                "rows": rows,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
