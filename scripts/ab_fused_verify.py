"""Interleaved fresh-session A/B for the fused broadcast verify.

Each invocation runs ONE variant in ONE fresh session and prints
per-query seconds (full plan+execute+collect, bench methodology).
The wrapper interleaves A,B,A,B so host drift lands on both.

Usage: python scripts/ab_fused_verify.py <fused|join>
"""
import json
import sys
import time

import os

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
if sys.argv[1] == "join":
    os.environ["DQE_VERIFY_BCAST_MB"] = "0"

from dqe_spark.session import get_spark  # noqa: E402
from dqe_spark.entry import all_queries  # noqa: E402

QS = ["neardup_hybrid", "dedup_semantic_keep", "dql_neardup", "dql_dedup_semantic"]

spark = get_spark()
SF = os.environ["SPARK_GRAFT_SF_DIR"]
qs = all_queries()
qs["aggr_avg_1m"](spark, SF).collect()  # warmup
out = {}
for name in QS:
    t0 = time.monotonic()
    qs[name](spark, SF).collect()
    out[name] = round(time.monotonic() - t0, 3)
print(json.dumps({"variant": sys.argv[1], "q": out}))
