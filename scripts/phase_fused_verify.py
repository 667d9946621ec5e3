"""Phase-isolated interleaved A/B of the verify stage alone.

One session: build the keyed frame + candidate set once, checkpoint
the candidates, then time ONLY verification — fused vs join —
interleaved N reps each.
"""
import os
import time

os.environ.setdefault("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from dqe_spark.session import get_spark  # noqa: E402
import dqe_spark.operators.similarity as S  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

spark = get_spark()
SF = os.environ["SPARK_GRAFT_SF_DIR"]
emb = spark.read.parquet(f"{SF}/embeddings.parquet")
pm = S.auto_planes(emb, bands=8)
keyed = S._keyed_frame(emb, pm, 8)
cand = S._srp_pairs_from_keyed(keyed, len(pm), 8).localCheckpoint(eager=True)
n = cand.count()
print("candidate pairs:", n)

withn = keyed.select(F.col("vec_id"), F.col("embedding"), F.col("__nn"))


def t_fused():
    t0 = time.monotonic()
    S._verify_fused(keyed, cand, 0.2).collect()
    return time.monotonic() - t0


def t_join():
    t0 = time.monotonic()
    S._verify_withn(withn, cand, 0.2).collect()
    return time.monotonic() - t0


fus, joi = [], []
for rep in range(7):
    joi.append(round(t_join(), 3))
    fus.append(round(t_fused(), 3))
print("join :", joi)
print("fused:", fus)
