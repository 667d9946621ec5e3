import os, sys, time, json
import numpy as np
import pandas as pd
sys.path.insert(0, "/root/repo")
SF = "/root/repo/_testdata/sf1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
from dqe_spark.session import get_spark
from dqe_spark.entry import all_queries
from dqe_spark.queries_ext import load_table
from dqe_spark.operators import similarity as S
from pyspark.sql import functions as F, types as T

spark = get_spark("ab-verify")
qs = all_queries()
for _ in range(8): qs["get_points"](spark, SF).collect()

emb = load_table(spark, SF, "embeddings")
nc = S.auto_clusters(emb, cache_key=(SF, "embeddings"))
pm = S.auto_planes(emb, bands=8)
cents = S.kmeans_centroids(emb, nc, 4)
keyed = S._keyed_frame(emb, pm, 8, cents)
cand = (S._srp_pairs_from_keyed(keyed, len(pm), 8, cross_cell_only=True)
        .union(S._ivf_pairs_from_keyed(keyed))).localCheckpoint(eager=True)
print("cands:", cand.count(), flush=True)

def old_fused(keyed, cand, threshold, vec="embedding", id_col="vec_id"):
    pdf = keyed.select(F.col(id_col), F.col(vec), F.col("__nn")).toPandas()
    idx = pd.Index(pdf[id_col]); assert idx.is_unique
    M = np.vstack([np.asarray(v, dtype=np.float64) for v in pdf[vec]])
    rootnn = np.sqrt(pdf["__nn"].to_numpy(dtype=np.float64))
    bc = keyed.sparkSession.sparkContext.broadcast((idx, M, rootnn))
    out_schema = T.StructType(list(cand.schema.fields) + [T.StructField("__cr", T.DoubleType())])
    def fused(batches):
        bidx, bM, broot = bc.value
        dims = bM.shape[1]
        for b in batches:
            i = bidx.get_indexer(b["id_i"]); j = bidx.get_indexer(b["id_j"])
            A, B = bM[i], bM[j]
            acc = np.zeros(len(b), dtype=np.float64)
            for d in range(dims):
                acc = acc + A[:, d] * B[:, d]
            yield b.assign(**{"__cr": acc / (broot[i] * broot[j])})
    return (cand.mapInPandas(fused, out_schema)
            .select("id_i", "id_j", F.round(F.col("__cr"), 6).alias("cos"))
            .where(F.col("cos") >= threshold))

# row-identity gate
a = sorted(map(tuple, old_fused(keyed, cand, 0.2).collect()))
b = sorted(map(tuple, S._verify_fused(keyed, cand, 0.2).collect()))
assert a == b, (len(a), len(b))
print("row-identity OK:", len(a), flush=True)

samples = {"old": [], "new": []}
for rep in range(9):
    for k, fn in (("old", old_fused), ("new", S._verify_fused)):
        t0 = time.perf_counter()
        fn(keyed, cand, 0.2).write.format("noop").mode("overwrite").save()
        samples[k].append(round(time.perf_counter() - t0, 3))
print(json.dumps({"median": {k: sorted(v)[len(v)//2] for k, v in samples.items()},
                  "samples": samples}), flush=True)
spark.stop()
