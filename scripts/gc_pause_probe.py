"""Direct System.gc() pause probe: time reps of a fixed mid-size query
while a driver thread forces System.gc() every 10 s (6x the bench
cadence), under the session's JVM flags. Isolated GC-pause inflation
shows as single-rep outliers vs the rep floor."""
import os, sys, time, threading, json
sys.path.insert(0, "/root/repo")
from dqe_spark.session import get_spark
from dqe_spark.entry import all_queries

SF = "/root/repo/_testdata/sf1"
os.environ["SPARK_GRAFT_SF_DIR"] = SF
spark = get_spark("gc-probe")
qs = all_queries()
# settle
for _ in range(10):
    qs["get_points"](spark, SF).collect()
# generate checkpoint/broadcast garbage like the suite does
qs["dedup_minhash_lsh"](spark, SF).collect()
stop = False
def gc_loop():
    while not stop:
        time.sleep(10)
        spark._jvm.System.gc()
t = threading.Thread(target=gc_loop, daemon=True); t.start()
reps = []
t_end = time.time() + 75
while time.time() < t_end:
    t0 = time.perf_counter()
    qs["anomaly_zscore_1m"](spark, SF).collect()
    reps.append(round(time.perf_counter() - t0, 3))
stop = True
floor = min(reps)
print(json.dumps({"flags": os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "default(+EGC)"),
                  "floor": floor, "reps": reps,
                  "outliers_1p5x": [r for r in reps if r > 1.5*floor]}))
spark.stop()
