"""ann_ivfpq time attribution: driver-side build+analysis vs execution,
and per-component noop timings (cand gen, ADC pairs, shortlist, full).
Guide §1 (measure first) / §7.3 (driver-side work)."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from spark_ij_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
s = get_spark("exp7", cpus=32)
s.sparkContext.setLogLevel("ERROR")
from spark_ij_spark.operators import similarity as sim
from spark_ij_spark.operators.dedup import _emb


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def phase(name, fn, reps=3):
    # separate build/exec timing: build includes model collects +
    # plan construction; exec is the noop of an already-built frame
    fn()  # warm
    s.catalog.clearCache()
    bb, ee = float("inf"), float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        df = fn()
        t1 = time.perf_counter()
        noop(df)
        t2 = time.perf_counter()
        bb, ee = min(bb, t1 - t0), min(ee, t2 - t1)
        s.catalog.clearCache()
    print(f"{name:28s} build {bb:7.3f}  exec {ee:7.3f}")
    sys.stdout.flush()


noop(_emb(s, SF))
phase("cand (ivf_candidate_pairs)", lambda: sim.ivf_candidate_pairs(s, SF))
phase("pq_pairs(cand)", lambda: sim.q_ann_pq_pairs(s, SF, cand=sim.ivf_candidate_pairs(s, SF)))
phase("ann_ivfpq full", lambda: sim.q_ann_ivfpq(s, SF))
phase("ann_pq full", lambda: sim.q_ann_pq(s, SF))
phase("ann_retrieval_metrics", lambda: sim.q_ann_retrieval_metrics(s, SF))
s.stop()
