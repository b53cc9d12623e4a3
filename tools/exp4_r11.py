"""Round-11 experiment 4: spread on events / lineitem — A/B in one
session, bench protocol (warmup + min-of-3, clearCache between)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

import spark_ij_spark.session as sess
from spark_ij_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("exp4-r11")
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as entrymod

qs = entrymod.queries()


def bench_query(label, name, reps=3):
    fn = qs[name]
    fn(spark, SF).count()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(spark, SF).count()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    print(f"{label:52s} {best:8.3f} s")
    sys.stdout.flush()
    return best


EVENT_QS = ["events_kmv_overlap", "events_kmv_users", "events_rollup", "events_sliding", "events_attribution", "events_ohlc"]
REL_QS = ["q1_pricing_summary", "q9_profit_by_nation", "q21_sole_blame_supplier", "q18_large_volume_customers"]

qs["q1_pricing_summary"](spark, SF).count()  # session warmup
spark.catalog.clearCache()

tot = {}
for q in EVENT_QS + REL_QS:
    tot[q] = bench_query(f"{q} (no spread)", q)

# patch load_tables to spread events and lineitem
_load_orig = sess.load_tables
_PK = {"events": "event_id", "lineitem": "l_orderkey"}


def load_spread(spark, sf_dir, names=None):
    out = _load_orig(spark, sf_dir, names)
    for t, pk in _PK.items():
        if t in out:
            out[t] = sess.spread(out[t], pk)
    return out


sess.load_tables = load_spread
# rebind in modules that imported it by name
import spark_ij_spark.operators.event_windows as ew
import spark_ij_spark.operators.timeseries as ts
import spark_ij_spark.operators.relational as rel

for m in (ew, ts, rel):
    if hasattr(m, "load_tables"):
        m.load_tables = load_spread

for q in EVENT_QS + REL_QS:
    b = bench_query(f"{q} (spread)", q)
    print(f"   -> delta {b - tot[q]:+0.3f}")

spark.stop()
