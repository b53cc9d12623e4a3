"""Warm min-of-3 timing of named declared queries using THE bench
protocol (bench.session_warmup / bench.warm_time), for before/after
evidence in optimization rounds.

Usage: python tools/time_queries.py [--cold] name1 name2 ...

--cold: min-of-3 of COLD runs instead (cache cleared before every
rep) — what a query pays when it runs first in a session, i.e. the
number the driver's single-run tail timings reflect.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    cold = "--cold" in names
    names = [n for n in names if n != "--cold"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import time

    import bench
    from spark_ij_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    bench.session_warmup(spark, qs, sf_dir)
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"time: {name}")
        if cold:
            best = float("inf")
            for _ in range(3):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                qs[name](spark, sf_dir).count()
                best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
            out[name] = round(best, 4)
        else:
            out[name] = round(bench.warm_time(spark, qs[name], sf_dir), 4)
        print(f"{name:36s} {out[name]:8.3f} s")
        sys.stdout.flush()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
