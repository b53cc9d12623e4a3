"""Warm min-of-3 timing of named declared queries using THE bench
protocol (bench.session_warmup / bench.warm_time), for before/after
evidence in optimization rounds.

Usage: python tools/time_queries.py name1 name2 ...
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

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
        out[name] = round(bench.warm_time(spark, qs[name], sf_dir), 4)
        print(f"{name:36s} {out[name]:8.3f} s")
        sys.stdout.flush()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
