"""Global structural plan sweep over EVERY graded query.

Builds (never executes) the physical plan of each ``queries()`` entry
at a small SF and reports structural violations of the repo's scale
rules:

- ``CartesianProduct`` — an unhinted non-equi join. Under the round-8
  broadcast policy (static auto-broadcast OFF, session.get_spark) a
  non-equi join whose bounded side lost its ``F.broadcast()`` hint
  silently degrades to a cartesian; this sweep is the net that
  catches it across the WHOLE surface, not just the queries that
  happen to have a hand-written plan guard in test_plans.py.
- ``BatchEvalPython`` — a row-at-a-time Python UDF in a graded plan.
  Python is allowed only as Arrow-batched pandas UDFs / mapInPandas
  (ArrowEvalPython, FlatMapGroupsInPandas, MapInPandas...).

Plan BUILD can still run driver-side calibration actions some queries
perform while composing their frames (k-means centroid loops, block
counts from footers) — at sf0.001 those are sub-second.

Usage: python tools/plan_sweep.py [--sf sf0.001]
Prints one line per offending query and exits non-zero on any hit;
``checked: N bad: 0`` when clean. The pytest twin
(tests/test_scale_plans.py::test_no_cartesian_or_row_python_anywhere)
enforces the same invariant in the suite.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FORBIDDEN = ("CartesianProduct", "BatchEvalPython")


def sweep(spark, sf_dir: str) -> dict[str, list[str]]:
    """{query_name: [forbidden ops found]} over every graded query."""
    import __spark_entry__ as entrymod

    bad: dict[str, list[str]] = {}
    for name, fn in entrymod.queries().items():
        df = fn(spark, sf_dir)
        plan = df._jdf.queryExecution().executedPlan().toString()
        hits = [op for op in FORBIDDEN if op in plan]
        if hits:
            bad[name] = hits
        # calibration frames some queries persist() during plan build
        # would otherwise accumulate across the 163-query sweep
        spark.catalog.clearCache()
    return bad


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="sf0.001")
    args = ap.parse_args()
    sf_dir = (
        args.sf if os.path.isdir(args.sf) else os.path.join("/root/testdata", args.sf)
    )

    from spark_ij_spark.session import get_spark

    spark = get_spark("plan-sweep", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    n = len(entrymod.queries())
    bad = sweep(spark, sf_dir)
    for name, hits in bad.items():
        print(f"  {name}: {', '.join(hits)}")
    print(f"checked: {n}  bad: {len(bad)}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
