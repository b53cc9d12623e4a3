"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing protocol: warmup passes absorb JVM/codegen and Python-worker
startup, then each query is timed as plan-build + execution to
completion (df.count() forces full evaluation) three times, reporting
the minimum — the standard steady-state measure, robust to background
load on a shared box. The cache is cleared after each query: cached
frames (dedup postings, CC loop frames, ...) accumulate across the
67-query run otherwise, and the resulting eviction/GC churn showed up
as phantom 2-3x swings on unchanged map-only queries in rounds 2/5
(see SCALING.md "Measurement noise").
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from spark_ij_spark.session import get_spark

    spark = get_spark("spark_ij_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    # Warmup: absorb one-time JVM/codegen startup (q1, pure JVM) and
    # Python-worker pool startup (a pandas-UDF query) so timed runs
    # measure steady-state throughput, not process spawning.
    qs["q1_pricing_summary"](spark, sf_dir).count()
    qs["img_order_stats"](spark, sf_dir).count()
    # drop the warmups' cached frames so the FIRST timed query runs
    # under the same isolated-cache protocol as the rest
    spark.catalog.clearCache()

    # Soft wall-clock budget: past it, remaining queries degrade from
    # warmup+min-of-3 to a single COLD timed run (no warmup pass — r9:
    # warmup+1 still overran a 10-minute capture window on a loaded
    # box) so the harness ALWAYS finishes inside the driver's window
    # even when the shared box is 2x loaded. Degradations are counted
    # in the output ("degraded") so the artifact says which regime
    # (and which temperature) each timing ran at.
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    t_start = time.monotonic()
    degraded = 0

    timings: dict[str, float] = {}
    for name, fn in qs.items():
        # one untimed pass absorbs per-query cold costs (codegen, cache
        # materialization, Python-worker reuse), then min-of-3 timed
        # runs measures steady-state throughput — the box this runs on
        # is shared, and cold-run noise was ±20% run-to-run. Past the
        # budget the query degrades to ONE timed COLD run (no warmup
        # pass either — r9: warmup+1 still overran the driver's
        # capture window on a loaded box); degraded counts say which
        # regime each artifact ran.
        over = time.monotonic() - t_start > budget
        if over:
            degraded += 1
            reps = 1
        else:
            fn(spark, sf_dir).count()  # untimed warmup pass
            reps = 3
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        # drop this query's cached frames before the next query: the
        # cache-manager matches by canonicalized plan, so leftover
        # entries are never reused across queries — they only add
        # memory pressure and eviction churn to later timings.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query map goes to a committed artifact; the driver only
    # captures the last ~2000 chars of stdout, and the single JSON
    # line for 148 queries (~5 KB) overflowed that in round 6
    # (BENCH_r06 parsed: null). The FINAL printed line is a compact
    # summary (< 1.5 KB): totals + the 10 slowest queries.
    full = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "degraded": degraded,
        "sf": sf_val,
    }
    with open(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_FULL.json"),
        "w",
    ) as fh:
        json.dump(full, fh, indent=1)
    slowest = dict(
        sorted(timings.items(), key=lambda kv: -kv[1])[:10]
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": slowest,
                "degraded": degraded,
                "sf": sf_val,
                "full": "BENCH_FULL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
