"""Benchmark harness: runs headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Two-tier timing protocol (round 10 — the 172-query flat protocol blew
its own budget in r9 and cold-degraded a nondeterministic subset,
making per-query cross-round comparison impossible):

- HEADLINE tier: the HEADLINE_N heaviest queries by the previous
  committed BENCH_FULL.json run FIRST and are ALWAYS timed warm
  (untimed warmup pass + min-of-3), budget notwithstanding. These are
  the numbers cross-round regressions are adjudicated on, so they must
  never silently change regime.
- TAIL tier: everything else, ordered never-benched-first then rotated
  by round index (count of BENCH_r*.json files — deterministic, each
  round starts the rotation further along so the whole tail gets a
  warm timing every few rounds). Warm min-of-3 while inside the
  wall-clock budget; past it, a single COLD run, recorded per-query as
  cold and listed by name in "degraded_names" so the artifact is
  self-adjudicating (VERDICT r9 "What's wrong #1").

Cache is cleared after each query: cached frames (dedup postings, CC
loop frames, ...) accumulate across the run otherwise, and the
resulting eviction/GC churn showed up as phantom 2-3x swings on
unchanged map-only queries in rounds 2/5 (SCALING.md "Measurement
noise").
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE_N = 40


def _plan_order(names: list[str], repo: str) -> tuple[list[str], set[str]]:
    """Return (run order, headline set): heaviest-by-prior-run headline
    tier first, then never-benched tail queries, then the known tail
    rotated by round index. Ranking uses WARM prior timings only — a
    query cold-timed last run (degraded_names) re-enters as
    never-benched, so a cold-inflated 5x number can't evict a genuine
    heavy query from the headline tier (round-10 review)."""
    prior: dict[str, float] = {}
    try:
        with open(os.path.join(repo, "BENCH_FULL.json")) as fh:
            full = json.load(fh)
        cold = set(full.get("degraded_names", []))
        prior = {
            n: t for n, t in full.get("queries", {}).items() if n not in cold
        }
    except (OSError, ValueError):
        pass
    known = [n for n in names if n in prior]
    headline = sorted(known, key=lambda n: -prior[n])[:HEADLINE_N]
    head_set = set(headline)
    fresh = [n for n in names if n not in prior]
    tail = [n for n in known if n not in head_set]
    tail.sort(key=lambda n: -prior[n])
    rounds = len(glob.glob(os.path.join(repo, "BENCH_r*.json")))
    if tail:
        k = (rounds * 37) % len(tail)  # 37 coprime-ish stride: spread starts
        tail = tail[k:] + tail[:k]
    return headline + fresh + tail, head_set


def main() -> None:
    repo = os.path.dirname(os.path.abspath(__file__))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")

    from spark_ij_spark.session import get_spark

    spark = get_spark("spark_ij_spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    order, head_set = _plan_order(list(qs), repo)

    # Warmup: absorb one-time JVM/codegen startup (q1, pure JVM) and
    # Python-worker pool startup (a pandas-UDF query) so timed runs
    # measure steady-state throughput, not process spawning.
    qs["q1_pricing_summary"](spark, sf_dir).count()
    qs["img_order_stats"](spark, sf_dir).count()
    # drop the warmups' cached frames so the FIRST timed query runs
    # under the same isolated-cache protocol as the rest
    spark.catalog.clearCache()

    # Soft wall-clock budget: past it, remaining TAIL queries degrade
    # from warmup+min-of-3 to a single COLD timed run (no warmup pass —
    # r9: warmup+1 still overran a 10-minute capture window on a loaded
    # box) so the harness ALWAYS finishes inside the driver's window
    # even when the shared box is 2x loaded. Headline queries never
    # degrade — the budget is sized so the headline tier fits even at
    # 2x load (~280 s of a 480 s budget at r9 timings).
    budget = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_SEC", "480"))
    t_start = time.monotonic()
    degraded_names: list[str] = []

    timings: dict[str, float] = {}
    for name in order:
        fn = qs[name]
        # one untimed pass absorbs per-query cold costs (codegen, cache
        # materialization, Python-worker reuse), then min-of-3 timed
        # runs measures steady-state throughput — the box this runs on
        # is shared, and cold-run noise was ±20% run-to-run.
        over = name not in head_set and time.monotonic() - t_start > budget
        if over:
            degraded_names.append(name)
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
        "headline": sorted(head_set),
        "degraded": len(degraded_names),
        "degraded_names": degraded_names,
        "sf": sf_val,
    }
    with open(os.path.join(repo, "BENCH_FULL.json"), "w") as fh:
        json.dump(full, fh, indent=1)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:10])
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "n_queries": len(timings),
                "queries": slowest,
                "degraded": len(degraded_names),
                "sf": sf_val,
                "full": "BENCH_FULL.json",
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
