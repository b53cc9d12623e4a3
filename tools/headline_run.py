"""Isolated warm re-run of the bench HEADLINE tier only.

VERDICT r10 item 6: the +13% warm-comparable drift between the r9 and
r10 full-bench runs was box-attributed by triangulation (unchanged
files + r9-driver-band agreement + decade curves). This tool pins such
claims directly: run ONLY the headline queries (the tier cross-round
regressions are adjudicated on), warm min-of-3, on an otherwise-quiet
box at round start, and write the table to stdout + a JSON artifact.

Usage:  python tools/headline_run.py [--out FILE]
Reads the headline list from the committed BENCH_FULL.json (same
selection bench.py will make), so the numbers are directly comparable
to the full-run artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(REPO, ".scratch", "headline_quiet.json"))
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    import bench

    prior = bench._prior_warm(REPO)

    from spark_ij_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("spark_ij_spark-headline")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    order, head_set, _warm, sent_set = bench._plan_order(list(qs), REPO, prior)
    # sentinels are part of the adjudication surface too (r12): re-run
    # them alongside the headline tier, in bench order
    headline = [n for n in order if n in head_set or n in sent_set]

    # bench.py's exact protocol (shared helpers): session warmup, then
    # per-query warm min-of-3 with isolated caches
    bench.session_warmup(spark, qs, args.sf_dir)
    timings: dict[str, float] = {}
    for name in headline:
        timings[name] = round(
            bench.warm_time(spark, qs[name], args.sf_dir), 4
        )

    rows = []
    for name in sorted(timings, key=lambda n: -timings[n]):
        prev = prior.get(name)
        ratio = round(timings[name] / prev, 2) if prev else None
        rows.append((name, prev, timings[name], ratio))
    out = {
        "metric": "headline_quiet_rerun",
        "total": round(sum(timings.values()), 4),
        "prior_total": round(sum(prior.get(n, 0.0) for n in timings), 4),
        "queries": timings,
        "prior": {n: prior.get(n) for n in timings},
    }
    out_dir = os.path.dirname(args.out)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"{'query':38s} {'prior':>8s} {'quiet':>8s} {'ratio':>6s}")
    for name, prev, cur, ratio in rows:
        print(
            f"{name:38s} {prev if prev is not None else float('nan'):8.3f}"
            f" {cur:8.3f} {ratio if ratio is not None else float('nan'):6.2f}"
        )
    print(json.dumps({k: out[k] for k in ("metric", "total", "prior_total")}))
    spark.stop()


if __name__ == "__main__":
    main()
