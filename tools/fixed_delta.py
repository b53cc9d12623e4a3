"""Fixed-delta ingest measurement for q_ann_incremental (VERDICT r10
item 4).

The decade-sweep replicas (tools/scale10.py) offset vec_id by
i*10,000,000 — a multiple of ANN_DELTA_MOD — so every replica keeps
the base residue structure and the "newly-arrived" delta batch
(vec_id % 10 == 3) scales WITH the corpus: the r10 composite 14.1x per
100x measured 100x corpus AND 100x delta together. This tool holds the
delta at its sf0.1 size: starting from an existing .scratch/sf1_k{K}
replica set, it rewrites embeddings to drop residue-3 vectors from the
replica copies (vec_id >= OFFSET), keeping only the base delta, and
symlinks every other table. q_ann_incremental then probes a K x corpus
standing index with a 1x delta — the nightly-ingest contract ("cost
scales with the delta, not the corpus") measured directly.

What still scales with the corpus by construction: the query hashes
the corpus into LSH buckets and aggregates per-bucket counts each run
(at toy SF the standing index is rebuilt inline rather than read from
a precomputed store), both map-side linear scans. The probe join +
rescore — the part that was delta x corpus before LSH — is the
delta-bounded piece this measurement isolates.

Usage:  python tools/fixed_delta.py [--k 10 100] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC_SF = "/root/testdata/sf0.1"
QUERY = "ann_incremental"


def build_fixed_delta(spark, k: int) -> str:
    from tools.scale10 import OFFSET

    src = os.path.join(REPO, ".scratch", f"sf1_k{k}")
    if not os.path.exists(os.path.join(src, "embeddings.parquet")):
        raise SystemExit(
            f"{src} missing — run: python tools/scale10.py --k {k}"
        )
    out = os.path.join(REPO, ".scratch", f"fixed_delta_k{k}")
    os.makedirs(out, exist_ok=True)
    # symlink every table EXCEPT embeddings (which gets the filtered
    # rewrite below). The first committed version of this loop had the
    # condition inverted — it symlinked ONLY embeddings (the grown
    # file) and the exists-guard then skipped the rewrite, so "fixed"
    # silently measured grown data (caught by the r11 mid-round code
    # review; the self-check below makes that class of bug loud).
    for name in os.listdir(src):
        if name.endswith(".parquet") and name != "embeddings.parquet":
            link = os.path.join(out, name)
            if not os.path.exists(link):
                os.symlink(os.path.join(src, name), link)
    from spark_ij_spark.operators.similarity import (
        ANN_DELTA_MOD,
        ANN_DELTA_RESIDUE,
    )

    delta_pred = (
        f"vec_id % {ANN_DELTA_MOD} = {ANN_DELTA_RESIDUE}"
    )
    dst = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(dst):
        emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
        # replicas (vec_id >= OFFSET) contribute corpus rows only; the
        # base copy keeps its residue-3 rows as the (fixed-size) delta.
        # repartition(2) matches the scale10 replica's embeddings file
        # layout exactly, so fixed-vs-grown timing differences can't
        # hide in scan parallelism
        emb.filter(
            f"NOT (vec_id >= {OFFSET} AND {delta_pred})"
        ).repartition(2).write.mode("overwrite").parquet(dst)
    # self-check EVERY run (cached builds included): the fixed
    # dataset's delta must be exactly the BASE delta — if it matches
    # the grown dataset's delta instead, we're about to time the wrong
    # experiment.
    n_fixed = spark.read.parquet(dst).filter(delta_pred).count()
    n_base = (
        spark.read.parquet(os.path.join(SRC_SF, "embeddings.parquet"))
        .filter(delta_pred)
        .count()
    )
    if n_fixed != n_base:
        raise SystemExit(
            f"fixed-delta build invalid: delta rows {n_fixed} != base "
            f"{n_base} — delete {out} and rebuild"
        )
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, nargs="+", default=[10, 100])
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from spark_ij_spark.session import get_spark

    spark = get_spark(
        "fixed-delta", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", 32))
    )
    spark.sparkContext.setLogLevel("ERROR")

    import bench
    import __spark_entry__ as mod

    qs = mod.queries()
    fn = qs[QUERY]

    def timed(sf_dir: str) -> float:
        # bench.py's exact protocol: untimed warm pass + min-of-reps,
        # isolated caches (shared helper, r11 review)
        return round(bench.warm_time(spark, fn, sf_dir, reps=args.reps), 4)

    bench.session_warmup(spark, qs, SRC_SF)
    result = {"query": QUERY, "base_sf01": timed(SRC_SF)}
    for k in args.k:
        fixed = build_fixed_delta(spark, k)
        grown = os.path.join(REPO, ".scratch", f"sf1_k{k}")
        result[f"fixed_delta_k{k}"] = timed(fixed)
        result[f"grown_delta_k{k}"] = timed(grown)
        result[f"fixed_ratio_k{k}"] = round(
            result[f"fixed_delta_k{k}"] / result["base_sf01"], 2
        )
        result[f"grown_ratio_k{k}"] = round(
            result[f"grown_delta_k{k}"] / result["base_sf01"], 2
        )
    print(json.dumps(result))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
