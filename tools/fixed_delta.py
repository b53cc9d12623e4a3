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
import time

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
    for name in os.listdir(src):
        if not name.endswith(".parquet") or name == "embeddings.parquet":
            link = os.path.join(out, name)
            if name.endswith(".parquet") and not os.path.exists(link):
                os.symlink(os.path.join(src, name), link)
            continue
    dst = os.path.join(out, "embeddings.parquet")
    if not os.path.exists(dst):
        from spark_ij_spark.operators.similarity import (
            ANN_DELTA_MOD,
            ANN_DELTA_RESIDUE,
        )

        emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
        # replicas (vec_id >= OFFSET) contribute corpus rows only; the
        # base copy keeps its residue-3 rows as the (fixed-size) delta
        # repartition(2) matches the scale10 replica's embeddings file
        # layout exactly, so fixed-vs-grown timing differences can't
        # hide in scan parallelism
        emb.filter(
            f"NOT (vec_id >= {OFFSET}"
            f" AND vec_id % {ANN_DELTA_MOD} = {ANN_DELTA_RESIDUE})"
        ).repartition(2).write.mode("overwrite").parquet(dst)
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

    import __spark_entry__ as mod

    fn = mod.queries()[QUERY]

    def timed(sf_dir: str) -> float:
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        spark.catalog.clearCache()
        return round(best, 4)

    fn(spark, SRC_SF).count()  # warmup
    spark.catalog.clearCache()
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
