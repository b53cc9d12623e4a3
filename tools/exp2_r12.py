"""Round-12 experiment 2: dedup_containment and pipeline_leakage_split.

Candidates (results asserted identical before timing):

containment
  A (current) cache the full pre-threshold pair frame, scan it twice
              (fwd where-select UNION rev where-select)
  B (emit)    single pass: each pair row conditionally emits 0-2
              directed rows map-side via explode(concat(CASE...)) —
              no pair-frame cache, no double scan (guide §2.4/§5;
              the docstring already promised this shape)

leakage_split
  A (current) cache the corpus-sized joined/split frame, aggregate it
              twice (witness + accounting)
  B (preagg)  ONE corpus pass into g = groupBy(split, cluster_rep);
              witness = per-cluster row count of g (== countDistinct
              split, g is distinct on the pair), accounting = g
              re-aggregated by split — corpus cache dropped, the
              second corpus-wide aggregate becomes O(|clusters|)

Usage: python tools/exp2_r12.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from spark_ij_spark.operators import dedup, pipeline
    from spark_ij_spark.operators.dedup import (
        CONTAIN_MIN_SHINGLES,
        CONTAIN_T_DEN,
        CONTAIN_T_NUM,
        _jaccard_pairs,
        shingle_postings,
    )
    from spark_ij_spark.operators.pipeline import (
        SPLIT_TRAIN_PCT,
        SPLIT_VAL_PCT,
        hash60_spark,
    )
    from spark_ij_spark.operators.text import _docs
    from spark_ij_spark.session import get_spark

    spark = get_spark("exp2-r12")
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- containment ----------------
    def contain_b():
        pairs = _jaccard_pairs(shingle_postings(spark, SF))
        fwd_ok = (
            f"{CONTAIN_T_DEN} * i >= {CONTAIN_T_NUM} * na"
            f" AND na >= {CONTAIN_MIN_SHINGLES}"
        )
        rev_ok = (
            f"{CONTAIN_T_DEN} * i >= {CONTAIN_T_NUM} * nb"
            f" AND nb >= {CONTAIN_MIN_SHINGLES}"
        )
        emit = F.expr(
            "explode(concat("
            f"CASE WHEN {fwd_ok} THEN array(named_struct("
            "'contained_doc', da, 'container_doc', db, 'n_common', i,"
            " 'containment', round(CAST(i AS DOUBLE) / na, 6))) ELSE array() END,"
            f" CASE WHEN {rev_ok} THEN array(named_struct("
            "'contained_doc', db, 'container_doc', da, 'n_common', i,"
            " 'containment', round(CAST(i AS DOUBLE) / nb, 6))) ELSE array() END))"
        )
        return (
            pairs.where(f"({fwd_ok}) OR ({rev_ok})")
            .select(emit.alias("e"))
            .select("e.*")
        )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    ref = canon(dedup.q_dedup_containment(spark, SF))
    spark.catalog.clearCache()
    got = canon(contain_b())
    spark.catalog.clearCache()
    assert got == ref, "containment: B differs"
    print(f"containment B identical ({len(got)} rows)", flush=True)

    # ---------------- leakage_split ----------------
    def leakage_b():
        labels = dedup.q_dedup_clusters(spark, SF)
        bucket = f"({hash60_spark('CAST(rep AS STRING)')}) % 100"
        split = (
            f"CASE WHEN {bucket} < {SPLIT_TRAIN_PCT} THEN 'train'"
            f" WHEN {bucket} < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'"
            f" ELSE 'test' END"
        )
        s = (
            _docs(spark, SF)
            .join(labels, "doc_id", "left")
            .withColumn("rep", F.coalesce("cluster_rep", "doc_id"))
            .withColumn("split", F.expr(split))
        )
        # cache the AGGREGATE (O(|clusters|) rows), not the corpus: the
        # witness and the accounting both read g
        g = s.groupBy("split", "cluster_rep").agg(
            F.count("*").alias("n"),
            F.expr("CAST(SUM(n_chars) AS BIGINT)").alias("sc"),
        ).cache()
        wit = F.broadcast(
            g.where(F.col("cluster_rep").isNotNull())
            .groupBy("cluster_rep")
            .agg(F.count("*").alias("ns"))
            .agg(
                F.coalesce(F.max("ns"), F.lit(0))
                .cast("bigint")
                .alias("max_splits_per_cluster")
            )
        )
        return (
            g.crossJoin(wit)
            .groupBy("split", "max_splits_per_cluster")
            .agg(
                F.expr("CAST(SUM(n) AS BIGINT)").alias("n_docs"),
                F.expr(
                    "CAST(SUM(CASE WHEN cluster_rep IS NOT NULL THEN n"
                    " ELSE 0 END) AS BIGINT)"
                ).alias("n_clustered_docs"),
                F.expr("CAST(SUM(sc) AS BIGINT)").alias("sum_chars"),
            )
        )

    ref = canon(
        pipeline.q_pipeline_leakage_split(spark, SF).select(
            "split", "max_splits_per_cluster", "n_docs", "n_clustered_docs",
            "sum_chars",
        )
    )
    spark.catalog.clearCache()
    got = canon(
        leakage_b().select(
            "split", "max_splits_per_cluster", "n_docs", "n_clustered_docs",
            "sum_chars",
        )
    )
    spark.catalog.clearCache()
    assert got == ref, f"leakage: B differs\nref={ref}\ngot={got}"
    print("leakage B identical", flush=True)

    # ---------------- timing (cold: caches cleared per rep) ----------
    cases = {
        "contain_A": lambda: dedup.q_dedup_containment(spark, SF),
        "contain_B": contain_b,
        "leakage_A": lambda: pipeline.q_pipeline_leakage_split(spark, SF),
        "leakage_B": leakage_b,
    }
    for name, fn in cases.items():
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(f"{name:12s} cold: {best:6.3f} s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
