"""Round-11 experiment 3: scan-parallelism spread — the testdata ships
single-row-group parquet, so every map stage over a base table runs as
ONE task. Measure steady-state (cache-warm, bench-protocol) rep times
with and without a guarded hash-repartition at the scan helpers."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ij_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark("exp3-r11")
spark.sparkContext.setLogLevel("ERROR")

from spark_ij_spark.operators import dedup, similarity, text


def bench_query(name, fn, reps=3):
    fn().count()  # warm: materialize caches
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn().count()
        best = min(best, time.perf_counter() - t0)
    spark.catalog.clearCache()
    print(f"{name:44s} {best:8.3f} s")
    sys.stdout.flush()


# --- baseline (wave-1 code, no spread) --------------------------------
print("scan partitions docs:", text._docs(spark, SF).rdd.getNumPartitions(),
      " emb:", spark.read.parquet(f"{SF}/embeddings.parquet").rdd.getNumPartitions())

bench_query("ngram_jaccard (no spread)", lambda: dedup.q_dedup_ngram_jaccard(spark, SF))
bench_query("simhash (no spread)", lambda: dedup.q_dedup_simhash(spark, SF))
bench_query("ann_lsh (no spread)", lambda: similarity.q_ann_lsh(spark, SF))
bench_query("ann_lsh_multiprobe (no spread)", lambda: similarity.q_ann_lsh_multiprobe(spark, SF))

# --- patch the scan helpers with spread -------------------------------
_docs_orig = text._docs
_emb_orig = dedup._emb


def spread(df, *keys):
    n = df.rdd.getNumPartitions()
    if n < df.sparkSession.sparkContext.defaultParallelism:
        return df.repartition(*[F.col(k) for k in keys])
    return df


def _docs_spread(spark, sf_dir):
    return spread(_docs_orig(spark, sf_dir), "doc_id")


def _emb_spread(spark, sf_dir):
    return spread(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), "vec_id"
    ).filter(
        F.expr(
            f"embedding IS NOT NULL AND size(embedding) = {dedup.EMB_DIM}"
            " AND NOT exists(embedding, x -> x IS NULL OR isnan(x)"
            " OR abs(x) = CAST('Infinity' AS DOUBLE))"
        )
    )


text._docs = _docs_spread
dedup._docs = _docs_spread
dedup._emb = _emb_spread
if hasattr(similarity, "_emb"):
    similarity._emb = _emb_spread
if hasattr(similarity, "emb_with_norm"):
    similarity.emb_with_norm = lambda s, d: _emb_spread(s, d).select(
        "vec_id", "embedding", F.expr(dedup.SELF_NORM_SPARK).alias("nrm")
    )

bench_query("ngram_jaccard (spread)", lambda: dedup.q_dedup_ngram_jaccard(spark, SF))
bench_query("simhash (spread)", lambda: dedup.q_dedup_simhash(spark, SF))
bench_query("ann_lsh (spread)", lambda: similarity.q_ann_lsh(spark, SF))
bench_query("ann_lsh_multiprobe (spread)", lambda: similarity.q_ann_lsh_multiprobe(spark, SF))

spark.stop()
