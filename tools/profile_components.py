"""Component-level profiler (guide §1): times the shared building
blocks of the heavy query families with the noop sink, warm min-of-3,
isolated caches — so optimization targets are attributed, not guessed.

Usage: python tools/profile_components.py [--sf-dir DIR] [--reps 3] [names...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()
    sf = args.sf_dir

    from pyspark.sql import functions as F

    from spark_ij_spark.session import get_spark

    spark = get_spark("component-profile")
    spark.sparkContext.setLogLevel("ERROR")

    from spark_ij_spark.operators import dedup, similarity, text

    def docs_scan():
        return text._docs(spark, sf)

    def tokens_only():
        return text._docs(spark, sf).select("doc_id", F.expr(text.TOKENS_SPARK).alias("toks"))

    def shingles_explode():
        return (
            text._docs(spark, sf)
            .withColumn("toks", F.expr(text.TOKENS_SPARK))
            .select("doc_id", F.explode(F.expr(text.SHINGLES_SPARK)).alias("s"))
        )

    def postings_distinct():
        return shingles_explode().distinct()

    def shingle_postings():
        return dedup.shingle_postings(spark, sf)

    def jaccard_pairs():
        return dedup._jaccard_pairs(dedup.shingle_postings(spark, sf))

    def jaccard_edges():
        return dedup.jaccard_edges(spark, sf)

    def cc_loop():
        return dedup.q_dedup_clusters(spark, sf)

    def emb_scan():
        return dedup._emb(spark, sf)

    def lsh_buckets():
        return similarity.lsh_buckets(spark, sf)

    def lsh_member_index():
        return similarity._lsh_member_index(similarity.lsh_buckets(spark, sf))

    def minhash_sigs():
        return dedup.minhash_signatures(spark, sf)

    def minhash_bands():
        return dedup.minhash_bands(spark, sf)

    def lsh_cand():
        return dedup.lsh_candidate_pairs(spark, sf)

    def lsh_verified():
        return dedup.q_dedup_minhash_lsh(spark, sf)

    def simhash_fp():
        return dedup.simhash_fingerprints(spark, sf)

    comps = {
        "docs_scan": docs_scan,
        "tokens_only": tokens_only,
        "shingles_explode": shingles_explode,
        "postings_distinct": postings_distinct,
        "shingle_postings": shingle_postings,
        "jaccard_pairs": jaccard_pairs,
        "jaccard_edges": jaccard_edges,
        "cc_loop": cc_loop,
        "emb_scan": emb_scan,
        "lsh_buckets": lsh_buckets,
        "lsh_member_index": lsh_member_index,
        "minhash_sigs": minhash_sigs,
        "minhash_bands": minhash_bands,
        "lsh_cand": lsh_cand,
        "lsh_verified": lsh_verified,
        "simhash_fp": simhash_fp,
    }
    names = args.names or list(comps)

    # session warmup (JVM/codegen + python pool)
    noop(docs_scan())
    noop(emb_scan())
    spark.catalog.clearCache()

    for name in names:
        fn = comps[name]
        spark.sparkContext.setJobDescription(f"profile: {name}")
        noop(fn())  # warm (materializes any caches)
        spark.catalog.clearCache()
        best = float("inf")
        for _ in range(args.reps):
            t0 = time.perf_counter()
            noop(fn())
            best = min(best, time.perf_counter() - t0)
            spark.catalog.clearCache()
        print(f"{name:24s} {best:8.3f} s")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
