"""Round-11 optimization experiments: candidate rewrites vs current
forms — asserts identical results, then times both (warm min-of-3,
noop sink). Scratch tool; variants that win move into the operators."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ij_spark.session import get_spark
from spark_ij_spark.operators import dedup, similarity, text
from spark_ij_spark.operators.text import TOKENS_SPARK, SHINGLES_SPARK, hash60_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, reps=3):
    noop(fn())
    spark.catalog.clearCache()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(fn())
        best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
    print(f"{name:32s} {best:8.3f} s")
    sys.stdout.flush()
    return best


def same(a, b, keys):
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    assert d1 == 0 and d2 == 0, f"MISMATCH {keys}: {d1} / {d2}"
    print(f"  identical ({keys}): OK ({a.count()} rows)")
    spark.catalog.clearCache()


spark = get_spark("exp-r11")
spark.sparkContext.setLogLevel("ERROR")

# session warmup
noop(text._docs(spark, SF))
noop(dedup._emb(spark, SF))
spark.catalog.clearCache()

# ---------------------------------------------------------------- 1
# postings: distinct() shuffle vs map-side array_distinct
def postings_old():
    return (
        text._docs(spark, SF)
        .withColumn("toks", F.expr(TOKENS_SPARK))
        .select("doc_id", F.explode(F.expr(SHINGLES_SPARK)).alias("s"))
        .distinct()
    )


def postings_new():
    return (
        text._docs(spark, SF)
        .withColumn("toks", F.expr(TOKENS_SPARK))
        .select(
            "doc_id",
            F.explode(F.expr(f"array_distinct({SHINGLES_SPARK})")).alias("s"),
        )
    )


same(postings_old(), postings_new(), "postings")
timeit("postings_distinct_old", postings_old)
timeit("postings_arraydistinct", postings_new)

# ---------------------------------------------------------------- 2
# simhash: 48x explode + two groupBys vs single groupBy with 48 sums
SIMHASH_BITS = dedup.SIMHASH_BITS


def simhash_old():
    return dedup.simhash_fingerprints(spark, SF)


def simhash_new():
    toks = dedup.shingle_postings(spark, SF).withColumn(
        "h", F.expr(hash60_spark("s"))
    )
    aggs = [
        F.expr(f"sum((h >> {b}) & 1)").alias(f"o{b}") for b in range(SIMHASH_BITS)
    ] + [F.count("*").alias("nsh")]
    fp_expr = " + ".join(
        f"(CASE WHEN 2 * o{b} > nsh THEN shiftleft(CAST(1 AS BIGINT), {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(SIMHASH_BITS)
    )
    return (
        toks.groupBy("doc_id").agg(*aggs).select("doc_id", F.expr(fp_expr).alias("fp"))
    )


same(simhash_old(), simhash_new(), "simhash fp")
timeit("simhash_old", simhash_old)
timeit("simhash_single_agg", simhash_new)

# ---------------------------------------------------------------- 3
# lsh_buckets: aggregate(zip_with) dots vs subset-sum (2*sum(+1 dims) - total)
def buckets_old():
    return similarity.lsh_buckets(spark, SF)


def buckets_new():
    qv = dedup._emb(spark, SF).select(
        "vec_id",
        F.expr(
            f"transform(embedding, x -> TRY_CAST(round(CAST(x AS DOUBLE) * {similarity.QUANT}) AS BIGINT))"
        ).alias("qv"),
    ).withColumn(
        "tot", F.expr("aggregate(qv, CAST(0 AS BIGINT), (acc, v) -> acc + v)")
    )
    buckets = []
    for t in range(similarity.LSH_NTABLES):
        bits = []
        for p in range(similarity.LSH_NBITS):
            pos = [
                d
                for d in range(similarity.DIM)
                if similarity._lsh_sign(t, p, d) == 1
            ]
            ssum = " + ".join(f"qv[{d}]" for d in pos) if pos else "CAST(0 AS BIGINT)"
            dot = f"(2 * ({ssum}) - tot)"
            bits.append(
                f"(CASE WHEN {dot} > 0 THEN CAST({1 << p} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
            )
        buckets.append(" + ".join(bits))
    return qv.select(
        "vec_id",
        F.posexplode(F.array(*[F.expr(b) for b in buckets])).alias("t", "bucket"),
    )


same(buckets_old(), buckets_new(), "lsh buckets")
timeit("lsh_buckets_old", buckets_old)
timeit("lsh_buckets_subsetsum", buckets_new)

spark.stop()
