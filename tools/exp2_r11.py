"""Round-11 experiments, batch 2: cap machinery, member index caching,
minhash verify semi-reduction, CC loop change-probe."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_ij_spark.session import get_spark
from spark_ij_spark.operators import dedup, similarity, text
from spark_ij_spark.operators.text import TOKENS_SPARK, SHINGLES_SPARK

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
    print(f"{name:36s} {best:8.3f} s")
    sys.stdout.flush()
    return best


def same(a, b, keys):
    d1 = a.exceptAll(b).count()
    d2 = b.exceptAll(a).count()
    assert d1 == 0 and d2 == 0, f"MISMATCH {keys}: {d1} / {d2}"
    print(f"  identical ({keys}): OK ({a.count()} rows)")
    spark.catalog.clearCache()


spark = get_spark("exp2-r11")
spark.sparkContext.setLogLevel("ERROR")
noop(text._docs(spark, SF))
noop(dedup._emb(spark, SF))
spark.catalog.clearCache()


def raw_postings():
    return (
        text._docs(spark, SF)
        .withColumn("toks", F.expr(TOKENS_SPARK))
        .select(
            "doc_id",
            F.explode(F.expr(f"array_distinct({SHINGLES_SPARK})")).alias("s"),
        )
    )


FRAC = dedup.MAX_SHINGLE_DOC_FRAC

# ------------------------------------------------ cap variants
def capped_current():
    return dedup.shingle_postings(spark, SF)


def capped_ad_persist():
    sh = raw_postings().persist()
    hot = (
        sh.groupBy("s").agg(F.count("*").alias("df"))
        .filter(F.expr(f"df > (SELECT count(*) FROM parquet.`{SF}/documents.parquet`) * {FRAC}"))
        .select("s")
    )
    return sh.join(F.broadcast(hot), "s", "left_anti")


def capped_ad_nopersist():
    sh = raw_postings()
    hot = (
        sh.groupBy("s").agg(F.count("*").alias("df"))
        .filter(F.expr(f"df > (SELECT count(*) FROM parquet.`{SF}/documents.parquet`) * {FRAC}"))
        .select("s")
    )
    return sh.join(F.broadcast(hot), "s", "left_anti")


same(capped_current(), capped_ad_nopersist(), "capped postings")
timeit("capped_current", capped_current)
timeit("capped_arraydistinct_persist", capped_ad_persist)
timeit("capped_arraydistinct_nopersist", capped_ad_nopersist)

# ------------------------------------------------ member index: double compute vs cached buckets
def mem_current():
    return similarity._lsh_member_index(similarity.lsh_buckets(spark, SF))


def mem_cached_buckets():
    b = similarity.lsh_buckets(spark, SF).cache()
    return similarity._lsh_member_index(b)


same(mem_current(), mem_cached_buckets(), "member index")
timeit("mem_current", mem_current)
timeit("mem_cached_buckets", mem_cached_buckets)

# ------------------------------------------------ minhash verify: semi-reduce pb
def verify_current():
    return dedup.q_dedup_minhash_lsh(spark, SF)


def verify_semireduced():
    post = dedup.shingle_postings(spark, SF).cache()
    cand = dedup.lsh_candidate_pairs(spark, SF, postings=post).cache()
    sh = post
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    cand_docs = (
        cand.select(F.col("da").alias("doc_id"))
        .union(cand.select(F.col("db").alias("doc_id")))
        .distinct()
    )
    shc = sh.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    pa = shc.withColumnRenamed("doc_id", "da")
    pb = shc.withColumnRenamed("doc_id", "db")
    inter = (
        cand.join(pa, "da")
        .join(pb, ["db", "s"])
        .groupBy("da", "db")
        .agg(F.count("*").alias("i"))
    )
    return (
        inter.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .select("da", "db", F.expr("round(CAST(i AS DOUBLE) / (na + nb - i), 6)").alias("jaccard"))
    )


same(verify_current(), verify_semireduced(), "minhash verify")
timeit("verify_current", verify_current)
timeit("verify_semireduced", verify_semireduced)

# ------------------------------------------------ CC loop: change probe folded into checkpoint frame
CC_MAX_ROUNDS = dedup.CC_MAX_ROUNDS


def cc_current():
    return dedup.q_dedup_clusters(spark, SF)


def cc_folded():
    edges = dedup.jaccard_edges(spark, SF)
    n_parts = dedup.cc_partitions(2 * edges.count())
    sym = edges.union(edges.select(F.col("db").alias("da"), F.col("da").alias("db")))
    sym = (
        sym.withColumnRenamed("da", "src")
        .withColumnRenamed("db", "dst")
        .repartition(n_parts, "src")
        .cache()
    )
    labels = (
        sym.select(F.col("src").alias("doc_id"))
        .distinct()
        .withColumn("label", F.col("doc_id"))
        .repartition(n_parts, "doc_id")
    )
    converged = False
    for _ in range(CC_MAX_ROUNDS):
        neighbor_min = (
            sym.join(labels, sym.src == labels.doc_id)
            .groupBy(F.col("dst").alias("doc_id"))
            .agg(F.min("label").alias("nlabel"))
        )
        new_frame = (
            labels.join(neighbor_min, "doc_id", "left")
            .select(
                "doc_id",
                F.col("label").alias("old_label"),
                F.least(F.col("label"), F.coalesce("nlabel", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = new_frame.filter(F.col("label") != F.col("old_label")).limit(1).count()
        labels = new_frame.select("doc_id", "label")
        if changed == 0:
            converged = True
            break
    assert converged
    return labels.select("doc_id", F.col("label").alias("cluster_rep"))


same(cc_current(), cc_folded(), "cc labels")
timeit("cc_current", cc_current)
timeit("cc_folded_probe", cc_folded)

spark.stop()
