"""PQ ADC shapes A/B: old explode+LUT-join+groupBy vs new broadcast
wide-LUT map-only, plus stage attribution (enc pass, pairs, full)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from spark_ij_spark.session import get_spark
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
s = get_spark('exp5', cpus=32); s.sparkContext.setLogLevel('ERROR')
from spark_ij_spark.operators import similarity as sim, dedup
from spark_ij_spark.operators.clustering import _best_cluster_expr
from spark_ij_spark.operators.dedup import quantized_embeddings
PQ_M, PQ_DSUB, PQ_K, NQ = sim.PQ_M, sim.PQ_DSUB, sim.PQ_K, sim.N_QUERIES

def noop(df): df.write.format("noop").mode("overwrite").save()
def timeit(name, fn, reps=3):
    noop(fn()); s.catalog.clearCache()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); noop(fn())
        best = min(best, time.perf_counter() - t0); s.catalog.clearCache()
    print(f"{name:34s} {best:8.3f} s"); sys.stdout.flush()

def build_enc():
    books = sim._pq_model(s, SF)[0]
    pts = quantized_embeddings(s, SF).select(
        "vec_id", F.expr("transform(qv, v -> CAST(v AS DOUBLE))").alias("x"))
    for m in range(PQ_M):
        pts = pts.withColumn(f"x{m}", F.expr(f"slice(x, {m*PQ_DSUB+1}, {PQ_DSUB})"))
    enc = pts.select(F.col("vec_id").alias("ib"),
        *[_best_cluster_expr(books[m], xcol=f"x{m}").alias(f"code{m}") for m in range(PQ_M)])
    return books, pts, enc

def old_pairs():
    books, pts, enc = build_enc()
    codes = enc.select("ib", F.explode(F.array(*[
        F.struct(F.lit(m).alias("m"), F.col(f"code{m}").alias("k")) for m in range(PQ_M)
    ])).alias("mk")).select("ib", F.col("mk.m").alias("m"), F.col("mk.k").alias("k"))
    cb_rows = [(m, k, cv) for m in range(PQ_M) for (k, cv) in books[m]]
    cb = s.createDataFrame(cb_rows, "m INT, k INT, cv ARRAY<DOUBLE>")
    qsub = (pts.filter(F.col("vec_id") < NQ).select(F.col("vec_id").alias("ia"),
        F.explode(F.array(*[F.struct(F.lit(m).alias("m"), F.col(f"x{m}").alias("qs")) for m in range(PQ_M)])).alias("mq"))
        .select("ia", F.col("mq.m").alias("m"), F.col("mq.qs").alias("qs")))
    dot = "aggregate(zip_with(qs, cv, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
    qn = "aggregate(qs, 0.0D, (acc, v) -> acc + v * v)"
    cn = "aggregate(cv, 0.0D, (acc, v) -> acc + v * v)"
    lut = qsub.join(F.broadcast(cb), "m").select("ia", "m", "k", F.expr(f"{qn} - 2.0D * ({dot}) + {cn}").alias("pdist"))
    joined = codes.join(F.broadcast(lut), ["m", "k"]).where(F.col("ib") != F.col("ia"))
    return joined.groupBy("ia", "ib").agg(F.expr("CAST(SUM(pdist) AS DOUBLE)").alias("adist"))

def new_pairs():
    return sim.q_ann_pq_pairs(s, SF)

def enc_only():
    return build_enc()[2]

def topk(pairs_fn):
    from pyspark.sql.window import Window
    w = Window.partitionBy("ia").orderBy(F.asc("adist"), F.asc("ib"))
    return (pairs_fn().withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= sim.PQ_TOPK).select("ia","ib","rank","adist"))

noop(dedup._emb(s, SF))
print("n emb:", dedup._emb(s, SF).count())
timeit("enc_only", enc_only)
timeit("old_pairs", old_pairs)
timeit("new_pairs(crossjoin)", new_pairs)
timeit("old_full_topk", lambda: topk(old_pairs))
timeit("new_full_topk", lambda: topk(new_pairs))
s.stop()
