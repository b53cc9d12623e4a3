"""IVF assignment A/B: crossJoin+per-vector-window argmax (old) vs
driver-collected literal-seed argmax projection (new) — guide §2.4
"remove shuffles outright". Asserts exact result identity (exceptAll
both ways) before timing; times the assignment pass and the two
heaviest consumers (ann_ivf, ann_ivfpq) end to end."""
import os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F
from spark_ij_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
s = get_spark("exp6", cpus=32)
s.sparkContext.setLogLevel("ERROR")
from spark_ij_spark.operators import similarity as sim
from spark_ij_spark.operators.dedup import emb_with_norm, _emb


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(name, fn, reps=3):
    noop(fn())
    s.catalog.clearCache()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(fn())
        best = min(best, time.perf_counter() - t0)
        s.catalog.clearCache()
    print(f"{name:34s} {best:8.3f} s")
    sys.stdout.flush()


def _dlit(v: float) -> str:
    r = repr(float(v))
    if "e" in r or "E" in r:
        return f"CAST('{r}' AS DOUBLE)"
    return f"{r}D"


def new_assign():
    rows = (
        emb_with_norm(s, SF)
        .filter(F.col("vec_id") < sim.IVF_NLIST)
        .collect()
    )
    seeds = sorted(
        (int(r.vec_id), [float(v) for v in r.embedding], float(r.nrm))
        for r in rows
    )
    cands = []
    for sid, arr, snrm in seeds:
        lit = ", ".join(_dlit(v) for v in arr)
        cos = (
            f"aggregate(zip_with(embedding, array({lit}),"
            " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
            " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
            f" / (nrm * {_dlit(snrm)})"
        )
        cands.append(
            f"named_struct('cos', {cos}, 'negid', {-sid}L)"
        )
    best = f"array_max(array({', '.join(cands)}))"
    return emb_with_norm(s, SF).select(
        "vec_id", F.expr(f"-({best}.negid)").alias("cell")
    )


def old_assign():
    return sim.ivf_assignments(s, SF)


# --- identity gate ------------------------------------------------------
o, n = old_assign(), new_assign()
d1 = n.exceptAll(o).count()
d2 = o.exceptAll(n).count()
print(f"identity: new-minus-old={d1} old-minus-new={d2}")
assert d1 == 0 and d2 == 0, "assignment results differ"

# --- timings ------------------------------------------------------------
noop(_emb(s, SF))
print("n emb:", _emb(s, SF).count())
timeit("old_assign", old_assign)
timeit("new_assign", new_assign)

# consumers: swap the assignment inside ivf_candidate_pairs by monkeypatch
orig = sim.ivf_assignments
timeit("ann_ivf OLD", lambda: sim.q_ann_ivf(s, SF))
sim.ivf_assignments = lambda spark, sf: new_assign()
timeit("ann_ivf NEW", lambda: sim.q_ann_ivf(s, SF))
sim.ivf_assignments = orig
timeit("ann_ivfpq OLD", lambda: sim.q_ann_ivfpq(s, SF))
sim.ivf_assignments = lambda spark, sf: new_assign()
timeit("ann_ivfpq NEW", lambda: sim.q_ann_ivfpq(s, SF))
sim.ivf_assignments = orig
s.stop()

# --- variant B: 1-row seeds-array broadcast, map-only argmax -------------
s2 = get_spark("exp6b", cpus=32)
s2.sparkContext.setLogLevel("ERROR")
s = s2


def arr_assign():
    e = emb_with_norm(s, SF)
    seeds_arr = (
        e.filter(F.col("vec_id") < sim.IVF_NLIST)
        .select(
            F.struct(
                F.col("vec_id").alias("sid"),
                F.col("embedding").alias("s_emb"),
                F.col("nrm").alias("s_nrm"),
            ).alias("st")
        )
        .agg(F.expr("array_sort(collect_list(st), (l, r) -> CAST(l.sid - r.sid AS INT))").alias("seeds"))
    )
    cos = (
        "aggregate(zip_with(embedding, sd.s_emb,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
        " / (nrm * sd.s_nrm)"
    )
    best = (
        f"array_max(transform(seeds, sd ->"
        f" named_struct('cos', {cos}, 'negid', -sd.sid)))"
    )
    return e.crossJoin(F.broadcast(seeds_arr)).select(
        "vec_id", F.expr(f"-({best}.negid)").alias("cell")
    )


o, n = old_assign(), arr_assign()
d1 = n.exceptAll(o).count()
d2 = o.exceptAll(n).count()
print(f"identityB: arr-minus-old={d1} old-minus-arr={d2}")
assert d1 == 0 and d2 == 0, "arr assignment results differ"

noop(_emb(s, SF))
timeit("old_assign (s2)", old_assign)
timeit("arr_assign (s2)", arr_assign)
orig2 = sim.ivf_assignments
timeit("ann_ivf OLD (s2)", lambda: sim.q_ann_ivf(s, SF))
sim.ivf_assignments = lambda spark, sf: arr_assign()
timeit("ann_ivf ARR (s2)", lambda: sim.q_ann_ivf(s, SF))
sim.ivf_assignments = orig2
timeit("ann_ivfpq OLD (s2)", lambda: sim.q_ann_ivfpq(s, SF))
sim.ivf_assignments = lambda spark, sf: arr_assign()
timeit("ann_ivfpq ARR (s2)", lambda: sim.q_ann_ivfpq(s, SF))
sim.ivf_assignments = orig2
s.stop()
