"""Distributed k-means over the ``embeddings`` table.

The iterative-ML shape on DataFrames (the clustering sibling of the
connected-components loop in ``dedup.py``): T fixed Lloyd iterations,
each = one map-only assignment pass (centroids compiled into the
expression as literals — K×dim model state on the driver, the MLlib
pattern) + one aggregation update shuffling only the tiny
(cluster, dim) key. At 100 TB the data never moves between
iterations; only O(K×dim) model state does.

Cross-engine determinism (the whole point of an oracle-checked ML op):

- Vectors are int64-quantized (×1e6) — every centroid update is a sum
  of INTEGERS (exact, order-independent, < 2^53) divided once by the
  member count, so Spark and DuckDB compute bit-identical centroids
  no matter how partial aggregation orders the sum.
- Assignment score = -2·(x·c) + |c|²: the dot products run as
  sequential folds (Spark ``aggregate(zip_with(...))`` ≡ DuckDB
  ``list_dot_product``, verified bit-identical elsewhere in this
  repo), and the argmin tie-breaks on centroid id via lexicographic
  struct-min / (score, cid) ordering.
- Seeds = the first K vectors, iterations fixed at T — no RNG, no
  convergence test, so replay is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ij_spark.operators.dedup import (
    EMB_CLEAN_DUCK,
    EMBED_QUANT,
    _emb,
    quantized_embeddings,
)

KMEANS_K = 8
KMEANS_ITERS = 3

def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, x): quantized embedding as an int-valued double array."""
    return quantized_embeddings(spark, sf_dir).select(
        "vec_id", F.expr("transform(qv, v -> CAST(v AS DOUBLE))").alias("x")
    )


def _best_cluster_expr(cents: list[tuple[int, list[float]]], xcol: str = "x"):
    """Column: argmin-over-centroids with literal centroid arrays
    compiled into the expression. The candidates build as ONE
    array-of-structs literal (constant-folded by Catalyst) scored by a
    single transform+aggregate lambda — identical arithmetic to
    unrolled per-candidate expressions but ~K× less generated code,
    which keeps the per-iteration codegen compile cheap. Scoring runs
    in whole-stage codegen — a map-only pass; `array_min` over
    (score, cid) structs is the lexicographic argmin with the cid
    tie-break.

    Built as ONE SQL text expression, not nested Column objects: the
    Column form costs one Py4J round-trip per literal (K×dim of them —
    measured ~1.9 s of pure plan-build time at 16×4×16 in the PQ op,
    and a per-iteration rebuild here), while one expr string is a
    single round-trip parsed JVM-side. Every literal carries the `D`
    suffix so it parses as DOUBLE — a bare decimal literal would parse
    as DECIMAL and poison the arithmetic. |c|² is pre-summed in Python
    left-to-right, the same sequential fold the engines use."""
    return F.expr(_best_cluster_struct_sql(cents, xcol) + ".cid")


def _best_cluster_struct_sql(
    cents: list[tuple[int, list[float]]], xcol: str = "x"
) -> str:
    """The (score, cid)-struct SQL text behind :func:`_best_cluster_expr`
    — shared with q_embed_outliers, which needs the score too (distance
    ranking), so assignment and distance can never use two drifted
    copies of the literal-centroid scoring expression."""
    cands = []
    for cid, c in cents:
        arr = ", ".join(f"{float(v)}D" for v in c)
        cnorm = 0.0
        for v in c:
            cnorm += float(v) * float(v)
        cands.append(
            f"named_struct('c', array({arr}), 'cnorm', {cnorm}D, 'cid', {cid})"
        )
    return (
        f"array_min(transform(array({', '.join(cands)}), cand -> "
        f"named_struct('score', aggregate(zip_with({xcol}, cand.c,"
        " (a, b) -> a * b), 0.0D, (acc, v) -> acc + v) * -2.0D + cand.cnorm,"
        " 'cid', cand.cid)))"
    )


def _seed_cents(points: DataFrame) -> list[tuple[int, list[float]]]:
    """Seed centroids (vec_id < KMEANS_K, sorted by id) — the ONE seed
    selection kmeans / SemDeDup / outlier-pruning all share; a seed-rule
    change edited here reaches every cell-assignment op (three verbatim
    copies previously had to be retuned in lockstep)."""
    cents = [
        (int(r.vec_id), [float(v) for v in r.x])
        for r in points.filter(F.col("vec_id") < KMEANS_K).collect()
    ]
    cents.sort()
    return cents


# Shared oracle fragments: the quantization (q) and seed-centroid (s)
# CTEs every cell-assignment oracle (kmeans / semdedup / outliers)
# composes — so a retune of the quantization scale, K, or the seed
# rule cannot silently split sibling queries across engines.
_Q_QUANT_DUCK = f"""q AS (
  SELECT vec_id,
         list_transform(embedding,
           v -> CAST(CAST(round(CAST(v AS DOUBLE) * {EMBED_QUANT}) AS BIGINT) AS DOUBLE)) AS x
  FROM {EMB_CLEAN_DUCK} embeddings)"""
_SEEDS_DUCK = f"""s AS (
  SELECT vec_id AS cid, x AS c, list_dot_product(x, x) AS cnorm
  FROM q WHERE vec_id < {KMEANS_K})"""


def q_embed_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster assignment after KMEANS_ITERS Lloyd iterations
    (seeds = vec_id < K). Returns every vector's final cluster plus the
    per-cluster size.

    Model state (K×dim doubles, ~4 KB) lives on the driver between
    iterations — the standard distributed-k-means shape (MLlib does the
    same): collecting O(model) per round is not a driver-side data
    loop, and it buys a map-only assignment pass (literal centroids in
    codegen, no join at all) plus one tiny (cluster, dim) shuffle for
    the update. Data never leaves the executors."""
    points = _points(spark, sf_dir).cache()
    cents = _seed_cents(points)
    for _ in range(KMEANS_ITERS):
        assigned = points.select(
            "vec_id", "x", _best_cluster_expr(cents).alias("cluster")
        )
        means = (
            assigned.select("cluster", F.posexplode("x").alias("pos", "v"))
            .groupBy("cluster", "pos")
            .agg(
                F.expr(
                    "CAST(SUM(CAST(v AS BIGINT)) AS DOUBLE) / COUNT(*)"
                ).alias("m")
            )
            .collect()
        )
        upd: dict[int, dict[int, float]] = {}
        for r in means:
            upd.setdefault(int(r.cluster), {})[int(r.pos)] = float(r.m)
        cents = [
            (
                cid,
                [upd[cid][p] for p in range(len(c))] if cid in upd else c,
            )
            for cid, c in cents
        ]
    from pyspark.sql.window import Window

    # window count, not agg+join: one shuffle on cluster and a single
    # assignment pass (the join form recomputed the argmin scan on
    # both sides)
    return points.select(
        "vec_id", _best_cluster_expr(cents).alias("cluster")
    ).withColumn(
        "n_members", F.count("*").over(Window.partitionBy("cluster"))
    )


def _duck_kmeans_sql() -> str:
    dot = "list_dot_product({a}, {b})"
    # iteration-0 centroids ARE the shared seed CTE (the same q/s
    # fragments the semdedup/outlier oracles compose)
    ctes = [_Q_QUANT_DUCK, _SEEDS_DUCK]
    prev = "s"
    for i in range(1, KMEANS_ITERS + 1):
        ctes.append(f"""a{i} AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY -2 * {dot.format(a='q.x', b='c.c')} + c.cnorm, c.cid) AS rn
    FROM q CROSS JOIN {prev} c)
  WHERE rn = 1)""")
        ctes.append(f"""m{i} AS (
  SELECT cluster AS cid, pos,
         CAST(SUM(CAST(v AS BIGINT)) AS DOUBLE) / COUNT(*) AS m
  FROM (SELECT a{i}.cluster, unnest(q.x) AS v, generate_subscripts(q.x, 1) AS pos
        FROM a{i} JOIN q USING (vec_id))
  GROUP BY cluster, pos)""")
        ctes.append(f"""u{i} AS (
  SELECT cid, list(m ORDER BY pos) AS c FROM m{i} GROUP BY cid)""")
        ctes.append(f"""c{i} AS (
  SELECT p.cid, COALESCE(u.c, p.c) AS c,
         {dot.format(a='COALESCE(u.c, p.c)', b='COALESCE(u.c, p.c)')} AS cnorm
  FROM {prev} p LEFT JOIN u{i} u USING (cid))""")
        prev = f"c{i}"
    final = f"""af AS (
  SELECT vec_id, cid AS cluster FROM (
    SELECT q.vec_id, c.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY -2 * {dot.format(a='q.x', b='c.c')} + c.cnorm, c.cid) AS rn
    FROM q CROSS JOIN {prev} c)
  WHERE rn = 1),
sizes AS (SELECT cluster, COUNT(*) AS n_members FROM af GROUP BY cluster)"""
    ctes.append(final)
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT af.vec_id, af.cluster, sizes.n_members"
        + "\nFROM af JOIN sizes USING (cluster)"
    )


Q_EMBED_KMEANS_SQL = _duck_kmeans_sql()


# --- SemDeDup (cell-bucketed semantic dedup) ---------------------------

# Cosine threshold calibrated to the synthetic embeddings: within-cell
# cos p99≈0.32 / max≈0.49, so 0.35 drops a real-but-minority slice
# (76/500 at sf0.01) — non-vacuous at the oracle SFs.
SEMDEDUP_TAU = 0.35


def q_embed_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): bucket embeddings into cells by
    nearest seed centroid, then drop every vector that has a
    more-senior (smaller vec_id) neighbor with cosine ≥ τ in the SAME
    cell. Returns the dropped set with its cell — the semantic-dedup
    kill list.

    Scale shape: cell assignment is the kmeans map-only pass (literal
    centroids in codegen, no join); then ONE shuffle groups each cell
    and a numpy int64 matmul scores the whole cell tile at once — the
    repo's dense-similarity pattern (see dedup.q_dedup_embedding),
    ~6× faster than per-pair fold expressions. Candidate pairs are
    within-cell only, never all-pairs — the entire point of SemDeDup
    at 100 TB, where cell count is chosen so a cell tile fits executor
    memory. Cosines are exact (int64-quantized vectors: matmul partial
    sums are integers < 2^53, and the final float division is the same
    IEEE op DuckDB's list_dot_product path performs), so the threshold
    comparison is bit-identical across engines."""
    import numpy as np
    import pandas as pd

    points = _points(spark, sf_dir)
    cents = _seed_cents(points)
    cells = points.select(
        "vec_id", "x", _best_cluster_expr(cents).alias("cell")
    )
    tau = SEMDEDUP_TAU

    def cell_kill(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_id": [], "cell": []}).astype(
                {"vec_id": "int64", "cell": "int32"}
            )
        A = np.asarray(list(pdf["x"]), dtype=np.int64)
        ids = pdf["vec_id"].to_numpy()
        nrm = np.sqrt((A * A).sum(axis=1).astype(np.float64))
        # Row-chunked matmul: the full n×n score matrix of a hot cell
        # is the memory hazard (a 50k-vector cell would be a 20 GB
        # dense tile — the sf~10 OOM class), while the cell's VECTORS
        # are only n×dims ints. Each chunk scores CHUNK×n cells and is
        # released before the next; results are bit-identical (same
        # int64 dots, same IEEE divisions), just computed in slabs.
        chunk = 1024
        dropped = np.zeros(len(ids), dtype=bool)
        for s in range(0, len(ids), chunk):
            e = min(s + chunk, len(ids))
            dots = (A[s:e] @ A.T).astype(np.float64)  # exact: |dot| < 2^53
            cos = dots / (nrm[s:e, None] * nrm[None, :])
            # dropped = has ANY smaller-id neighbor with cos >= tau
            mask = (cos >= tau) & (ids[s:e, None] < ids[None, :])
            dropped |= mask.any(axis=0)
        return pd.DataFrame(
            {
                "vec_id": ids[dropped],
                "cell": np.full(int(dropped.sum()), pdf["cell"].iloc[0]),
            }
        )

    return cells.groupBy("cell").applyInPandas(
        cell_kill, "vec_id long, cell int"
    )


Q_EMBED_SEMDEDUP_SQL = f"""
WITH {_Q_QUANT_DUCK},
{_SEEDS_DUCK},
a AS (
  SELECT vec_id, x, cid AS cell FROM (
    SELECT q.vec_id, q.x, s.cid,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY -2 * list_dot_product(q.x, s.c) + s.cnorm, s.cid) AS rn
    FROM q CROSS JOIN s) WHERE rn = 1)
SELECT DISTINCT a2.vec_id AS vec_id, a2.cell AS cell
FROM a a1 JOIN a a2 USING (cell)
WHERE a1.vec_id < a2.vec_id
  AND list_dot_product(a1.x, a2.x)
      / (sqrt(list_dot_product(a1.x, a1.x)) * sqrt(list_dot_product(a2.x, a2.x)))
      >= {SEMDEDUP_TAU}
"""

# Fraction of each cell pruned as outliers. A binary fraction (1/16)
# so n × frac is exact in both engines (CLAUDE.md float rule).
OUTLIER_FRAC = 0.0625


def q_embed_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prototypicality pruning (the D4 / SemDeDup-family sibling that
    drops the OTHER tail): per cell, the OUTLIER_FRAC of vectors
    FARTHEST from their seed centroid — training-data cleaning for
    off-manifold/noise embeddings, where SemDeDup drops the
    too-similar core.

    Determinism is fully integer: seeds are quantized vectors, so
    dist² = |x|² − 2x·c + |c|² is an exact sum of integers < 2^53
    computed by the same sequential fold in both engines, then cast to
    BIGINT; ranking is (dist² DESC, vec_id) — a total integer order.
    The per-cell keep count ceil(n × 1/16) is exact because the
    fraction is binary.

    Scale shape: cell assignment + dist² is ONE map-only codegen pass
    (literal centroids, no join — argmin and distance come out of the
    same array_min struct); then one shuffle on cell for the
    (rank, count) window. Nothing is all-pairs and the model state is
    O(K×dim) literals."""
    points = _points(spark, sf_dir)
    cents = _seed_cents(points)
    best = _best_cluster_struct_sql(cents, "x")
    xx = "aggregate(zip_with(x, x, (a, b) -> a * b), 0.0D, (acc, v) -> acc + v)"
    assigned = points.select(
        "vec_id", F.expr(best).alias("s"), F.expr(xx).alias("xx")
    ).select(
        "vec_id",
        F.expr("CAST(s.cid AS BIGINT)").alias("cell"),
        F.expr("CAST(s.score + xx AS BIGINT)").alias("dist2"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("cell")
    rank = Window.partitionBy("cell").orderBy(
        F.col("dist2").desc(), F.col("vec_id").asc()
    )
    return (
        assigned.withColumn("rn", F.row_number().over(rank).cast("bigint"))
        .withColumn("n_cell", F.count(F.lit(1)).over(w))
        .where(F.expr(f"rn <= CAST(ceil(n_cell * {OUTLIER_FRAC}) AS BIGINT)"))
        .select("vec_id", "cell", "dist2", "rn")
        .orderBy("cell", "rn")
    )


Q_EMBED_OUTLIERS_SQL = f"""
WITH {_Q_QUANT_DUCK},
{_SEEDS_DUCK},
a AS (
  SELECT vec_id, CAST(cid AS BIGINT) AS cell, CAST(score + xx AS BIGINT) AS dist2
  FROM (
    SELECT q.vec_id, s.cid,
           -2 * list_dot_product(q.x, s.c) + s.cnorm AS score,
           list_dot_product(q.x, q.x) AS xx,
           row_number() OVER (
             PARTITION BY q.vec_id
             ORDER BY -2 * list_dot_product(q.x, s.c) + s.cnorm, s.cid) AS rn
    FROM q CROSS JOIN s) WHERE rn = 1),
ranked AS (
  SELECT vec_id, cell, dist2,
         CAST(row_number() OVER (
           PARTITION BY cell ORDER BY dist2 DESC, vec_id) AS BIGINT) AS rn,
         COUNT(*) OVER (PARTITION BY cell) AS n_cell
  FROM a)
SELECT vec_id, cell, dist2, rn
FROM ranked WHERE rn <= CAST(ceil(n_cell * {OUTLIER_FRAC}) AS BIGINT)
ORDER BY cell, rn
"""


COV_DIM = 64


def q_embed_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass covariance partials over the embedding matrix — the
    building block for whitening / PCA preprocessing: for every dim
    pair (i ≤ j), the exact int64 sums (n, Σxᵢ, Σxⱼ, Σxᵢxⱼ) from which
    cov(i,j) = Σxy/n − (Σx/n)(Σy/n) derives scalar-side. Sums are over
    EMBED_QUANT-quantized values, so both engines are bit-identical
    (order-independent integer adds) — the same quantization trick the
    cosine/matmul family uses.

    Scale shape: per-Arrow-batch partial Gram matrix (numpy int64
    Mᵀ·M + column sums) emitted as d(d+1)/2 triangle rows per BATCH →
    ONE partial-agg shuffle of O(d² × partitions) rows regardless of
    corpus size. The Python hop is Arrow-batched and O(n·d²) in BLAS,
    not d²-per-row Catalyst struct allocation (the explode form
    measured 2.2 s vs ~0.8 s here at sf0.1, and its CPU amplification
    is what dies first at 100 TB). Exactness: |x| ≤ EMBED_QUANT = 1e6
    so per-batch products ≤ 1e12 and a 10k-row Arrow batch keeps every
    int64 partial < 1.2e16 ≪ 2^63. The CROSS-batch total, though,
    grows with corpus rows (Σ|xy| can pass 2^63 around ~10^7
    worst-case / ~10^9 realistic rows), so the final SUM widens to
    DECIMAL(38,0) internally — exact and order-independent like
    DuckDB's HUGEINT SUM, never a silent int64 wrap — and the BIGINT
    output cast goes NULL (loudly wrong, caught by any NULL check)
    rather than numerically wrong if a single shard's total exceeds
    2^63. Past that, shard the corpus and merge shard partials
    driver-side in Python integers (exact, O(d²·shards))."""
    import numpy as np
    import pandas as pd

    qe = quantized_embeddings(spark, sf_dir)
    iu, ju = np.triu_indices(COV_DIM)
    schema = (
        "i BIGINT, j BIGINT, n_p BIGINT, sx_p BIGINT, sy_p BIGINT, "
        "sxy_p BIGINT"
    )

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            g = m.T @ m
            s = m.sum(axis=0)
            yield pd.DataFrame(
                {
                    "i": iu + 1,
                    "j": ju + 1,
                    "n_p": np.full(len(iu), len(m), dtype=np.int64),
                    "sx_p": s[iu],
                    "sy_p": s[ju],
                    "sxy_p": g[iu, ju],
                }
            )

    return (
        qe.select("qv")
        .mapInPandas(gram_partials, schema)
        .groupBy("i", "j")
        .agg(
            # DECIMAL(38,0) internal accumulator (output stays BIGINT):
            # non-ANSI SUM(BIGINT) WRAPS silently past 2^63, and the
            # Σxy total grows with corpus rows — the widened sum is
            # still an exact order-independent integer add (like
            # DuckDB's HUGEINT SUM) and goes NULL, not wrong, if a
            # shard ever exceeds the output domain.
            F.expr("CAST(SUM(CAST(n_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "n"
            ),
            F.expr("CAST(SUM(CAST(sx_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "s_x"
            ),
            F.expr("CAST(SUM(CAST(sy_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "s_y"
            ),
            F.expr("CAST(SUM(CAST(sxy_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "s_xy"
            ),
        )
        .orderBy("i", "j")
    )


Q_EMBED_COVARIANCE_SQL = f"""
WITH q AS (
  SELECT list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * {EMBED_QUANT}) AS BIGINT)) AS qv
  FROM {EMB_CLEAN_DUCK} embeddings),
p AS (
  SELECT unnest(flatten(list_transform(range(1, {COV_DIM + 1}),
           i -> list_transform(range(i, {COV_DIM + 1}),
             j -> {{'i': i, 'j': j, 'x': qv[i], 'y': qv[j]}})))) AS s
  FROM q)
SELECT CAST(s.i AS BIGINT) AS i, CAST(s.j AS BIGINT) AS j,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(s.x) AS BIGINT) AS s_x,
       CAST(SUM(s.y) AS BIGINT) AS s_y,
       CAST(SUM(s.x * s.y) AS BIGINT) AS s_xy
FROM p GROUP BY s.i, s.j ORDER BY i, j
"""


# --- dominant principal direction via integer power iteration ---------

# Power iteration runs on the N-NORMALIZED second-moment matrix
# A = (Xᵀ·X) // N of PI_QUANT-quantized embeddings, so |A_ij| ≤
# PI_QUANT² (2^20) REGARDLESS of corpus size — the op never overflows
# at any N, unlike iterating on the raw Gram sum. With v bounded by
# PI_SCALE (2^16), every w_i = Σ A_ij v_j ≤ 64·2^36 ≈ 2^42 and the
# normalization product w·PI_SCALE ≤ 2^58 stays far inside BIGINT.
PI_QUANT = 1024       # 2^10 per-component quantization
PI_SCALE = 65536      # 2^16 fixed-point scale of the iterate
PI_ITERS = 24


def _sdiv(num: int, den: int) -> int:
    """Sign-explicit floor division of |num| (so Spark-side Python,
    and the oracle's CASE, agree for negative numerators — Python //
    floors while a naive SQL translation may truncate)."""
    return -((-num) // den) if num < 0 else num // den


def q_embed_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding cloud (uncentered
    PCA) via PI_ITERS integer power-iteration steps — the whitening /
    drift-direction primitive. Center upstream (calibrate-then-apply
    mean subtraction) when the corpus is not near zero-mean.

    Scale shape: ONE distributed pass builds the d×d second-moment
    triangle (per-Arrow-batch numpy Mᵀ·M partials → one O(d²·
    partitions) shuffle — identical to ``q_embed_covariance``); the
    iteration then runs on O(d²) driver-side model state, like the
    k-means centroid update. Floor-dividing the Gram by N bounds every
    matrix entry by PI_QUANT² independent of corpus size.

    Determinism: all-integer iterates (v0 = PI_SCALE·1; per step
    v ← sign(w)·(|w|·PI_SCALE // max|w|)), so Spark's driver loop and
    the oracle's PI_ITERS unrolled SQL steps produce bit-identical
    vectors; sign ambiguity is fixed by the deterministic start.

    Convergence honesty: on THIS synthetic corpus the spectrum is
    near-degenerate (λ2/λ1 ≈ 0.98 — the embeddings are near-isotropic,
    the same property that zeroes LSH recall), so PI_ITERS iterations land
    IN the top eigenspace (Rayleigh quotient ≳ 0.97·λmax, asserted in
    pytest) without singling out one eigenvector; on a corpus with a
    real dominant direction the same iterate aligns with it.
    """
    import numpy as np
    import pandas as pd

    qe = _emb(spark, sf_dir).select(
        F.expr(
            f"transform(embedding, x -> TRY_CAST(round(CAST(x AS DOUBLE) * {PI_QUANT}) AS BIGINT))"
        ).alias("qv")
    )
    iu, ju = np.triu_indices(COV_DIM)
    schema = "i BIGINT, j BIGINT, n_p BIGINT, g_p BIGINT"

    def gram_partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf["qv"].to_numpy()).astype(np.int64)
            g = m.T @ m
            yield pd.DataFrame(
                {
                    "i": iu + 1,
                    "j": ju + 1,
                    "n_p": np.full(len(iu), len(m), dtype=np.int64),
                    "g_p": g[iu, ju],
                }
            )

    tri = (
        qe.mapInPandas(gram_partials, schema)
        .groupBy("i", "j")
        .agg(
            # DECIMAL(38,0) internal accumulator, same rule as
            # q_embed_covariance above: per-row g_p products reach
            # PI_QUANT² = 2^40-ish, so the cross-batch total crosses
            # 2^63 around ~1e13 rows and non-ANSI SUM(BIGINT) would
            # wrap SILENTLY (the oracle's HUGEINT sum stays exact).
            F.expr("CAST(SUM(CAST(n_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "n"
            ),
            F.expr("CAST(SUM(CAST(g_p AS DECIMAL(38,0))) AS BIGINT)").alias(
                "g"
            ),
        )
        .collect()
    )
    # O(d²) model state: mirror the triangle, N-normalize, iterate.
    a = [[0] * COV_DIM for _ in range(COV_DIM)]
    for r in tri:
        av = _sdiv(r.g, r.n)
        a[r.i - 1][r.j - 1] = av
        a[r.j - 1][r.i - 1] = av
    v = [PI_SCALE] * COV_DIM
    for _ in range(PI_ITERS):
        w = [sum(a[i][j] * v[j] for j in range(COV_DIM)) for i in range(COV_DIM)]
        m = max(abs(x) for x in w)
        v = [_sdiv(x * PI_SCALE, m) for x in w]
    # v/PI_SCALE is a binary fraction (<= 16 fractional bits): exactly
    # representable, so NO rounding — round-at-9 hits exact decimal
    # ties where Spark (half-even on doubles) and DuckDB (half-up)
    # disagree.
    rows = [(i + 1, v[i], v[i] / PI_SCALE) for i in range(COV_DIM)]
    return spark.createDataFrame(
        rows, "dim BIGINT, v_fp BIGINT, component DOUBLE"
    )


def _power_iteration_sql() -> str:
    steps = []
    prev = "v0"
    for t in range(1, PI_ITERS + 1):
        # AS MATERIALIZED is load-bearing: each step references its
        # predecessor twice, and DuckDB inlines plain CTEs — without
        # materialization the expression tree doubles per step (2^12
        # blowup hangs the oracle).
        steps.append(
            f"""w{t} AS MATERIALIZED (
  SELECT af.i AS i, SUM(af.a * {prev}.v) AS w
  FROM af JOIN {prev} ON af.j = {prev}.i GROUP BY af.i),
v{t} AS MATERIALIZED (
  SELECT i, CASE WHEN w >= 0 THEN (w * {PI_SCALE}) // m
                 ELSE -(((-w) * {PI_SCALE}) // m) END AS v
  FROM w{t}, (SELECT MAX(ABS(w)) AS m FROM w{t}))"""
        )
        prev = f"v{t}"
    return f"""
WITH q AS (
  SELECT list_transform(embedding,
         x -> CAST(round(CAST(x AS DOUBLE) * {PI_QUANT}) AS BIGINT)) AS qv
  FROM {EMB_CLEAN_DUCK} embeddings),
p AS (
  SELECT unnest(flatten(list_transform(range(1, {COV_DIM + 1}),
           i -> list_transform(range(i, {COV_DIM + 1}),
             j -> {{'i': i, 'j': j, 'x': qv[i], 'y': qv[j]}})))) AS s
  FROM q),
g AS (
  SELECT s.i AS i, s.j AS j, COUNT(*) AS n, CAST(SUM(s.x * s.y) AS BIGINT) AS g
  FROM p GROUP BY s.i, s.j),
af AS MATERIALIZED (
  SELECT i, j, CASE WHEN g >= 0 THEN g // n ELSE -((-g) // n) END AS a FROM g
  UNION ALL
  SELECT j, i, CASE WHEN g >= 0 THEN g // n ELSE -((-g) // n) END AS a
  FROM g WHERE i <> j),
v0 AS (SELECT unnest(range(1, {COV_DIM + 1})) AS i,
              CAST({PI_SCALE} AS BIGINT) AS v),
{",".join(steps)}
SELECT i AS dim, CAST(v AS BIGINT) AS v_fp,
       CAST(v AS DOUBLE) / {PI_SCALE} AS component
FROM v{PI_ITERS}
"""


Q_EMBED_POWER_ITERATION_SQL = _power_iteration_sql()


QUERIES = {
    "embed_power_iteration": q_embed_power_iteration,
    "embed_kmeans": q_embed_kmeans,
    "embed_semdedup": q_embed_semdedup,
    "embed_covariance": q_embed_covariance,
    "embed_outliers": q_embed_outliers,
}
ORACLES = {
    "embed_power_iteration": Q_EMBED_POWER_ITERATION_SQL,
    "embed_kmeans": Q_EMBED_KMEANS_SQL,
    "embed_semdedup": Q_EMBED_SEMDEDUP_SQL,
    "embed_covariance": Q_EMBED_COVARIANCE_SQL,
    "embed_outliers": Q_EMBED_OUTLIERS_SQL,
}
