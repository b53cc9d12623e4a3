"""K-means over embeddings: oracle match + clustering invariants."""

from __future__ import annotations

from spark_ij_spark.operators import clustering

from .conftest import assert_oracle_match


def test_kmeans_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        clustering.QUERIES["embed_kmeans"],
        clustering.ORACLES["embed_kmeans"],
    )


def test_kmeans_partitions_all_vectors(spark, sf_dir, duck):
    rows = clustering.q_embed_kmeans(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    assert len(rows) == total  # every vector assigned exactly once
    clusters = {r.cluster for r in rows}
    assert clusters <= set(range(clustering.KMEANS_K))
    assert len(clusters) > 1, "clustering collapsed to one cell"
    # n_members column is consistent with the actual partition
    from collections import Counter

    sizes = Counter(r.cluster for r in rows)
    for r in rows:
        assert r.n_members == sizes[r.cluster]


def test_kmeans_improves_on_initial_assignment(spark, sf_dir):
    """Lloyd iterations must not worsen the clustering: final
    within-cluster dispersion <= the seed-centroid assignment's (both
    computed with the same integer-exact arithmetic)."""
    import numpy as np

    pts = {
        int(r.vec_id): np.array(r.x)
        for r in clustering._points(spark, sf_dir).collect()
    }
    seeds = [(cid, list(pts[cid])) for cid in range(clustering.KMEANS_K)]

    def cost(cents):
        carr = {cid: np.array(c) for cid, c in cents}
        tot = 0.0
        for x in pts.values():
            tot += min(float(((x - c) ** 2).sum()) for c in carr.values())
        return tot

    final_assign = {
        int(r.vec_id): int(r.cluster)
        for r in clustering.q_embed_kmeans(spark, sf_dir).collect()
    }
    # reconstruct final centroids from the final assignment
    by_c: dict[int, list] = {}
    for vid, cl in final_assign.items():
        by_c.setdefault(cl, []).append(pts[vid])
    final_cents = [(cl, list(np.mean(np.stack(v), axis=0))) for cl, v in by_c.items()]
    assert cost(final_cents) <= cost(seeds)


def test_semdedup_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        clustering.QUERIES["embed_semdedup"],
        clustering.ORACLES["embed_semdedup"],
    )


def test_semdedup_drops_are_sound(spark, sf_dir, duck):
    """vec_id 0 can never be dropped (no smaller-id neighbor exists),
    the kill list is a strict subset of the corpus, and cells come from
    the seed id range."""
    rows = clustering.q_embed_semdedup(spark, sf_dir).collect()
    total = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()[0]
    dropped = {r.vec_id for r in rows}
    assert 0 < len(dropped) < total
    assert 0 not in dropped
    assert len(dropped) == len(rows)  # distinct vec_ids
    assert {r.cell for r in rows} <= set(range(clustering.KMEANS_K))


def test_covariance_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        clustering.QUERIES["embed_covariance"],
        clustering.ORACLES["embed_covariance"],
    )


def test_covariance_partials_agree_with_numpy(spark, sf_dir):
    """Derived cov from the integer partials equals numpy's biased
    covariance on the same quantized matrix (exactly, both int64)."""
    import numpy as np

    from spark_ij_spark.operators.dedup import quantized_embeddings

    m = np.array(
        [r.qv for r in quantized_embeddings(spark, sf_dir).collect()],
        dtype=np.int64,
    )
    rows = clustering.q_embed_covariance(spark, sf_dir).collect()
    assert len(rows) == clustering.COV_DIM * (clustering.COV_DIM + 1) // 2
    n = m.shape[0]
    for r in rows[:: 97]:  # spot-check a spread of pairs
        x, y = m[:, r.i - 1], m[:, r.j - 1]
        assert r.n == n
        assert r.s_x == int(x.sum())
        assert r.s_y == int(y.sum())
        assert r.s_xy == int(np.dot(x, y))
    diag = {(r.i, r.j): r for r in rows if r.i == r.j}
    for (i, _), r in list(diag.items())[:5]:
        # Σx² ≥ (Σx)²/n: variance of a real column is non-negative
        assert r.s_xy * r.n >= r.s_x * r.s_x


def test_outliers_match_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        clustering.QUERIES["embed_outliers"],
        clustering.ORACLES["embed_outliers"],
    )


def test_outliers_are_farthest_fraction(spark, sf_dir):
    """Per cell: kept count == ceil(n_cell/16); the pruned dist² are
    all >= every survivor's dist² in that cell (they really are the
    far tail); ranks contiguous from 1."""
    rows = clustering.q_embed_outliers(spark, sf_dir).collect()
    assert rows
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    # recompute per-cell totals + full dist2 sets independently
    import math

    from pyspark.sql import functions as F

    pts = clustering._points(spark, sf_dir)
    cents = [
        (int(r.vec_id), [float(v) for v in r.x])
        for r in pts.filter(F.col("vec_id") < clustering.KMEANS_K).collect()
    ]
    cents.sort()
    full = pts.select(
        "vec_id", clustering._best_cluster_expr(cents).alias("cell"), "x"
    ).collect()
    cellmap: dict[int, list[tuple[int, int]]] = {}
    for r in full:
        c = dict(cents)[r.cell]
        d2 = int(sum((a - b) * (a - b) for a, b in zip(r.x, c)))
        cellmap.setdefault(r.cell, []).append((r.vec_id, d2))
    for cell, kept in by_cell.items():
        allpts = cellmap[cell]
        assert len(kept) == math.ceil(len(allpts) / 16)
        kept_ids = {r.vec_id for r in kept}
        floor_kept = min(r.dist2 for r in kept)
        for vid, d2 in allpts:
            if vid not in kept_ids:
                assert d2 <= floor_kept
        assert sorted(r.rn for r in kept) == list(range(1, len(kept) + 1))


def test_power_iteration_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        clustering.QUERIES["embed_power_iteration"],
        clustering.ORACLES["embed_power_iteration"],
    )


def test_power_iteration_reaches_top_eigenspace(spark, sf_dir):
    """The synthetic embeddings are near-isotropic (λ2/λ1 ≈ 0.98 —
    the same property that zeroes LSH recall here), so power iteration
    cannot quickly separate the near-degenerate top eigenVECTORS; the honest
    convergence claim is on the Rayleigh quotient: the iterate's
    energy must sit within 5% of numpy's λmax of the SAME
    N-normalized quantized matrix. Also checks the deterministic
    max-normalization invariant (max|v_fp| == PI_SCALE)."""
    import numpy as np

    rows = clustering.q_embed_power_iteration(spark, sf_dir).collect()
    v = np.array([r.v_fp for r in sorted(rows, key=lambda r: r.dim)], dtype=float)
    assert int(np.abs(v).max()) == clustering.PI_SCALE

    emb = np.stack(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .toPandas()["embedding"]
        .to_numpy()
    ).astype(np.float64)
    q = np.round(emb * clustering.PI_QUANT)
    g = (q.T @ q).astype(np.int64)
    # mirror the op's sign-explicit truncating division (numpy // floors)
    a = np.where(g >= 0, g // len(q), -((-g) // len(q)))
    ww = np.linalg.eigvalsh(a.astype(float))
    rq = float(v @ a @ v) / float(v @ v)
    assert rq >= 0.95 * ww.max(), (rq, ww.max())
