"""Data-profile, anomaly, and bucketed-layout queries vs oracles."""

from __future__ import annotations

import pytest

from spark_ij_spark.operators import layout, profile

from .conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(profile.QUERIES))
def test_profile_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, profile.QUERIES[name], profile.ORACLES[name]
    )


@pytest.mark.parametrize("name", sorted(layout.QUERIES))
def test_layout_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, layout.QUERIES[name], layout.ORACLES[name]
    )


def test_embed_drift_slices_split_evenly_and_cover_corpus(spark, duck):
    """The md5 slice hash must cut the embeddings table into two
    near-equal halves (it's a 60-bit uniform hash mod 2, not a data
    attribute), every dimension of the vector must appear, and the
    reported means must be consistent: mean_shift == mean_b - mean_a
    within the 1e-6 rounding grain whenever both slices are non-empty."""
    rows = profile.QUERIES["embed_drift"](spark, SF_DIR).collect()
    n_vecs = duck.execute(
        f"SELECT COUNT(*), MAX(len(embedding)) FROM "
        f"'{SF_DIR}/embeddings.parquet'"
    ).fetchone()
    total, dims = int(n_vecs[0]), int(n_vecs[1])
    assert len(rows) == dims
    for r in rows:
        assert r["n_a"] + r["n_b"] == total
        # binomial(total, 1/2): allow 5 sigma around the even split
        sigma = (total * 0.25) ** 0.5
        assert abs(r["n_a"] - total / 2) < 5 * sigma + 1
        if r["n_a"] > 0 and r["n_b"] > 0:
            assert abs(r["mean_shift"] - (r["mean_b"] - r["mean_a"])) < 2e-6
        else:
            assert r["mean_shift"] == -1e12


def test_zorder_buckets_balanced_and_prune_both_dims(spark, duck):
    """The z-order layout property: buckets are equal-size (ntile),
    cover the table exactly, and a narrow window on EITHER dimension
    alone intersects well under all bucket bounds — the two-sided
    data-skipping a single-column sort cannot give (it is tight on one
    dimension and spans the other's full range in ~every bucket)."""
    rows = layout.q_zorder_stats(spark, SF_DIR).collect()
    assert len(rows) == layout.Z_BUCKETS
    ns = [r.n for r in rows]
    assert max(ns) - min(ns) <= 1
    (total,) = duck.execute("SELECT COUNT(*) FROM orders").fetchone()
    assert sum(ns) == total

    def frac_hit(bounds, lo, hi):
        hit = sum(1 for a, b in bounds if not (b < lo or a > hi))
        return hit / len(bounds)

    for dim in ("cust", "day"):
        bounds = [(r[f"min_{dim}"], r[f"max_{dim}"]) for r in rows]
        lo = min(a for a, _ in bounds)
        hi = max(b for _, b in bounds)
        mid, w = (lo + hi) // 2, max((hi - lo) // 40, 1)  # ~5% window
        frac = frac_hit(bounds, mid - w, mid + w)
        assert 0 < frac <= 0.75, (dim, frac)


def test_drift_psi_nonnegative_and_covers_corpus(spark, duck):
    """Each PSI contribution (p−q)·ln(p/q) is ≥ 0 by construction
    (both factors share sign); the two slices partition the corpus."""
    rows = profile.q_docs_drift_psi(spark, SF_DIR).collect()
    assert rows
    assert all(r.psi >= 0 for r in rows)
    (total,) = duck.execute("SELECT COUNT(*) FROM documents").fetchone()
    assert sum(r.n_a + r.n_b for r in rows) == total
    # deterministic md5 split → both slices non-empty at this SF
    assert sum(r.n_a for r in rows) > 0 and sum(r.n_b for r in rows) > 0


def test_skew_profile_identifies_heaviest_keys(spark, duck):
    """Top keys match an independent DuckDB heavy-hitter query and the
    ratio column is consistent with cnt/mean."""
    rows = profile.q_join_key_skew(spark, SF_DIR).collect()
    assert len(rows) == profile.SKEW_TOPN
    cnts = [r.cnt for r in rows]
    assert cnts == sorted(cnts, reverse=True)
    (top_cnt,) = duck.execute(
        "SELECT MAX(c) FROM (SELECT COUNT(*) c FROM lineitem GROUP BY l_partkey)"
    ).fetchone()
    assert rows[0].cnt == top_cnt
    for r in rows:
        assert abs(r.skew_ratio - r.cnt / r.mean_cnt) < 1e-4


def test_integrity_audit_accounts_for_every_key(spark, duck):
    """Counts must tile: docs = matched + docs_only, vecs = matched +
    vecs_only, and totals equal the raw table counts."""
    (r,) = profile.q_integrity_docs_embeddings(spark, SF_DIR).collect()
    (nd,) = duck.execute("SELECT COUNT(*) FROM documents").fetchone()
    (nv,) = duck.execute("SELECT COUNT(*) FROM embeddings").fetchone()
    assert r.n_docs == nd and r.n_vecs == nv
    assert r.n_docs == r.n_matched + r.n_docs_only
    assert r.n_vecs == r.n_matched + r.n_vecs_only


def test_cdc_state_is_latest_per_user(spark, duck):
    """Every emitted row must be that user's true max-ts event, and
    n_changes the user's event count (independent DuckDB recount)."""
    from spark_ij_spark.operators import event_windows

    rows = event_windows.q_events_cdc_state(spark, SF_DIR).collect()
    truth = {
        u: (eid, n)
        for u, eid, n in duck.execute(
            "SELECT user_id, arg_max(event_id, ts), COUNT(*)"
            " FROM events GROUP BY user_id"
        ).fetchall()
    }
    assert len(rows) == len(truth)
    for r in rows:
        eid, n = truth[r.user_id]
        assert r.last_event_id == eid and r.n_changes == n


def test_cooccurrence_counts_bounded_by_marginals(spark, duck):
    """n_ab ≤ min(n_a, n_b) against independently recomputed
    marginals; pmi = ln(lift) within rounding."""
    import math

    from spark_ij_spark.operators import event_windows

    rows = event_windows.q_events_cooccurrence(spark, SF_DIR).collect()
    assert rows
    marg = dict(
        duck.execute(
            "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert r.ta < r.tb
        assert 0 < r.n_ab <= min(marg[r.ta], marg[r.tb])
        assert abs(r.pmi - math.log(r.lift)) < 1e-4


def test_weighted_sample_favors_heavy_docs(spark, duck):
    """Exponential-clock sampling with weight = token count must skew
    the sample toward long documents: the pooled sample mean token
    count exceeds the pooled corpus mean (per-stratum means fluctuate
    at k=10, the pooled mean is the stable statistic)."""
    from spark_ij_spark.operators import pipeline

    rows = pipeline.q_pipeline_weighted_sample(spark, SF_DIR).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.n_tokens)
    assert all(len(v) == pipeline.WS_K for v in by_lang.values())
    (corpus_mean,) = duck.execute(
        "SELECT AVG(len(string_split(text, ' '))) FROM documents"
    ).fetchone()
    sample_mean = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_scd2_intervals_tile_per_user(spark, duck):
    """SCD-2 rows per user must form a gapless chain: sorted
    valid_from == previous valid_to, exactly one open (is_current)
    row per user, and row count equals the event count."""
    from spark_ij_spark.operators import event_windows

    rows = event_windows.q_events_scd2(spark, SF_DIR).collect()
    (n_events,) = duck.execute("SELECT COUNT(*) FROM events").fetchone()
    assert len(rows) == n_events
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r.valid_from_us)
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].is_current == 1
        for prev, nxt in zip(rs, rs[1:]):
            assert prev.valid_to_us == nxt.valid_from_us
            assert prev.is_current == 0


def test_calibrated_mix_hits_target_proportions(spark):
    """The binding tier keeps ALL its tokens (budget == avail); kept
    tokens land within one doc of each budget; realized shares track
    the target rationals."""
    from spark_ij_spark.operators import pipeline

    rows = {r.tier: r for r in pipeline.q_pipeline_calibrated_mix(spark, SF_DIR).collect()}
    assert set(rows) == set(pipeline.MIX_TIER_SHARES)
    k = min(
        rows[t].avail_tokens * d // n
        for t, (n, d) in pipeline.MIX_TIER_SHARES.items()
    )
    binding = [t for t, (n, d) in pipeline.MIX_TIER_SHARES.items()
               if rows[t].avail_tokens * d // n == k]
    assert binding
    for t, (n, d) in pipeline.MIX_TIER_SHARES.items():
        r = rows[t]
        assert r.budget_tokens == k * n // d
        assert r.kept_tokens <= r.budget_tokens
        assert r.kept_tokens <= r.avail_tokens
        # greedy fill gets within one (max-sized) document of budget
        assert r.budget_tokens - r.kept_tokens < 100 or r.kept_tokens == r.avail_tokens


def test_gapfill_grid_is_dense_and_ma_consistent(spark, duck):
    """Per type, hours form a contiguous grid from first to last
    activity; zero-filled rows are genuinely absent in the sparse
    counts; the trailing MA at any row equals the mean of its window."""
    from spark_ij_spark.operators import event_windows as ew

    rows = ew.q_events_gapfill(spark, SF_DIR).collect()
    sparse = {
        (t, h): n
        for t, h, n in duck.execute(
            "SELECT event_type, date_trunc('hour', ts), COUNT(*)"
            " FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    by_t = {}
    for r in rows:
        by_t.setdefault(r.event_type, []).append(r)
    import datetime

    for t, rs in by_t.items():
        rs.sort(key=lambda r: r.hour)
        for a, b in zip(rs, rs[1:]):
            assert b.hour - a.hour == datetime.timedelta(hours=1)
        assert any(r.n == 0 for r in rs)  # gaps existed and were filled
        for i, r in enumerate(rs):
            assert r.n == sparse.get((t, r.hour), 0)
            lo = max(0, i - ew.GAPFILL_MA_HOURS + 1)
            want = sum(x.n for x in rs[lo : i + 1]) / ew.GAPFILL_MA_HOURS
            assert abs(r.ma - want) < 1e-6


def test_rfm_scores_are_quartile_consistent(spark):
    """Segment digits are 1-4; each digit's population is roughly a
    quartile (exact quartering is impossible with ties); better
    recency means a HIGHER first digit."""
    from spark_ij_spark.operators import event_windows as ew

    rows = ew.q_events_rfm(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.segment) == 3
        assert all(c in "1234" for c in r.segment)
    # anti-monotone check: the user with max recency_h never outranks
    # (in first digit) the user with min recency_h
    worst = max(rows, key=lambda r: r.recency_h)
    best = min(rows, key=lambda r: r.recency_h)
    assert int(worst.segment[0]) <= int(best.segment[0])
    # population split sanity: no digit bucket holds > 60% of users
    from collections import Counter

    for pos in range(3):
        c = Counter(r.segment[pos] for r in rows)
        assert max(c.values()) <= 0.6 * len(rows)


def test_bloom_prejoin_no_false_negatives(spark, duck):
    """Bloom soundness: candidates ⊇ true matches (n_false_pos ≥ 0 and
    n_candidates = n_true + n_false_pos), and n_true per flag equals
    the exact brand join computed independently."""
    rows = layout.q_bloom_prejoin(spark, SF_DIR).collect()
    assert rows
    exact = dict(
        duck.execute(
            "SELECT l_returnflag, COUNT(*) FROM lineitem"
            " JOIN part ON l_partkey = p_partkey"
            f" WHERE p_brand = '{layout.BLOOM_BRAND}' GROUP BY 1"
        ).fetchall()
    )
    for r in rows:
        assert r.n_candidates == r.n_true + r.n_false_pos
        assert r.n_false_pos >= 0
        assert r.n_true == exact.get(r.l_returnflag, 0)


def test_profile_agrees_with_duckdb_per_column(spark, duck, sf_dir):
    """Spot-check the profile against independently computed stats."""
    rows = {r.col_name: r for r in profile.q_profile_orders(spark, sf_dir).collect()}
    n_distinct, mn, mx = duck.execute(
        "SELECT COUNT(DISTINCT o_totalprice), MIN(o_totalprice),"
        " MAX(o_totalprice) FROM orders"
    ).fetchone()
    r = rows["o_totalprice"]
    assert r.n_distinct == n_distinct and r.n_nulls == 0
    assert r.min_num == mn and r.max_num == mx
    assert r.min_str == "" and r.max_str == ""
    r = rows["o_orderstatus"]
    assert r.min_num == -1.0 and r.max_num == -1.0
    assert r.min_str <= r.max_str and r.min_str != ""


def test_anomalies_are_actual_outliers(spark, duck, sf_dir):
    """Every flagged hour deviates from its type mean by more than
    Z_THRESHOLD sigma (recomputed independently in python)."""
    import math

    rows = profile.q_events_anomalies(spark, sf_dir).collect()
    assert rows
    hourly = duck.execute(
        "SELECT event_type, date_trunc('hour', ts), COUNT(*)"
        " FROM events GROUP BY 1, 2"
    ).fetchall()
    by_type: dict[str, list[int]] = {}
    for t, _, n in hourly:
        by_type.setdefault(t, []).append(n)
    for r in rows:
        ns = by_type[r.event_type]
        mean = sum(ns) / len(ns)
        var = sum(x * x for x in ns) / len(ns) - mean * mean
        assert abs((r.n - mean) / math.sqrt(var)) > profile.Z_THRESHOLD
        assert abs(r.z) > profile.Z_THRESHOLD


def test_bucketed_join_no_exchange_before_join(spark):
    """The whole point: after the amortized bucketed write, the join
    itself plans with ZERO exchange — the only shuffle in the query is
    the final groupBy. (First call writes the tables; the plan is
    asserted on the recurring-call path.)"""
    layout.q_bucketed_join_revenue(spark, SF_DIR)  # ensure tables exist
    df = layout.q_bucketed_join_revenue(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # groupBy only
    assert "EvalPython" not in plan


def test_k_anonymity_partitions_corpus_and_flags_consistently(spark):
    """The equivalence classes must partition the corpus (sizes sum to
    the doc count), every flag/risk column must be derivable from
    group_n alone, and the plan is a single partial-agg shuffle with
    no join."""
    from spark_ij_spark.session import load_tables

    from .conftest import SF_DIR

    df = profile.q_docs_k_anonymity(spark, SF_DIR)
    rows = df.collect()
    n_docs = load_tables(spark, SF_DIR, ["documents"])["documents"].count()
    assert sum(r.group_n for r in rows) == n_docs
    for r in rows:
        assert r.k_anon == int(r.group_n >= profile.KANON_K)
        assert r.risk_pm == 1000 // r.group_n
    # fresh frame: after collect() the finalized AdaptiveSparkPlan
    # prints Final AND Initial sections, double-counting exchanges
    plan = (
        profile.q_docs_k_anonymity(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan


def test_compaction_first_fit_invariants(spark):
    """The sequential first-fit guarantee: a file lands in group g only
    when the bytes before it reach g*target, so within every source the
    prefix sums dominate g*target, file intervals are disjoint and
    ordered, and doc/byte totals are conserved."""
    import duckdb

    from spark_ij_spark.operators.layout import q_layout_compaction

    from .conftest import SF_DIR

    rows = q_layout_compaction(spark, SF_DIR).collect()
    assert rows
    con = duckdb.connect()
    total_docs = con.execute(
        f"SELECT COUNT(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert sum(r.n_docs for r in rows) == total_docs
    by_src = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, groups in by_src.items():
        groups.sort(key=lambda r: r.out_group)
        target = groups[0].target_bytes
        prefix = 0
        prev_last = -1
        for g in groups:
            assert g.target_bytes == target
            assert g.first_file > prev_last, "file intervals must be disjoint"
            prev_last = g.last_file
            assert prefix >= g.out_group * target
            prefix += g.group_bytes
