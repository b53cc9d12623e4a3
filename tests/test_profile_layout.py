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


def test_bucketed_join_matches_oracle(spark, duck):
    assert_oracle_match(
        spark,
        duck,
        layout.QUERIES["bucketed_join_revenue"],
        layout.ORACLES["bucketed_join_revenue"],
    )


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
