"""Relational surface: every query must hash-match its DuckDB oracle
(the driver's correctness gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from spark_ij_spark.operators import relational

from .conftest import SF_DIR, assert_oracle_match

QUERY_NAMES = sorted(relational.QUERIES)


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, relational.QUERIES[name], relational.ORACLES[name]
    )


def test_q1_returns_rows(spark, sf_dir):
    df = relational.q1_pricing_summary(spark, sf_dir)
    assert df.count() > 0
    assert "sum_qty" in df.columns


def test_grouping_sets_totals_consistent(spark, sf_dir):
    """gid identifies the grouping: detail rows (gid 0) sum to the
    grand total (gid 3); each one-dimension slice (gid 1 or 2) also
    sums to the grand total; single Expand+aggregate plan."""
    from spark_ij_spark.operators.relational import q_grouping_sets

    rows = q_grouping_sets(spark, sf_dir).collect()
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    assert set(by_gid) == {0, 1, 2, 3}
    grand = by_gid[3]
    assert len(grand) == 1 and grand[0].status == "ALL" and grand[0].priority == "ALL"
    total = grand[0].n_orders
    assert sum(r.n_orders for r in by_gid[0]) == total
    assert sum(r.n_orders for r in by_gid[1]) == total  # status slices
    assert sum(r.n_orders for r in by_gid[2]) == total  # priority slices
    plan = (
        q_grouping_sets(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Expand" in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_pareto_frontier_matches_bruteforce(spark, duck):
    """Skyline correctness against the O(n²) definition: a frontier
    row is never strictly dominated, and every dominated order is
    excluded (checked per priority with numpy broadcasting)."""
    import numpy as np

    # SF_DIR, not a hardcoded path: the duck fixture's views follow
    # SPARK_GRAFT_TEST_SF_DIR, and both sides must read the same SF.
    got = {
        (r.o_orderpriority, r.o_orderkey)
        for r in relational.q_pareto_orders(spark, SF_DIR).collect()
    }
    raw = duck.execute(
        "SELECT o_orderpriority, o_orderkey, o_totalprice, o_orderdate"
        " FROM orders"
    ).fetchall()
    by_prio = {}
    for prio, key, price, date in raw:
        by_prio.setdefault(prio, []).append((key, price, date))
    want = set()
    for prio, rows in by_prio.items():
        price = np.array([r[1] for r in rows])
        date = np.array([r[2] for r in rows])
        for i, (key, p, d) in enumerate(rows):
            dominated = ((price > p) & (date > d)).any()
            if not dominated:
                want.add((prio, key))
    assert got == want
