"""Relational surface: every query must hash-match its DuckDB oracle
(the driver's correctness gate, replicated locally at sf0.001)."""

from __future__ import annotations

import pytest

from spark_ij_spark.operators import relational

from .conftest import assert_oracle_match

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
