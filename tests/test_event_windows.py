"""Batch event-window queries against their DuckDB oracles."""

from __future__ import annotations

import pytest

from spark_ij_spark.operators import event_windows

from .conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(event_windows.QUERIES))
def test_event_window_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, event_windows.QUERIES[name], event_windows.ORACLES[name]
    )
