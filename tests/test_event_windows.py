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


def test_events_load_without_builder_conf(spark, sf_dir):
    """The driver hands queries() its own SparkSession, built without
    get_spark()'s nanosAsLong conf — load_tables must still read the
    TIMESTAMP(NANOS) events.parquet by setting the conf at runtime."""
    from spark_ij_spark.session import load_tables

    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    try:
        ev = load_tables(spark, sf_dir, ["events"])["events"]
        assert ev.schema["ts"].dataType.typeName() == "timestamp"
        assert ev.limit(1).count() == 1
    finally:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
