"""Image-kernel queries against their DuckDB oracles (the driver gate)."""

from __future__ import annotations

import pytest

from spark_ij_spark.operators import image_queries

from .conftest import assert_oracle_match


@pytest.mark.parametrize("name", sorted(image_queries.QUERIES))
def test_image_query_matches_oracle(spark, duck, name):
    assert_oracle_match(
        spark, duck, image_queries.QUERIES[name], image_queries.ORACLES[name]
    )
