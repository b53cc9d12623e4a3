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


def test_vectorized_particles_equal_kernel(spark, sf_dir):
    """The batch-vectorized run detection in q_img_threshold_particles
    must agree image-for-image with the general applyThreshold +
    analyze_particles kernel path."""
    from spark_ij_spark.datamodel import image_to_np
    from spark_ij_spark.kernels.particles import analyze_particles
    from spark_ij_spark.registry import run_op

    imgs = image_queries.order_quantity_images(spark, sf_dir).limit(200).collect()
    got = {
        r.l_orderkey: (r.n_particles, r.total_area)
        for r in image_queries.q_img_threshold_particles(spark, sf_dir).collect()
    }
    for row in imgs:
        arr = image_to_np(row.image)
        masked, _ = run_op(arr, "applyThreshold", "lower=25 upper=1e9", {})
        areas = analyze_particles(masked).get("Area", [])
        assert got[row.l_orderkey] == (len(areas), float(sum(areas)))
