"""Image data model + kernels, following the reference's test strategy
(SURVEY.md §5): analytic expectations for single ops, statistical
invariants for noise, dimension-convention checks, lineage round-trips."""

from __future__ import annotations

import json

import numpy as np
import pytest

from spark_ij_spark.kernels.histogram import hist_distance, histogram
from spark_ij_spark.kernels.particles import analyze_particles, label_components
from spark_ij_spark.operators.images import (
    assemble_stacks,
    combine_images,
    create_empty_images,
    explode_pixels,
    get_statistics,
    image_histogram,
    run_all,
    run_with_table,
)
from spark_ij_spark.registry import list_commands, run_op


@pytest.fixture(scope="module")
def images5(spark):
    # 5 constant images, value = 1000*i + 1000 (SpijiTests.scala:33-34 flavor)
    return create_empty_images(
        spark, "img:", 5, width=20, height=10, value_fn=lambda i: 1000.0 * i + 1000.0
    ).cache()


def test_registry_has_expected_ops():
    cmds = list_commands()
    for expected in [
        "Add Noise",
        "Median...",
        "Auto Threshold",
        "Convert to Mask",
        "Analyze Particles...",
        "applyThreshold",
        "setThreshold",
        "8-bit",
        "32-bit",
    ]:
        assert expected in cmds
    assert len(cmds) >= 25


def test_create_empty_images_schema_and_values(spark, images5):
    rows = get_statistics(images5).select("sample", "stats.*").collect()
    assert len(rows) == 5
    by_key = {r["sample"]: r for r in rows}
    for i in range(5):
        r = by_key[f"img:{i}"]
        assert r["mean"] == 1000.0 * i + 1000.0
        assert r["stdDev"] == 0.0
        assert r["pts"] == 200.0


def test_dimension_convention(spark, images5):
    img = images5.first()["image"]
    assert list(img["shape"]) == [10, 20, 1]  # [height][width][slices]


def test_noise_invariants(spark, images5):
    """stddev(noise twice) > stddev(noise) > stddev(const) ≈ 0
    (SpijiTests.scala:297-310)."""
    base = get_statistics(images5).select("stats.stdDev").first()[0]
    once = get_statistics(run_all(images5, "Add Noise")).select("stats.stdDev").first()[0]
    twice = get_statistics(
        run_all(run_all(images5, "Add Noise"), "Add Noise")
    ).select("stats.stdDev").first()[0]
    assert base == pytest.approx(0.0)
    assert once > 1.0
    assert twice > once


def test_threshold_pipeline_drives_mean_to_255(spark, images5):
    """applyThreshold with an all-inclusive range → all pixels 255
    (SpijiTests.scala:345-371)."""
    noisy = run_all(images5, "Add Noise")
    masked = run_all(noisy, "applyThreshold", "lower=0 upper=1e9")
    stats = get_statistics(masked).select("stats.*").collect()
    for r in stats:
        assert r["mean"] == 255.0
        assert r["stdDev"] == 0.0


def test_stats_match_exploded_pixels(spark, images5):
    """Cross-check the UDF reduce against the relational pixel view."""
    noisy = run_all(images5, "Add Noise").cache()
    from pyspark.sql import functions as F

    udf_stats = {
        r["sample"]: r
        for r in get_statistics(noisy).select("sample", "stats.*").collect()
    }
    rel_stats = {
        r["sample"]: r
        for r in explode_pixels(noisy)
        .groupBy("sample")
        .agg(
            F.min("value").alias("min"),
            F.avg("value").alias("mean"),
            F.max("value").alias("max"),
            F.count("value").alias("pts"),
        )
        .collect()
    }
    for k, u in udf_stats.items():
        rdata = rel_stats[k]
        assert u["min"] == rdata["min"]
        assert u["mean"] == pytest.approx(rdata["mean"], rel=1e-12)
        assert u["max"] == rdata["max"]
        assert u["pts"] == rdata["pts"]


def test_histogram_constant_image_analytic(spark):
    """Constant-5 image, bins=3 on [0,10]: middle bin holds all pixels
    (SpijiTests.scala:176-186)."""
    centers, counts = histogram(np.full((10, 20), 5.0), (0.0, 10.0), 3)
    assert centers.tolist() == [0.0, 5.0, 10.0]
    assert counts.tolist() == [0, 200, 0]


def test_histogram_distance_identities():
    """self=0, disjoint=1, noisy in between (SpijiTests.scala:209-231)."""
    # fixed-range histograms share a center lattice (as ImageJ's uint8
    # histograms do) — the discrete converter only overlaps aligned bins
    rng = np.random.default_rng(42)
    a = np.full((50, 50), 100.0)
    b = np.full((50, 50), 200.0)
    noisy = a + rng.normal(0, 10, a.shape)
    fixed = (0.0, 255.0)
    ca, na = histogram(a, fixed, 256)
    cb, nb = histogram(b, fixed, 256)
    cn, nn = histogram(noisy, fixed, 256)
    assert hist_distance(ca, na, ca, na) == pytest.approx(0.0)
    assert hist_distance(ca, na, cb, nb) == pytest.approx(1.0)
    d = hist_distance(ca, na, cn, nn)
    assert 0.0 < d < 1.0


def test_image_histogram_column(spark, images5):
    row = images5.select(
        image_histogram("image", (0.0, 10000.0), 5).alias("h")
    ).first()["h"]
    assert len(row["bin_centers"]) == 5
    assert sum(row["bin_counts"]) == 200


def test_subtract_self_is_zero(spark, images5):
    paired = images5.withColumn("img2", images5["image"])
    diff = paired.withColumn("image", combine_images("image", "img2", "subtract"))
    stats = get_statistics(diff).select("stats.*").collect()
    for r in stats:
        assert r["mean"] == 0.0 and r["min"] == 0.0 and r["max"] == 0.0


def test_merge_lineage_nesting(spark, images5):
    paired = images5.withColumn("img2", images5["image"])
    diff = paired.withColumn("image", combine_images("image", "img2", "subtract"))
    log = diff.select("image.log").first()[0]
    assert len(log) == 1
    entry = log[0]
    assert entry["optype"] == "MERGE"
    children = json.loads(entry["children_json"])
    assert len(children) == 2
    assert children[0][0]["opval"] == "createEmptyImages"


def test_run_appends_lineage(spark, images5):
    out = run_all(run_all(images5, "Add Noise"), "Median...", "radius=2")
    log = out.select("image.log").first()[0]
    assert [e["opval"] for e in log] == ["createEmptyImages", "Add Noise", "Median..."]


def test_stack_assembly_dimension(spark):
    """Stack build: n images of w×h → [h][w][n] (SpijiTests.scala:232-256)."""
    df = create_empty_images(
        spark, "s", 4, width=30, height=20, value_fn=lambda i: float(i)
    ).withColumn("group", __import__("pyspark.sql.functions", fromlist=["lit"]).lit("g"))
    stacked = assemble_stacks(df, "group").first()["image"]
    assert list(stacked["shape"]) == [20, 30, 4]


def test_label_components_two_blobs():
    mask = np.zeros((20, 20), dtype=bool)
    mask[2:5, 2:5] = True
    mask[10:15, 10:18] = True
    labels, n = label_components(mask)
    assert n == 2
    assert (labels > 0).sum() == 9 + 40


def test_analyze_particles_measurements():
    img = np.zeros((20, 20), dtype=np.uint8)
    img[2:5, 2:5] = 10
    img[10:15, 10:18] = 20
    table = analyze_particles(img)
    assert len(table["Area"]) == 2
    assert sorted(table["Area"]) == [9.0, 40.0]
    assert sorted(table["Mean"]) == [10.0, 20.0]
    # particle invariants (SpijiTests.scala:88-108)
    assert sum(table["Area"]) < img.size
    assert all(mn <= mx for mn, mx in zip(table["Min"], table["Max"]))


def test_run_with_table(spark, images5):
    noisy = run_all(images5, "Add Noise")
    masked = run_all(noisy, "Auto Threshold", "method=IsoData white")
    out = run_with_table(masked, "Analyze Particles...", "display clear")
    row = out.select("table").first()["table"]
    assert "Area" in row and len(row["Area"]) > 0


def test_calibration_preserved_through_ops(spark):
    """Calibration survives serialize → op → tabulate
    (SpijiTests.scala:109-140)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from spark_ij_spark.datamodel import IMAGE_SCHEMA, np_to_image
    from pyspark.sql.types import StringType, StructField, StructType

    def gen(batches):
        for pdf in batches:
            rows = [
                {
                    "sample": f"c{int(i)}",
                    "image": np_to_image(
                        np.full((4, 6), 7.0, dtype="float32"),
                        meta={"pixel_width": 0.5, "pixel_height": 0.25, "unit": "mm"},
                    ),
                }
                for i in pdf["id"]
            ]
            yield pd.DataFrame(rows)

    schema = StructType(
        [StructField("sample", StringType()), StructField("image", IMAGE_SCHEMA)]
    )
    df = __import__("pyspark.sql", fromlist=["SparkSession"]).SparkSession.getActiveSession().range(2).mapInPandas(gen, schema)
    out = run_all(df, "Add Noise")
    meta = out.select("image.meta").first()[0]
    assert meta["pixel_width"] == 0.5
    assert meta["pixel_height"] == 0.25
    assert meta["unit"] == "mm"


def test_convert_array_type_lattice():
    from spark_ij_spark.datamodel import convert_array_type

    a = np.array([0, 100, 255], dtype=np.uint8)
    f = convert_array_type(a, "float32", is_signed=True, scale=2.0)
    # (v - 127/2) * 2
    assert f.tolist() == pytest.approx([(v - 63.5) * 2.0 for v in [0, 100, 255]])
    back = convert_array_type(f.astype("float32"), "uint8", is_signed=True, scale=2.0)
    assert back.dtype == np.uint8
    b = convert_array_type(np.array([0.0, 1.0, -1.0]), "bool")
    assert b.tolist() == [False, True, False]


def test_rgb_reduction_strategies():
    from spark_ij_spark.datamodel import rgb_to_gray

    rgb = np.zeros((2, 2, 1, 3), dtype=np.uint8)
    rgb[..., 0] = 10
    rgb[..., 1] = 20
    rgb[..., 2] = 60
    assert rgb_to_gray(rgb, "MEAN")[0, 0, 0] == pytest.approx(30.0)
    assert rgb_to_gray(rgb, "SUM")[0, 0, 0] == pytest.approx(90.0)
    assert rgb_to_gray(rgb, "RED")[0, 0, 0] == 10.0
    assert rgb_to_gray(rgb, "BLUE")[0, 0, 0] == 60.0


def test_ingest_coercions():
    from spark_ij_spark.datamodel import coerce_ingest

    assert coerce_ingest(np.array([70000], dtype=np.int64)).dtype == np.uint16
    assert coerce_ingest(np.array([70000], dtype=np.int64))[0] == 70000 & 0xFFFF
    assert coerce_ingest(np.array([1.5], dtype=np.float64)).dtype == np.float32
    assert coerce_ingest(np.array([True])).tolist() == [255]


def test_unknown_op_suggests():
    with pytest.raises(KeyError, match="did you mean"):
        run_op(np.zeros((2, 2)), "Add Nois")
