"""ROI geometry kernels + SQL surface (Spiji.java:515-613 parity)."""

from __future__ import annotations

import json

import numpy as np
import pytest

from spark_ij_spark.kernels import roi as R


def test_set_get_roundtrip_and_unknown_type():
    info = R.set_roi("", [1, 2], [3, 4], "rectangle")
    roi = R.get_roi(info)
    assert roi == {"type": "RECTANGLE", "xs": [1.0, 2.0], "ys": [3.0, 4.0]}
    with pytest.raises(ValueError, match="unknown ROI type"):
        R.set_roi("", [0], [0], "BLOB")
    with pytest.raises(ValueError, match="equal length"):
        R.set_roi("", [0, 1], [0], "LINE")


def test_set_roi_preserves_existing_info_text():
    info = R.set_roi("free text metadata", [0, 1], [0, 1], "LINE")
    d = json.loads(info)
    assert d["text"] == "free text metadata"
    assert R.get_roi(info)["type"] == "LINE"


def test_calibrated_get_applies_pixel_size_and_origin():
    info = R.set_roi("", [2.0, 4.0], [10.0, 20.0], "RECTANGLE")
    meta = {"pixel_width": 0.5, "pixel_height": 2.0, "x_origin": 2.0, "y_origin": 0.0}
    cal = R.get_roi(info, meta, calibrated=True)
    assert cal["xs"] == [0.0, 1.0]  # (x - 2) * 0.5
    assert cal["ys"] == [20.0, 40.0]  # y * 2
    # NOCAL leaves raw pixel coords
    assert R.get_roi(info, meta, calibrated=False)["xs"] == [2.0, 4.0]


def test_rectangle_mask_half_open():
    m = R.roi_mask((4, 6), {"type": "RECTANGLE", "xs": [1, 4], "ys": [1, 3]})
    assert m.sum() == 3 * 2
    assert m[1, 1] and m[2, 3] and not m[3, 3] and not m[1, 4]


def test_oval_mask_inscribed():
    m = R.roi_mask((10, 10), {"type": "OVAL", "xs": [0, 10], "ys": [0, 10]})
    assert m[5, 5] and not m[0, 0] and not m[9, 9]
    assert 50 < m.sum() < 90  # ~π/4 of the 100-px bounding box


def test_polygon_mask_triangle():
    tri = {"type": "POLYGON", "xs": [0, 8, 0], "ys": [0, 0, 8]}
    m = R.roi_mask((9, 9), tri)
    assert m[1, 1] and not m[8, 8]
    assert abs(int(m.sum()) - 32) <= 8  # ≈ half the 8x8 square


def test_point_and_line_masks():
    p = R.roi_mask((5, 5), {"type": "POINT", "xs": [2], "ys": [3]})
    assert p.sum() == 1 and p[3, 2]
    ln = R.roi_mask((5, 5), {"type": "LINE", "xs": [0, 4], "ys": [0, 4]})
    assert ln.sum() == 5 and all(ln[i, i] for i in range(5))


def test_roi_measure_restricts_stats():
    arr = np.arange(12, dtype="float32").reshape(3, 4, 1)
    roi = {"type": "RECTANGLE", "xs": [0, 2], "ys": [0, 1]}  # pixels 0,1
    s = R.roi_measure(arr, roi)
    assert (s["min"], s["max"], s["pts"]) == (0.0, 1.0, 2.0)
    assert s["mean"] == 0.5


def test_sql_roi_surface(spark, sf_dir):
    from spark_ij_spark.functions.sql import register_imagej
    from spark_ij_spark.operators.images import create_empty_images

    register_imagej(spark)
    create_empty_images(
        spark, "r", 3, width=6, height=4, value_fn=lambda i: float(i)
    ).createOrReplaceTempView("roi_imgs")
    rows = spark.sql(
        """
        SELECT sample,
               getroi(setroi(image, 'OVAL', array(0.0D, 6.0D), array(0.0D, 4.0D)), false) AS roi,
               roistats(setroi(image, 'RECTANGLE', array(1.0D, 3.0D), array(1.0D, 3.0D)))['pts'] AS pts
        FROM roi_imgs
        """
    ).collect()
    assert len(rows) == 3
    for r in rows:
        assert json.loads(r.roi)["type"] == "OVAL"
        assert r.pts == 4.0  # 2x2 rectangle
