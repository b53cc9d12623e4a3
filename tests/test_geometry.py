"""Geometry + morphology named ops (registry-dispatched)."""

from __future__ import annotations

import numpy as np

from spark_ij_spark.registry import list_commands, run_op


def _img(a):
    return np.asarray(a, dtype="float32")[:, :, np.newaxis]


def test_registry_includes_geometry_ops():
    cmds = list_commands()
    for c in (
        "Rotate 90 Degrees Right",
        "Flip Horizontally",
        "Translate...",
        "Crop",
        "Bin...",
        "Erode",
        "Dilate",
        "Fill Holes",
        "Outline",
    ):
        assert c in cmds


def test_rotate_and_flip_roundtrip():
    a = _img([[1, 2], [3, 4], [5, 6]])
    r, _ = run_op(a, "Rotate 90 Degrees Right")
    assert r.shape[:2] == (2, 3)
    back, _ = run_op(r, "Rotate 90 Degrees Left")
    np.testing.assert_array_equal(back, a)
    f, _ = run_op(a, "Flip Horizontally")
    ff, _ = run_op(f, "Flip Horizontally")
    np.testing.assert_array_equal(ff, a)


def test_translate_zero_fills():
    a = _img([[1, 2], [3, 4]])
    t, _ = run_op(a, "Translate...", "x=1 y=0")
    assert t[0, 0, 0] == 0 and t[0, 1, 0] == 1


def test_crop_and_bin():
    a = _img(np.arange(16).reshape(4, 4))
    c, _ = run_op(a, "Crop", "x=1 y=1 width=2 height=2")
    assert c.shape[:2] == (2, 2) and c[0, 0, 0] == 5
    b, _ = run_op(a, "Bin...", "x=2 y=2 bin=average")
    assert b.shape[:2] == (2, 2)
    assert float(b[0, 0, 0]) == (0 + 1 + 4 + 5) / 4


def test_morphology_open_removes_speck_keeps_block():
    s = np.zeros((7, 7), dtype="float32")
    s[1, 1] = 255  # isolated speck
    s[3:6, 3:6] = 255  # 3x3 block
    a = s[:, :, np.newaxis]
    opened, _ = run_op(a, "Open")
    assert opened[1, 1, 0] == 0  # speck gone
    assert opened[4, 4, 0] == 255  # block survives


def test_fill_holes_and_outline():
    s = np.zeros((7, 7), dtype="float32")
    s[1:6, 1:6] = 255
    s[3, 3] = 0  # hole
    filled, _ = run_op(s[:, :, np.newaxis], "Fill Holes")
    assert filled[3, 3, 0] == 255
    ol, _ = run_op(filled, "Outline")
    assert ol[1, 1, 0] == 255 and ol[3, 3, 0] == 0


def test_erode_dilate_inverse_on_big_block():
    s = np.zeros((9, 9), dtype="float32")
    s[2:7, 2:7] = 255
    a = s[:, :, np.newaxis]
    er, _ = run_op(a, "Erode")
    assert er[2, 2, 0] == 0 and er[4, 4, 0] == 255
    di, _ = run_op(er, "Dilate")
    np.testing.assert_array_equal(di, a)  # closing recovers convex block


def test_make_substack_slice_extract():
    a = np.stack(
        [np.full((2, 2), k, dtype="float32") for k in range(5)], axis=2
    )
    one, _ = run_op(a, "Make Substack...", "first=3 last=3")
    assert one.shape == (2, 2, 1) and one[0, 0, 0] == 2.0  # 1-based
    rng, _ = run_op(a, "Make Substack...", "first=2 last=4")
    assert rng.shape == (2, 2, 3)


def test_distance_map_properties():
    s = np.zeros((9, 9), dtype="float32")
    s[2:7, 2:7] = 255  # 5x5 block
    d, _ = run_op(s[:, :, np.newaxis], "Distance Map")
    d2 = d[:, :, 0]
    assert d2[0, 0] == 0.0  # background
    assert d2[2, 2] == 1.0  # block corner: 1 step from background
    assert float(d2[4, 4]) == 3.0  # block center: 3 orthogonal steps
    # distance grows monotonically toward the center along the row
    assert d2[4, 2] <= d2[4, 3] <= d2[4, 4]
    # (3,3) is 2 pixels inside: cheapest chamfer path is two orthogonal
    # steps = (3+3)/3 = 2 (beats the diagonal 4+4)
    assert d2[3, 3] == 2.0


def test_skeletonize_thins_thick_line():
    s = np.zeros((9, 15), dtype="float32")
    s[3:6, 2:13] = 255  # 3-px-thick horizontal bar
    sk, _ = run_op(s[:, :, np.newaxis], "Skeletonize")
    sk2 = sk[:, :, 0]
    assert sk2.sum() > 0
    # every column that retains foreground is thinned to a single pixel
    cols = (sk2 > 0).sum(axis=0)
    assert cols.max() == 1
    # skeleton is a subset of the original foreground
    assert ((sk2 > 0) & (s == 0)).sum() == 0
    # idempotent on an already-thin line
    again, _ = run_op(sk, "Skeletonize")
    np.testing.assert_array_equal(again, sk)


def test_ultimate_points_marks_blob_centers():
    s = np.zeros((9, 19), dtype="float32")
    s[2:7, 2:7] = 255   # 5x5 block centered at (4,4)
    s[2:7, 12:17] = 255  # 5x5 block centered at (4,14)
    up, _ = run_op(s[:, :, np.newaxis], "Ultimate Points")
    u = up[:, :, 0]
    assert u[4, 4] == 255 and u[4, 14] == 255  # both centers marked
    assert u[0, 0] == 0 and u[2, 2] == 0  # background/corners unmarked
    assert (u > 0).sum() <= 10  # a handful of markers, not the blobs


def test_watershed_splits_touching_disks():
    from spark_ij_spark.kernels.particles import analyze_particles

    yy, xx = np.mgrid[0:13, 0:20]
    disk_a = (yy - 6) ** 2 + (xx - 6) ** 2 <= 16
    disk_b = (yy - 6) ** 2 + (xx - 13) ** 2 <= 16
    s = np.where(disk_a | disk_b, 255.0, 0.0).astype("float32")
    # fused: one component before watershed
    before = analyze_particles(s[:, :, np.newaxis])
    assert len(before.get("Area", [])) == 1
    ws, _ = run_op(s[:, :, np.newaxis], "Watershed")
    after = analyze_particles(ws)
    assert len(after.get("Area", [])) == 2  # split into two objects
    # the split only removes the 1-px line, not whole regions
    assert (ws > 0).sum() > 0.8 * (s > 0).sum()


def test_watershed_single_object_unchanged():
    s = np.zeros((9, 9), dtype="float32")
    s[2:7, 2:7] = 255
    ws, _ = run_op(s[:, :, np.newaxis], "Watershed")
    np.testing.assert_array_equal(ws[:, :, 0], s)


def test_resize_and_invert_lut():
    a = _img(np.arange(16).reshape(4, 4))
    r, _ = run_op(a, "Size...", "width=2 height=2")
    assert r.shape[:2] == (2, 2)
    mask = np.where(np.arange(9).reshape(3, 3) % 2 == 0, 255.0, 0.0).astype("float32")
    inv, _ = run_op(mask[:, :, np.newaxis], "Invert LUT")
    assert inv[0, 0, 0] == 0 and inv[0, 1, 0] == 255
