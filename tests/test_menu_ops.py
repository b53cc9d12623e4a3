"""Menu-staple kernels: registry breadth + semantic invariants
(mirrors the reference's >100-command assertion, DDLTests.scala:34)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from spark_ij_spark.registry import list_commands, run_op

img8 = arrays(
    np.uint8, st.tuples(st.integers(4, 12), st.integers(4, 12)),
    elements=st.integers(0, 255),
)


def test_registry_exceeds_100_commands():
    cmds = list_commands()
    assert len(cmds) > 100, f"only {len(cmds)} commands registered"
    assert len(set(cmds)) == len(cmds)


@settings(max_examples=25, deadline=None)
@given(img8, st.integers(0, 255))
def test_min_max_clamp_bounds(a, v):
    lo, _ = run_op(a, "Min...", f"value={v}")
    hi, _ = run_op(a, "Max...", f"value={v}")
    assert lo.min() >= v and hi.max() <= v
    assert lo.dtype == a.dtype == hi.dtype


@settings(max_examples=25, deadline=None)
@given(img8, st.integers(0, 255))
def test_xor_is_involution_and_or_identity(a, v):
    x1, _ = run_op(a, "XOR...", f"value={v}")
    x2, _ = run_op(x1, "XOR...", f"value={v}")
    assert (x2 == a).all()
    o, _ = run_op(a, "OR...", "value=0")
    assert (o == a).all()
    z, _ = run_op(a, "AND...", "value=255")
    assert (z == a).all()


@settings(max_examples=25, deadline=None)
@given(img8)
def test_reciprocal_matches_ieee(a):
    r, _ = run_op(a, "Reciprocal", None)
    assert r.dtype == np.float32
    nz = a > 0
    assert np.allclose(r[nz], 1.0 / a[nz].astype(np.float64), rtol=1e-6)
    assert np.isinf(r[~nz]).all()


def test_apply_offset_converts_to_float():
    """uint16 CT data − 1024 must go negative, not clamp at 0
    (reference: PortableImagePlus.scala:190-195)."""
    ct = np.array([[0, 500], [1024, 3000]], dtype=np.uint16)
    out, _ = run_op(ct, "applyOffset", None)
    assert out.dtype == np.float32
    assert out.min() == -1024.0 and out.max() == 3000.0 - 1024.0
    clamped, _ = run_op(ct, "Add...", "value=-1024")
    assert clamped.min() == 0  # the in-dtype op clamps — different semantics


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 250))
def test_shadows_preserve_flat_regions(v):
    a = np.full((8, 8), v, dtype=np.uint8)
    for d in ("North", "South", "East", "West",
              "Northeast", "Northwest", "Southeast", "Southwest"):
        out, _ = run_op(a, d, None)
        assert (out == v).all(), d  # kernels sum to 1


def test_unsharp_mask_fixed_point_on_flat():
    a = np.full((10, 10), 77, dtype=np.uint8)
    out, _ = run_op(a, "Unsharp Mask...", "radius=2 mask=0.6")
    assert (out == 77).all()


def test_top_hat_removes_flat_background():
    a = np.full((12, 12), 40, dtype=np.uint8)
    a[6, 6] = 200  # small bright peak survives, background goes to 0
    out, _ = run_op(a, "Top Hat...", "radius=2")
    assert out[0, 0] == 0 and out[6, 6] > 0


def test_remove_outliers_kills_hot_pixel():
    a = np.full((9, 9), 10, dtype=np.uint8)
    a[4, 4] = 250
    out, _ = run_op(a, "Remove Outliers...", "radius=2 threshold=50")
    assert out[4, 4] == 10


def test_remove_nans_fills_from_neighbors():
    a = np.full((6, 6), 5.0, dtype=np.float32)
    a[2, 3] = np.nan
    out, _ = run_op(a, "Remove NaNs...", "radius=1")
    assert not np.isnan(out).any()
    assert out[2, 3] == 5.0


def test_enhance_contrast_stretches_to_full_range():
    a = np.clip(np.arange(100, dtype=np.float64).reshape(10, 10) + 70, 70, 180).astype(np.uint8)
    out, _ = run_op(a, "Enhance Contrast...", "saturated=0")
    assert out.min() == 0 and out.max() == 255


def test_find_maxima_single_peak():
    a = np.zeros((9, 9), dtype=np.uint8)
    a[4, 4] = 200
    out, tbl = run_op(a, "Find Maxima...", "prominence=10")
    assert out[4, 4] == 255 and (out > 0).sum() == 1
    assert tbl["count"] == [1.0]


def test_scale_identity_and_dims():
    a = np.random.default_rng(0).integers(0, 255, (10, 14), dtype=np.uint8)
    same, _ = run_op(a, "Scale...", "x=1 y=1")
    assert (same == a).all()
    double, _ = run_op(a, "Scale...", "x=2 y=2")
    assert double.shape == (20, 28)


def test_rotate_zero_identity_and_flat_invariance():
    a = np.random.default_rng(1).integers(0, 255, (9, 9), dtype=np.uint8)
    same, _ = run_op(a, "Rotate...", "angle=0")
    assert (same == a).all()
    flat = np.full((9, 9), 123, dtype=np.uint8)
    rot, _ = run_op(flat, "Rotate...", "angle=37")
    assert rot[4, 4] == 123  # center always in-bounds


def test_canvas_grow_then_crop_roundtrip():
    a = np.random.default_rng(2).integers(0, 255, (6, 8), dtype=np.uint8)
    grown, _ = run_op(a, "Canvas Size...", "width=12 height=10")
    assert grown.shape == (10, 12)
    back, _ = run_op(grown, "Crop", "x=2 y=2 width=8 height=6")
    assert (back == a).all()


def test_stack_ops_shapes_and_reverse_involution():
    st_ = np.arange(3 * 4 * 5, dtype=np.uint8).reshape(3, 4, 5)
    rev, _ = run_op(st_, "Reverse", None)
    rev2, _ = run_op(rev, "Reverse", None)
    assert (rev2 == st_).all()
    assert (rev == st_[:, :, ::-1]).all()
    deleted, _ = run_op(st_, "Delete Slice", "number=2")
    assert deleted.shape == (3, 4, 4)
    assert (deleted[:, :, 1] == st_[:, :, 2]).all()
    added, _ = run_op(st_, "Add Slice", None)
    assert added.shape == (3, 4, 6) and (added[:, :, 5] == 0).all()


def test_z_project_orderings():
    st_ = np.random.default_rng(3).integers(0, 255, (5, 6, 7), dtype=np.uint8)
    mx, _ = run_op(st_, "Z Project...", 'projection="Max Intensity"')
    mn, _ = run_op(st_, "Z Project...", 'projection="Min Intensity"')
    avg, _ = run_op(st_, "Z Project...", 'projection="Average Intensity"')
    sm, _ = run_op(st_, "Z Project...", 'projection="Sum Slices"')
    assert (mx == st_.max(axis=2)).all() and (mn == st_.min(axis=2)).all()
    assert (mn.astype("float64") <= avg).all() and (avg <= mx.astype("float64")).all()
    assert np.allclose(sm, st_.astype("float64").sum(axis=2))


def test_3d_filters_flat_invariance_and_order():
    st_ = np.full((4, 4, 4), 50, dtype=np.uint8)
    for op in ("Median 3D...", "Mean 3D...", "Minimum 3D...",
               "Maximum 3D...", "Gaussian Blur 3D..."):
        out, _ = run_op(st_, op, "x=1 y=1 z=1")
        assert (out == 50).all(), op
    r = np.random.default_rng(4).integers(0, 255, (5, 5, 5), dtype=np.uint8)
    mn, _ = run_op(r, "Minimum 3D...", "x=1 y=1 z=1")
    mx, _ = run_op(r, "Maximum 3D...", "x=1 y=1 z=1")
    assert (mn <= r).all() and (r <= mx).all()


def test_fft_shape_dtype_and_dc_peak():
    a = np.full((16, 16), 100, dtype=np.uint8)
    out, _ = run_op(a, "FFT", None)
    assert out.shape == a.shape and out.dtype == np.uint8
    assert out[8, 8] == 255  # DC term at the centered origin


def test_bandpass_passes_midband_removes_dc():
    y = np.arange(32)[:, None]
    a = (np.sin(y * 2 * np.pi / 8.0) * 60 + 128).astype(np.uint8) * np.ones((1, 32), dtype=np.uint8)
    out, _ = run_op(a, "Bandpass Filter...", "filter_large=16 filter_small=3")
    # period-8 stripes survive; the 128 DC offset is suppressed
    assert out.astype(float).std() > 10
    flat = np.full((16, 16), 200, dtype=np.uint8)
    fo, _ = run_op(flat, "Bandpass Filter...", "filter_large=8 filter_small=2")
    assert fo.astype(float).mean() < 20


def test_salt_pepper_deterministic_and_bounded():
    a = np.random.default_rng(5).integers(1, 254, (20, 20), dtype=np.uint8)
    o1, _ = run_op(a, "Salt and Pepper", None)
    o2, _ = run_op(a, "Salt and Pepper", None)
    assert (o1 == o2).all()
    changed = o1 != a
    assert set(np.unique(o1[changed])) <= {0, 255}


def test_lut_sets_meta_and_rgb_color_applies_it():
    from spark_ij_spark.kernels.menu import lut_table

    a = np.arange(64, dtype=np.uint8).reshape(8, 8)
    meta: dict = {}
    out, _ = run_op(a, "Fire", None, meta)
    assert (out == a).all()
    assert '"lut": "Fire"' in meta["info"]
    rgb, _ = run_op(a, "RGB Color", None, meta)
    assert rgb.shape == (8, 8, 3) and rgb.dtype == np.uint8
    t = lut_table("Fire")
    scaled, _ = run_op(a, "8-bit", None)
    assert (rgb == t[scaled]).all()
    for name in ("Grays", "Ice", "Spectrum", "3-3-2 RGB", "Red", "Green",
                 "Blue", "Cyan", "Magenta", "Yellow", "Red/Green"):
        tab = lut_table(name)
        assert tab.shape == (256, 3) and tab.dtype == np.uint8


def test_apply_lut_bakes_display_range():
    import json

    a = np.array([[50, 100], [150, 200]], dtype=np.uint8)
    meta = {"info": json.dumps({"display_range": [50, 200]})}
    out, _ = run_op(a, "Apply LUT", None, meta)
    assert out[0, 0] == 0 and out[1, 1] == 255
    assert json.loads(meta["info"])["display_range"] is None


def test_nan_background_uses_stashed_threshold():
    import json

    a = np.array([[10, 50], [100, 200]], dtype=np.uint8)
    meta = {"info": json.dumps({"threshold": [40, 150]})}
    out, _ = run_op(a, "NaN Background", None, meta)
    assert np.isnan(out[0, 0]) and np.isnan(out[1, 1])
    assert out[0, 1] == 50.0 and out[1, 0] == 100.0


def test_translate_full_shift_blanks_image():
    a = np.random.default_rng(6).integers(1, 255, (5, 7), dtype=np.uint8)
    for argstr in ("x=7 y=0", "x=0 y=5", "x=-7 y=0", "x=0 y=-5", "x=100 y=100"):
        out, _ = run_op(a, "Translate...", argstr)
        assert (out == 0).all(), argstr


def test_unknown_command_suggests_near_match():
    with pytest.raises(KeyError, match="did you mean"):
        run_op(np.zeros((4, 4), dtype=np.uint8), "Unsharp Masc...", None)


# --- round-8 kernels-review regressions --------------------------------


def test_rgb_image_survives_geometry_and_morphology():
    """True RGB is 4D [h][w][s][3] inside kernels; every per-slice op
    must handle the channel axis (a 2D/3D-only helper crashed the
    whole family on RGB input)."""
    rgb = np.random.default_rng(0).integers(0, 255, (8, 8, 1, 3)).astype(np.uint8)
    for op, a in (
        ("Translate...", "x=1 y=1"),
        ("Erode", None),
        ("Dilate", None),
        ("Fill Holes", None),
        ("Rotate 90 Degrees Right", None),
    ):
        out, _ = run_op(rgb, op, a)
        assert out.ndim == 4 and out.shape[-1] == 3, (op, out.shape)


def test_rgb_color_converts_3_slice_stack():
    """Inside kernels a 3D uint8 array is a SLICE STACK, never RGB
    (color is declared by the decoder; CLAUDE.md round-7 rule) — RGB
    Color must convert it, not no-op on a shape/dtype heuristic."""
    stack = np.random.default_rng(1).integers(0, 255, (8, 8, 3)).astype(np.uint8)
    out, _ = run_op(stack, "RGB Color", None, {})
    assert out.ndim == 4 and out.shape == (8, 8, 3, 3)


def test_gamma_rounds_like_sibling_arith_ops():
    out, _ = run_op(np.array([[0, 50, 200, 255]], np.uint8), "Gamma...", "value=0.5")
    assert out.tolist() == [[0, 113, 226, 255]]  # rint, not truncation


def test_z_project_clamps_out_of_range_start():
    out, _ = run_op(np.ones((4, 4, 3), np.uint8), "Z Project...", "start=5")
    assert out.shape == (4, 4)


def test_rank_filter_chunked_matches_full_window():
    """The row-chunked rank filter (memory cap for large radii) must be
    bit-identical to the single fancy-index form at any chunk size."""
    import numpy.lib.stride_tricks as st

    import spark_ij_spark.kernels.filters as fl

    big = np.random.default_rng(2).integers(0, 255, (32, 45)).astype(np.uint8)
    mask = fl._circular_mask(3.0)
    r = mask.shape[0] // 2
    win = st.sliding_window_view(np.pad(big, r, mode="edge"), mask.shape)
    ref = np.median(win[:, :, mask], axis=2).astype(big.dtype)
    old = fl._RANK_CHUNK_BYTES
    try:
        for cap in (2048, 10**9):
            fl._RANK_CHUNK_BYTES = cap
            assert np.array_equal(fl._rank_filter(big, 3.0, np.median), ref)
    finally:
        fl._RANK_CHUNK_BYTES = old


def test_roi_line_mask_has_no_gaps_and_rgb_measure_works():
    from spark_ij_spark.kernels import roi

    mk = roi.roi_mask((1, 8), {"type": "LINE", "xs": [0.0, 5.9], "ys": [0.0, 0.0]})
    assert np.where(mk[0])[0].tolist() == [0, 1, 2, 3, 4, 5, 6]
    rgb = np.full((4, 4, 1, 3), 30, np.uint8)
    m = roi.roi_measure(rgb, {"type": "RECTANGLE", "xs": [0, 3], "ys": [0, 3]})
    assert m["pts"] > 0 and m["mean"] == 30.0


def test_meta_and_log_accept_rows_and_positional_tuples():
    from pyspark.sql import Row

    from spark_ij_spark import datamodel as dm

    assert dm.meta_of({"meta": Row(pixel_width=1.0, pixel_height=2.0)})[
        "pixel_height"
    ] == 2.0
    pos = dm.meta_of({"meta": tuple(dm.DEFAULT_META.values())})
    assert pos == dict(dm.DEFAULT_META)
    lg = dm.log_of({"log": [("LOAD", "file", "x", "", "[]")]})
    assert lg[0]["optype"] == "LOAD" and lg[0]["children_json"] == "[]"


def test_gray_to_rgb_scales_wide_types_instead_of_wrapping():
    from spark_ij_spark import datamodel as dm

    out = dm.gray_to_rgb(np.array([[0, 300, 65535]], np.uint16))
    assert out[0, :, 0].tolist() == [0, 1, 255]  # not 300 % 256 == 44
