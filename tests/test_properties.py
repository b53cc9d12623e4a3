"""Property-based invariants (hypothesis) for the pure kernels.

The reference's test strategy (SURVEY.md §5 layer 3) asserts
statistical/analytic invariants over randomized inputs; hypothesis
generalizes that to generated inputs with shrinking.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st
from hypothesis.extra.numpy import arrays

from spark_ij_spark.datamodel import (
    coerce_ingest,
    convert_array_type,
    ensure_3d,
    rgb_to_gray,
)
from spark_ij_spark.kernels.histogram import hist_distance, histogram
from spark_ij_spark.kernels.roi import roi_mask
from spark_ij_spark.operators.sweep import macro_steps_to_sweep

# suite default 50 examples; SPARK_GRAFT_HYP_EXAMPLES cranks it for
# on-demand deep-fuzz passes (e.g. 2000 in an idle round) without
# slowing every CI run
import os

SMALL = {
    "max_examples": int(os.environ.get("SPARK_GRAFT_HYP_EXAMPLES", "50")),
    "deadline": None,
}


@given(
    arrays(
        dtype=np.float32,
        shape=st.tuples(st.integers(1, 8), st.integers(1, 8)),
        elements=st.floats(-1e6, 1e6, width=32),
    )
)
@settings(**SMALL)
def test_ensure_3d_preserves_values(a):
    out = ensure_3d(coerce_ingest(a))
    assert out.ndim == 3 and out.shape[:2] == a.shape
    np.testing.assert_array_equal(out[:, :, 0], a)


@given(
    arrays(
        dtype=np.int32,
        shape=st.tuples(st.integers(1, 6), st.integers(1, 6)),
        elements=st.integers(0, 65535),
    )
)
@settings(**SMALL)
def test_ingest_coercion_int_to_uint16_masks_like_reference(a):
    # int[][] → 16-bit is the documented lossy coercion (Spiji.java:995-996)
    out = coerce_ingest(a)
    assert out.dtype == np.uint16
    np.testing.assert_array_equal(out.astype("int64"), a.astype("int64") & 0xFFFF)


@given(
    arrays(
        dtype=np.uint8,
        shape=st.tuples(st.integers(1, 6), st.integers(1, 6)),
        elements=st.integers(0, 255),
    ),
    st.sampled_from(["float32", "float64", "int32", "uint16", "bool"]),
)
@settings(**SMALL)
def test_lattice_conversion_unsigned_identity_scale1(a, kind):
    out = convert_array_type(a, kind, is_signed=False, scale=1.0)
    if kind == "bool":
        np.testing.assert_array_equal(out, a > 0)
    else:
        np.testing.assert_array_equal(out.astype("float64"), a.astype("float64"))


@given(
    arrays(
        dtype=np.float64,
        shape=st.tuples(st.integers(2, 5), st.integers(2, 5), st.integers(1, 2), st.just(3)),
        elements=st.floats(0, 255),
    )
)
@settings(**SMALL)
def test_rgb_reduce_mean_between_min_max(a):
    g_mean = rgb_to_gray(a, "MEAN")
    g_min = rgb_to_gray(a, "MIN")
    g_max = rgb_to_gray(a, "MAX")
    assert (g_min <= g_mean + 1e-9).all() and (g_mean <= g_max + 1e-9).all()


@given(
    arrays(
        dtype=np.float64,
        shape=st.integers(1, 200),
        elements=st.floats(0, 100, allow_nan=False),
    ),
    st.integers(2, 64),
)
@settings(**SMALL)
def test_histogram_conserves_count(data, bins):
    centers, counts = histogram(data, (0.0, 100.0), bins)
    assert counts.sum() == data.size
    assert len(centers) == bins
    assert (np.diff(centers) > 0).all()


@given(
    arrays(
        dtype=np.float64,
        shape=st.integers(2, 100),
        elements=st.floats(0, 50, allow_nan=False),
    )
)
@settings(**SMALL)
def test_hist_distance_identity_and_disjoint(data):
    c, n = histogram(data, (0.0, 50.0), 32)
    # self-distance ≈ 0 (SpijiTests.scala:209-231 invariant)
    assert hist_distance(c, n, c, n) < 1e-9
    # disjoint support → distance ≈ 1
    c2, n2 = histogram(data + 1000.0, (1000.0, 1050.0), 32)
    assert hist_distance(c, n, c2, n2) > 0.999


@given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 10), st.integers(0, 10))
@settings(**SMALL)
def test_rectangle_roi_area(w, h, x0, y0):
    x1, y1 = x0 + min(w, 5), y0 + min(h, 5)
    m = roi_mask((h, w), {"type": "RECTANGLE", "xs": [x0, x1], "ys": [y0, y1]})
    expect = max(0, min(x1, w) - min(x0, w)) * max(0, min(y1, h) - min(y0, h))
    assert int(m.sum()) == expect


@given(st.integers(1, 9), st.integers(10, 50), st.integers(2, 7))
@settings(**SMALL)
def test_sweep_interpolation_endpoints_and_int_preservation(lo, hi, steps):
    out = macro_steps_to_sweep([f"radius={lo}", f"radius={hi}"], steps=steps, delim=" ")
    # int-preserving interpolation dedupes collided rounded values, so
    # the count is min(steps, distinct ints in range)
    assert len(out) == min(steps, hi - lo + 1)
    assert out[0] == f"radius={lo}" and out[-1] == f"radius={hi}"
    vals = [int(s.split("=")[1]) for s in out]  # never decimals here
    assert vals == sorted(set(vals))


def test_hash60_cross_engine_identity(spark):
    """The 60-bit md5 hash — the primitive every deterministic op
    (minhash, simhash, LSH bands, splits, sampling) builds on — must be
    bit-identical between Spark and DuckDB over adversarial strings:
    unicode, empties, quotes, long runs, digits."""
    import duckdb

    from spark_ij_spark.operators.text import hash60_duck, hash60_spark

    samples = (
        ["", " ", "a", "ab c", "naïve", "中文 字", "'; --", '"q"', "\t", "🙂"]
        + [f"doc-{i}" for i in range(50)]
        + ["x" * 1000, "the the the", "0", "-1", "3.14159"]
    )
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    from pyspark.sql import functions as F

    got = {
        r.s: r.h
        for r in sdf.select("s", F.expr(hash60_spark("s")).alias("h")).collect()
    }
    con = duckdb.connect()
    for s in samples:
        (want,) = con.execute(
            f"SELECT {hash60_duck('?')}", [s]
        ).fetchone()
        assert got[s] == want, f"hash60 diverged on {s!r}"


@given(
    arrays(
        dtype=np.uint8,
        shape=st.tuples(st.integers(1, 40), st.integers(1, 40)),
        elements=st.integers(0, 255),
    )
)
@settings(**SMALL)
def test_gif_roundtrip_lossless_any_gray(a):
    from spark_ij_spark.sources.purepy_codecs import decode_gif, encode_gif

    np.testing.assert_array_equal(decode_gif(encode_gif(a)), a)


@given(st.integers(1, 400))
@settings(**SMALL)
def test_chunk_starts_cover_every_token_without_subset_chunks(n):
    """Pure-python twin of the chunking start rule (s = 1 OR
    s + overlap <= n over stride steps): every token lands in >= 1
    chunk, and no chunk is a subset of its predecessor."""
    from spark_ij_spark.operators.pipeline import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        _CHUNK_NEW,
    )

    starts = [
        s
        for s in range(1, n + 1, CHUNK_STRIDE)
        if s == 1 or s + _CHUNK_NEW <= n
    ]
    covered = set()
    prev_end = 0
    for s in starts:
        end = min(s + CHUNK_TOKENS - 1, n)
        assert end > prev_end  # adds new tokens -> not a subset
        covered.update(range(s, end + 1))
        prev_end = end
    assert covered == set(range(1, n + 1))


def _label_components_reference(mask):
    """The pre-round-7 per-pixel union-find labeling, kept as the
    semantic reference for the vectorized run-based implementation."""
    import numpy as np

    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    nxt = 1
    for i in range(h):
        for j in range(w):
            if not mask[i, j]:
                continue
            neigh = []
            if i > 0:
                for dj in (-1, 0, 1):
                    jj = j + dj
                    if 0 <= jj < w and labels[i - 1, jj]:
                        neigh.append(labels[i - 1, jj])
            if j > 0 and labels[i, j - 1]:
                neigh.append(labels[i, j - 1])
            if not neigh:
                labels[i, j] = nxt
                parent.append(nxt)
                nxt += 1
            else:
                m = min(neigh)
                labels[i, j] = m
                for n_ in neigh:
                    ra, rb = find(m), find(n_)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    remap, out_n = {}, 0
    flat = labels.ravel()
    for idx in np.nonzero(flat)[0]:
        r = find(int(flat[idx]))
        if r not in remap:
            out_n += 1
            remap[r] = out_n
        flat[idx] = remap[r]
    return labels, out_n


@settings(max_examples=60, deadline=None)
@given(
    arrays(
        dtype=bool,
        shape=st.tuples(st.integers(1, 12), st.integers(1, 12)),
    )
)
def test_run_based_labeling_matches_pixel_reference(mask):
    """The vectorized run-based 8-connected labeling must be
    label-for-label identical (including raster id order) to the
    per-pixel union-find it replaced."""
    import numpy as np

    from spark_ij_spark.kernels.particles import label_components

    a, na = label_components(mask.copy())
    b, nb = _label_components_reference(mask.copy())
    assert na == nb
    assert np.array_equal(a, b)
