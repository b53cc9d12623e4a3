"""Spatial filters: rank filters (median/mean/min/max/variance),
gaussian blur, 3x3 convolutions.

The reference delegates these to ImageJ plugins per slice
(reference: PortableImagePlus.scala:163-180 processorForEach applies a
per-slice kernel across a 3D stack). Rebuild: vectorized numpy over
``sliding_window_view`` with edge-replicate padding; rank filters use
ImageJ's circular neighborhood (RankFilters semantics: pixels with
dx²+dy² ≤ r² + 1).
"""

from __future__ import annotations

import numpy as np
from numpy.lib.stride_tricks import sliding_window_view

from spark_ij_spark.registry import get_float, register_op


def _circular_mask(radius: float) -> np.ndarray:
    """ImageJ RankFilters kernel: dx²+dy² ≤ r²+1."""
    r = int(np.floor(radius))
    yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
    return (yy * yy + xx * xx) <= radius * radius + 1


def _per_slice(arr: np.ndarray, fn) -> np.ndarray:
    """Apply a 2D filter over each slice of [h][w][s] (and each channel of
    [h][w][s][3])."""
    if arr.ndim == 2:
        return fn(arr)
    if arr.ndim == 3:
        return np.stack([fn(arr[:, :, k]) for k in range(arr.shape[2])], axis=2)
    if arr.ndim == 4:
        return np.stack(
            [
                np.stack([fn(arr[:, :, k, c]) for k in range(arr.shape[2])], axis=2)
                for c in range(arr.shape[3])
            ],
            axis=3,
        )
    raise ValueError(f"unsupported ndim {arr.ndim}")


# Cap on the materialized [rows][w][n_in_disk] window tensor of the
# rank filter (float64 bytes). A single fancy-index over the whole
# slice needs h*w*n_disk*8 bytes — ~16.5 GB for a 512x512 slice at
# ImageJ's default Subtract Background rolling=50 (~7861 disk pixels),
# an executor OOM. Chunking rows bounds memory with identical output.
_RANK_CHUNK_BYTES = 128 * 1024 * 1024


def _rank_filter(arr: np.ndarray, radius: float, reducer) -> np.ndarray:
    mask = _circular_mask(radius)
    r = mask.shape[0] // 2
    n_disk = int(mask.sum())

    def one(sl: np.ndarray) -> np.ndarray:
        padded = np.pad(sl, r, mode="edge")
        win = sliding_window_view(padded, mask.shape)  # [h][w][kh][kw]
        h, w = sl.shape
        rows_per_chunk = max(
            1, int(_RANK_CHUNK_BYTES // (8 * max(1, w) * max(1, n_disk)))
        )
        out = np.empty((h, w), dtype=np.result_type(sl.dtype, np.float64))
        for y0 in range(0, h, rows_per_chunk):
            y1 = min(h, y0 + rows_per_chunk)
            vals = win[y0:y1, :, mask]  # [rows][w][n_in_disk]
            out[y0:y1] = reducer(vals, axis=2)
        return out

    return _per_slice(arr, one).astype(arr.dtype)


@register_op("Median...")
def op_median(arr, args, meta):
    return _rank_filter(arr, get_float(args, "radius", 1.0), np.median)


@register_op("Mean...")
def op_mean_filter(arr, args, meta):
    out = _rank_filter(arr.astype("float64"), get_float(args, "radius", 1.0), np.mean)
    if arr.dtype.kind in "ui":
        out = np.rint(out)
    return out.astype(arr.dtype)


@register_op("Minimum...")
def op_min_filter(arr, args, meta):
    return _rank_filter(arr, get_float(args, "radius", 1.0), np.min)


@register_op("Maximum...")
def op_max_filter(arr, args, meta):
    return _rank_filter(arr, get_float(args, "radius", 1.0), np.max)


@register_op("Variance...")
def op_variance_filter(arr, args, meta):
    out = _rank_filter(arr.astype("float64"), get_float(args, "radius", 1.0), np.var)
    return out.astype("float32")


@register_op("Despeckle")
def op_despeckle(arr, args, meta):
    return _rank_filter(arr, 1.0, np.median)


# ---------------------------------------------------------------------------
# gaussian + fixed 3x3 kernels
# ---------------------------------------------------------------------------


def _gaussian_1d(sigma: float) -> np.ndarray:
    r = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype="float64")
    k = np.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / k.sum()


def _convolve2d(sl: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    kh, kw = kernel.shape
    if kh % 2 == 0 or kw % 2 == 0:
        # even kernels have no center anchor: the symmetric padding
        # would GROW the image by one pixel per even axis and misalign
        # downstream combines — reject loudly like ImageJ's dialog does
        raise ValueError(
            f"Convolve: kernel dimensions must be odd, got {kh}x{kw}"
        )
    padded = np.pad(sl.astype("float64"), ((kh // 2, kh // 2), (kw // 2, kw // 2)), mode="edge")
    win = sliding_window_view(padded, kernel.shape)
    return np.einsum("ijkl,kl->ij", win, kernel)


@register_op("Gaussian Blur...")
def op_gaussian_blur(arr, args, meta):
    sigma = get_float(args, "sigma", 2.0)
    k = _gaussian_1d(sigma)

    def one(sl):
        tmp = _convolve2d(sl, k[np.newaxis, :])
        return _convolve2d(tmp, k[:, np.newaxis])

    out = _per_slice(arr, one)
    if arr.dtype.kind in "ui":
        out = np.rint(out)
    return out.astype(arr.dtype)


_SMOOTH = np.full((3, 3), 1.0 / 9.0)
_SHARPEN = np.array([[-1, -1, -1], [-1, 12, -1], [-1, -1, -1]], dtype="float64") / 4.0
_SOBEL_X = np.array([[1, 0, -1], [2, 0, -2], [1, 0, -1]], dtype="float64")
_SOBEL_Y = _SOBEL_X.T


def _clamped(arr: np.ndarray, out: np.ndarray) -> np.ndarray:
    if arr.dtype.kind in "ui":
        info = np.iinfo(arr.dtype)
        out = np.clip(np.rint(out), info.min, info.max)
    return out.astype(arr.dtype)


@register_op("Smooth")
def op_smooth(arr, args, meta):
    return _clamped(arr, _per_slice(arr, lambda sl: _convolve2d(sl, _SMOOTH)))


@register_op("Sharpen")
def op_sharpen(arr, args, meta):
    return _clamped(arr, _per_slice(arr, lambda sl: _convolve2d(sl, _SHARPEN)))


@register_op("Find Edges")
def op_find_edges(arr, args, meta):
    def one(sl):
        gx = _convolve2d(sl, _SOBEL_X)
        gy = _convolve2d(sl, _SOBEL_Y)
        return np.sqrt(gx * gx + gy * gy)

    return _clamped(arr, _per_slice(arr, one))


@register_op("Convolve...")
def op_convolve(arr, args, meta):
    """``text1=`` holds a whitespace/newline-separated kernel matrix."""
    text = args.get("text1")
    if not text or text is True:
        raise ValueError("Convolve...: text1=<kernel matrix> required")
    rows = [r for r in str(text).replace("\\n", "\n").splitlines() if r.strip()]
    kernel = np.array([[float(v) for v in r.split()] for r in rows], dtype="float64")
    if args.get("normalize"):
        s = kernel.sum()
        if s != 0:
            kernel = kernel / s
    return _clamped(arr, _per_slice(arr, lambda sl: _convolve2d(sl, kernel)))
