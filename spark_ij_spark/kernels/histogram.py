"""Histograms with the reference's exact binning/interp/distance
semantics (reference: IJHistogram.scala).

- bin centers run from min to max inclusive with step
  (max-min)/(bins-1)  (IJHistogram.scala:124-141 getSmartHistogram)
- re-gridding sums source counts whose center falls within half a step
  of each new center (histConverter, IJHistogram.scala:56-66)
- distance: interp both to the union support at 10000 centers
  (histInterpCount, :46), normalize by own totals, then half the L1
  difference → [0, 1]  (:34-41). This is the reference's only
  similarity metric and the seed of the similarity-search operators.
"""

from __future__ import annotations

import numpy as np


def histogram(
    arr: np.ndarray,
    value_range: tuple[float, float] | None = None,
    bins: int = 256,
) -> tuple[np.ndarray, np.ndarray]:
    """(bin_centers, counts) with center-anchored bins.

    Centers are evenly spaced over [lo, hi] inclusive; each pixel counts
    toward its nearest center (equivalent to histConverter applied to
    the raw values).
    """
    a = np.asarray(arr, dtype="float64").ravel()
    if value_range is None:
        lo, hi = float(a.min()), float(a.max())
    else:
        lo, hi = float(value_range[0]), float(value_range[1])
    if bins < 2:
        raise ValueError("bins must be >= 2")
    if hi <= lo:
        # degenerate/point range: count only pixels AT lo into bin 0 —
        # counting a.size would include out-of-range pixels the normal
        # branch excludes (for a constant image the two agree)
        centers = np.linspace(lo, lo + 1, bins)
        counts = np.zeros(bins, dtype="int64")
        counts[0] = int(np.count_nonzero(a == lo))
        return centers, counts
    centers = np.linspace(lo, hi, bins)
    step = (hi - lo) / (bins - 1)
    idx = np.rint((a - lo) / step).astype("int64")
    inside = (idx >= 0) & (idx < bins)
    counts = np.bincount(idx[inside], minlength=bins).astype("int64")
    return centers, counts


def hist_converter(
    rec_cents: np.ndarray, rec_counts: np.ndarray, new_cents: np.ndarray
) -> np.ndarray:
    """Re-grid: per new center, sum source counts within half a step
    (IJHistogram.histConverter; note its step uses len(newCents), kept)."""
    new_cents = np.asarray(new_cents, dtype="float64")
    step = (new_cents.max() - new_cents.min()) / len(new_cents)
    half = step / 2.0
    diff = np.abs(np.asarray(rec_cents, dtype="float64")[None, :] - new_cents[:, None])
    return (np.asarray(rec_counts)[None, :] * (diff < half)).sum(axis=1)


def interp(
    centers: np.ndarray, counts: np.ndarray, new_min: float, new_max: float, new_count: int
) -> tuple[np.ndarray, np.ndarray]:
    """IJHistogram.interp: inclusive linspace + histConverter."""
    new_cents = np.linspace(new_min, new_max, new_count)
    return new_cents, hist_converter(centers, counts, new_cents)


HIST_INTERP_COUNT = 10000


def hist_distance(
    centers_a: np.ndarray,
    counts_a: np.ndarray,
    centers_b: np.ndarray,
    counts_b: np.ndarray,
    interp_count: int = HIST_INTERP_COUNT,
) -> float:
    """Normalized histogram distance in [0, 1] (IJHistogram.- :34-41):
    0 = identical distributions, 1 = disjoint supports."""
    lo = min(np.min(centers_a), np.min(centers_b))
    hi = max(np.max(centers_a), np.max(centers_b))
    _, ca = interp(centers_a, counts_a, lo, hi, interp_count)
    _, cb = interp(centers_b, counts_b, lo, hi, interp_count)
    ta, tb = ca.sum(), cb.sum()
    na = ca / ta if ta else ca.astype("float64")
    nb = cb / tb if tb else cb.astype("float64")
    return float(np.abs(na - nb).sum() / 2.0)
