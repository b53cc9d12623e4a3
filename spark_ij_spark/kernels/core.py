"""Core per-image kernels: arithmetic, noise, thresholds, bit-depth.

Rebuilds the named ops the reference invokes through ImageJ's menu
(reference: PortableImagePlus.scala:352-388 dispatch; threshold
special-case :366-377; arithmetic ops :190-258). All kernels are
out-of-place numpy — copy-on-write is free, unlike the reference's
``duplicate()``-per-op flag (PortableImagePlus.scala:295-299).

Noise is seeded deterministically from the pixel bytes + op args, so
pipelines are reproducible under retry/speculative execution — a
property the reference never had (its tests use statistical invariants
for exactly this reason, SpijiTests.scala:297-310); ours can use both.
"""

from __future__ import annotations

import json
import zlib
from typing import Any

import numpy as np

from spark_ij_spark.registry import get_float, register_op

# integer clamp ranges for in-dtype arithmetic (ImageJ clamps on int types)
_CLAMP = {
    "uint8": (0, 255),
    "uint16": (0, 65535),
    "int16": (-32768, 32767),
    "int32": (-(2**31), 2**31 - 1),
}


def _arith(arr: np.ndarray, value: float, fn) -> np.ndarray:
    out = fn(arr.astype("float64"), value)
    name = arr.dtype.name
    if name in _CLAMP:
        lo, hi = _CLAMP[name]
        out = np.clip(np.rint(out), lo, hi)
    return out.astype(arr.dtype)


@register_op("Add...")
def op_add(arr, args, meta):
    return _arith(arr, get_float(args, "value", 0.0), lambda a, v: a + v)


@register_op("Subtract...")
def op_subtract(arr, args, meta):
    return _arith(arr, get_float(args, "value", 0.0), lambda a, v: a - v)


@register_op("Multiply...")
def op_multiply(arr, args, meta):
    return _arith(arr, get_float(args, "value", 1.0), lambda a, v: a * v)


@register_op("Divide...")
def op_divide(arr, args, meta):
    v = get_float(args, "value", 1.0)
    if v == 0:
        raise ValueError("Divide...: value must be nonzero")
    return _arith(arr, v, lambda a, v: a / v)


@register_op("Gamma...")
def op_gamma(arr, args, meta):
    g = get_float(args, "value", 1.0)
    a = arr.astype("float64")
    lo, hi = a.min(), a.max()
    if hi > lo:
        a = ((a - lo) / (hi - lo)) ** g * (hi - lo) + lo
    # round like every sibling arithmetic op (_arith/_clamped use
    # rint): a truncating astype biased integer outputs down by up
    # to 1 count
    if arr.dtype.kind in "ui":
        a = np.rint(a)
    return a.astype(arr.dtype)


@register_op("applyOffset")
def op_apply_offset(arr, args, meta):
    """Float-converting offset (reference:
    PortableImagePlus.scala:190-195 — the CT Hounsfield correction,
    default −1024). Unlike the clamping "Add..." this first converts
    to float32, so adding a negative offset to unsigned data yields
    negative values instead of clamping at 0."""
    v = get_float(args, "value", -1024.0)
    return (arr.astype("float32") + np.float32(v)).astype("float32")


@register_op("Abs")
def op_abs(arr, args, meta):
    return np.abs(arr)


@register_op("Log")
def op_log(arr, args, meta):
    return np.log(np.maximum(arr.astype("float64"), 1e-300)).astype("float32")


@register_op("Exp")
def op_exp(arr, args, meta):
    return np.exp(arr.astype("float64")).astype("float32")


@register_op("Square")
def op_square(arr, args, meta):
    return _arith(arr, 2.0, lambda a, _: a * a)


@register_op("Square Root")
def op_sqrt(arr, args, meta):
    return np.sqrt(np.maximum(arr.astype("float64"), 0)).astype("float32")


@register_op("Invert")
def op_invert(arr, args, meta):
    """ImageJ semantics: 8/16-bit invert against the dtype max; float
    inverts against the data range (min+max-v)."""
    name = arr.dtype.name
    if name in ("uint8", "uint16"):
        return (_CLAMP[name][1] - arr.astype("int64")).astype(arr.dtype)
    a = arr.astype("float64")
    return (a.min() + a.max() - a).astype(arr.dtype)


@register_op("Duplicate...")
def op_duplicate(arr, args, meta):
    return arr.copy()


# ---------------------------------------------------------------------------
# noise (reference tests: SpijiTests.scala:297-310 noise invariants)
# ---------------------------------------------------------------------------


def _seed_for(arr: np.ndarray, args: dict[str, Any]) -> int:
    payload = arr.tobytes() + json.dumps(args, sort_keys=True, default=str).encode()
    return zlib.crc32(payload)


@register_op("Add Noise")
def op_add_noise(arr, args, meta):
    """Gaussian noise, sd=25 (ImageJ's Add Noise default)."""
    return _add_gaussian_noise(arr, 25.0, args)


@register_op("Add Specified Noise...")
def op_add_specified_noise(arr, args, meta):
    return _add_gaussian_noise(arr, get_float(args, "standard", 25.0), args)


def _add_gaussian_noise(arr: np.ndarray, sd: float, args) -> np.ndarray:
    rng = np.random.default_rng(_seed_for(arr, {**args, "_sd": sd}))
    noisy = arr.astype("float64") + rng.normal(0.0, sd, size=arr.shape)
    name = arr.dtype.name
    if name in _CLAMP:
        lo, hi = _CLAMP[name]
        noisy = np.clip(np.rint(noisy), lo, hi)
    return noisy.astype(arr.dtype)


# ---------------------------------------------------------------------------
# thresholds (special-case parse mirrors PortableImagePlus.scala:366-377)
# ---------------------------------------------------------------------------


def _threshold_bounds(args: dict[str, Any]) -> tuple[float, float]:
    lower = get_float(args, "lower", -np.inf)
    upper = get_float(args, "upper", np.inf)
    return lower, upper


def _mask(arr: np.ndarray, lower: float, upper: float) -> np.ndarray:
    return (((arr >= lower) & (arr <= upper)) * 255).astype(np.uint8)


@register_op("setThreshold")
def op_set_threshold(arr, args, meta):
    """Record threshold bounds in meta.info (functional analog of the
    reference's processor-level threshold state)."""
    lower, upper = _threshold_bounds(args)
    info = {}
    try:
        info = json.loads(meta.get("info") or "{}")
    except (ValueError, TypeError):
        pass
    info["threshold"] = [None if not np.isfinite(lower) else lower,
                         None if not np.isfinite(upper) else upper]
    meta["info"] = json.dumps(info)
    return arr


@register_op("applyThreshold")
def op_apply_threshold(arr, args, meta):
    lower, upper = _threshold_bounds(args)
    return _mask(arr, lower, upper)


@register_op("Convert to Mask")
def op_convert_to_mask(arr, args, meta):
    """Binarize using the stashed threshold if present, else IsoData."""
    try:
        info = json.loads(meta.get("info") or "{}")
        lo, hi = info["threshold"]
        return _mask(arr, -np.inf if lo is None else lo, np.inf if hi is None else hi)
    except (ValueError, TypeError, KeyError):
        t = isodata_threshold(arr)
        return _mask(arr, t, np.inf)


def isodata_threshold(arr: np.ndarray) -> float:
    """ImageJ's default auto-threshold (iterative intermeans)."""
    a = arr.astype("float64").ravel()
    t = a.mean()
    for _ in range(100):
        lo = a[a <= t]
        hi = a[a > t]
        if lo.size == 0 or hi.size == 0:
            break
        nt = (lo.mean() + hi.mean()) / 2.0
        if abs(nt - t) < 1e-7:
            break
        t = nt
    return t


def otsu_threshold(arr: np.ndarray) -> float:
    a = arr.astype("float64").ravel()
    hist, edges = np.histogram(a, bins=256)
    centers = (edges[:-1] + edges[1:]) / 2.0
    total = hist.sum()
    w0 = np.cumsum(hist)
    w1 = total - w0
    m0 = np.cumsum(hist * centers)
    mt = m0[-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        between = (mt * w0 - total * m0) ** 2 / (w0 * w1 * total * total)
    between[~np.isfinite(between)] = -1
    return float(centers[int(np.argmax(between))])


_AUTO_METHODS = {
    "isodata": isodata_threshold,
    "default": isodata_threshold,
    "otsu": otsu_threshold,
    "mean": lambda a: float(a.mean()),
}


@register_op("Auto Threshold")
def op_auto_threshold(arr, args, meta):
    """``method=IsoData white setthreshold`` grammar as exercised by
    SpijiTests.scala:395. ``setthreshold`` stashes bounds instead of
    binarizing; ``white`` makes above-threshold the foreground."""
    method = str(args.get("method", "IsoData")).lower()
    fn = _AUTO_METHODS.get(method)
    if fn is None:
        raise ValueError(f"unknown Auto Threshold method {method!r}")
    t = fn(arr)
    white = bool(args.get("white", False))
    lower, upper = (t, np.inf) if white else (-np.inf, t)
    if args.get("setthreshold"):
        return op_set_threshold(
            arr,
            {"lower": lower if np.isfinite(lower) else None,
             "upper": upper if np.isfinite(upper) else None},
            meta,
        )
    return _mask(arr, lower, upper)


# ---------------------------------------------------------------------------
# bit-depth conversions
# ---------------------------------------------------------------------------


@register_op("8-bit")
def op_to_8bit(arr, args, meta):
    """Scale data range to 0..255 (ImageJ scales the display range; with
    the default full-range display that is min..max)."""
    if arr.dtype == np.uint8:
        return arr
    a = arr.astype("float64")
    lo, hi = a.min(), a.max()
    if hi <= lo:
        return np.zeros_like(a, dtype=np.uint8)
    return np.rint((a - lo) / (hi - lo) * 255.0).astype(np.uint8)


@register_op("16-bit")
def op_to_16bit(arr, args, meta):
    if arr.dtype == np.uint16:
        return arr
    if arr.dtype == np.uint8:
        return arr.astype(np.uint16)
    a = arr.astype("float64")
    return np.clip(np.rint(a), 0, 65535).astype(np.uint16)


@register_op("32-bit")
def op_to_32bit(arr, args, meta):
    return arr.astype(np.float32)
