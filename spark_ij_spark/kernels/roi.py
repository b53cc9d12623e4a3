"""ROI (region of interest) geometry: set / get / mask / measure.

Reference surface: `Spiji.java:515-564` (setRoi from double[2][n]
coordinate arrays), `:574-613` (getRoi with CAL|NOCAL calibration
scaling). Types: LINE / RECTANGLE / POINT / OVAL / POLYLINE / POLYGON.

The ROI travels with the image in ``meta.info`` as JSON (the info
field is the reference's free-text metadata slot), so it survives
serialization, shuffles, and op chains exactly like calibration does.
Mask construction is vectorized numpy (no geometry library): ovals by
ellipse equation, polygons by ray casting.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

ROI_TYPES = ("LINE", "RECTANGLE", "POINT", "OVAL", "POLYLINE", "POLYGON")

_ROI_KEY = "__roi__"


def set_roi(info: str, xs: list[float], ys: list[float], roi_type: str) -> str:
    """Attach ROI geometry to an image's info JSON; returns new info.

    Coordinates follow the reference's double[2][n] convention
    (Spiji.java:515-564): xs/ys in uncalibrated pixel units.
    """
    rt = roi_type.upper()
    if rt not in ROI_TYPES:
        raise ValueError(f"unknown ROI type {roi_type!r}; one of {ROI_TYPES}")
    if len(xs) != len(ys):
        raise ValueError("xs and ys must have equal length")
    try:
        d = json.loads(info) if info else {}
        if not isinstance(d, dict):
            d = {"text": info}
    except (ValueError, TypeError):
        d = {"text": info}
    d[_ROI_KEY] = {"type": rt, "xs": [float(x) for x in xs], "ys": [float(y) for y in ys]}
    return json.dumps(d)


def get_roi(
    info: str, meta: dict[str, Any] | None = None, calibrated: bool = False
) -> dict[str, Any] | None:
    """Read ROI back; ``calibrated`` applies pixel size + origin like
    the reference's CAL mode (Spiji.java:574-613)."""
    try:
        d = json.loads(info) if info else {}
    except (ValueError, TypeError):
        return None
    roi = d.get(_ROI_KEY) if isinstance(d, dict) else None
    if roi is None:
        return None
    if calibrated and meta:
        pw = float(meta.get("pixel_width", 1.0))
        ph = float(meta.get("pixel_height", 1.0))
        x0 = float(meta.get("x_origin", 0.0))
        y0 = float(meta.get("y_origin", 0.0))
        roi = {
            "type": roi["type"],
            "xs": [(x - x0) * pw for x in roi["xs"]],
            "ys": [(y - y0) * ph for y in roi["ys"]],
        }
    return roi


def roi_mask(shape: tuple[int, int], roi: dict[str, Any]) -> np.ndarray:
    """Boolean [h][w] membership mask for an ROI."""
    h, w = shape
    xs = np.asarray(roi["xs"], dtype="float64")
    ys = np.asarray(roi["ys"], dtype="float64")
    yy, xx = np.mgrid[0:h, 0:w]
    t = roi["type"]
    if t == "RECTANGLE":
        # two corner points (x0,y0), (x1,y1), half-open like array slices
        x0, x1 = sorted((xs[0], xs[1]))
        y0, y1 = sorted((ys[0], ys[1]))
        return (xx >= x0) & (xx < x1) & (yy >= y0) & (yy < y1)
    if t == "OVAL":
        # bounding box corners → inscribed ellipse
        x0, x1 = sorted((xs[0], xs[1]))
        y0, y1 = sorted((ys[0], ys[1]))
        cx, cy = (x0 + x1) / 2.0, (y0 + y1) / 2.0
        rx, ry = max((x1 - x0) / 2.0, 1e-12), max((y1 - y0) / 2.0, 1e-12)
        return ((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2 <= 1.0
    if t == "POINT":
        m = np.zeros(shape, dtype=bool)
        xi = np.clip(np.round(xs).astype(int), 0, w - 1)
        yi = np.clip(np.round(ys).astype(int), 0, h - 1)
        m[yi, xi] = True
        return m
    if t in ("LINE", "POLYLINE"):
        m = np.zeros(shape, dtype=bool)
        for i in range(len(xs) - 1):
            # ceil, not floor: a fractional span (e.g. x 0.0→5.9)
            # sampled at floor+1 points skips interior pixels
            n = int(np.ceil(max(abs(xs[i + 1] - xs[i]), abs(ys[i + 1] - ys[i])))) + 1
            lx = np.clip(np.round(np.linspace(xs[i], xs[i + 1], n)).astype(int), 0, w - 1)
            ly = np.clip(np.round(np.linspace(ys[i], ys[i + 1], n)).astype(int), 0, h - 1)
            m[ly, lx] = True
        return m
    if t == "POLYGON":
        # ray casting, vectorized over the pixel grid
        inside = np.zeros(shape, dtype=bool)
        n = len(xs)
        j = n - 1
        px, py = xx + 0.0, yy + 0.0
        for i in range(n):
            cond = ((ys[i] > py) != (ys[j] > py)) & (
                px
                < (xs[j] - xs[i]) * (py - ys[i]) / (ys[j] - ys[i] + 1e-300) + xs[i]
            )
            inside ^= cond
            j = i
        return inside
    raise ValueError(f"unknown ROI type {t!r}")


def roi_measure(arr: np.ndarray, roi: dict[str, Any]) -> dict[str, float]:
    """min/mean/stdDev/max/pts restricted to the ROI (2-D projection of
    slice 0 for stacks; RGB slices reduce by unweighted channel mean —
    ImageJ's default RGB statistics convention and the datamodel's
    MEAN reduction), mirroring ImageStatistics fields."""
    if arr.ndim == 4:
        sl = arr[:, :, 0, :].astype("float64").mean(axis=-1)
    elif arr.ndim == 3:
        sl = arr[:, :, 0]
    else:
        sl = arr
    m = roi_mask(sl.shape, roi)
    from spark_ij_spark.datamodel import stats_of_values

    return stats_of_values(sl[m].astype("float64"))
