"""Particle analysis: connected-component labeling + per-component
shape/intensity measurements.

Rebuilds ``analyzeParticles`` (reference: PortableImagePlus.scala:153-155
→ ImageJ's ParticleAnalyzer with the measurement set of
IJResultsTable.scala:95-97: area mean standard modal min centroid center
perimeter bounding integrated median skewness kurtosis). Output is the
dynamic results table — ``{column: array<double>}`` — exactly the wire
shape of IJResultsTableUDT (IJResultsTableUDT.scala:32-38).

Pure numpy (no scipy in the runtime): labeling is two-pass union-find
with 8-connectivity (ImageJ's default); perimeter uses the exposed-edge
count approximation (documented divergence from ImageJ's weighted
boundary walk); Feret is the max pairwise distance over boundary pixels.
"""

from __future__ import annotations

import numpy as np

from spark_ij_spark.registry import register_op


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """8-connected two-pass union-find labeling of a 2D boolean mask.

    Returns (labels int32 [h][w] with 0 = background, n_components).
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]  # parent[i] = representative; parent[0] unused

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nxt = 1
    for i in range(h):
        row = mask[i]
        for j in range(w):
            if not row[j]:
                continue
            neigh = []
            if i > 0:
                if labels[i - 1, j]:
                    neigh.append(labels[i - 1, j])
                if j > 0 and labels[i - 1, j - 1]:
                    neigh.append(labels[i - 1, j - 1])
                if j + 1 < w and labels[i - 1, j + 1]:
                    neigh.append(labels[i - 1, j + 1])
            if j > 0 and labels[i, j - 1]:
                neigh.append(labels[i, j - 1])
            if not neigh:
                labels[i, j] = nxt
                parent.append(nxt)
                nxt += 1
            else:
                m = min(neigh)
                labels[i, j] = m
                for n in neigh:
                    union(m, n)
    # second pass: compress to consecutive ids
    remap: dict[int, int] = {}
    out_n = 0
    flat = labels.ravel()
    for idx in np.nonzero(flat)[0]:
        r = find(int(flat[idx]))
        if r not in remap:
            out_n += 1
            remap[r] = out_n
        flat[idx] = remap[r]
    return labels, out_n


def _component_measurements(
    values: np.ndarray,
    labels: np.ndarray,
    n: int,
    pixel_width: float = 1.0,
    pixel_height: float = 1.0,
) -> dict[str, list[float]]:
    """ImageJ-style measurement columns for each labeled component."""
    cols: dict[str, list[float]] = {
        k: []
        for k in (
            "Area Mean StdDev Mode Min Max X Y XM YM Perim. BX BY Width Height "
            "Circ. Feret IntDen Median Skew Kurt RawIntDen".split()
        )
    }
    px_area = pixel_width * pixel_height
    for lab in range(1, n + 1):
        ys, xs = np.nonzero(labels == lab)
        vals = values[ys, xs].astype("float64")
        cnt = vals.size
        mean = vals.mean()
        sd = vals.std(ddof=1) if cnt > 1 else 0.0
        # mode: most frequent value (ImageJ: histogram peak)
        uniq, freq = np.unique(vals, return_counts=True)
        mode = uniq[int(np.argmax(freq))]
        tot = vals.sum()
        cx = (xs.mean() + 0.5) * pixel_width
        cy = (ys.mean() + 0.5) * pixel_height
        if tot != 0:
            cxm = ((xs + 0.5) * vals).sum() / tot * pixel_width
            cym = ((ys + 0.5) * vals).sum() / tot * pixel_height
        else:
            cxm, cym = cx, cy
        bx, by = xs.min(), ys.min()
        bw, bh = xs.max() - bx + 1, ys.max() - by + 1
        # perimeter: exposed 4-neighbor edges (approximation)
        comp = labels == lab
        per = 0
        per += np.count_nonzero(comp[0, :]) + np.count_nonzero(comp[-1, :])
        per += np.count_nonzero(comp[:, 0]) + np.count_nonzero(comp[:, -1])
        per += np.count_nonzero(comp[1:, :] != comp[:-1, :])
        per += np.count_nonzero(comp[:, 1:] != comp[:, :-1])
        per = per * (pixel_width + pixel_height) / 2.0
        area = cnt * px_area
        circ = float(4.0 * np.pi * area / (per * per)) if per > 0 else 0.0
        # Feret: max pairwise distance over boundary pixels (capped)
        pts = np.stack([xs * pixel_width, ys * pixel_height], axis=1)
        if len(pts) > 1500:
            sel = np.linspace(0, len(pts) - 1, 1500).astype(int)
            pts = pts[sel]
        if len(pts) > 1:
            d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(axis=2)
            feret = float(np.sqrt(d2.max()))
        else:
            feret = float(max(pixel_width, pixel_height))
        if cnt > 2 and sd > 0:
            z = (vals - mean) / sd
            skew = float((z**3).mean())
            kurt = float((z**4).mean() - 3.0)
        else:
            skew, kurt = 0.0, 0.0
        row = {
            "Area": area,
            "Mean": mean,
            "StdDev": sd,
            "Mode": float(mode),
            "Min": float(vals.min()),
            "Max": float(vals.max()),
            "X": cx,
            "Y": cy,
            "XM": cxm,
            "YM": cym,
            "Perim.": float(per),
            "BX": float(bx * pixel_width),
            "BY": float(by * pixel_height),
            "Width": float(bw * pixel_width),
            "Height": float(bh * pixel_height),
            "Circ.": min(circ, 1.0),
            "Feret": feret,
            "IntDen": float(area * mean),
            "Median": float(np.median(vals)),
            "Skew": skew,
            "Kurt": kurt,
            "RawIntDen": float(tot),
        }
        for k, v in row.items():
            cols[k].append(float(v))
    return cols


def analyze_particles(
    arr: np.ndarray,
    pixel_width: float = 1.0,
    pixel_height: float = 1.0,
    min_size: float = 0.0,
    max_size: float = np.inf,
) -> dict[str, list[float]]:
    """Label foreground (nonzero) per slice and measure each component.

    Components are filtered by calibrated area in [min_size, max_size]
    (the ``size=`` option of Analyze Particles...). Slices are analyzed
    independently and their rows concatenated, with a ``Slice`` column
    when the stack has >1 slice (ImageJ behavior with ``stack``).
    """
    if arr.ndim == 2:
        arr = arr[:, :, np.newaxis]
    if arr.ndim == 4:  # RGB → first channel for masking purposes
        arr = arr[..., 0]
    out: dict[str, list[float]] = {}
    nslices = arr.shape[2]
    for k in range(nslices):
        sl = arr[:, :, k]
        labels, n = label_components(sl != 0)
        cols = _component_measurements(sl, labels, n, pixel_width, pixel_height)
        if min_size > 0 or np.isfinite(max_size):
            keep = [
                i
                for i, a in enumerate(cols["Area"])
                if min_size <= a <= max_size
            ]
            cols = {c: [v[i] for i in keep] for c, v in cols.items()}
        if nslices > 1:
            cols["Slice"] = [float(k + 1)] * len(cols["Area"])
        for c, v in cols.items():
            out.setdefault(c, []).extend(v)
    return out


@register_op("Analyze Particles...")
def op_analyze_particles(arr, args, meta):
    """Registry entry: returns (image unchanged, results table)."""
    size = str(args.get("size", "0-Infinity"))
    try:
        lo_s, _, hi_s = size.partition("-")
        lo = float(lo_s or 0.0)
        hi = np.inf if hi_s in ("", "Infinity") else float(hi_s)
    except ValueError:
        lo, hi = 0.0, np.inf
    table = analyze_particles(
        arr,
        pixel_width=float(meta.get("pixel_width", 1.0) or 1.0),
        pixel_height=float(meta.get("pixel_height", 1.0) or 1.0),
        min_size=lo,
        max_size=hi,
    )
    return arr, table
