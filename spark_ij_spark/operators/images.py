"""DataFrame-level image operators — the rebuild of the reference's
RDD combinator surface (scOps.scala) as idiomatic PySpark.

Reference shape: ``RDD[(String, PortableImagePlus)]`` with implicit
combinators (runAll, getStatistics, runRange...). Rebuild: a DataFrame
with ``sample: string, image: struct`` columns; every combinator is a
column expression over Arrow pandas UDFs, so Catalyst fuses chains of
ops into single stages and the whole pipeline stays embarrassingly
parallel (the reference's own operators induce no shuffles either —
SURVEY.md §3.2).

Scale notes: image payloads ride inside Arrow batches; batch size is
bounded by spark.sql.execution.arrow.maxRecordsPerBatch — for 100 TB of
large images, lower that (or repartition by bytes) so a batch fits in
worker memory. No driver-side collect anywhere (the reference's
driver-side filename collect, scOps.scala:78-80, is not carried over).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from spark_ij_spark import lineage
from spark_ij_spark.datamodel import (
    HIST_SCHEMA,
    IMAGE_SCHEMA,
    STATS_SCHEMA,
    TABLE_SCHEMA,
    image_to_np,
    log_of,
    meta_of,
    np_to_image,
)
from spark_ij_spark.kernels.histogram import histogram
from spark_ij_spark.registry import run_op

# ---------------------------------------------------------------------------
# sources (reference: scOps.scala:63-73 createEmptyImages)
# ---------------------------------------------------------------------------


def create_empty_images(
    spark: SparkSession,
    prefix: str,
    imgs: int,
    width: int,
    height: int,
    value_fn: Callable[[int], float] | None = None,
    dtype: str = "float32",
    slices: int = 1,
    partitions: int | None = None,
) -> DataFrame:
    """Synthetic image table: ``imgs`` constant-valued images keyed
    ``prefix + i``. Distributed via spark.range → mapInPandas (images are
    materialized on executors, never on the driver)."""
    value_fn = value_fn or (lambda i: 0.0)

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                arr = np.full((height, width, slices), value_fn(i), dtype=dtype)
                img = np_to_image(
                    arr,
                    log=[
                        lineage.log_entry(
                            lineage.OP_CREATE,
                            "createEmptyImages",
                            [prefix, str(width), str(height)],
                        )
                    ],
                )
                rows.append({"sample": f"{prefix}{i}", "image": img})
            yield pd.DataFrame(rows)

    out_schema = StructType(
        [StructField("sample", StringType()), StructField("image", IMAGE_SCHEMA)]
    )
    rng = spark.range(imgs, numPartitions=partitions or min(imgs, 32))
    return rng.mapInPandas(gen, schema=out_schema)


# ---------------------------------------------------------------------------
# per-row op application (reference: scOps.scala:192-198 runAll)
# ---------------------------------------------------------------------------


def _apply_ops_batch(
    img_df: pd.DataFrame, ops: list[tuple[str, str]]
) -> pd.DataFrame:
    rows = []
    for img in img_df.itertuples(index=False):
        arr = image_to_np(img)
        meta = meta_of(img)
        log = log_of(img)
        for cmd, args in ops:
            arr, _table = run_op(arr, cmd, args, meta)
            log = lineage.append_entry(
                log, lineage.log_entry(lineage.OP_RUN, cmd, [args or ""])
            )
        rows.append(np_to_image(arr, meta=meta, log=log))
    return pd.DataFrame(rows, columns=["data", "dtype", "shape", "meta", "log"])


def run_image_ops(
    image_col: str | Column, ops: list[tuple[str, str]]
) -> Column:
    """Fused op chain: apply registry ops IN SEQUENCE inside ONE Arrow
    pandas-UDF hop (SURVEY §4.2 op-fusion). Chained single-op UDFs are
    dependent Python UDFs, which Spark plans as one ArrowEvalPython
    node PER op — each paying a full image-struct serialize/deserialize
    round trip. Fusing keeps the ndarray in Python between ops, so a
    k-op chain costs one round trip instead of k. Lineage is appended
    per op, identical to running the ops separately."""

    @F.pandas_udf(IMAGE_SCHEMA)
    def _udf(img: pd.DataFrame) -> pd.DataFrame:
        return _apply_ops_batch(img, list(ops))

    return _udf(image_col)


def run_image_op(image_col: str | Column, cmd: str, args: str = "") -> Column:
    """Column expression applying a named op (lineage appended)."""
    return run_image_ops(image_col, [(cmd, args)])


def run_all(
    df: DataFrame,
    cmd: str | list[tuple[str, str]],
    args: str = "",
    image_col: str = "image",
) -> DataFrame:
    """Map a named op over every row (the reference's runAll). Pass a
    list of ``(cmd, args)`` pairs to run a fused chain in one Arrow
    hop (see run_image_ops)."""
    if isinstance(cmd, list):
        return df.withColumn(image_col, run_image_ops(image_col, cmd))
    return df.withColumn(image_col, run_image_op(image_col, cmd, args))


def run_with_table(
    df: DataFrame, cmd: str, args: str = "", image_col: str = "image"
) -> DataFrame:
    """Run op and keep (image, results-table) — reference runWithTable
    (PortableImagePlus.scala:130-136). Table is a per-row functional
    value, NOT process-global state (risk §7.3-3 of SURVEY.md)."""
    pair_schema = StructType(
        [StructField("image", IMAGE_SCHEMA), StructField("table", TABLE_SCHEMA)]
    )

    @F.pandas_udf(pair_schema)
    def _udf(img: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in img.itertuples(index=False):
            arr = image_to_np(r)
            meta = meta_of(r)
            out, table = run_op(arr, cmd, args, meta)
            log = lineage.append_entry(
                log_of(r), lineage.log_entry(lineage.OP_RUN, cmd, [args or ""])
            )
            rows.append(
                {
                    "image": np_to_image(out, meta=meta, log=log),
                    "table": {k: list(map(float, v)) for k, v in (table or {}).items()},
                }
            )
        return pd.DataFrame(rows)

    tmp = df.withColumn("_pair", _udf(image_col))
    return tmp.withColumn(image_col, F.col("_pair.image")).withColumn(
        "table", F.col("_pair.table")
    ).drop("_pair")


# ---------------------------------------------------------------------------
# per-image reductions
# ---------------------------------------------------------------------------


def image_stats(image_col: str | Column) -> Column:
    """min/mean/stdDev/max/pts struct (reference: getImageStatistics,
    PortableImagePlus.scala:143-146, which delegates to ImageJ's
    ImageStatistics — SAMPLE stddev, n−1 denominator; matches
    particles.py's per-component measurements)."""

    from spark_ij_spark.datamodel import stats_of_values

    @F.pandas_udf(STATS_SCHEMA)
    def _udf(img: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [
                stats_of_values(image_to_np(r).astype("float64"))
                for r in img.itertuples(index=False)
            ]
        )

    return _udf(image_col)


def get_statistics(df: DataFrame, image_col: str = "image") -> DataFrame:
    return df.withColumn("stats", image_stats(image_col))


def image_histogram(
    image_col: str | Column,
    value_range: tuple[float, float] | None = None,
    bins: int = 256,
) -> Column:
    """Histogram struct column (hist/hist3 SQL surface)."""

    @F.pandas_udf(HIST_SCHEMA)
    def _udf(img: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in img.itertuples(index=False):
            centers, counts = histogram(image_to_np(r), value_range, bins)
            rows.append(
                {
                    "bin_centers": centers.tolist(),
                    "bin_counts": [int(c) for c in counts],
                }
            )
        return pd.DataFrame(rows)

    return _udf(image_col)


# ---------------------------------------------------------------------------
# binary (two-image) ops (reference: PortableImagePlus.scala:217-270)
# ---------------------------------------------------------------------------

_BINARY_KERNELS = {
    "subtract": lambda a, b: a.astype("float64") - b.astype("float64"),
    "average": lambda a, b: (a.astype("float64") + b.astype("float64")) / 2.0,
    "add": lambda a, b: a.astype("float64") + b.astype("float64"),
    "append": lambda a, b: np.concatenate([a, b], axis=2),
}


def combine_images(a_col: str | Column, b_col: str | Column, how: str) -> Column:
    """Pixel-wise binary op; lineage logs of both parents merge into one
    nested MERGE entry (ImagePlusIO.scala:175-183 semantics)."""
    kern = _BINARY_KERNELS[how]

    @F.pandas_udf(IMAGE_SCHEMA)
    def _udf(a: pd.DataFrame, b: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for ra, rb in zip(a.itertuples(index=False), b.itertuples(index=False)):
            na_, nb_ = image_to_np(ra), image_to_np(rb)
            arr = kern(na_, nb_)
            if how == "append" and na_.dtype == nb_.dtype:
                # same-dtype append keeps the parents' dtype; a MIXED
                # append keeps numpy's promoted type — casting back to
                # the first parent's dtype silently wrapped/truncated
                # the second parent's pixels (round-8 review)
                arr = arr.astype(na_.dtype)
            log = lineage.merge_logs(log_of(ra), log_of(rb), how)
            rows.append(np_to_image(arr, meta=meta_of(ra), log=log))
        return pd.DataFrame(rows)

    return _udf(a_col, b_col)


# ---------------------------------------------------------------------------
# pixel explode — images as relational data (enables SQL/DuckDB oracles)
# ---------------------------------------------------------------------------

_PIXEL_SCHEMA = StructType(
    [
        StructField("sample", StringType()),
        StructField("y", IntegerType()),
        StructField("x", IntegerType()),
        StructField("z", IntegerType()),
        StructField("value", DoubleType()),
    ]
)


def processor_for_each(
    image_col: str | Column,
    slice_fn: Callable[[np.ndarray], np.ndarray],
    op_label: str = "processorForEach",
) -> Column:
    """Apply a 2-D kernel to every slice of a 3-D stack independently
    (PortableImagePlus.scala:163-180), appending one lineage entry.

    ``slice_fn`` receives [h][w] and returns [h][w]; slices are
    re-stacked on axis 2 (RGB images iterate per slice AND channel via
    the shared 4D-aware helper — a bare ``arr[:, :, k]`` on a 4D image
    handed [h][w][3] planes to the 2-D kernel). Runs batch-at-a-time
    in the pandas UDF, so per-slice Python overhead is amortized
    across the Arrow batch.
    """
    from spark_ij_spark import lineage
    from spark_ij_spark.kernels.filters import _per_slice

    @F.pandas_udf(IMAGE_SCHEMA)
    def _udf(img: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in img.itertuples(index=False):
            arr = image_to_np(r)
            out = _per_slice(arr, slice_fn)
            log = lineage.append_entry(
                log_of(r), lineage.log_entry("PROC", op_label)
            )
            rows.append(np_to_image(out, meta=meta_of(r), log=log))
        return pd.DataFrame(rows, columns=["data", "dtype", "shape", "meta", "log"])

    col = F.col(image_col) if isinstance(image_col, str) else image_col
    return _udf(col)


def explode_pixels(df: DataFrame, image_col: str = "image", sample_col: str = "sample") -> DataFrame:
    """Flatten images into (sample, y, x, z, value) rows — the relational
    view of pixel data (`toarray` SQL surface made queryable)."""

    def gen(batches):
        # accumulate numpy arrays per batch and concatenate ONCE — the
        # per-pixel list extends this replaces boxed ~5 Python objects
        # per pixel before pandas re-converted them to Arrow (CLAUDE.md:
        # vectorize per Arrow batch, not per row/image)
        for pdf in batches:
            samples, ys, xs, zs, vs = [], [], [], [], []
            for sample, img in zip(pdf[sample_col], pdf[image_col]):
                arr = image_to_np(img)
                if arr.ndim == 4:
                    arr = arr[..., 0]
                h, w, s = arr.shape
                yy, xx, zz = np.meshgrid(
                    np.arange(h), np.arange(w), np.arange(s), indexing="ij"
                )
                samples.append(np.repeat(np.asarray([sample]), arr.size))
                ys.append(yy.ravel())
                xs.append(xx.ravel())
                zs.append(zz.ravel())
                vs.append(arr.astype("float64").ravel())
            if not samples:
                continue
            yield pd.DataFrame(
                {
                    "sample": np.concatenate(samples),
                    "y": np.concatenate(ys),
                    "x": np.concatenate(xs),
                    "z": np.concatenate(zs),
                    "value": np.concatenate(vs),
                }
            )

    return df.select(sample_col, image_col).mapInPandas(gen, schema=_PIXEL_SCHEMA)


def reduce_images(
    df: DataFrame, key_col: str, how: str = "average", image_col: str = "image"
) -> DataFrame:
    """groupBy(key).applyInPandas reduce of same-shape images — the
    group form of the pairwise `average`/`subtract` ops (SURVEY §2.6;
    reference pairwise average `PortableImagePlus.scala:217-232`).

    ``how``: average | sum | min | max. The result image is float64 so
    integral pixel sums stay exact (order-independent) regardless of
    the reduction tree — required for oracle-grade determinism.

    Map-side combine: a ``mapInPandas`` pass partial-reduces each Arrow
    batch in place (per group within the batch), so the only thing that
    ever shuffles is one partial image per (batch, group) — the full
    pixel payload never crosses the wire. This is the aggregation shape
    a groupBy gets for free from Catalyst, hand-built here because the
    combine runs in numpy. It also dissolves the low-cardinality-key
    straggler problem (7 width classes here) without salting: partials
    parallelize with the input partitioning, and the final per-key
    merge touches only batch-count-sized data. Average carries (sum, n)
    through the tree so the merge is associative."""
    if how not in ("average", "sum", "min", "max"):
        raise ValueError(f"unknown reduction {how!r}")
    out_schema = StructType(
        [StructField("group_key", StringType()), StructField("image", IMAGE_SCHEMA)]
    )
    # Both Python hops move FLAT columns (binary payload + shape), not
    # the nested image struct — struct<binary,...> → Python conversion
    # dominates the hop cost otherwise (same projection the histogram /
    # particles hot paths use). meta/log are rebuilt at the end.
    partial_schema = StructType(
        [
            StructField("group_key", StringType()),
            StructField("n", LongType()),
            StructField("data", BinaryType()),
            StructField("shape", ArrayType(IntegerType())),
        ]
    )
    from spark_ij_spark.datamodel import DEFAULT_META

    def _pack(out: np.ndarray, n: int) -> dict:
        return {
            "data": np.ascontiguousarray(out).tobytes(),
            "dtype": "float64",
            "shape": [int(s) for s in out.shape],
            "meta": dict(DEFAULT_META),
            "log": [
                lineage.log_entry(
                    lineage.OP_MERGE, f"reduce_images:{how}", [str(n)]
                )
            ],
        }

    def _combine(arrs: np.ndarray) -> np.ndarray:
        return arrs.sum(axis=0) if how in ("average", "sum") else (
            arrs.min(axis=0) if how == "min" else arrs.max(axis=0)
        )

    def partial(batches):
        for pdf in batches:
            rows = []
            for gk, sub in pdf.groupby("group_key", sort=False):
                arrs = np.stack(
                    [
                        np.frombuffer(d, dtype=dt).reshape(list(sh)).astype("float64")
                        for d, dt, sh in zip(sub["data"], sub["dtype"], sub["shape"])
                    ]
                )
                out = _combine(arrs)
                rows.append(
                    {
                        "group_key": gk,
                        "n": len(arrs),
                        "data": np.ascontiguousarray(out).tobytes(),
                        "shape": [int(s) for s in out.shape],
                    }
                )
            if rows:
                yield pd.DataFrame(rows)

    def final(pdf: pd.DataFrame) -> pd.DataFrame:
        arrs = np.stack(
            [
                np.frombuffer(d, dtype="float64").reshape(list(sh))
                for d, sh in zip(pdf["data"], pdf["shape"])
            ]
        )
        n = int(pdf["n"].sum())
        out = _combine(arrs)
        if how == "average":
            out = out / n
        return pd.DataFrame(
            [{"group_key": str(pdf["group_key"].iloc[0]), "image": _pack(out, n)}]
        )

    flat = df.select(
        F.col(key_col).cast("string").alias("group_key"),
        F.col(f"{image_col}.data").alias("data"),
        F.col(f"{image_col}.dtype").alias("dtype"),
        F.col(f"{image_col}.shape").alias("shape"),
    )
    partials = flat.mapInPandas(partial, schema=partial_schema)
    return partials.groupBy("group_key").applyInPandas(final, schema=out_schema)


# ---------------------------------------------------------------------------
# grouped stack assembly (reference: Spiji.java:769-792 via groupBy)
# ---------------------------------------------------------------------------


def assemble_stacks(
    df: DataFrame, key_col: str, image_col: str = "image", order_col: str = "sample"
) -> DataFrame:
    """groupBy(key).applyInPandas: concatenate each group's images into
    one stack along the slice axis (deterministic order by order_col)."""
    out_schema = StructType(
        [StructField("sample", StringType()), StructField("image", IMAGE_SCHEMA)]
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        arrs = [image_to_np(img) for img in pdf[image_col]]
        stacked = np.concatenate(arrs, axis=2)
        first = pdf[image_col].iloc[0]
        img = np_to_image(
            stacked,
            meta=meta_of(first),
            log=[lineage.log_entry(lineage.OP_MERGE, "assemble_stacks", [str(len(arrs))])],
        )
        return pd.DataFrame([{"sample": str(pdf[key_col].iloc[0]), "image": img}])

    return df.groupBy(key_col).applyInPandas(build, schema=out_schema)
