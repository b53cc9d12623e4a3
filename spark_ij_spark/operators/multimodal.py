"""Multimodal columns: image/audio/video as opaque binary + typed meta.

North-star op family (SURVEY.md §7.1 M7): media travels as a struct
column ``media: struct<data binary, mime string, meta struct<...>>``
so Spark shuffles/persists it natively and kernels view it zero-copy.
Decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs (mapInPandas-style plumbing). The ``application/x-npy``
codec is real and fully tested; jpeg/png/audio/video codecs need
libraries absent from this container, so their decode bodies are
clearly-marked stubs (NotImplementedError) behind an import-try —
schema, partitioning, UDF signatures and batch shapes are real.

Scale: all ops are map-only over binary payloads; the only shuffles
are the analyst's own groupBys. Arrow batch size bounds executor
memory per batch (spark.sql.execution.arrow.maxRecordsPerBatch);
at 100 TB you lower it for large media so a batch of blobs fits.
"""

from __future__ import annotations

import io

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from spark_ij_spark.datamodel import image_to_np
from spark_ij_spark.operators.image_queries import order_quantity_images
from spark_ij_spark.operators.relational import dsum_sql

MEDIA_META_SCHEMA = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", DoubleType()),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("data", BinaryType()),
        StructField("mime", StringType()),
        StructField("meta", MEDIA_META_SCHEMA),
    ]
)

NPY_MIME = "application/x-npy"
#: mimes with a real in-container decoder (pure-stdlib codecs)
NATIVE_MIMES = (NPY_MIME, "image/png", "image/tiff", "application/dicom")
#: mimes whose decoders require absent libraries → stubbed
STUBBED_MIMES = ("image/jpeg", "audio/wav", "video/mp4")

_MIME_SUFFIX = {"image/png": ".png", "image/tiff": ".tif", "application/dicom": ".dcm"}


def decode_media_bytes(data: bytes, mime: str) -> np.ndarray:
    """Decode one media payload to ndarray [h][w][frames]. PNG/TIFF/
    DICOM decode via the pure-stdlib codecs (a multi-page TIFF's pages
    land on the frame axis); jpeg/audio/video need libraries absent
    from this container and stay clearly-marked stubs."""
    if mime == NPY_MIME:
        return np.load(io.BytesIO(bytes(data)), allow_pickle=False)
    if mime in _MIME_SUFFIX:
        from spark_ij_spark.sources.codecs import decode_bytes

        return decode_bytes(bytes(data), f"payload{_MIME_SUFFIX[mime]}")
    if mime in STUBBED_MIMES:
        raise NotImplementedError(
            f"decoder for {mime!r} requires a codec library not present in "
            "this container (PIL/librosa/av); the Spark-side plumbing is "
            "real — swap this body when the library is available"
        )
    raise ValueError(f"unknown mime {mime!r}")


def _encode_npy(arr: np.ndarray) -> bytes:
    buf = io.BytesIO()
    np.save(buf, arr, allow_pickle=False)
    return buf.getvalue()


def media_from_image(image_col: str | Column, frame_axis: bool = True) -> Column:
    """Pack an image struct into a media value (npy container). With
    ``frame_axis`` the width axis becomes the frame axis ([1][n][1] →
    [1][1][n]) so 1-D pixel rows act as frame sequences for video ops."""

    @F.pandas_udf(MEDIA_SCHEMA)
    def pack(imgs: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in imgs.itertuples(index=False):
            arr = image_to_np(r)
            if frame_axis and arr.shape[0] == 1 and arr.shape[2] == 1:
                arr = arr.reshape(1, 1, -1)
            h, w, nf = arr.shape
            rows.append(
                {
                    "data": _encode_npy(arr),
                    "mime": NPY_MIME,
                    "meta": {
                        "width": int(w),
                        "height": int(h),
                        "n_frames": int(nf),
                        "sample_rate": 0,
                        "duration_ms": float(nf) * (1000.0 / 30.0),
                    },
                }
            )
        return pd.DataFrame(rows, columns=["data", "mime", "meta"])

    col = F.col(image_col) if isinstance(image_col, str) else image_col
    return pack(col)


def frame_sample(media_col: str | Column, stride: int) -> Column:
    """Keep every ``stride``-th frame (frames 0, stride, 2·stride, …);
    meta updated to the sampled frame count."""

    @F.pandas_udf(MEDIA_SCHEMA)
    def sample(media: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in media.itertuples(index=False):
            arr = decode_media_bytes(r.data, r.mime)[:, :, ::stride]
            meta = dict(r.meta)
            meta["n_frames"] = int(arr.shape[2])
            meta["duration_ms"] = float(arr.shape[2]) * (1000.0 / 30.0)
            rows.append({"data": _encode_npy(arr), "mime": r.mime, "meta": meta})
        return pd.DataFrame(rows, columns=["data", "mime", "meta"])

    col = F.col(media_col) if isinstance(media_col, str) else media_col
    return sample(col)


def resize_media(media_col: str | Column, width: int, height: int) -> Column:
    """Nearest-neighbor spatial resize (deterministic index sampling —
    no interpolation library needed)."""

    @F.pandas_udf(MEDIA_SCHEMA)
    def resize(media: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in media.itertuples(index=False):
            arr = decode_media_bytes(r.data, r.mime)
            h, w, nf = arr.shape
            yi = (np.arange(height) * h) // height
            xi = (np.arange(width) * w) // width
            out = arr[yi][:, xi]
            meta = dict(r.meta)
            meta["width"], meta["height"] = int(width), int(height)
            rows.append({"data": _encode_npy(out), "mime": r.mime, "meta": meta})
        return pd.DataFrame(rows, columns=["data", "mime", "meta"])

    col = F.col(media_col) if isinstance(media_col, str) else media_col
    return resize(col)


FEATURE_SCHEMA = StructType(
    [
        StructField("mean", DoubleType()),
        StructField("std", DoubleType()),
        StructField("p_min", DoubleType()),
        StructField("p_max", DoubleType()),
        StructField("n_px", IntegerType()),
    ]
)


def media_features(media_col: str | Column) -> Column:
    """Per-media scalar feature extraction (decode → numpy reduce)."""

    @F.pandas_udf(FEATURE_SCHEMA)
    def feats(media: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in media.itertuples(index=False):
            arr = decode_media_bytes(r.data, r.mime).astype("float64")
            rows.append(
                {
                    "mean": float(arr.mean()),
                    "std": float(arr.std()),
                    "p_min": float(arr.min()),
                    "p_max": float(arr.max()),
                    "n_px": int(arr.size),
                }
            )
        return pd.DataFrame(rows, columns=["mean", "std", "p_min", "p_max", "n_px"])

    col = F.col(media_col) if isinstance(media_col, str) else media_col
    return feats(col)


# --- oracle-checked query ---------------------------------------------


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal pipeline: lineitem-quantity images → media (frames =
    lineitems ordered by (linenumber, quantity, price, partkey)) →
    frame_sample(stride 2) → features. Sampled-frame sum/count have an
    exact SQL oracle: quantities at odd row_number positions."""
    imgs = order_quantity_images(spark, sf_dir)
    media = imgs.select(
        "l_orderkey", media_from_image("image").alias("media")
    )
    sampled = media.select(
        "l_orderkey", frame_sample("media", 2).alias("media")
    )
    return sampled.select(
        "l_orderkey",
        F.col("media.meta.n_frames").alias("n_sampled"),
        media_features("media").alias("f"),
    ).select(
        "l_orderkey",
        "n_sampled",
        F.expr("round(f.mean * n_sampled, 2)").alias("sum_sampled"),
    )


Q_MEDIA_FRAME_SAMPLE_SQL = f"""
WITH ordered AS (
  SELECT l_orderkey, l_quantity,
         row_number() OVER (
           PARTITION BY l_orderkey
           ORDER BY l_linenumber, l_quantity, l_extendedprice, l_partkey
         ) AS rn
  FROM lineitem)
SELECT l_orderkey,
       CAST(COUNT(*) AS INT) AS n_sampled,
       round({dsum_sql('l_quantity', 2)}, 2) AS sum_sampled
FROM ordered
WHERE rn % 2 = 1
GROUP BY l_orderkey
"""


QUERIES = {"media_frame_sample": q_media_frame_sample}
ORACLES = {"media_frame_sample": Q_MEDIA_FRAME_SAMPLE_SQL}
