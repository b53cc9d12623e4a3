"""Byte-stream image codecs (suffix-dispatched).

The reference decodes byte streams by writing a temp file and calling
the ImageJ opener (`Spiji.java:1571-1614` — its own comment calls this
a "pyspark-style ugly hack"); encode likewise round-trips a temp file
(`Spiji.java:1623-1634`). This rebuild is in-memory: numpy's ``.npy``
container is the native, fully-tested format; PIL/tifffile codecs are
gated behind import-try because those libraries are not in the target
container — the dispatch, schema, and plumbing around them are real,
only the codec body is stubbed (NotImplementedError) when the library
is absent.
"""

from __future__ import annotations

import io
import os

import numpy as np

from spark_ij_spark.datamodel import coerce_ingest, ensure_3d

#: suffixes with a real in-container codec
NATIVE_SUFFIXES = (".npy",)
#: suffixes that need PIL (stubbed when PIL is absent)
PIL_SUFFIXES = (".png", ".jpg", ".jpeg", ".gif", ".bmp")
#: suffixes that need tifffile (stubbed when absent)
TIFF_SUFFIXES = (".tif", ".tiff")

SUPPORTED_SUFFIXES = NATIVE_SUFFIXES + PIL_SUFFIXES + TIFF_SUFFIXES


def _suffix(path: str) -> str:
    return os.path.splitext(path)[1].lower()


def decode_bytes(data: bytes, path: str) -> np.ndarray:
    """bytes → ndarray ([h][w][slices] after ingest coercion), suffix-
    dispatched like the reference's opener (`scOps.scala:90-91`)."""
    sfx = _suffix(path)
    if sfx in NATIVE_SUFFIXES:
        arr = np.load(io.BytesIO(data), allow_pickle=False)
        return ensure_3d(coerce_ingest(arr))
    if sfx in PIL_SUFFIXES:
        try:
            from PIL import Image  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"codec for '{sfx}' requires PIL, which is not installed in "
                "this container; plumbing is real, codec body is stubbed "
                "(see sources/codecs.py)"
            ) from e
        img = Image.open(io.BytesIO(data))
        return ensure_3d(coerce_ingest(np.asarray(img)))
    if sfx in TIFF_SUFFIXES:
        try:
            import tifffile  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                f"codec for '{sfx}' requires tifffile, which is not installed "
                "in this container; plumbing is real, codec body is stubbed"
            ) from e
        arr = tifffile.imread(io.BytesIO(data))
        return ensure_3d(coerce_ingest(arr))
    raise ValueError(
        f"unsupported image suffix {sfx!r} for {path!r}; supported: "
        f"{', '.join(SUPPORTED_SUFFIXES)}"
    )


def encode_array(arr: np.ndarray, suffix: str = ".npy") -> bytes:
    """ndarray → bytes for the given container format."""
    if suffix in NATIVE_SUFFIXES:
        buf = io.BytesIO()
        np.save(buf, arr, allow_pickle=False)
        return buf.getvalue()
    if suffix in PIL_SUFFIXES:
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                f"encoder for '{suffix}' requires PIL (not installed); "
                "use '.npy' in this container"
            ) from e
        buf = io.BytesIO()
        Image.fromarray(arr.squeeze()).save(buf, format=suffix.lstrip(".").upper())
        return buf.getvalue()
    raise ValueError(f"unsupported encode suffix {suffix!r}")
