"""Round-12 experiment 1: the order_quantity_images build pass.

Every img_* query's COLD cost is dominated by materializing the shared
cached image table (r12 baseline: 8 img queries, 1.4-2.5 s each cold,
all paying the same build). The current build returns the full nested
image struct from a pandas UDF that assembles one Python dict per
order (~150 k dicts at sf0.1) — the row-at-a-time struct construction
guide §4.2 warns about.

Candidates (results asserted identical before timing):

  A (current)    pandas UDF -> full nested IMAGE_SCHEMA struct rows
  B (binary udf) pandas UDF returns ONLY the packed float32 bytes;
                 dtype/shape/meta/log are assembled JVM-side (literal
                 struct) — the Arrow return payload shrinks to the
                 pixel bytes and Python builds no dicts
  C (mapInArrow) zero-copy re-slice: the Arrow list<float32> child
                 buffer IS the concatenated pixel payload, so the
                 binary column is built from the list offsets (x4)
                 over the same data buffer (guide §4.2, offsets trick)

Usage: python tools/exp1_r12.py [--reps 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import functions as F
    from pyspark.sql.types import BinaryType

    from spark_ij_spark.datamodel import DEFAULT_META, LOG_ENTRY_SCHEMA
    from spark_ij_spark.operators import image_queries as iq
    from spark_ij_spark.session import get_spark, load_tables

    spark = get_spark("exp1-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def grouped_q():
        li = load_tables(spark, SF, ["lineitem"])["lineitem"]
        grouped = li.groupBy("l_orderkey").agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "l_linenumber", "l_quantity", "l_extendedprice", "l_partkey"
                    )
                )
            ).alias("pix")
        )
        return grouped.select(
            "l_orderkey",
            F.expr("transform(pix, e -> CAST(e.l_quantity AS FLOAT))").alias("q"),
        )

    # JVM-side image-struct assembly shared by B and C: only the packed
    # bytes + length come from Python
    META_LIT = F.struct(
        *[
            (F.lit(v).cast("double") if isinstance(v, float) else F.lit(v)).alias(k)
            for k, v in DEFAULT_META.items()
        ]
    )
    EMPTY_LOG = F.expr("array()").cast(
        "array<struct<optype:string,optool:string,opval:string,"
        "opargs:array<string>,children_json:string>>"
    )

    def assemble(packed):
        return packed.select(
            "l_orderkey",
            F.struct(
                F.col("data").alias("data"),
                F.lit("float32").alias("dtype"),
                F.array(F.lit(1), F.col("n"), F.lit(1)).alias("shape"),
                META_LIT.alias("meta"),
                EMPTY_LOG.alias("log"),
            ).alias("image"),
        )

    def build_b():
        # no type hints: `from __future__ import annotations` stringifies
        # them and the local pd import defeats pandas_udf's resolver
        pack = F.pandas_udf(
            lambda q: pd.Series(
                [np.ascontiguousarray(v, dtype=np.float32).tobytes() for v in q]
            ),
            BinaryType(),
        )

        flat = grouped_q()
        packed = flat.select(
            "l_orderkey",
            pack("q").alias("data"),
            F.size("q").alias("n"),
        )
        return assemble(packed)

    def build_c():
        def pack(batches):
            for b in batches:
                if b.num_rows == 0:
                    continue
                okey = b.column(0)
                q = b.column(1)
                off = np.asarray(q.offsets)
                vals = q.values.to_numpy(zero_copy_only=False).astype(
                    np.float32, copy=False
                )
                # binary column over the same payload: byte offsets are
                # 4x the (rebased) list offsets; one contiguous slice of
                # the child buffer is the data
                bo = ((off - off[0]) * 4).astype(np.int32)
                payload = np.ascontiguousarray(vals[off[0] : off[-1]])
                data = pa.Array.from_buffers(
                    pa.binary(),
                    b.num_rows,
                    [None, pa.py_buffer(bo.tobytes()), pa.py_buffer(payload)],
                )
                n = pa.array(np.diff(off).astype(np.int32))
                yield pa.RecordBatch.from_arrays(
                    [okey, data, n], names=["l_orderkey", "data", "n"]
                )

        flat = grouped_q()
        packed = flat.mapInArrow(pack, schema="l_orderkey long, data binary, n int")
        return assemble(packed)

    builders = {
        "A_current": lambda: iq.order_quantity_images(spark, SF),
        "B_binary_udf": build_b,
        "C_mapinarrow": build_c,
    }

    # --- identity check: full image rows must match A exactly ----------
    def canon(df):
        rows = df.select(
            "l_orderkey",
            F.col("image.data").alias("d"),
            F.col("image.dtype").alias("t"),
            F.col("image.shape").alias("s"),
            F.col("image.meta").alias("m"),
            F.col("image.log").alias("lg"),
        ).collect()
        return sorted(
            (r.l_orderkey, bytes(r.d), r.t, tuple(r.s), tuple(r.m), tuple(r.lg))
            for r in rows
        )

    ref = canon(builders["A_current"]())
    spark.catalog.clearCache()
    for name in ("B_binary_udf", "C_mapinarrow"):
        got = canon(builders[name]())
        spark.catalog.clearCache()
        assert got == ref, f"{name}: result differs from current build"
        print(f"{name}: identical ({len(got)} rows)", flush=True)

    # --- timing: build + materialize via noop (cold each rep: the cache
    # is cleared, so this times what every img query's first run pays)
    for name, fn in builders.items():
        best = float("inf")
        for _ in range(args.reps):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(fn())
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(f"{name:14s} cold build: {best:6.3f} s", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
