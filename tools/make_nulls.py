"""Build a NULL/empty-injected variant of sf0.01 under .scratch/ —
the third adversarial axis after scale (scale10.py) and skew
(make_skew.py). The driver's testdata contains ZERO nulls and zero
empty strings/arrays in any table (verified round 8), so every
null-handling branch in all graded queries is dormant at the graded
SFs — while a real 100 TB corpus is full of null/empty text, missing
metric values, and empty embedding rows.

Injection rules (DETERMINISTIC modular rules on ids, no RNG; VALUE
columns only). Keys AND dimension columns (doc_id/vec_id/user_id/
event_id, lang, source, event_type, ts, label) stay non-null — that is
the documented ingest contract, not an oversight: a grouping dimension
with NULLs would force an '<unknown>' coalesce into every group key of
~100 queries for no analytic gain, so the ingest boundary (the
split_corrupt path for malformed rows) enforces them NOT NULL and the
nullable surface is exactly the measurement columns injected here:

- documents.text: ``doc_id % 23 = 5`` → NULL, ``% 23 = 9`` → '' (empty
  string), ``% 23 = 13`` → whitespace-only; n_chars re-derived from
  the new text (NULL when text is NULL — a missing doc has no length).
- events.value: ``event_id % 31 = 11`` → NULL (missing metric sample),
  ``event_id % 31 = 23`` → NaN (a bad reading: NaN through a plain
  decimal/BIGINT cast crashes DuckDB and ANSI Spark — the TRY_CAST
  measurement boundary maps it to missing), ``event_id % 31 = 29`` →
  +Infinity (an overflowed reading — same missing-data contract as
  NaN). Whole-entity rules make the all-null-GROUP branches fire:
  ``user_id % 101 = 7`` → every reading of the user NULL (the user
  must drop from TWA/EWMA on both engines), ``epoch-hour % 97 = 13``
  → every reading of the hour NULL (the rollup's hourly sum must
  COALESCE to 0.0 on both engines).
- events.props: ``event_id % 31 = 17`` → NULL (absent JSON payload).
- embeddings.embedding: ``vec_id % 37 = 12`` → empty array,
  ``vec_id % 37 = 25`` → NULL (failed embedder rows),
  ``vec_id % 37 = 7`` → NULL element at position 0,
  ``vec_id % 37 = 31`` → NaN element at position 0,
  ``vec_id % 37 = 19`` → +Infinity element at position 0
  (partially-corrupt vectors — the _emb integrity filter must reject
  all three: a NaN/Inf element poisons quantization casts and cosine,
  and DuckDB's plain CAST errors on Infinity where Spark's TRY_CAST
  silently NULLs — the one-engine-crash class).

Spark and DuckDB read the SAME injected parquet, so
``tools/oracle_sim.py --sf .scratch/null0.01`` hash-verifies that the
two engines AGREE on every query's null semantics — and that no Spark
path (numpy kernels, pandas UDFs, array expressions) crashes on a
null/empty input.

Usage:
  python tools/make_nulls.py                # null0.01 (correctness sweep)
Then: python tools/oracle_sim.py --sf .scratch/null0.01
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_ap = argparse.ArgumentParser()
_ap.add_argument("--src", default="sf0.01")
_ARGS = _ap.parse_args()

SRC = f"/root/testdata/{_ARGS.src}"
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    _ARGS.src.replace("sf", "null"),
)


def main() -> int:
    from pyspark.sql import functions as F

    from spark_ij_spark.session import get_spark, load_tables

    spark = get_spark("make-nulls", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    t = load_tables(spark, SRC)

    # --- documents ------------------------------------------------------
    docs = t["documents"].select(
        "doc_id",
        F.expr(
            "CASE WHEN doc_id % 23 = 5 THEN CAST(NULL AS STRING)"
            " WHEN doc_id % 23 = 9 THEN ''"
            " WHEN doc_id % 23 = 13 THEN '   '"
            " ELSE text END"
        ).alias("text"),
        "lang",
        "source",
    )
    docs = docs.withColumn("n_chars", F.expr("CAST(length(text) AS BIGINT)"))
    docs.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    # --- events ---------------------------------------------------------
    ev = t["events"].select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.expr(
            # per-event missing/bad readings, PLUS whole-entity rules
            # that make the all-null-group branches fire: every
            # reading of ~1% of users (user_id % 101 = 7) and every
            # reading in ~1% of UTC hours (epoch-hour % 97 = 13) is
            # NULL — an all-null user must DROP from TWA/EWMA and an
            # all-null hour must COALESCE to 0.0 in the rollup on
            # both engines (dormant until these rules existed), and
            # +Infinity (event_id % 31 = 29) is an overflowed reading
            # that every measurement boundary must treat as missing.
            "CASE WHEN event_id % 31 = 11 THEN CAST(NULL AS DOUBLE)"
            " WHEN event_id % 31 = 23 THEN CAST('NaN' AS DOUBLE)"
            " WHEN event_id % 31 = 29 THEN CAST('Infinity' AS DOUBLE)"
            " WHEN user_id % 101 = 7 THEN CAST(NULL AS DOUBLE)"
            " WHEN (unix_micros(ts) div 3600000000) % 97 = 13"
            "   THEN CAST(NULL AS DOUBLE)"
            " ELSE value END"
        ).alias("value"),
        F.expr(
            "CASE WHEN event_id % 31 = 17 THEN CAST(NULL AS STRING)"
            " ELSE props END"
        ).alias("props"),
    )
    ev.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )

    # --- embeddings -----------------------------------------------------
    emb = t["embeddings"].select(
        "vec_id",
        F.expr(
            "CASE WHEN vec_id % 37 = 12 THEN CAST(array() AS ARRAY<FLOAT>)"
            " WHEN vec_id % 37 = 25 THEN CAST(NULL AS ARRAY<FLOAT>)"
            " WHEN vec_id % 37 = 7 THEN concat("
            "array(CAST(NULL AS FLOAT)), slice(embedding, 2, size(embedding) - 1))"
            " WHEN vec_id % 37 = 31 THEN concat("
            "array(CAST('NaN' AS FLOAT)), slice(embedding, 2, size(embedding) - 1))"
            " WHEN vec_id % 37 = 19 THEN concat("
            "array(CAST('Infinity' AS FLOAT)), slice(embedding, 2, size(embedding) - 1))"
            " ELSE embedding END"
        ).alias("embedding"),
        "label",
    )
    emb.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )

    # --- unchanged tables: copy through ----------------------------------
    for name in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        t[name].write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )
    print(f"null-injected dataset written to {OUT}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
