"""Build an adversarially SKEWED variant of sf0.01 under .scratch/ —
the dataset that actually exercises the branches the uniform testdata
leaves dormant:

- documents: ~30% of docs get a shared boilerplate sentence APPENDED
  (hot shingles — drives gram/band posting lists past the
  MAX_SHINGLE_DOC_FRAC caps so the capped code paths RUN), and docs
  selected by a hash rule become members of ~10 exact-duplicate
  clusters of ~30 copies each (hot LSH bands, big CC components, deep
  keeper groups).
- events: ~25% of events are reassigned to ONE hot user and their
  event_type forced to one hot type (skewed sessionization, window,
  salted-agg, co-occurrence paths).
- lineitem: ~20% of rows re-keyed to one hot part and one hot
  supplier (skewed joins; AQE skew handling).
- embeddings: ~60% of vectors replaced by copies of vector 0 (a dense
  cell for SemDeDup/IVF/LSH bucket hotness; raised from 10% in round
  10 so the densest LSH bucket exceeds BOTH retrieval candidate caps
  (LSH_PROBE_CAP=64 and LSH_OWN_CAP=256) and every cap branch runs
  live end-to-end under the skew hash sweep — at 10% the max
  occupancy was 57, below even the probe cap's 64).

Everything is DETERMINISTIC (modular rules on ids, no RNG) and
applied identically nowhere — the point is that Spark and DuckDB read
the SAME skewed parquet, so `tools/oracle_sim.py --sf .scratch/skew0.01`
hash-verifies every oracle-backed query with the caps and skew guards
ACTIVE on both engines.

Usage:
  python tools/make_skew.py                 # skew0.01 (correctness sweep)
  python tools/make_skew.py --src sf0.1     # skew0.1  (skew PERF testing)
Then: python tools/oracle_sim.py --sf .scratch/skew<sf>
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
    _ARGS.src.replace("sf", "skew"),
)

BOILER = (
    "subscribe to our newsletter for updates terms of service apply "
    "all rights reserved click here to unsubscribe"
)
DUP_CLUSTERS = 10
DUP_SIZE = 30


def main() -> int:
    from pyspark.sql import functions as F

    from spark_ij_spark.session import get_spark, load_tables

    spark = get_spark("make-skew", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT, exist_ok=True)
    t = load_tables(spark, SRC)

    # --- documents ------------------------------------------------------
    docs = t["documents"]
    # exact-duplicate clusters: every doc_id % 5 == 0 (20% of docs)
    # joins cluster ((doc_id div 5) % DUP_CLUSTERS) and takes that
    # cluster leader's text — n_docs/(5*DUP_CLUSTERS) copies each.
    # cluster id from div-5 so members spread over ALL clusters, and
    # the leader is each cluster's min-doc member itself — every
    # cluster is guaranteed a leader.
    cl_expr = (
        f"CASE WHEN doc_id % 5 = 0 THEN (doc_id div 5) % {DUP_CLUSTERS}"
        " ELSE CAST(NULL AS BIGINT) END"
    )
    leaders = (
        docs.withColumn("cl", F.expr(cl_expr))
        .filter(F.col("cl").isNotNull())
        .groupBy("cl")
        .agg(F.min_by("text", "doc_id").alias("cl_text"))
    )
    skew_docs = (
        docs.withColumn("cl", F.expr(cl_expr))
        .join(F.broadcast(leaders), "cl", "left")
        .select(
            "doc_id",
            F.expr(
                "CASE WHEN cl_text IS NOT NULL THEN cl_text"
                f" WHEN doc_id % 10 < 3 THEN concat(text, ' ', '{BOILER}')"
                " ELSE text END"
            ).alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    # keep n_chars consistent with the new text (profile ops read it)
    skew_docs = skew_docs.withColumn(
        "n_chars", F.expr("CAST(length(text) AS BIGINT)")
    )
    skew_docs.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "documents.parquet")
    )

    # --- events ---------------------------------------------------------
    ev = t["events"]
    hot_user = 1
    skew_ev = ev.select(
        "event_id",
        "ts",
        F.expr(
            f"CASE WHEN event_id % 4 = 0 THEN CAST({hot_user} AS BIGINT)"
            " ELSE user_id END"
        ).alias("user_id"),
        F.expr(
            "CASE WHEN event_id % 4 = 0 THEN 'click' ELSE event_type END"
        ).alias("event_type"),
        "value",
        "props",
    )
    skew_ev.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "events.parquet")
    )

    # --- lineitem -------------------------------------------------------
    li = t["lineitem"]
    hot = li.agg(
        F.min("l_partkey").alias("hp"), F.min("l_suppkey").alias("hs")
    ).collect()[0]
    skew_li = li.select(
        "l_orderkey",
        F.expr(
            f"CASE WHEN l_orderkey % 5 = 0 THEN CAST({hot.hp} AS BIGINT)"
            " ELSE l_partkey END"
        ).alias("l_partkey"),
        F.expr(
            f"CASE WHEN l_orderkey % 5 = 0 THEN CAST({hot.hs} AS BIGINT)"
            " ELSE l_suppkey END"
        ).alias("l_suppkey"),
        "l_linenumber",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
        "l_returnflag",
        "l_linestatus",
        "l_shipdate",
    )
    skew_li.repartition(4).write.mode("overwrite").parquet(
        os.path.join(OUT, "lineitem.parquet")
    )

    # --- embeddings -----------------------------------------------------
    emb = t["embeddings"]
    v0 = F.broadcast(
        emb.orderBy("vec_id").limit(1).select(
            F.col("embedding").alias("e0")
        )
    )
    skew_emb = (
        emb.crossJoin(v0)
        .select(
            "vec_id",
            F.expr(
                "CASE WHEN vec_id % 5 IN (0, 1, 2) THEN e0 ELSE embedding END"
            ).alias("embedding"),
            "label",
        )
    )
    skew_emb.repartition(2).write.mode("overwrite").parquet(
        os.path.join(OUT, "embeddings.parquet")
    )

    # --- unchanged tables: copy through ----------------------------------
    for name in ("region", "nation", "customer", "supplier", "part",
                 "orders"):
        t[name].write.mode("overwrite").parquet(
            os.path.join(OUT, f"{name}.parquet")
        )
    print(f"skew dataset written to {OUT}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
