"""Round-12 experiment 3: events_retention join-free rewrite and
bucketed_join_revenue cold-cost attribution.

retention
  A (current) distinct → per-user min aggregate → JOIN back → final
              countDistinct aggregate
  B (window)  distinct → min-over-user window (no join) → final
              count(*) (rows are distinct per (user, week) by
              construction, so countDistinct(user_id) == COUNT(*))

bucketed_join_revenue: phase attribution of the cold run — metastore
init, each bucketed write, the join itself — to decide what to fix.

Usage: python tools/exp3_r12.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from spark_ij_spark.operators import event_windows as ew
    from spark_ij_spark.operators.event_windows import _events
    from spark_ij_spark.session import get_spark

    spark = get_spark("exp3-r12")
    spark.sparkContext.setLogLevel("ERROR")

    def retention_b():
        ev = _events(spark, SF).select(
            "user_id",
            F.expr("CAST(date_trunc('week', ts) AS DATE)").alias("week"),
        )
        ua = ev.distinct()
        w = Window.partitionBy("user_id")
        return (
            ua.withColumn("cohort_week", F.min("week").over(w))
            .select(
                "cohort_week",
                F.expr("datediff(week, cohort_week) DIV 7").alias("week_index"),
            )
            .groupBy("cohort_week", "week_index")
            .agg(F.count("*").alias("n_active"))
            .withColumn("cohort_week", F.col("cohort_week").cast("string"))
        )

    def canon(df):
        return sorted(map(tuple, df.collect()))

    ref = canon(ew.q_events_retention(spark, SF))
    spark.catalog.clearCache()
    got = canon(retention_b())
    spark.catalog.clearCache()
    assert got == ref, "retention B differs"
    print(f"retention B identical ({len(got)} rows)", flush=True)

    for name, fn in (
        ("retention_A", lambda: ew.q_events_retention(spark, SF)),
        ("retention_B", retention_b),
    ):
        best = float("inf")
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn().count()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(f"{name:12s} cold: {best:6.3f} s", flush=True)

    # ------- bucketed_join_revenue phase attribution -------
    from spark_ij_spark.operators.layout import (
        JOIN_BUCKETS,
        _tag,
        q_bucketed_join_revenue,
    )
    from spark_ij_spark.plans.scale import write_bucketed
    from spark_ij_spark.session import load_tables

    t0 = time.perf_counter()
    spark.catalog.tableExists("nonexistent_probe_table")
    print(f"catalog probe (metastore init): {time.perf_counter() - t0:6.3f} s",
          flush=True)

    t = load_tables(spark, SF, ["orders", "lineitem"])
    t0 = time.perf_counter()
    write_bucketed(
        t["orders"].select("o_orderkey", "o_orderpriority"),
        "exp3_bkt_orders", "o_orderkey", JOIN_BUCKETS, sort_by="o_orderkey",
    )
    print(f"orders bucketed write: {time.perf_counter() - t0:6.3f} s", flush=True)
    t0 = time.perf_counter()
    write_bucketed(
        t["lineitem"].select(
            F.col("l_orderkey").alias("o_orderkey"),
            "l_extendedprice", "l_discount",
        ),
        "exp3_bkt_lineitem", "o_orderkey", JOIN_BUCKETS, sort_by="o_orderkey",
    )
    print(f"lineitem bucketed write: {time.perf_counter() - t0:6.3f} s", flush=True)

    for tbl in ("exp3_bkt_orders", "exp3_bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")

    t0 = time.perf_counter()
    q_bucketed_join_revenue(spark, SF).count()
    print(f"full query (first run, incl writes): {time.perf_counter() - t0:6.3f} s",
          flush=True)
    t0 = time.perf_counter()
    q_bucketed_join_revenue(spark, SF).count()
    print(f"full query (tables exist): {time.perf_counter() - t0:6.3f} s",
          flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
