"""Physical-layout graded queries (bucketed co-located join).

Elevates the ``plans/scale.py`` utilities to a driver-graded query:
the recurring-join answer at 100 TB is to pay ONE bucketed write per
table and then run every subsequent join on that key with ZERO
exchange on either side (bucketing pre-partitions and pre-sorts both
sides identically, so the sort-merge join starts from the scan).

The write happens once per session per sf_dir (guarded by
``tableExists``); repeated calls — exactly the recurring-join usage
pattern bucketing exists for — plan the join with no shuffle at all
(guarded in test_plans). The aggregate after the join is the only
exchange in the plan.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_ij_spark.operators.relational import dsum, dsum_sql
from spark_ij_spark.plans.scale import bucketed_join, write_bucketed
from spark_ij_spark.session import load_tables

JOIN_BUCKETS = 8


def _tag(sf_dir: str) -> str:
    return re.sub(r"[^0-9a-zA-Z]+", "_", sf_dir).strip("_")


def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per order priority via a bucketed orders ⋈ lineitem
    join: both sides are bucket-written on the order key (amortized,
    once per session), so the join plans with no Exchange on either
    side — the co-located-join shape recurring 100 TB joins should
    take. Revenue uses the decimal-sum pattern (order-independent,
    hash-identical to the oracle's plain join)."""
    to = f"bkt_orders_{_tag(sf_dir)}"
    tl = f"bkt_lineitem_{_tag(sf_dir)}"
    if not spark.catalog.tableExists(to) or not spark.catalog.tableExists(tl):
        t = load_tables(spark, sf_dir, ["orders", "lineitem"])
        write_bucketed(
            t["orders"].select("o_orderkey", "o_orderpriority"),
            to,
            "o_orderkey",
            JOIN_BUCKETS,
            sort_by="o_orderkey",
        )
        write_bucketed(
            t["lineitem"].select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_extendedprice",
                "l_discount",
            ),
            tl,
            "o_orderkey",
            JOIN_BUCKETS,
            sort_by="o_orderkey",
        )
    return (
        bucketed_join(spark, to, tl, "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
            dsum("l_extendedprice * (1 - l_discount)", 6, "revenue"),
        )
        .orderBy("o_orderpriority")
    )


Q_BUCKETED_JOIN_REVENUE_SQL = f"""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       {dsum_sql('l_extendedprice * (1 - l_discount)', 6)} AS revenue
FROM orders JOIN lineitem ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES = {
    "bucketed_join_revenue": q_bucketed_join_revenue,
}
ORACLES = {
    "bucketed_join_revenue": Q_BUCKETED_JOIN_REVENUE_SQL,
}
