"""Window functions: ranking, analytic (lag/lead), frames, distribution.

Absent from the reference except as implicit row-index bookkeeping
(SURVEY.md §2.5, main.py:366-369 / 413-431); full surface here via
``pyspark.sql.Window``. All window shuffles partition on the window key —
at scale the partition key must carry enough cardinality (user_id, custkey)
to spread; none of these windows is global.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables


@register(
    "q14_window_rank",
    oracle="""
        SELECT * FROM (
            SELECT
                o_orderstatus,
                o_orderkey,
                ROUND(o_totalprice, 2) AS total_price,
                ROW_NUMBER() OVER w AS rn,
                RANK() OVER w AS rnk,
                DENSE_RANK() OVER w AS drnk
            FROM orders
            WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey)
        ) t
        WHERE rn <= 5
        ORDER BY o_orderstatus, rn
    """,
    doc="ranking trio per group, top-5 filter (per-group top-k pattern).",
    tags=("window", "rank"),
)
def q14_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        t["orders"]
        .select(
            "o_orderstatus",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 5)
        .orderBy("o_orderstatus", "rn")
    )


@register(
    "q15_window_running",
    oracle="""
        SELECT
            event_id,
            user_id,
            ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_total,
            ROUND(LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS prev_value,
            LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
        ORDER BY event_id
    """,
    doc="running sum + lag/lead per user ordered by time.",
    tags=("window", "analytic"),
)
def q15_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["events"])
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t["events"]
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(run), 2).alias("run_total"),
            F.round(F.lag("value").over(w), 2).alias("prev_value"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .orderBy("event_id")
    )


@register(
    "q16_window_moving_avg",
    oracle="""
        SELECT
            o_custkey,
            o_orderkey,
            ROUND(AVG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) + 1e-9, 4) AS moving_avg
        FROM orders
        ORDER BY o_custkey, o_orderkey
    """,
    doc="explicit ROWS frame: trailing 3-row moving average per customer.",
    tags=("window", "frame"),
)
def q16_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey").rowsBetween(-2, Window.currentRow)
    return (
        t["orders"]
        .select("o_custkey", "o_orderkey", F.round(F.avg("o_totalprice").over(w) + 1e-9, 4).alias("moving_avg"))
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q17_window_distribution",
    oracle="""
        SELECT
            c_custkey,
            c_mktsegment,
            NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) AS quartile,
            ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) + 1e-9, 6) AS pct_rank,
            ROUND(CUME_DIST() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) + 1e-9, 6) AS cume
        FROM customer
        ORDER BY c_custkey
    """,
    doc="distribution functions: ntile / percent_rank / cume_dist.",
    tags=("window", "distribution"),
)
def q17_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["customer"])
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        t["customer"]
        .select(
            "c_custkey",
            "c_mktsegment",
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w) + 1e-9, 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w) + 1e-9, 6).alias("cume"),
        )
        .orderBy("c_custkey")
    )


@register(
    "q18_window_share",
    oracle="""
        SELECT
            o_orderkey,
            o_custkey,
            ROUND(o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_custkey) + 1e-9, 6) AS share_of_customer
        FROM orders
        ORDER BY o_orderkey
    """,
    doc="window aggregate as denominator: per-row share of group total.",
    tags=("window", "agg"),
)
def q18_window_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders"])
    w = Window.partitionBy("o_custkey")
    return (
        t["orders"]
        .select(
            "o_orderkey",
            "o_custkey",
            F.round(F.col("o_totalprice") / F.sum("o_totalprice").over(w) + 1e-9, 6).alias("share_of_customer"),
        )
        .orderBy("o_orderkey")
    )
