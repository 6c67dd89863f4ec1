"""Set operations: UNION (distinct + all), INTERSECT, EXCEPT.

Absent from the reference (SURVEY.md §2.7; nearest relative is the export
schema-union, covered by the export projection operator). Spark builtins;
each distinct set-op is a shuffle on the full row — these queries keep the
row a single key column so the shuffle is minimal, the right shape at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables


def _urgent_custkeys(t):
    return (
        t["orders"].filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    )


def _building_custkeys(t):
    return (
        t["customer"].filter(F.col("c_mktsegment") == "BUILDING").select(F.col("c_custkey").alias("custkey"))
    )


_URGENT_SQL = "SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'"
_BUILDING_SQL = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"


@register(
    "q19_union_distinct",
    oracle=f"SELECT custkey FROM ({_URGENT_SQL} UNION {_BUILDING_SQL}) t ORDER BY custkey",
    doc="UNION (distinct): customers that are urgent-buyers or in BUILDING.",
    tags=("setop",),
)
def q19_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    return _urgent_custkeys(t).union(_building_custkeys(t)).distinct().orderBy("custkey")


@register(
    "q20_intersect",
    oracle=f"SELECT custkey FROM ({_URGENT_SQL} INTERSECT {_BUILDING_SQL}) t ORDER BY custkey",
    doc="INTERSECT: urgent-buyers who are also BUILDING customers.",
    tags=("setop",),
)
def q20_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    return _urgent_custkeys(t).intersect(_building_custkeys(t)).orderBy("custkey")


@register(
    "q21_except",
    oracle=f"SELECT custkey FROM ({_BUILDING_SQL} EXCEPT {_URGENT_SQL}) t ORDER BY custkey",
    doc="EXCEPT: BUILDING customers with no urgent orders.",
    tags=("setop",),
)
def q21_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    return _building_custkeys(t).subtract(_urgent_custkeys(t)).orderBy("custkey")


@register(
    "q22_union_all_counted",
    oracle=f"""
        SELECT custkey, COUNT(*) AS n
        FROM ({_URGENT_SQL} UNION ALL {_BUILDING_SQL}) t
        GROUP BY custkey ORDER BY n DESC, custkey LIMIT 50
    """,
    doc="UNION ALL + re-aggregation (bag semantics preserved).",
    tags=("setop",),
)
def q22_union_all_counted(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["orders", "customer"])
    return (
        _urgent_custkeys(t)
        .unionAll(_building_custkeys(t))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "custkey")
        .limit(50)
    )


@register(
    "q89_multiset_setops",
    oracle="""
        WITH a AS (SELECT l_orderkey AS k FROM lineitem WHERE l_quantity >= 30),
        b AS (SELECT l_orderkey AS k FROM lineitem WHERE l_returnflag = 'R'),
        i AS (SELECT k FROM a INTERSECT ALL SELECT k FROM b),
        e AS (SELECT k FROM a EXCEPT ALL SELECT k FROM b)
        SELECT 'intersect_all' AS op, COUNT(*) AS n, COUNT(DISTINCT k) AS n_distinct FROM i
        UNION ALL
        SELECT 'except_all' AS op, COUNT(*) AS n, COUNT(DISTINCT k) AS n_distinct FROM e
        ORDER BY op
    """,
    doc="multiset set ops: INTERSECT ALL / EXCEPT ALL preserve duplicate counts "
    "(q20/q21 are the distinct variants).",
    tags=("setop", "multiset"),
)
def q89_multiset_setops(spark, sf_dir: str):
    t = load_tables(spark, sf_dir, ["lineitem"])
    a = t["lineitem"].filter(F.col("l_quantity") >= 30).select(F.col("l_orderkey").alias("k"))
    b = t["lineitem"].filter(F.col("l_returnflag") == "R").select(F.col("l_orderkey").alias("k"))
    i = a.intersectAll(b).agg(
        F.lit("intersect_all").alias("op"), F.count(F.lit(1)).alias("n"), F.countDistinct("k").alias("n_distinct")
    )
    e = a.exceptAll(b).agg(
        F.lit("except_all").alias("op"), F.count(F.lit(1)).alias("n"), F.countDistinct("k").alias("n_distinct")
    )
    return i.unionAll(e).orderBy("op")
