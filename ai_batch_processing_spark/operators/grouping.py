"""Group-key semantics of the reference's ``group_data`` (main.py:359-370).

Reference rule: group key = ``str(row.get(group_by, "unknown"))`` — every
key is a string, rows with no key land in an ``"unknown"`` bucket, rows
keep a ``_row_index`` so output order can be restored (main.py:697).

Spark shape: the dict-of-lists materialization becomes a plain ``groupBy``
on a normalized key column. Collecting rows per group only happens inside
``applyInPandas`` (the conversation operator) — never on the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, GroupedData, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.template import with_row_index
from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

UNKNOWN_GROUP = "unknown"
GROUP_COL = "group"


def group_key_expr(column: str) -> Column:
    """Stringified group key with the reference's unknown-bucket rule."""
    return F.coalesce(F.col(column).cast("string"), F.lit(UNKNOWN_GROUP))


def with_group_key(df: DataFrame, group_by: str | None, out_col: str = GROUP_COL) -> DataFrame:
    """Add the normalized ``group`` column.

    ``group_by=None`` mirrors the reference's ungrouped mode where each row
    is its own singleton group ``row_{i}`` (main.py:324).
    """
    if group_by is None:
        indexed = df if "_row_index" in df.columns else with_row_index(df)
        return indexed.withColumn(out_col, F.concat(F.lit("row_"), F.col("_row_index").cast("string")))
    return df.withColumn(out_col, group_key_expr(group_by))


def grouped(df: DataFrame, group_by: str) -> GroupedData:
    """``group_data`` analog: groupBy on the normalized key."""
    return with_group_key(df, group_by).groupBy(GROUP_COL)


@register(
    "q31_group_unknown_bucket",
    oracle="""
        SELECT
            COALESCE(CAST(NULLIF(lang, 'fr') AS VARCHAR), 'unknown') AS group_key,
            COUNT(*) AS n_rows,
            CAST(SUM(n_chars) AS BIGINT) AS total_chars
        FROM documents
        GROUP BY 1
        ORDER BY group_key
    """,
    doc="group_data parity (main.py:359-370): stringified key, null → 'unknown' bucket.",
    tags=("reference", "grouping"),
)
def q31_group_unknown_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULLIF injects nulls so the unknown-bucket rule is actually exercised
    # (the synthetic table has no null lang).
    t = load_tables(spark, sf_dir, ["documents"])
    df = t["documents"].withColumn("lang2", F.nullif(F.col("lang"), F.lit("fr")))
    return (
        df.withColumn("group_key", F.coalesce(F.col("lang2").cast("string"), F.lit(UNKNOWN_GROUP)))
        .groupBy("group_key")
        .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("n_chars").cast("long").alias("total_chars"))
        .orderBy("group_key")
    )
