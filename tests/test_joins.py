"""Skew-salted and bucketed joins: result parity + plan guarantees."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.joins import salted_join, write_bucketed
from ai_batch_processing_spark.session import load_tables


def _skewed_frames(spark):
    # 90% of left rows share key 1 — the classic hot-key shape.
    left = spark.range(1000).select(
        F.when(F.col("id") < 900, 1).otherwise(F.col("id")).alias("k"), F.col("id").alias("lv")
    )
    right = spark.range(200).select(F.col("id").alias("k"), (F.col("id") * 10).alias("rv"))
    return left, right


def test_salted_join_matches_plain_inner(spark):
    left, right = _skewed_frames(spark)
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", n_salts=8).collect()}
    assert salted == plain and len(plain) == 900  # hot key matches; ids 900+ don't


def test_salted_join_matches_plain_left(spark):
    left, right = _skewed_frames(spark)
    plain = {(r.k, r.lv, r.rv) for r in left.join(right, "k", "left").collect()}
    salted = {(r.k, r.lv, r.rv) for r in salted_join(left, right, "k", n_salts=4, how="left").collect()}
    assert salted == plain


def test_salted_join_spreads_hot_key(spark):
    left, right = _skewed_frames(spark)
    lhs_salts = (
        left.withColumn("_salt", F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(8)))
        .filter(F.col("k") == 1)
        .select("_salt")
        .distinct()
        .count()
    )
    assert lhs_salts == 8  # the hot key really fans out over all salt lanes


def test_salted_join_rejects_right_outer(spark):
    left, right = _skewed_frames(spark)
    with pytest.raises(ValueError):
        salted_join(left, right, "k", how="right")


def test_bucketed_join_has_no_shuffle(spark, sf_dir):
    # managed tables land in the session's (static) warehouse dir; the
    # DROPs in the finally block delete the files again.
    t = load_tables(spark, sf_dir, ["orders", "lineitem"])
    write_bucketed(t["orders"], "orders_b", "o_orderkey", 8, sort_by="o_orderkey")
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        8,
        sort_by="o_orderkey",
    )
    try:
        # disable broadcast so the join must pick SortMergeJoin
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
        joined.collect()
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in final
        assert "Exchange" not in final  # co-located buckets: zero shuffle
        n = joined.count()
        assert n == t["lineitem"].count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")
