"""Approximate sketches — the cardinality/quantile scale path.

Exact distinct counting or percentiles at 100 TB mean full shuffles;
these are the sketch substitutes (DataSketches HLL/KLL/theta in Spark 4),
pinned against exact answers with their documented error bounds — plus
the property that actually matters at scale: sketches computed on
PARTITIONS of the data merge into the whole-data answer.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_batch_processing_spark.session import load_tables


def test_approx_count_distinct_within_rsd(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).first()
    assert abs(row.approx - row.exact) / row.exact < 0.06  # 3×rsd safety margin


def test_hll_sketch_estimate_and_mergeability(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    exact = li.select("l_orderkey").distinct().count()
    whole = li.agg(F.hll_sketch_estimate(F.hll_sketch_agg("l_orderkey")).alias("e")).first().e
    assert abs(whole - exact) / exact < 0.05
    # the distributed property: per-group sketches union to ~the global
    # answer (not bit-identical — sparse/dense mode transitions differ by
    # build order; the estimate stays within the HLL error bound)
    merged = (
        li.groupBy("l_returnflag")
        .agg(F.hll_sketch_agg("l_orderkey").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .first()
        .e
    )
    assert abs(merged - exact) / exact < 0.05


def test_theta_sketch_estimate(spark, sf_dir):
    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    exact = orders.select("o_custkey").distinct().count()
    est = orders.agg(F.theta_sketch_estimate(F.theta_sketch_agg("o_custkey")).alias("e")).first().e
    assert abs(est - exact) / exact < 0.05


def test_kll_quantile_sketch_tracks_exact(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr(
            "kll_sketch_get_quantile_double(kll_sketch_agg_double(l_extendedprice), 0.5)"
        ).alias("approx"),
    ).first()
    # KLL default k: rank error ~1.7%; value tolerance generous at 5%
    assert abs(row.approx - row.exact) / row.exact < 0.05
