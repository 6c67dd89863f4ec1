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


# ---------------------------------------------------------------------------
# Deterministic SQL-portable sketches (operators/sketches.py)
# ---------------------------------------------------------------------------


def _orders_keys(spark, sf_dir):
    return load_tables(spark, sf_dir, ["orders"])["orders"].select(
        F.col("o_custkey").cast("string").alias("k"),
        (F.col("o_orderkey") % 2 == 0).cast("string").alias("g"),
    )


def test_portable_hash32_md5_matches_duckdb(spark, duck):
    from ai_batch_processing_spark.operators.sketches import portable_hash32

    vals = ["alpha", "b c d", "", "Ω-unicode", "42"]
    sdf = spark.createDataFrame([(v,) for v in vals], ["k"])
    got = {
        r.k: r.h
        for r in sdf.select("k", portable_hash32(F.col("k"), "md5").alias("h")).collect()
    }
    for v in vals:
        want = duck.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 8)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[v] == want, v


def test_theta_distinct_tracks_exact_and_is_deterministic(spark, sf_dir):
    from ai_batch_processing_spark.operators.sketches import theta_distinct

    df = _orders_keys(spark, sf_dir)
    exact = df.select("k").distinct().count()
    for method in ("xxhash64", "md5"):
        est = theta_distinct(df, "k", (), theta_frac=1 / 4, method=method).first()
        # rel stderr ~ 1/sqrt(sampled); allow 5 sigma
        tol = 5 / max(est.sampled_distinct, 1) ** 0.5
        assert abs(est.est_distinct - exact) / exact < max(tol, 0.02), method
        again = theta_distinct(
            df.repartition(7), "k", (), theta_frac=1 / 4, method=method
        ).first()
        assert (again.sampled_distinct, again.est_distinct) == (
            est.sampled_distinct,
            est.est_distinct,
        ), "estimate must be partitioning-invariant"


def test_theta_sample_merges_exactly(spark, sf_dir):
    """sample(A ∪ B) == sample(A) ∪ sample(B) — shard sketches roll up."""
    from ai_batch_processing_spark.operators.sketches import theta_sample

    df = _orders_keys(spark, sf_dir)
    a, b = df.where(F.col("k").cast("long") % 2 == 0), df.where(
        F.col("k").cast("long") % 2 == 1
    )
    whole = set(r.k for r in theta_sample(df, "k", (), 1 / 4).collect())
    merged = set(r.k for r in theta_sample(a, "k", (), 1 / 4).collect()) | set(
        r.k for r in theta_sample(b, "k", (), 1 / 4).collect()
    )
    assert whole == merged


def test_theta_pair_overlap_jaccard_sane(spark, sf_dir):
    from ai_batch_processing_spark.operators.sketches import theta_pair_overlap

    df = _orders_keys(spark, sf_dir)
    rows = theta_pair_overlap(df, "k", "g", theta_frac=1.0).collect()
    # theta_frac=1 → the "sample" IS the full set → est_jaccard is exact
    assert len(rows) == 1
    r = rows[0]
    assert r.union_sampled == r.sampled_a + r.sampled_b - r.inter_sampled
    exact_inter = (
        df.where(F.col("g") == "true")
        .select("k")
        .intersect(df.where(F.col("g") == "false").select("k"))
        .count()
    )
    assert r.inter_sampled == exact_inter


def test_count_min_never_underestimates_and_merges(spark, sf_dir):
    from ai_batch_processing_spark.operators.sketches import cms_lookup, count_min

    df = _orders_keys(spark, sf_dir)
    truth = df.groupBy("k").agg(F.count(F.lit(1)).alias("true_count"))
    cms = count_min(df, "k", depth=4, width=64)
    est = cms_lookup(cms, truth, "k", depth=4, width=64)
    bad = est.where(F.col("cms_est") < F.col("true_count")).count()
    assert bad == 0, "CMS must overestimate only"
    # additivity: shard sketches sum to the whole sketch, cell by cell
    a = count_min(df.where(F.col("k").cast("long") % 2 == 0), "k", depth=4, width=64)
    b = count_min(df.where(F.col("k").cast("long") % 2 == 1), "k", depth=4, width=64)
    summed = (
        a.unionByName(b)
        .groupBy("row_idx", "col_idx")
        .agg(F.sum("counter").alias("counter"))
    )
    diff = summed.exceptAll(cms).count() + cms.exceptAll(summed).count()
    assert diff == 0


def test_cms_unseen_key_estimates_small(spark, sf_dir):
    from ai_batch_processing_spark.operators.sketches import cms_lookup, count_min

    df = _orders_keys(spark, sf_dir)
    cms = count_min(df, "k", depth=4, width=256)
    probe = df.sparkSession.createDataFrame([("never-seen-key-xyz",)], ["k"])
    est = cms_lookup(cms, probe, "k", depth=4, width=256).first().cms_est
    n = df.count()
    # CMS guarantee: err ≤ e/width · N with prob 1 - e^-depth
    assert est <= 2.71828 / 256 * n * 3


def test_theta_threshold_validates():
    import pytest as _pytest

    from ai_batch_processing_spark.operators.sketches import theta_threshold

    assert theta_threshold(1.0) == 4294967296
    with _pytest.raises(ValueError):
        theta_threshold(0.0)
    with _pytest.raises(ValueError):
        theta_threshold(1.5)


def test_hll_registers_match_reference_fold(spark):
    """Registers equal a row-at-a-time python fold of the same md5
    construction; the estimate reproduces the closed formula."""
    import hashlib

    from ai_batch_processing_spark.operators.sketches import (
        _HLL_M,
        _HLL_WBITS,
        hll_estimate,
        hll_registers,
    )

    keys = [f"key-{i}" for i in range(500)]
    ref: dict[int, int] = {}
    for k in keys:
        h = int(hashlib.md5(k.encode()).hexdigest()[:8], 16)
        bucket, w = h >> _HLL_WBITS, h % (1 << _HLL_WBITS)
        rho = (_HLL_WBITS + 1) - w.bit_length() if w > 0 else _HLL_WBITS + 1
        ref[bucket] = max(ref.get(bucket, 0), rho)
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    regs = {r.bucket: r.r for r in hll_registers(df, "k").collect()}
    assert regs == ref

    est = hll_estimate(hll_registers(df, "k")).collect()[0]
    inv = sum(2.0 ** -r for r in ref.values())
    v = _HLL_M - len(ref)
    alpha = 0.7213 / (1.0 + 1.079 / _HLL_M)
    raw = alpha * _HLL_M * _HLL_M / (inv + v)
    import math

    expected = (
        round(_HLL_M * math.log(_HLL_M / v), 6) if (raw <= 2.5 * _HLL_M and v > 0) else round(raw, 6)
    )
    assert est.n_zero_registers == v
    assert abs(est.hll_estimate - expected) < 1e-6
    # m=256 => stderr ~6.5%; 500 distinct keys must land within ~4 sigma
    assert abs(est.hll_estimate - 500) / 500 < 0.26


def test_hll_duplicates_do_not_move_registers(spark):
    """HLL is a pure function of the SET: replicating every key 7x
    leaves every register (and the estimate) unchanged."""
    from ai_batch_processing_spark.operators.sketches import hll_estimate, hll_registers

    base = [(f"k{i}",) for i in range(200)]
    df1 = spark.createDataFrame(base, "k string")
    df7 = spark.createDataFrame(base * 7, "k string")
    r1 = sorted((r.bucket, r.r) for r in hll_registers(df1, "k").collect())
    r7 = sorted((r.bucket, r.r) for r in hll_registers(df7, "k").collect())
    assert r1 == r7
    assert (
        hll_estimate(hll_registers(df1, "k")).collect()[0].hll_estimate
        == hll_estimate(hll_registers(df7, "k")).collect()[0].hll_estimate
    )


def test_hll_merge_equals_direct_on_partitioned_keys(spark):
    """Registers built per group then bucket-max-merged equal the
    single-pass registers — the semilattice property, on disjoint AND
    overlapping group key sets."""
    from pyspark.sql import functions as F

    from ai_batch_processing_spark.operators.sketches import hll_bucket_rho

    rows = [(f"g{i % 3}", f"k{i}") for i in range(300)] + [
        ("g0", "shared"), ("g1", "shared"), ("g2", "shared")
    ]
    df = spark.createDataFrame(rows, "g string, k string")
    coords = hll_bucket_rho(df, "k", "g")
    merged = (
        coords.groupBy("g", "bucket").agg(F.max("rho").alias("r"))
        .groupBy("bucket").agg(F.max("r").alias("r"))
    )
    direct = coords.groupBy("bucket").agg(F.max("rho").alias("r"))
    m = sorted((r.bucket, r.r) for r in merged.collect())
    d = sorted((r.bucket, r.r) for r in direct.collect())
    assert m == d
