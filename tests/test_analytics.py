"""Analytics-module specifics not covered by the oracle gate.

The oracle gate (test_queries_oracle.py) already hash-checks q35–q39 and
q55–q59; here we pin the scale path that can't be hash-checked:
approx_percentile must track the exact percentile within its accuracy
bound, because at 100 TB the exact sort-based percentile is replaced by
the sketch.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_batch_processing_spark.session import load_tables


def test_approx_percentile_tracks_exact(spark, sf_dir):
    li = load_tables(spark, sf_dir, ["lineitem"])["lineitem"]
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).first()
    # accuracy=10000 → rank error ≤ n/10000; at test scale that's tighter
    # than 1% of the value range.
    assert abs(row.approx - row.exact) / row.exact < 0.01


def test_systematic_sample_fraction(spark, sf_dir):
    from ai_batch_processing_spark.plans.analytics import q56_systematic_sample

    orders = load_tables(spark, sf_dir, ["orders"])["orders"]
    total = orders.count()
    sampled = q56_systematic_sample(spark, sf_dir).count()
    # keys are dense-ish → mod-97 sampling lands near 1/97 of the table
    assert 0.2 / 97 < sampled / total < 5 / 97
