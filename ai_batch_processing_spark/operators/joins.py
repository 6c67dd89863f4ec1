"""Join strategies for hostile data: skew salting and bucketed co-location.

The reference never joins (one table at a time — SURVEY.md §2.3). At
100 TB, two join pathologies dominate:

- **skew**: one hot key puts half the probe side in one task. AQE's
  skew-join splitting (on in ``session.get_spark``) handles sort-merge
  skew automatically; ``salted_join`` is the explicit fix for the cases
  AQE can't touch (aggregation-free shuffled hash joins, or when the
  build side must replicate).
- **repeated shuffles**: joining the same big tables on the same key in
  every pipeline run. Bucketing pays the shuffle once at write time;
  subsequent joins on the bucket key are shuffle-free map-side zips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the left side's hot keys spread over ``n_salts`` tasks.

    Left rows get a deterministic salt in [0, n_salts) (hash of the whole
    row — spreads even a single hot key); the right side is replicated
    n_salts times so every (key, salt) pair finds its match. The shuffle
    then partitions on (key, salt): a key holding 50% of the rows lands on
    n_salts tasks instead of one. Replication cost: |right| × n_salts —
    use when right is the smaller side but too big to broadcast.

    Supports ``inner`` and ``left`` joins (replication would duplicate
    unmatched right rows under ``right``/``full``).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(n_salts))
    lhs = left.withColumn("_salt", salt)
    rhs = right.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = lhs.join(rhs, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: str,
    n_buckets: int = 32,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.

    Pays the shuffle once: rows are hash-distributed into ``n_buckets``
    files per partition by ``bucket_by``. Joins and aggregations on that
    key against another table bucketed the same way run WITHOUT a shuffle
    (SortMergeJoin over pre-sorted buckets, zero Exchange — asserted in
    tests/test_joins.py).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_by)
    if sort_by:
        w = w.sortBy(sort_by)
    w.saveAsTable(table)
