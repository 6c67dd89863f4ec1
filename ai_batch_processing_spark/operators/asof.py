"""As-of (temporal) join — an operator Spark lacks natively.

Semantics: for every left row, attach the most recent right row with
``right_ts <= left_ts`` sharing the join key (backward as-of, inclusive),
or nulls when none exists (left-outer flavor).

Implementation is the scale-correct union+window pattern rather than an
inequality join: tag both sides, union them, sort within each key by
(ts, side) and carry the right side's values forward with
``last(..., ignorenulls=True)``. Cost is ONE shuffle on the key and a
per-partition sort — no O(left×right) pair blow-up, no skew amplification
beyond what the key distribution already has. An inequality join would be
a BroadcastNestedLoop or cartesian-per-key plan that dies at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_PACK = "__asof_pack"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join. ``right_cols`` maps right column → output alias.

    ``strict=True`` excludes ties (``right_ts < left_ts`` instead of ``<=``).
    Output = every left row + the aliased right columns (null if no match).
    """
    keys = [on] if isinstance(on, str) else list(on)
    for alias in right_cols.values():
        if alias in left.columns:
            raise ValueError(f"output alias {alias!r} collides with a left column")

    # All carried right columns ride in ONE struct: the struct itself is
    # non-null for every right row even when its fields are NULL, so
    # `last(_PACK, ignorenulls=True)` tracks the most-recent matched ROW and
    # NULL field values propagate from it — per-column last(ignorenulls)
    # would skip a NULL field and resurrect a stale value from an older row.
    r = right.select(
        *keys,
        F.col(right_ts).alias(_TS),
        F.struct(
            *[F.col(src).alias(dst) for src, dst in right_cols.items()]
        ).alias(_PACK),
    ).withColumn(_SIDE, F.lit(0))

    l = left.withColumn(_TS, F.col(left_ts)).withColumn(_SIDE, F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    # Right rows sort before left rows at equal ts, so `last(...)` at a left
    # row sees ties; strict mode orders left first so ties are invisible.
    side_order = F.col(_SIDE).asc() if not strict else F.col(_SIDE).desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(_TS).asc(), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = unioned.withColumn(_PACK, F.last(_PACK, ignorenulls=True).over(w))

    return (
        unioned.filter(F.col(_SIDE) == 1)
        .select(
            *[c for c in left.columns],
            *[F.col(f"{_PACK}.{dst}").alias(dst) for dst in right_cols.values()],
        )
    )
