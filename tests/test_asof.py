"""As-of join operator semantics."""

from __future__ import annotations

from ai_batch_processing_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u1", 10.0), (2, "u1", 20.0), (3, "u2", 5.0), (4, "u3", 7.0)],
        "lid long, user string, lts double",
    )
    right = spark.createDataFrame(
        [(100, "u1", 10.0), (101, "u1", 15.0), (102, "u2", 99.0)],
        "rid long, user string, rts double",
    )
    return left, right


def test_backward_asof_inclusive(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.matched_rid
        for r in asof_join(
            left, right, on="user", left_ts="lts", right_ts="rts", right_cols={"rid": "matched_rid"}
        ).collect()
    }
    assert out[1] == 100  # tie: rts == lts matches (inclusive)
    assert out[2] == 101  # most recent prior
    assert out[3] is None  # right event after left ts
    assert out[4] is None  # no right rows for u3


def test_strict_excludes_ties(spark):
    left, right = _frames(spark)
    out = {
        r.lid: r.matched_rid
        for r in asof_join(
            left,
            right,
            on="user",
            left_ts="lts",
            right_ts="rts",
            right_cols={"rid": "matched_rid"},
            strict=True,
        ).collect()
    }
    assert out[1] is None  # tie excluded
    assert out[2] == 101


def test_left_rows_all_preserved(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, on="user", left_ts="lts", right_ts="rts", right_cols={"rid": "m"})
    assert out.count() == left.count()
    assert set(out.columns) == {"lid", "user", "lts", "m"}
