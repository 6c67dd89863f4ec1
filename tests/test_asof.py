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


def test_null_right_value_propagates_from_matched_row(spark):
    """A NULL carried-column value on the MATCHED right row must surface as
    NULL, not a stale value from an older right row (merge_asof parity)."""
    left = spark.createDataFrame(
        [(1, "u1", 30.0), (2, "u1", 12.0)], "lid long, user string, lts double"
    )
    right = spark.createDataFrame(
        [("u1", 10.0, "old"), ("u1", 20.0, None)], "user string, rts double, tag string"
    )
    out = {
        r.lid: r.matched_tag
        for r in asof_join(
            left, right, on="user", left_ts="lts", right_ts="rts", right_cols={"tag": "matched_tag"}
        ).collect()
    }
    assert out[1] is None  # matched row (rts=20) carries NULL — must NOT fall back to "old"
    assert out[2] == "old"  # genuinely matches the older row


def test_asof_matches_pandas_merge_asof_property(spark):
    """Randomized parity with pandas.merge_asof (backward, by-key) — the
    authoritative as-of semantics, across ties, misses, and empty keys."""
    import numpy as np
    import pandas as pd

    from ai_batch_processing_spark.operators.asof import asof_join

    rng = np.random.default_rng(7)
    for trial in range(5):
        left = pd.DataFrame(
            {
                "k": rng.integers(0, 4, 40),
                "lts": rng.integers(0, 100, 40).astype("int64"),
                "lv": np.arange(40),
            }
        )
        right = pd.DataFrame(
            {
                "k": rng.integers(0, 4, 25),
                "rts": rng.integers(0, 100, 25).astype("int64"),
                "rv": np.arange(25) * 10,
            }
        )
        # merge_asof needs sorted inputs; ties broken by taking the LAST
        # right row at equal ts — drop right-side ts duplicates per key so
        # both engines agree on a unique match
        right = right.drop_duplicates(["k", "rts"], keep="last")
        expected = pd.merge_asof(
            left.sort_values("lts", kind="stable"),
            right.sort_values("rts", kind="stable"),
            left_on="lts",
            right_on="rts",
            by="k",
            direction="backward",
        )
        ldf = spark.createDataFrame(left)
        rdf = spark.createDataFrame(right)
        got = asof_join(
            ldf, rdf, on="k", left_ts="lts", right_ts="rts", right_cols={"rv": "rv"}
        ).toPandas()
        exp_map = {int(r.lv): (None if pd.isna(r.rv) else int(r.rv)) for r in expected.itertuples()}
        got_map = {int(r.lv): (None if pd.isna(r.rv) else int(r.rv)) for r in got.itertuples()}
        assert got_map == exp_map, f"trial {trial} mismatch"
