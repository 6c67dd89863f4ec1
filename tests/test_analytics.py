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


def test_cusum_prefix_sum_identity_matches_sequential_reference(spark):
    """The window-function form must equal the textbook sequential
    recurrence S_i = max(0, S_{i-1} + z_i - k) on a planted drift."""
    from ai_batch_processing_spark.plans.analytics import q239_cusum_drift  # noqa: F401
    from pyspark.sql import functions as F, Window

    # reuse the same machinery on a toy frame via the identity directly
    zs = [0.2, -0.1, 0.3, 1.1, 1.2, 1.0, 0.9, -2.0, 0.1]
    k = 0.5
    df = spark.createDataFrame(
        [("a", i, z) for i, z in enumerate(zs)], "t string, h int, z double"
    )
    w = Window.partitionBy("t").orderBy("h").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    p = df.withColumn("pf", F.sum(F.col("z") - F.lit(k)).over(w))
    s = p.withColumn("cusum", F.round(F.col("pf") - F.least(F.lit(0.0), F.min("pf").over(w)), 4))
    got = [r.cusum for r in s.orderBy("h").collect()]
    # sequential reference
    S, want = 0.0, []
    for z in zs:
        S = max(0.0, S + z - k)
        want.append(round(S, 4))
    assert got == [round(x, 4) for x in want]


def test_change_point_finds_planted_shift(spark):
    """A 10->50 level shift between bucket 10 and 11 must be the argmax
    split, with exact segment means."""
    import datetime

    from ai_batch_processing_spark.plans.analytics import change_point_split

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (base + datetime.timedelta(hours=i), 10 if i < 10 else 50) for i in range(20)
    ]
    hourly = spark.createDataFrame(rows, "hour timestamp, c long")
    out = change_point_split(hourly).collect()[0]
    assert out.split_hour == base + datetime.timedelta(hours=9)
    assert (out.n_left, out.n_right) == (10, 10)
    assert (out.mean_left, out.mean_right) == (10.0, 50.0)


def test_change_point_flat_series_zero_gain(spark):
    """A constant series has gain 0 everywhere; the earliest boundary
    wins the tiebreak."""
    import datetime

    from ai_batch_processing_spark.plans.analytics import change_point_split

    base = datetime.datetime(2024, 1, 1)
    hourly = spark.createDataFrame(
        [(base + datetime.timedelta(hours=i), 7) for i in range(6)],
        "hour timestamp, c long",
    )
    out = change_point_split(hourly).collect()[0]
    assert out.gain == 0.0
    assert out.split_hour == base


def test_session_paths_gap_split_and_truncation(spark):
    """One user: 3 quick events, a 2h gap, then 4 quick events -> two
    sessions with paths 'a>b>c' and 'd>e>f' (first THREE only)."""
    import datetime

    from ai_batch_processing_spark.plans.analytics import session_paths

    base = datetime.datetime(2024, 1, 1)
    evs = [
        (0, base, 1, "a"),
        (1, base + datetime.timedelta(minutes=5), 1, "b"),
        (2, base + datetime.timedelta(minutes=10), 1, "c"),
        (3, base + datetime.timedelta(hours=3), 1, "d"),
        (4, base + datetime.timedelta(hours=3, minutes=1), 1, "e"),
        (5, base + datetime.timedelta(hours=3, minutes=2), 1, "f"),
        (6, base + datetime.timedelta(hours=3, minutes=3), 1, "g"),
    ]
    ev = spark.createDataFrame(
        evs, "event_id long, ts timestamp, user_id long, event_type string"
    )
    got = sorted((r.path, r.n_sessions) for r in session_paths(ev).collect())
    assert got == [("a>b>c", 1), ("d>e>f", 1)]


def test_fano_constant_is_zero_bursty_above_one(spark):
    """Constant hourly counts -> variance 0 -> fano 0; counts {1,7} ->
    var_samp 18, mean 4 -> fano 4.5. Exercises the registered operator
    body via a temp-dir events parquet."""
    import datetime

    from ai_batch_processing_spark.registry import load_all

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(4):
        for _ in range(4):
            rows.append((eid, base + datetime.timedelta(hours=h), 1, "steady", 1.0, "{}"))
            eid += 1
    for h, c in [(0, 1), (1, 7)]:
        for _ in range(c):
            rows.append((eid, base + datetime.timedelta(hours=h), 1, "bursty", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = load_all()["q296_event_burstiness"].fn(spark, d)
        got = {r.event_type: (r.mean_hourly, r.fano) for r in out.collect()}
    assert got["steady"] == (4.0, 0.0)
    assert got["bursty"] == (4.0, 4.5)


def test_ordered_funnel_strict_sequence(spark):
    """User A completes signup->click->purchase in order; user B clicks
    BEFORE signup (must not count); user C signs up only."""
    import datetime
    import tempfile

    from ai_batch_processing_spark.registry import load_all

    base = datetime.datetime(2024, 1, 1)

    def e(i, u, t, mins):
        return (i, base + datetime.timedelta(minutes=mins), u, t, 1.0, "{}")

    rows = [
        e(0, 1, "signup", 0), e(1, 1, "click", 10), e(2, 1, "purchase", 20),
        e(3, 2, "click", 0), e(4, 2, "signup", 10), e(5, 2, "purchase", 20),
        e(6, 3, "signup", 0),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = load_all()["q306_ordered_funnel"].fn(spark, d).collect()[0]
    assert (out.n_users, out.n_signup) == (3, 3)
    # user 2's click precedes signup -> only user 1 advances
    assert out.n_click_after == 1 and out.n_purchase_after == 1
    assert out.conv_full == round(1 / 3, 6)


def test_key_skew_stats_known_distribution(spark):
    """Sizes {1x90, 10x9, 100x1}: n_keys=100, max 100, p50=1 (90% of
    keys are singletons), p99=10, max share = 100/280 rows."""
    from ai_batch_processing_spark.plans.analytics import key_skew_stats

    rows = (
        [(f"s{i}",) for i in range(90)]
        + [(f"m{i}",) for i in range(9) for _ in range(10)]
        + [("big",)] * 100
    )
    df = spark.createDataFrame(rows, "k string")
    out = key_skew_stats(df, "k", "k").collect()[0]
    assert (out.n_rows, out.n_keys, out.max_size) == (280, 100, 100)
    assert out.p50_size == 1 and out.p99_size == 10
    assert out.max_share_ppm == (100 * 1000000) // 280


def test_input_layout_audit_multipart_directory(spark):
    """A documents table written as a multi-part DIRECTORY (what
    coalesce-free writes produce) must normalize to ONE row named after
    the directory, with table-level stats — the same row the view-level
    oracle computes. Per-file granularity stays available via
    input_layout_report."""
    import tempfile

    from ai_batch_processing_spark.plans.analytics import input_layout_report
    from ai_batch_processing_spark.registry import load_all

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    with tempfile.TemporaryDirectory() as d:
        docs.repartition(4).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        out = load_all()["q311_input_layout_audit"].fn(spark, d).collect()
        assert len(out) == 1
        r = out[0]
        assert r.file_name == "documents.parquet"
        assert (r.n_rows, r.min_id, r.max_id) == (100, 0, 99)
        # the ungated per-file report sees all four part files
        df = spark.read.parquet(f"{d}/documents.parquet")
        per = input_layout_report(df, "doc_id").collect()
        assert len(per) == 4
        assert sum(p.n_rows for p in per) == 100
        assert min(p.min_id for p in per) == 0
        assert max(p.max_id for p in per) == 99


def test_ordered_funnel_zero_signups_null_rates(spark, duck):
    """Zero 'signup' events: every conversion denominator is NULLIF-
    guarded, so BOTH engines yield NULL rates (not inf/NaN) — the
    cross-engine divergence ADVICE r8 flagged."""
    import datetime
    import tempfile

    from ai_batch_processing_spark.registry import load_all

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (0, base, 1, "click", 1.0, "{}"),
        (1, base + datetime.timedelta(minutes=5), 1, "purchase", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import duckdb

    from ai_batch_processing_spark.registry import registered_oracle

    with tempfile.TemporaryDirectory() as d:
        ev.coalesce(1).write.mode("overwrite").parquet(f"{d}/events.parquet")
        out = load_all()["q306_ordered_funnel"].fn(spark, d).collect()[0]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet/*.parquet'")
        ora = con.execute(registered_oracle("q306_ordered_funnel")).fetchone()
    assert out.n_signup == 0
    assert out.conv_step2 is None and out.conv_step3 is None and out.conv_full is None
    # oracle: same NULLs in the same positions (n_users, n_signup, ..., convs)
    assert ora[1] == 0 and ora[4] is None and ora[5] is None and ora[6] is None


def test_kaplan_meier_hand_computed(spark):
    """4 users: A returns day 1, B returns day 2, C censored day 2,
    D never (censored at horizon day 3). Hand KM: S(1)=3/4;
    day 2: risk 3, 1 event -> S(2)=3/4*2/3=1/2; censoring at 2 drops
    risk but not survival; day 3: risk 1? D censored at 3 -> no events,
    survival stays 1/2."""
    import datetime

    from ai_batch_processing_spark.plans.analytics import kaplan_meier_return

    base = datetime.datetime(2024, 1, 1)

    def e(i, u, days):
        return (i, base + datetime.timedelta(days=days), u, "click", 1.0, "{}")

    rows = [
        e(0, 1, 0), e(1, 1, 1),          # A: event at day 1
        e(2, 2, 0), e(3, 2, 2),          # B: event at day 2
        e(4, 3, 0), e(5, 3, 2), e(6, 3, 2),  # C: second event day 2 too
        e(7, 4, 0),                      # D: single event -> censored day 3
        e(8, 5, 3),                      # horizon-setter: first event at day 3
    ]
    # user 5's only event is AT the horizon -> censored at day 0
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = {r.day: r for r in kaplan_meier_return(ev).collect()}
    # day 0: 5 at risk, 0 events, 1 censored (user 5) -> S=1
    assert (out[0].n_at_risk, out[0].n_events, out[0].n_censored) == (5, 0, 1)
    assert out[0].survival == 1.0
    # day 1: 4 at risk, user A events -> S = 3/4
    assert (out[1].n_at_risk, out[1].n_events) == (4, 1)
    assert out[1].survival == 0.75
    # day 2: 3 at risk, users B and C event -> S = 3/4 * 1/3 = 0.25
    assert (out[2].n_at_risk, out[2].n_events) == (3, 2)
    assert out[2].survival == 0.25
    # day 3: user D censored, no events -> survival unchanged
    assert (out[3].n_at_risk, out[3].n_events, out[3].n_censored) == (1, 0, 1)
    assert out[3].survival == 0.25


def test_windowed_psi_zero_on_identical_mix_and_positive_on_shift(spark):
    """9 days of the exact same (2 view, 1 click) mix -> smoothing cancels
    and PSI is exactly 0 once the 7-day window fills; day 10 swings to
    all-error -> PSI > 0.25 (the action threshold)."""
    from ai_batch_processing_spark.plans.analytics import windowed_psi_drift

    rows = []
    eid = 0
    for d in range(1, 10):
        for et in ["view", "view", "click"]:
            rows.append((eid, f"2024-03-{d:02d} 12:00:00", 1, et, 1.0, "{}"))
            eid += 1
    for _ in range(3):
        rows.append((eid, "2024-03-10 12:00:00", 1, "error", 1.0, "{}"))
        eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r.day: r.psi for r in windowed_psi_drift(ev).collect()}
    assert out["2024-03-08"] == 0.0 and out["2024-03-09"] == 0.0
    assert out["2024-03-10"] > 0.25


def test_markov_transitions_hand_computed(spark):
    """user path view->click->view->click: transitions {vc:2, cv:1};
    P(click|view)=1.0, and the 2x2 G2 must be positive (perfect
    alternation = maximal order dependence)."""
    from ai_batch_processing_spark.plans.analytics import markov_transitions

    seq = ["view", "click", "view", "click"]
    ev = spark.createDataFrame(
        [(i, f"2024-01-01 00:0{i}:00", 7, et, 1.0, "{}") for i, et in enumerate(seq)],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    rows = {(r.prev_etype, r.next_etype): r for r in markov_transitions(ev).collect()}
    assert rows[("view", "click")].n_trans == 2
    assert rows[("click", "view")].n_trans == 1
    assert rows[("view", "click")].p_next_given_prev == 1.0
    assert rows[("view", "click")].g2_contrib > 0
