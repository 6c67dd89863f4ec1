"""Document chunking: Catalyst composition vs row-at-a-time UDTF parity.

chunk_documents is the scale path (sequence+posexplode+substring, zero
shuffle); ChunkTextUDTF is the table-function API surface. They must
produce identical rows.
"""

from __future__ import annotations

from ai_batch_processing_spark.operators.text import (
    HAS_UDTF,
    chunk_documents,
    register_chunk_udtf,
)

DOCS = [
    (1, "a" * 450),  # 4 chunks at stride 150: starts 0/150/300 -> wait, 3
    (2, "b" * 150),  # exactly one stride -> 1 chunk
    (3, "c" * 151),  # one past the stride -> 2 chunks
    (4, ""),  # empty -> no chunks
    (5, "short"),  # shorter than chunk_size -> 1 chunk
]


def _chunk_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_chunk_boundaries(spark):
    out = (
        chunk_documents(_chunk_df(spark), chunk_size=200, overlap=50)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 4 not in by_doc  # empty doc dropped
    assert [r.start_offset for r in by_doc[1]] == [0, 150, 300]
    assert [len(r.chunk_text) for r in by_doc[1]] == [200, 200, 150]
    assert [r.start_offset for r in by_doc[2]] == [0]
    assert [r.start_offset for r in by_doc[3]] == [0, 150]
    assert by_doc[3][1].chunk_text == "c"  # 1-char tail chunk
    assert by_doc[5][0].chunk_text == "short"
    # reconstruction: stripping the overlap from non-first chunks rebuilds the doc
    rebuilt = by_doc[1][0].chunk_text + "".join(c.chunk_text[50:] for c in by_doc[1][1:])
    assert rebuilt == "a" * 450


def test_chunk_plan_has_no_shuffle(spark):
    plan = chunk_documents(_chunk_df(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure row fan-out, partition-local


def test_udtf_parity_with_catalyst(spark):
    assert HAS_UDTF
    register_chunk_udtf(spark)
    _chunk_df(spark).createOrReplaceTempView("chunk_parity_docs")
    via_udtf = spark.sql(
        """
        SELECT d.doc_id, c.chunk_idx, c.start_offset, c.chunk_text
        FROM chunk_parity_docs d, LATERAL chunk_text(d.text, 200, 50) c
        ORDER BY doc_id, chunk_idx
        """
    ).collect()
    via_catalyst = (
        chunk_documents(_chunk_df(spark), chunk_size=200, overlap=50)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    assert [tuple(r) for r in via_udtf] == [tuple(r) for r in via_catalyst]


# ---------------------------------------------------------------------------
# BPE trainer
# ---------------------------------------------------------------------------
def test_bpe_train_hand_computed_merges(spark):
    """Classic BPE on a corpus small enough to verify by hand:
    types {aaab×2, ab×1} → merge (a,a) n=4 (overlapping pairs counted),
    then (a,b) n=3, then (aa,ab) n=2, then no pair remains (early stop)."""
    from ai_batch_processing_spark.operators.text import bpe_train

    df = spark.createDataFrame([("aaab aaab ab",)], "text string")
    rows = [tuple(r) for r in bpe_train(df, n_merges=8).orderBy("step").collect()]
    assert rows == [
        (1, "a", "a", "aa", 4),
        (2, "a", "b", "ab", 3),
        (3, "aa", "ab", "aaab", 2),
    ]


def test_bpe_train_leftmost_nonoverlapping_merge(spark):
    """'a a a a' must merge to 'aa aa', not 'aa a a' — the sentinel
    encoding must not let adjacent occurrences share boundary chars."""
    from ai_batch_processing_spark.operators.text import bpe_train

    df = spark.createDataFrame([("aaaa xy",)], "text string")
    rows = [tuple(r) for r in bpe_train(df, n_merges=2).orderBy("step").collect()]
    # (a,a) appears 3 times in 'aaaa' (overlaps counted); after the merge
    # the word is [aa, aa], so (aa, aa) is the next-best pair with count 1.
    assert rows[0] == (1, "a", "a", "aa", 3)
    assert rows[1] == (2, "aa", "aa", "aaaa", 1)


def test_bpe_train_deterministic_and_max_count_nonincreasing(spark, sf_dir):
    from ai_batch_processing_spark.operators.text import bpe_train
    from ai_batch_processing_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(100)
    a = [tuple(r) for r in bpe_train(docs, n_merges=5).orderBy("step").collect()]
    b = [tuple(r) for r in bpe_train(docs, n_merges=5).orderBy("step").collect()]
    assert a == b and len(a) == 5
    counts = [r[4] for r in a]
    # merging the argmax pair can never create a more frequent pair:
    # count(new pair (x, ab)) <= count(old pair (x, a)) <= old max
    assert counts == sorted(counts, reverse=True)


# ---------------------------------------------------------------------------
# BPE encode
# ---------------------------------------------------------------------------
def test_bpe_encode_hand_computed(spark):
    """Merges [(a,a), (a,b)] over 'aaab ab c': 'aaab' wraps to a|a|a|b,
    merge1 (leftmost-nonoverlap) → aa|a|b, merge2 → aa|ab; 'ab' → ab;
    'c' → c (single-char tokens encode even though training skips them)."""
    from ai_batch_processing_spark.operators.text import (
        bpe_encode_counts,
        bpe_encode_symbols,
        bpe_encode_tokens,
    )

    df = spark.createDataFrame([(1, "aaab ab c")], "doc_id long, text string")
    merges = [("a", "a"), ("a", "b")]
    syms = bpe_encode_symbols(df, merges).collect()[0]
    assert syms.tokens == ["aa", "a", "b", "ab", "c"] or syms.tokens == ["aa", "ab", "ab", "c"]
    # leftmost-nonoverlapping: 'aaab' after (a,a) is [aa, a, b]; then (a,b)
    # fuses the tail → [aa, ab]
    assert syms.tokens == ["aa", "ab", "ab", "c"]
    counts = bpe_encode_counts(df, merges).collect()[0]
    assert (counts.n_tokens_base, counts.n_tokens_bpe) == (7, 4)
    udf_syms = bpe_encode_tokens(df, merges).collect()[0]
    assert udf_syms.tokens == syms.tokens


def test_bpe_encode_udf_parity_with_catalyst(spark, sf_dir):
    """The rank-loop encoder must produce the exact symbol sequences of the
    sequential chained-replace form on a real corpus with trained merges."""
    from ai_batch_processing_spark.operators.text import (
        bpe_encode_symbols,
        bpe_encode_tokens,
        bpe_train,
    )
    from ai_batch_processing_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(200)
    merges = [
        (r.left, r.right) for r in bpe_train(docs, n_merges=8).orderBy("step").collect()
    ]
    assert len(merges) == 8
    a = {r.doc_id: r.tokens for r in bpe_encode_symbols(docs, merges).collect()}
    b = {r.doc_id: r.tokens for r in bpe_encode_tokens(docs, merges).collect()}
    assert a == b


def test_bpe_encode_compression_monotone(spark, sf_dir):
    """Every merge can only shrink the symbol count: n_bpe <= n_base
    everywhere, with strict shrinkage somewhere on a real corpus."""
    from ai_batch_processing_spark.operators.text import bpe_encode_counts, bpe_train
    from ai_batch_processing_spark.session import load_tables
    from pyspark.sql import functions as F

    docs = load_tables(spark, sf_dir, ["documents"])["documents"].limit(200)
    merges = [
        (r.left, r.right) for r in bpe_train(docs, n_merges=8).orderBy("step").collect()
    ]
    out = bpe_encode_counts(docs, merges)
    assert out.filter(F.col("n_tokens_bpe") > F.col("n_tokens_base")).count() == 0
    assert out.filter(F.col("n_tokens_bpe") < F.col("n_tokens_base")).count() > 0


def test_bpe_train_batched_equals_sequential(spark, sf_dir):
    """The batched merge selection (merge_batch > 1: disjoint strict-
    dominance prefix per pass) must produce EXACTLY the sequential
    trainer's merge table — same pairs, same order, same counts — on the
    real corpus and on an adversarial tie-heavy corpus."""
    from ai_batch_processing_spark.operators.text import bpe_train

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    seq = [tuple(r) for r in bpe_train(docs, n_merges=24, merge_batch=1).orderBy("step").collect()]
    bat = [tuple(r) for r in bpe_train(docs, n_merges=24, merge_batch=64).orderBy("step").collect()]
    assert bat == seq

    # adversarial: interacting top pairs + exact count ties force the
    # batch to degrade toward sequential without diverging from it
    ties = spark.createDataFrame(
        [("ab ab ab bc bc bc cd cd cd abc abc",), ("aaaa aaaa baba dada",)],
        "text string",
    )
    seq2 = [tuple(r) for r in bpe_train(ties, n_merges=10, merge_batch=1).orderBy("step").collect()]
    bat2 = [tuple(r) for r in bpe_train(ties, n_merges=10, merge_batch=8).orderBy("step").collect()]
    assert bat2 == seq2


def test_gopher_rules_line_and_symbol_rules(spark):
    """The line-based and symbol rules need adversarial inputs (the
    synthetic corpus has no newlines/bullets/ellipses): bullet-dominated
    and ellipsis-dominated docs must fail their rules, a clean long doc
    passes everything, and ratios are exact."""
    from ai_batch_processing_spark.operators.text import gopher_rules

    good = "the cat sat with the dog and that was fine " * 5  # 45 words, stops
    bullets = "\n".join(f"- item {i}" for i in range(10))
    ellipses = "\n".join(f"line {i} trails off..." for i in range(10))
    symbols = "tag " + "# " * 30
    short = "too few words here"
    df = spark.createDataFrame(
        [(1, good), (2, bullets), (3, ellipses), (4, symbols), (5, short)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in gopher_rules(df, min_words=20).collect()}

    assert rows[1].passes and rows[1].n_stop_hits >= 2
    assert rows[2].bullet_line_ratio == 1.0 and not rows[2].r_bullet_lines
    assert rows[3].ellipsis_line_ratio == 1.0 and not rows[3].r_ellipsis_lines
    assert rows[4].symbol_ratio > 0.1 and not rows[4].r_symbol_ratio
    assert not rows[4].r_alpha_words  # '#' tokens carry no alphabetic char
    assert not rows[5].r_word_count and not rows[5].passes


def test_rbo_identical_and_disjoint_rankings(spark):
    """Identical rankings: X_d = d so rbo = (1-p) * sum p^(d-1) (the
    truncated geometric mass, -> 1 as depth grows). Disjoint: 0."""
    from ai_batch_processing_spark.operators.text import (
        _RBO_WEIGHTS,
        rank_biased_overlap,
    )

    r = spark.createDataFrame(
        [(f"t{i}", i) for i in range(1, 21)], "term string, r long"
    )
    out = rank_biased_overlap(r, r).collect()[0]
    expect = round(sum(round(0.1 * w * d / d, 6) for d, w in _RBO_WEIGHTS), 6)
    assert out.overlap_at_depth == 20
    assert abs(out.rbo - expect) < 1e-9

    other = spark.createDataFrame(
        [(f"u{i}", i) for i in range(1, 21)], "term string, r long"
    )
    out2 = rank_biased_overlap(r, other).collect()[0]
    assert out2.overlap_at_depth == 0 and out2.rbo == 0.0


def test_char_bigram_entropy_known_distribution(spark):
    """'ababa' -> bigrams {ab:2, ba:2}: h_joint = ln 2, first chars
    {a:2, b:2}: h_first = ln 2, so h_cond = 0 (fully deterministic
    successor)."""
    import math

    from ai_batch_processing_spark.operators.text import char_bigram_entropy

    docs = spark.createDataFrame([(0, "ababa")], "doc_id long, text string")
    out = char_bigram_entropy(docs).collect()[0]
    term = round(-0.5 * math.log(0.5), 6)
    assert out.n_bigrams == 4
    assert abs(out.h_joint - round(2 * term, 6)) < 1e-9
    assert out.h_cond == 0.0


def test_gopher_rules_trim_and_alpha_edge_cases(spark, duck):
    """r9 expression swaps (btrim line rules, single-pass alpha regex)
    must match the original \\s-regex semantics on adversarial inputs:
    tab-indented bullets, all-whitespace lines, mixed-digit words, and
    ellipsis lines padded with tabs — verified cell-by-cell against the
    DuckDB oracle, which mirrors the trim form."""
    import duckdb

    from ai_batch_processing_spark.registry import registered_oracle

    rows = [
        (1, "\t- tabbed bullet\n  * spaced star\nplain line\n   \t  "),
        (2, "trails off...\t \nends dots...\nno dots here\nunicode one…  "),
        (3, "12a3 999 ## a1 ... x 42"),
        # NB: no \v here — Java regex \s includes \x0B but RE2's does not,
        # a latent SPLIT divergence predating the trim rules (documented)
        (4, "\f- formfeed bullet\nmid - dash not bullet x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    import tempfile

    from ai_batch_processing_spark.registry import load_all

    with tempfile.TemporaryDirectory() as d:
        df.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")
        got = [
            tuple(r)
            for r in load_all()["q164_gopher_quality_rules"].fn(spark, d).collect()
        ]
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet/*.parquet'"
        )
        ora = con.execute(registered_oracle("q164_gopher_quality_rules")).fetchall()
    assert got == [tuple(r) for r in ora]
    by_id = {r[0]: r for r in got}
    # doc 1: lines = [tab-bullet, space-star, plain, all-ws] -> 2/4 bullets
    assert by_id[1][4] == 0.5
    # doc 2: 3 of 4 lines end with an ellipsis after trailing-ws trim
    assert by_id[2][5] == 0.75
    # doc 3: words = [12a3, 999, ##, a1, ..., x, 42] -> 3 alpha of 7
    assert by_id[3][1] == 7 and by_id[3][6] == round(3 / 7, 6)


def test_gopher_rules_arrow_kernel_java_ws_and_nulls(spark):
    """The r10 mapInArrow metrics kernel must preserve the JVM regex
    semantics it replaced: Java's \\s includes \\x0B (RE2's does not, so
    the kernel writes the class out), the plan carries exactly one
    MapInArrow node reading only (id, text), and a NULL text row
    propagates NULL metrics instead of zeros."""
    from ai_batch_processing_spark.operators.text import gopher_rules

    df = spark.createDataFrame(
        [
            # \x0B separates words under Java \s — the kernel must agree
            (1, "a\x0bb c of the"),
            (2, None),
            # empty text: 0 words, 1 line (split('') -> ['']), all ratios 0
            (3, ""),
        ],
        "doc_id long, text string",
    )
    out = gopher_rules(df, min_words=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].n_words == 5  # a / b / c / of / the
    assert rows[1].n_stop_hits == 2  # of, the
    assert rows[1].mean_word_len == round(8 / 5, 6)  # a+b+c+of+the = 8 chars
    # NULL text: metrics NULL, ratios 0.0 via the otherwise(0.0) guard,
    # passes False (NULL AND FALSE) — identical to the JVM expression form
    assert rows[2].n_words is None and rows[2].r_stop_words is None
    assert rows[2].mean_word_len == 0.0 and rows[2].passes is False
    assert rows[3].n_words == 0 and rows[3].bullet_line_ratio == 0.0


def test_degenerate_loop_audit_hand_computed(spark):
    """Runs and 2-token loops score exactly (length-1) / (length-2):
    'a a a a'   -> max_uni_rep 3, max_loop2 2 (a run also self-loops)
    'x y x y x' -> max_uni_rep 0, max_loop2 3
    'p q r s'   -> 0 / 0, not flagged."""
    from ai_batch_processing_spark.operators.text import degenerate_loop_audit

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "x y x y x"), (3, "p q r s"), (4, ""), (5, "solo")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in degenerate_loop_audit(df).collect()}
    assert (rows[1].max_uni_rep, rows[1].max_loop2, rows[1].looped) == (3, 2, True)
    assert (rows[2].max_uni_rep, rows[2].max_loop2, rows[2].looped) == (0, 3, True)
    assert (rows[3].max_uni_rep, rows[3].max_loop2, rows[3].looped) == (0, 0, False)
    assert (rows[4].n_tokens, rows[4].max_uni_rep, rows[4].max_loop2) == (0, 0, 0)
    assert (rows[5].n_tokens, rows[5].max_uni_rep, rows[5].looped) == (1, 0, False)


def test_degenerate_loop_audit_interrupted_runs(spark):
    """An interrupting token resets the streak: 'a a b a a a' has
    max_uni_rep 2 (from the trailing triple), not 3."""
    from ai_batch_processing_spark.operators.text import degenerate_loop_audit

    df = spark.createDataFrame([(1, "a a b a a a")], "doc_id long, text string")
    r = degenerate_loop_audit(df).collect()[0]
    assert r.max_uni_rep == 2
