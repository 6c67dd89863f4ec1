from __future__ import annotations

import math


def test_bleu_identity_pair_is_one(spark):
    from ai_batch_processing_spark.operators.text import bleu_pairs

    pairs = spark.createDataFrame(
        [(0, "the cat sat on the mat today ok", "the cat sat on the mat today ok")],
        "pid long, ref string, cand string",
    )
    r = bleu_pairs(pairs).collect()[0]
    assert r.bleu == 1.0 and r.bp == 1.0
    assert r.p1 == r.p2 == r.p3 == r.p4 == 1.0


def test_bleu_clipping_and_zero_ngram_order(spark):
    from ai_batch_processing_spark.operators.text import bleu_pairs

    # the degenerate candidate from Papineni et al.: "the the the the"
    # vs a reference containing one "the" — p1 clips to 1/4; no cand
    # bigram matches, so BLEU-4 is 0
    pairs = spark.createDataFrame(
        [(0, "the cat", "the the the the")], "pid long, ref string, cand string"
    )
    r = bleu_pairs(pairs).collect()[0]
    assert r.p1 == 0.25
    assert r.p2 == 0.0
    assert r.bleu == 0.0


def test_bleu_brevity_penalty_hand_computed(spark):
    from ai_batch_processing_spark.operators.text import bleu_pairs

    # candidate = first 6 tokens of an 8-token reference: every cand
    # n-gram matches (p_n = 1), so BLEU = bp = exp(1 - 8/6)
    ref = "a b c d e f g h"
    cand = "a b c d e f"
    pairs = spark.createDataFrame(
        [(0, ref, cand)], "pid long, ref string, cand string"
    )
    r = bleu_pairs(pairs).collect()[0]
    assert r.p1 == r.p4 == 1.0
    expected = round(math.exp(1 - 8 / 6), 6)
    assert abs(r.bp - expected) < 1e-9
    assert abs(r.bleu - expected) < 1e-9


def test_bleu_corpus_micro_vs_macro(spark):
    from ai_batch_processing_spark.operators.text import bleu_corpus

    # one perfect pair + one zero pair: macro = (1 + 0)/2 = 0.5; micro
    # pools the counts and lands elsewhere — both must be deterministic
    pairs = spark.createDataFrame(
        [
            (0, "u v w x y z", "u v w x y z"),
            (1, "p q r s t u", "m n o a b c"),
        ],
        "pid long, ref string, cand string",
    )
    r = bleu_corpus(pairs).collect()[0]
    assert r.n_pairs == 2
    assert r.bleu_macro == 0.5
    # pooled p4: pair0 contributes 3/3, pair1 0/3 -> 0.5 etc.
    assert r.p4 == 0.5


def test_self_bleu_sources_identical_vs_disjoint(spark):
    """A source of identical docs scores self-BLEU 1; a source of
    token-disjoint docs scores 0 on every pair."""
    from ai_batch_processing_spark.operators.text import self_bleu_sources

    rows = [
        (1, "same", "the quick brown fox jumps over the lazy dog"),
        (2, "same", "the quick brown fox jumps over the lazy dog"),
        (3, "same", "the quick brown fox jumps over the lazy dog"),
        (4, "diff", "aa bb cc dd ee ff gg hh"),
        (5, "diff", "ii jj kk ll mm nn oo pp"),
        (6, "diff", "qq rr ss tt uu vv ww xx"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r.source: r for r in self_bleu_sources(df, k=3).collect()}
    assert out["same"].n_pairs == 6 and out["same"].self_bleu == 1.0
    assert out["diff"].n_pairs == 6 and out["diff"].self_bleu == 0.0
    assert out["diff"].max_pair_bleu == 0.0
