"""Property-based tests (hypothesis) — SURVEY.md §5.2(3).

Pure-driver functions (delimiter sniffing) get full hypothesis fuzzing;
Spark-evaluated semantics (template rendering) are checked batch-wise
against a pure-Python oracle — one Spark job per example set, not per
example.
"""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st

from ai_batch_processing_spark.io.readers import _sniff_delimiter

# --------------------------------------------------------------------------
# delimiter sniffing (main.py:225-238 semantics)
# --------------------------------------------------------------------------
printable_line = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\n\r"), max_size=120
)


@given(printable_line)
@settings(max_examples=300)
def test_sniff_total_and_lawful(line):
    """Never raises; returns one of the four outcomes; obeys the spec."""
    d = _sniff_delimiter(line)
    assert d in (",", "|", "\t", None)
    if d == ",":
        parts = [p.strip() for p in line.split(",")]
        assert len(parts) >= 2 and all(p and len(p) < 30 and " " not in p for p in parts)
    elif d == "|":
        assert "|" in line
    elif d == "\t":
        assert "\t" in line


@given(st.lists(st.from_regex(r"[A-Za-z0-9_]{1,29}", fullmatch=True), min_size=2, max_size=8))
@settings(max_examples=100)
def test_sniff_accepts_headerish_comma_lines(tokens):
    assert _sniff_delimiter(",".join(tokens)) == ","


@given(printable_line)
@settings(max_examples=200)
def test_sniff_prose_with_commas_never_comma(line):
    """A comma line containing a spaced token (prose) must not sniff as CSV."""
    prose = line + ", hello world"
    assert _sniff_delimiter(prose) != ","


# --------------------------------------------------------------------------
# template rendering (main.py:372-377 semantics)
# --------------------------------------------------------------------------
_PLACEHOLDER = re.compile(r"\{(\w+)\}")


def _render_oracle(template: str, row: dict[str, str | None], columns: list[str]) -> str:
    """Single-pass substitution; unknown placeholders literal; None → ''."""

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in columns:
            return m.group(0)
        v = row.get(name)
        return "" if v is None else str(v)

    return _PLACEHOLDER.sub(sub, template)


template_text = st.lists(
    st.sampled_from(list("ab{}_x1 ") + ["{a}", "{b}", "{zz}"]), max_size=12
).map("".join)
value = st.one_of(st.none(), st.text(st.characters(codec="ascii", exclude_characters="\n\r"), max_size=10))


@given(st.lists(st.tuples(template_text, value, value), min_size=1, max_size=12))
@settings(max_examples=12, deadline=None)
def test_template_matches_python_oracle(spark, cases):
    from ai_batch_processing_spark.operators.template import template_expr
    rows = [(i, a, b) for i, (_t, a, b) in enumerate(cases)]
    df = spark.createDataFrame(rows, "i long, a string, b string")
    outs = [template_expr(t, ["a", "b"]).alias(f"o{i}") for i, (t, _a, _b) in enumerate(cases)]
    got = {r.i: r for r in df.select("i", *outs).collect()}
    for i, (t, a, b) in enumerate(cases):
        expected = _render_oracle(t, {"a": a, "b": b}, ["a", "b"])
        assert got[i][f"o{i}"] == expected, (t, a, b)


# --------------------------------------------------------------------------
# text analytics expressions vs pure-Python oracles (batch-wise)
# --------------------------------------------------------------------------
# Printable ascii + tab/newline ONLY: the three regex engines in play
# disagree about exotic whitespace (Python's \s matches \x1c-\x1f, Java's
# matches \x0b, RE2's matches neither) — on printable text + [ \t\n] all
# of them agree, which is the domain the operators are specified over.
doc_text = st.text(
    alphabet=st.characters(codec="ascii", min_codepoint=0x20, max_codepoint=0x7E)
    | st.sampled_from("\t\n"),
    max_size=80,
)


def _py_tokens(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.lower()) if t != ""]


def _py_fingerprint(text: str) -> str:
    import hashlib as _h

    norm = re.sub("[^a-z0-9]+", " ", text.lower()).strip()
    return _h.md5(norm.encode()).hexdigest()


@given(st.lists(doc_text, min_size=1, max_size=25))
@settings(max_examples=12, deadline=None)
def test_token_count_and_fingerprint_match_python_oracle(spark, texts):
    """tokens_expr / fingerprint_expr agree with the straightforward Python
    reading of their specs on arbitrary ascii text — one Spark job per
    example set."""
    from pyspark.sql import functions as F

    from ai_batch_processing_spark.operators.text import fingerprint_expr, token_count_ws

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {
        r.i: r
        for r in df.select(
            "i",
            token_count_ws(F.col("text")).alias("n"),
            fingerprint_expr("text").alias("fp"),
        ).collect()
    }
    for i, t in enumerate(texts):
        assert got[i].n == len(_py_tokens(t)), repr(t)
        assert got[i].fp == _py_fingerprint(t), repr(t)


# --------------------------------------------------------------------------
# packing fragments: lossless decomposition for arbitrary token sequences
# --------------------------------------------------------------------------
@given(
    st.lists(st.integers(min_value=0, max_value=1500), min_size=1, max_size=40),
    st.integers(min_value=1, max_value=600),
)
@settings(max_examples=30, deadline=None)
def test_pack_fragments_lossless_property(spark, sizes, budget):
    """For ANY doc-size sequence and budget: fragments are contiguous from
    0 per doc, sum to the doc's tokens, pack ranges are contiguous, and
    continuation fragments start at offset 0 of their pack. One Spark job
    per example (batch-wise hypothesis pattern)."""
    from ai_batch_processing_spark.operators.curation import pack_fragments

    rows = [("g", i, n) for i, n in enumerate(sizes)]
    df = spark.createDataFrame(rows, "source string, doc_id long, n_tokens long")
    frags = pack_fragments(df, budget, ["source"], ["doc_id"], "n_tokens").collect()
    by_doc = {}
    for r in frags:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(range(len(sizes)))  # no doc vanishes
    start = 0
    for i, n in enumerate(sizes):
        fs = sorted(by_doc[i], key=lambda r: r.pack_id)
        assert sum(f.slice_len for f in fs) == n
        pos = 0
        for f in fs:
            assert f.slice_start == pos
            pos += f.slice_len
        assert [f.pack_id for f in fs] == list(range(fs[0].pack_id, fs[-1].pack_id + 1))
        assert fs[0].pack_id == start // budget and fs[0].pack_offset == start % budget
        for f in fs[1:]:
            assert f.pack_offset == 0
        start += n


# --------------------------------------------------------------------------
# Z-order: interleave bijectivity and locality bounds (pure-python oracle)
# --------------------------------------------------------------------------
@given(
    st.lists(
        st.tuples(st.integers(0, 10_000), st.integers(0, 10_000)),
        min_size=2,
        max_size=30,
        unique=True,
    )
)
@settings(max_examples=20, deadline=None)
def test_zorder_matches_python_interleave(spark, points):
    """zorder_value must equal the reference bit-interleave of the scaled
    bucket values for arbitrary (a, b) integer points."""
    from pyspark.sql import functions as F

    from ai_batch_processing_spark.io.writers import zorder_value
    df = spark.createDataFrame([(a, b) for a, b in points], "a long, b long")
    mins = df.agg(
        F.min("a").alias("_amin"), F.max("a").alias("_amax"),
        F.min("b").alias("_bmin"), F.max("b").alias("_bmax"),
    )
    z = zorder_value(F.col("a"), F.col("b"), F.col("_amin"), F.col("_amax"),
                     F.col("_bmin"), F.col("_bmax"), bits=16)
    got = {(r.a, r.b): r.z for r in df.crossJoin(F.broadcast(mins)).select("a", "b", z.alias("z")).collect()}

    amin = min(a for a, _ in points); amax = max(a for a, _ in points)
    bmin = min(b for _, b in points); bmax = max(b for _, b in points)

    def bucket(v, lo, hi):
        return min(65535, int((v - lo) / (hi - lo + 1) * 65536))

    def interleave(qa, qb):
        out = 0
        for i in range(16):
            out |= ((qa >> i) & 1) << (2 * i)
            out |= ((qb >> i) & 1) << (2 * i + 1)
        return out

    for (a, b), zv in got.items():
        assert zv == interleave(bucket(a, amin, amax), bucket(b, bmin, bmax))


# --------------------------------------------------------------------------
# SQ8 quantization: numpy HALF_UP twin vs a pure-Python BigDecimal-style
# oracle (the semantics Spark's round and DuckDB's round agree on)
# --------------------------------------------------------------------------
def _half_up_py(t: float) -> int:
    """Exact HALF_UP on the binary value via the fractions module — the
    reference semantics (Spark BigDecimal / DuckDB round agree with it
    for every double that round-trips its shortest decimal repr)."""
    from fractions import Fraction

    f = Fraction(t)
    a = abs(f)
    fl = a.numerator // a.denominator
    frac = a - fl
    r = fl + (1 if frac >= Fraction(1, 2) else 0)
    return int(r if f >= 0 else -r)


@given(
    st.lists(
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=64,
    )
)
@settings(max_examples=300)
def test_sq8_np_half_up_matches_exact_rational_rounding(vec):
    """_sq8_np's floor+exact-fraction comparison must agree with exact
    rational HALF_UP on t = v/scale for arbitrary float vectors —
    including denormals-adjacent, .5-boundary, and zero vectors."""
    import numpy as np

    from ai_batch_processing_spark.operators.similarity import _sq8_np

    x = np.array([vec], dtype=np.float64)
    got = _sq8_np(x)[0]
    amax = max(abs(v) for v in vec)
    s0 = amax / 127.0  # may underflow to 0 for denormal-only vectors
    scale = s0 if s0 > 0 else 1.0
    for v, g in zip(vec, got):
        t = v / scale  # the same IEEE division the kernel performs
        assert g == _half_up_py(t), (v, scale, t, g)
