"""Deduplication operators for training-data pipelines.

Four families, each designed for 100 TB first and verified at test scale:

- **exact**: hash-groupBy on content (or any key set), keep one
  representative. One shuffle on the key; Catalyst does partial
  aggregation map-side.
- **n-gram Jaccard (exact pairwise)**: character-shingle explode +
  self-join on shingle + intersection counting. Quadratic in the worst
  case — at scale this is the VERIFICATION stage applied to LSH candidate
  pairs only, never to the full corpus. Kept SQL-expressible so the whole
  computation is oracle-checked.
- **MinHash + LSH**: shingles → 64-bit hash → k permutation-min signature →
  band buckets → candidate pairs within buckets. This is the scale path:
  cost is linear in corpus size + bucket-local joins. All JVM-side
  (xxhash64 / transform / array_min); no Python in the plan.
- **SimHash**: 63-bit signed-sum fingerprint over token hashes; hamming
  distance via xor+bit_count; banding on 16-bit sub-keys for candidate
  generation.

The reference has no dedup (single table, no joins — SURVEY.md §2.3); these
are the BASELINE.json north-star extensions.
"""

from __future__ import annotations

import functools
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

_MERSENNE31 = (1 << 31) - 1  # prime modulus for permutation hashes


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup(df: DataFrame, key_cols: list[str], keep_min: str) -> DataFrame:
    """Keep one row per key: the one with the minimal ``keep_min`` value.

    Deterministic representative selection (unlike ``dropDuplicates``,
    whose survivor depends on partition order): a single shuffle on
    ``key_cols`` via a min-struct aggregation, no window needed.
    """
    others = [c for c in df.columns if c not in key_cols]
    packed = F.struct(*[F.col(keep_min)] + [F.col(c) for c in others if c != keep_min])
    agg = df.groupBy(*key_cols).agg(F.min(packed).alias("_rep"))
    return agg.select(
        *key_cols,
        *[F.col(f"_rep.{c}").alias(c) for c in [keep_min] + [c for c in others if c != keep_min]],
    )


# --------------------------------------------------------------------------
# shingling
# --------------------------------------------------------------------------
def shingles(df: DataFrame, id_col: str, text_col: str, k: int = 5) -> DataFrame:
    """Distinct character k-grams per document: (id, s). Pure Catalyst."""
    return (
        df.filter(F.length(text_col) >= k)
        .select(
            F.col(id_col).alias("id"),
            F.explode(
                F.array_distinct(
                    F.expr(f"transform(sequence(1, length({text_col}) - {k - 1}), i -> substring({text_col}, i, {k}))")
                )
            ).alias("s"),
        )
    )


def jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, threshold: float = 0.5
) -> DataFrame:
    """Exact pairwise character-k-gram Jaccard ≥ threshold.

    |A∩B| via self-join on shingle; |A∪B| = |A|+|B|-|A∩B|. Use on
    LSH candidates (or bounded subsets) — this is the verify stage.
    Output: (id_a, id_b, jaccard) with id_a < id_b.
    """
    sh = shingles(df, id_col, text_col, k)
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("i"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    jac = F.col("i") / (F.col("na.n") + F.col("nb.n") - F.col("i"))
    return (
        inter.join(na, F.col("id_a") == F.col("na.id"))
        .join(nb, F.col("id_b") == F.col("nb.id"))
        .filter(jac >= threshold)
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------
def minhash_signatures(
    df: DataFrame, id_col: str, text_col: str, k: int = 5, num_perm: int = 64, seed: int = 42
) -> DataFrame:
    """(id, sig: array<long>[num_perm]) MinHash signature per document.

    Permutations are ``(a*h + b) mod p`` over xxhash64-derived shingle
    hashes — deterministic given ``seed``. One explode + one groupBy; the
    num_perm mins are computed as independent aggregate expressions, all
    inside whole-stage codegen.
    """
    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _MERSENNE31), rng.randrange(0, _MERSENNE31)) for _ in range(num_perm)]
    sh = shingles(df, id_col, text_col, k)
    hashed = sh.withColumn("h", F.pmod(F.xxhash64("s"), F.lit(_MERSENNE31)))
    mins = [
        F.min(F.pmod(F.lit(a) * F.col("h") + F.lit(b), F.lit(_MERSENNE31))).alias(f"_m{i}")
        for i, (a, b) in enumerate(coeffs)
    ]
    agg = hashed.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"_m{i}" for i in range(num_perm)]).alias("sig"))


def lsh_candidate_pairs(
    sig_df: DataFrame, num_perm: int = 64, bands: int = 16, max_bucket: int = 500
) -> DataFrame:
    """Banded-LSH candidate pairs from MinHash signatures.

    Each signature splits into ``bands`` bands; docs colliding on any
    band's hash become a candidate pair. Buckets larger than
    ``max_bucket`` are dropped (degenerate content — a single bucket of
    m docs costs m² pairs; the cap bounds the blow-up, and dropped
    buckets are exact-duplicate clusters better handled by exact dedup).
    """
    # slice() is 1-indexed; band j covers [j*r+1, r].
    r = max(1, num_perm // bands)
    banded = sig_df.select(
        "id",
        F.posexplode(
            F.expr(f"transform(sequence(0, {bands - 1}), j -> xxhash64(slice(sig, j * {r} + 1, {r}), j))")
        ).alias("band", "bh"),
    )
    counts = banded.groupBy("band", "bh").agg(F.count(F.lit(1)).alias("m"))
    ok = banded.join(
        F.broadcast(counts.filter(F.col("m") > max_bucket)), ["band", "bh"], "left_anti"
    )
    x = ok.alias("x")
    y = ok.alias("y")
    return (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.bh") == F.col("y.bh")) & (F.col("x.id") < F.col("y.id")))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    num_perm: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """Scale-path near-dup detection: LSH candidates verified by exact Jaccard.

    The exact-Jaccard verify runs on candidate pairs only (semi-joined
    subset), so total cost is corpus-linear + candidates-quadratic.
    """
    sigs = minhash_signatures(df, id_col, text_col, k, num_perm, seed)
    cands = lsh_candidate_pairs(sigs, num_perm, bands)
    ids = cands.select(F.col("id_a").alias("id")).union(cands.select("id_b")).distinct()
    subset = df.join(ids, df[id_col] == ids.id, "left_semi")
    verified = jaccard_pairs(subset, id_col, text_col, k, threshold)
    return verified.join(cands, ["id_a", "id_b"], "left_semi")


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash(df: DataFrame, id_col: str, text_col: str, bits: int = 63) -> DataFrame:
    """(id, simhash) 63-bit SimHash over whitespace-token xxhash64 hashes.

    Per bit: sum ±1 across token hashes, bit set if the sum is
    non-negative. ``bits`` aggregate expressions in one groupBy — stays in
    codegen, no Python.
    """
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).filter(F.col("tok") != "")
    h = F.xxhash64("tok")
    sums = [
        F.sum(F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"_b{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy("id").agg(*sums)
    sim = functools.reduce(
        lambda acc, i: acc + F.when(F.col(f"_b{i}") >= 0, F.lit(1 << i)).otherwise(F.lit(0)),
        range(bits),
        F.lit(0).cast("long"),
    )
    return agg.select("id", sim.alias("simhash"))


def simhash_near_pairs(df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming.

    Candidate generation blocks on four 16-bit sub-keys (two hashes within
    hamming ≤ 3 of a 64-bit key must agree on at least one of 4 bands) —
    corpus-linear, then exact hamming verify on candidates.
    """
    sh = simhash(df, id_col, text_col)
    banded = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.expr("transform(sequence(0, 3), j -> shiftright(simhash, j * 16) & 65535)")
        ).alias("band", "key"),
    )
    x = banded.alias("x")
    y = banded.alias("y")
    cand = (
        x.join(y, (F.col("x.band") == F.col("y.band")) & (F.col("x.key") == F.col("y.key")) & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.col("x.simhash").alias("sh_a"),
            F.col("y.simhash").alias("sh_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.filter(ham <= max_hamming).select("id_a", "id_b", ham.alias("hamming"))


# --------------------------------------------------------------------------
# Registered queries — a synthesized near-dup corpus (the base table has no
# duplicates), deterministic in both engines.
# --------------------------------------------------------------------------
_DUP_CORPUS_SQL = """
        SELECT doc_id AS id, text FROM documents WHERE doc_id < 200
        UNION ALL
        SELECT doc_id + 100000 AS id, text || ' tail marker' AS text
        FROM documents WHERE doc_id < 200 AND doc_id % 2 = 0
"""


def _dup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    base = t["documents"].filter(F.col("doc_id") < 200).select(F.col("doc_id").alias("id"), "text")
    near = (
        t["documents"]
        .filter((F.col("doc_id") < 200) & (F.col("doc_id") % 2 == 0))
        .select((F.col("doc_id") + 100000).alias("id"), F.concat(F.col("text"), F.lit(" tail marker")).alias("text"))
    )
    return base.unionAll(near)


@register(
    "q40_dedup_exact",
    oracle="""
        WITH corpus AS (
            SELECT doc_id AS id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS id, text FROM documents WHERE doc_id % 3 = 0
        )
        SELECT CAST(MIN(id) AS BIGINT) AS keep_id, COUNT(*) AS n_copies
        FROM corpus
        GROUP BY text
        ORDER BY keep_id
    """,
    doc="exact dedup: hash-groupBy on content, deterministic min-id survivor.",
    bench=True,
    tags=("dedup", "exact"),
)
def q40_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir, ["documents"])
    base = t["documents"].select(F.col("doc_id").alias("id"), "text")
    dups = (
        t["documents"].filter(F.col("doc_id") % 3 == 0).select((F.col("doc_id") + 100000).alias("id"), "text")
    )
    corpus = base.unionAll(dups)
    return (
        corpus.groupBy("text")
        .agg(F.min("id").cast("long").alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    )


@register(
    "q41_dedup_ngram_jaccard",
    oracle=f"""
        WITH corpus AS ({_DUP_CORPUS_SQL}),
        docs AS (SELECT id, text FROM corpus WHERE length(text) >= 5),
        sh AS (
            SELECT DISTINCT id, substring(text, CAST(i AS INT), 5) AS s
            FROM docs, unnest(generate_series(1, length(text) - 4)) AS t(i)
        ),
        sizes AS (SELECT id, COUNT(*) AS n FROM sh GROUP BY id),
        inter AS (
            SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i
            FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, ROUND(CAST(i AS DOUBLE) / (na.n + nb.n - i), 6) AS jaccard
        FROM inter
        JOIN sizes na ON na.id = id_a
        JOIN sizes nb ON nb.id = id_b
        WHERE CAST(i AS DOUBLE) / (na.n + nb.n - i) >= 0.5
        ORDER BY id_a, id_b
    """,
    doc="exact n-gram Jaccard near-dup pairs (the verify stage of MinHash dedup).",
    tags=("dedup", "jaccard"),
)
def q41_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_corpus(spark, sf_dir)
    return jaccard_pairs(corpus, "id", "text", k=5, threshold=0.5).orderBy("id_a", "id_b")


@register(
    "q42_dedup_minhash_lsh",
    oracle=None,  # LSH banding isn't reasonably SQL-expressible; recall vs
    # the exact-Jaccard oracle is asserted in tests/test_dedup.py.
    doc="MinHash+LSH near-dup pairs, exact-Jaccard-verified (scale path).",
    bench=True,
    tags=("dedup", "minhash", "lsh"),
)
def q42_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_corpus(spark, sf_dir)
    return minhash_dedup_pairs(corpus, "id", "text", threshold=0.5).orderBy("id_a", "id_b")


@register(
    "q43_dedup_simhash",
    oracle=None,  # bit-level simhash is impractical in ANSI SQL; semantics
    # are pinned by tests/test_dedup.py (identical/near/far texts).
    doc="SimHash near-dup pairs (hamming ≤ 3 via 16-bit band blocking).",
    tags=("dedup", "simhash"),
)
def q43_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dup_corpus(spark, sf_dir)
    return simhash_near_pairs(corpus, "id", "text", max_hamming=3).orderBy("id_a", "id_b")
