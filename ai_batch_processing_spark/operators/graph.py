"""Graph operators over similarity/link graphs: PageRank-style centrality.

Corpus curation uses graph signals (page importance over a link graph,
centrality over a document-similarity graph) as quality features next to
the per-row scores in ``text.py``. The reference has no graph surface; this
is a BASELINE.json north-star extension demonstrating ITERATIVE distributed
computation beyond ``dedup.connected_components``:

- each iteration is one keyed join + one aggregate (all partial-aggregated,
  no driver-side state beyond the loop counter);
- lineage is truncated per iteration with ``localCheckpoint`` (the
  connected-components pattern — without it the plan doubles per round and
  every action recomputes all prior rounds);
- the iteration count is FIXED, so the whole computation is deterministic
  and the DuckDB oracle can unroll the same iterations as a CTE chain —
  the distributed loop is hash-checked against straight-line SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_batch_processing_spark.registry import register
from ai_batch_processing_spark.session import load_tables

DAMPING = 0.85


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iterations: int = 10,
    damping: float = DAMPING,
) -> DataFrame:
    """(id, rank) after ``iterations`` synchronous PageRank steps.

    ``nodes`` must have column ``id``; ``edges`` columns ``src``/``dst``.
    Simplified model (no dangling-mass redistribution — every node in a
    k-NN graph has out-edges): r₀ = 1/N;
    rᵢ₊₁(v) = (1−d)/N + d·Σ_{(u,v)∈E} rᵢ(u)/outdeg(u).

    Scale shape: node count N rides in as a broadcast 1-row aggregate (no
    driver ``.count()``); out-degrees are computed once and live ON the
    edge rows, so each iteration shuffles edges exactly once (join on src,
    aggregate on dst) and the rank table once. ``localCheckpoint`` per
    iteration keeps the plan O(1) in the round number.
    """
    n_row = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    odeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    # out-degree attached to each edge once, reused every iteration
    e = edges.join(odeg, "src").select("src", "dst", "odeg").persist()
    # (id, n) materialized ONCE — every iteration joins onto this
    # checkpointed frame instead of re-running the node scan and the
    # count aggregate 10 times over
    base = nodes.crossJoin(F.broadcast(n_row)).select("id", "n").localCheckpoint(eager=True)
    ranks = base.select("id", (F.lit(1.0) / F.col("n")).alias("rank"))
    for _ in range(iterations):
        contribs = (
            e.join(ranks, e.src == ranks.id)
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("odeg")).alias("inflow"))
        )
        ranks = (
            base.join(contribs, base.id == contribs.dst, "left")
            .select(
                "id",
                (
                    (F.lit(1.0) - F.lit(damping)) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    # ranks is eagerly checkpointed — nothing downstream depends on e's
    # cache, and a library function must not leak storage across calls
    e.unpersist()
    return ranks


def knn_edges(
    emb: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Directed k-NN edges (src → its k most-cosine-similar neighbors)."""
    from ai_batch_processing_spark.operators.similarity import cosine_topk

    top = cosine_topk(emb, emb, k=k, corpus_id=id_col, query_id=id_col, vec_col=vec_col)
    return top.select(F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst"))


def _pagerank_oracle_sql(iterations: int, cap: int, k: int, damping: float) -> str:
    """The straight-line DuckDB twin: k-NN edges + unrolled iterations."""
    head = f"""
        WITH emb AS (
            SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
            FROM embeddings WHERE vec_id < {cap}
        ),
        cnt AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM emb),
        scored AS (
            SELECT a.id AS src, b.id AS dst,
                   ROW_NUMBER() OVER (
                       PARTITION BY a.id
                       ORDER BY ROUND(list_cosine_similarity(a.v, b.v), 6) DESC, b.id
                   ) AS rnk
            FROM emb a JOIN emb b ON a.id <> b.id
        ),
        edges AS (SELECT src, dst FROM scored WHERE rnk <= {k}),
        odeg AS (SELECT src, COUNT(*) AS odeg FROM edges GROUP BY src),
        e AS (SELECT edges.src, edges.dst, odeg.odeg FROM edges JOIN odeg USING (src)),
        r0 AS (SELECT id, 1.0 / cnt.n AS rank FROM emb CROSS JOIN cnt)
    """
    steps = []
    for i in range(iterations):
        steps.append(
            f"""
        , c{i} AS (
            SELECT e.dst, SUM(r{i}.rank / e.odeg) AS inflow
            FROM e JOIN r{i} ON e.src = r{i}.id GROUP BY e.dst
        ),
        r{i + 1} AS (
            SELECT emb.id,
                   (1 - {damping}) / cnt.n
                   + {damping} * COALESCE(c{i}.inflow, 0) AS rank
            FROM emb CROSS JOIN cnt LEFT JOIN c{i} ON emb.id = c{i}.dst
        )"""
        )
    tail = f"""
        SELECT id AS vec_id, ROUND(rank, 6) AS rank
        FROM r{iterations}
        ORDER BY vec_id
    """
    return head + "".join(steps) + tail


_PR_CAP = 300
_PR_K = 5
_PR_ITERS = 10


@register(
    "q122_pagerank_knn_graph",
    oracle=_pagerank_oracle_sql(_PR_ITERS, _PR_CAP, _PR_K, DAMPING),
    doc="PageRank centrality over the embedding k-NN similarity graph: the "
    "distributed iterative loop (join+agg per round, localCheckpoint "
    "lineage truncation) hash-checked against 10 UNROLLED iterations of "
    "straight-line DuckDB SQL.",
    bench=True,  # the iterative-workload bench representative (1.7x vs
    # the DuckDB unrolled-SQL oracle at sf0.1 — real data work, not floor)
    tags=("graph", "similarity", "iterative"),
)
def q122_pagerank_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = (
        load_tables(spark, sf_dir, ["embeddings"])["embeddings"]
        .filter(F.col("vec_id") < _PR_CAP)
        .select("vec_id", "embedding")
    )
    nodes = emb.select(F.col("vec_id").alias("id"))
    ranks = pagerank(nodes, knn_edges(emb, k=_PR_K), iterations=_PR_ITERS)
    return ranks.select(
        F.col("id").alias("vec_id"), F.round("rank", 6).alias("rank")
    ).orderBy("vec_id")
