"""Graph operators: PageRank semantics on hand-computable graphs."""

from __future__ import annotations

from ai_batch_processing_spark.operators.graph import knn_edges, pagerank


def test_pagerank_two_node_cycle_is_uniform(spark):
    nodes = spark.createDataFrame([(1,), (2,)], "id long")
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ranks = {r.id: r.rank for r in pagerank(nodes, edges, iterations=10).collect()}
    # symmetric cycle: stationary distribution is uniform at every step
    assert abs(ranks[1] - 0.5) < 1e-12 and abs(ranks[2] - 0.5) < 1e-12


def test_pagerank_sink_hub_attracts_mass_and_total_is_conserved(spark):
    # 1→3, 2→3, 3→1: node 3 receives from two nodes, must out-rank 2
    nodes = spark.createDataFrame([(1,), (2,), (3,)], "id long")
    edges = spark.createDataFrame([(1, 3), (2, 3), (3, 1)], "src long, dst long")
    rows = pagerank(nodes, edges, iterations=20).collect()
    ranks = {r.id: r.rank for r in rows}
    assert ranks[3] > ranks[1] > ranks[2]
    assert abs(sum(ranks.values()) - 1.0) < 1e-9  # no dangling → mass conserved


def test_knn_edges_shape(spark):
    emb = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    e = knn_edges(emb, k=2).collect()
    assert len(e) == 12  # 6 nodes × 2 out-edges
    assert all(r.src != r.dst for r in e)
