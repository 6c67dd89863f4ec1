"""Portable PCA power iteration (q230): direction quality, determinism."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ai_batch_processing_spark.operators.linalg import pca_top_component


def _planted_corpus(spark, n=120, dim=6, seed=3):
    """Gaussian cloud stretched 8x along a planted unit direction."""
    rng = np.random.default_rng(seed)
    u = rng.normal(size=dim)
    u /= np.linalg.norm(u)
    x = rng.normal(size=(n, dim)) + 8.0 * np.outer(rng.normal(size=n), u)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        u,
    )


def test_pca_recovers_planted_direction(spark):
    emb, u = _planted_corpus(spark)
    out = pca_top_component(emb, n_iter=6)
    comp = np.array([r.component for r in out.orderBy("pos").collect()])
    # direction recovered up to sign
    assert abs(float(comp @ u)) > 0.99
    # unit norm (up to the 6dp component rounding)
    assert np.linalg.norm(comp) == pytest.approx(1.0, abs=1e-4)
    # the stretched direction dominates: most variance captured
    share = out.first().var_share
    assert 0.8 < share <= 1.0


def test_pca_matches_numpy_eigenvector(spark):
    emb, _ = _planted_corpus(spark, n=80, dim=5, seed=11)
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r.embedding for r in rows])
    c = x - x.mean(axis=0)
    evals, evecs = np.linalg.eigh(c.T @ c)
    top = evecs[:, -1]
    comp = np.array(
        [r.component for r in pca_top_component(emb, n_iter=8).orderBy("pos").collect()]
    )
    assert abs(float(comp @ top)) > 0.999


def test_pca_partition_invariant_and_validates(spark):
    emb, _ = _planted_corpus(spark, n=60, dim=4, seed=5)
    c1 = [(r.pos, r.component, r.var_share) for r in pca_top_component(emb).orderBy("pos").collect()]
    c2 = [
        (r.pos, r.component, r.var_share)
        for r in pca_top_component(emb.repartition(7)).orderBy("pos").collect()
    ]
    assert c1 == c2  # 6dp-rounded decisions → layout-invariant
    with pytest.raises(ValueError, match="n_iter"):
        pca_top_component(emb, n_iter=0)
    empty = emb.filter(F.lit(False))
    with pytest.raises(ValueError, match="empty"):
        pca_top_component(empty)


def test_pca_components_orthogonal_and_match_numpy_top2(spark):
    emb, _ = _planted_corpus(spark, n=100, dim=6, seed=21)
    from ai_batch_processing_spark.operators.linalg import pca_components

    mu, comps = pca_components(emb, n_components=2, n_iter=8)
    v1, v2 = comps
    assert abs(float(v1 @ v2)) < 1e-4  # re-orthogonalized
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r.embedding for r in rows])
    c = x - x.mean(axis=0)
    _, evecs = np.linalg.eigh(c.T @ c)
    assert abs(float(v1 @ evecs[:, -1])) > 0.99
    assert abs(float(v2 @ evecs[:, -2])) > 0.98


def test_pca_project_reconstruction_improves_with_components(spark):
    emb, _ = _planted_corpus(spark, n=80, dim=5, seed=9)
    from ai_batch_processing_spark.operators.linalg import (
        pca_components,
        pca_project,
    )

    mu, comps = pca_components(emb, n_components=2, n_iter=6)
    proj = {r.vec_id: (r.pc1, r.pc2) for r in pca_project(emb, mu, comps).collect()}
    rows = emb.orderBy("vec_id").collect()
    x = np.array([r.embedding for r in rows])
    c = x - mu
    # residual after removing pc1 then pc2 shrinks monotonically
    r0 = float((c**2).sum())
    c1 = c - np.outer([proj[r.vec_id][0] for r in rows], comps[0])
    r1 = float((c1**2).sum())
    c2 = c1 - np.outer([proj[r.vec_id][1] for r in rows], comps[1])
    r2 = float((c2**2).sum())
    assert r1 < 0.9 * r0 and r2 < r1
    # pc1 equals the centered dot with v1 (6dp)
    want = np.round(c @ comps[0], 6)
    got = np.array([proj[r.vec_id][0] for r in rows])
    assert np.allclose(got, want, atol=2e-6)


def test_pca_residual_norm_flags_planted_off_manifold_outlier(spark):
    from ai_batch_processing_spark.operators.linalg import (
        pca_components,
        pca_project,
    )

    # corpus living (almost) exactly in a 2-D subspace — the top-2 basis
    # explains normal rows to ~noise level, so reconstruction error is a
    # clean anomaly score; the outlier leaves the subspace by 3.0
    rng = np.random.default_rng(17)
    a, b = rng.normal(size=60), rng.normal(size=60)
    noise = 0.01 * rng.normal(size=(60, 6))
    u1 = np.array([1.0, 0, 0, 0, 0, 0])
    u2 = np.array([0, 1.0, 0, 0, 0, 0])
    x = np.outer(4 * a, u1) + np.outer(2 * b, u2) + noise
    rows = [(i, [float(v) for v in x[i]]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out_row = spark.createDataFrame(
        [(999, [1.0, 0.5, 3.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    corpus = emb.union(out_row)
    mu, comps = pca_components(corpus, n_components=2, n_iter=6)
    proj = pca_project(corpus, mu, comps, residual_norm=True)
    top = proj.orderBy(F.desc("resid_norm")).first()
    assert top.vec_id == 999  # the planted off-manifold row ranks first


def test_isotropy_identical_vs_orthogonal(spark):
    """Identical unit vectors: mean pairwise dot = 1, anisotropy = 1.
    An orthonormal pair: mean pairwise dot = 0."""
    from ai_batch_processing_spark.operators.linalg import embedding_isotropy

    same = spark.createDataFrame(
        [(i, [1.0, 0.0]) for i in range(4)], "vec_id long, embedding array<double>"
    )
    out = embedding_isotropy(same).collect()[0]
    assert (out.n_vecs, out.dim) == (4, 2)
    assert out.mean_norm == 1.0 and out.mean_sq_norm == 1.0
    assert out.mean_pair_dot == 1.0 and out.anisotropy == 1.0

    ortho = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out2 = embedding_isotropy(ortho).collect()[0]
    assert out2.mean_pair_dot == 0.0 and out2.anisotropy == 0.0
