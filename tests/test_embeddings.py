"""Embedding analytics operators (operators/embeddings.py) on toy
vectors with hand-computable answers. Cross-engine parity is covered by
the oracle sweep (test_parity.py: emb_*); this checks the math."""

from __future__ import annotations

import math

from dqe_spark.operators import embeddings as E


def _toy(spark):
    # two labels, 2-dim: label 0 = {(1,0), (0,1)} -> centroid (0.5, 0.5)
    #                    label 1 = {(2,0)}        -> centroid (2, 0)
    rows = [
        (0, [1.0, 0.0]),
        (0, [0.0, 1.0]),
        (1, [2.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "label int, embedding array<float>")


def test_label_centroids(spark):
    out = {
        (r.label, r.pos): r.centroid
        for r in E.label_centroids(_toy(spark)).collect()
    }
    assert out == {(0, 0): 0.5, (0, 1): 0.5, (1, 0): 2.0, (1, 1): 0.0}


def test_norm_stats(spark):
    out = {r.label: r for r in E.norm_stats(_toy(spark)).collect()}
    assert out[0].n == 2 and out[1].n == 1
    assert out[0].min_norm == 1.0 and out[0].max_norm == 1.0
    assert out[0].rms_norm == 1.0  # both unit vectors
    assert out[1].min_norm == out[1].max_norm == out[1].rms_norm == 2.0


def test_centroid_cosine_pairs(spark):
    rows = E.centroid_cosine_pairs(_toy(spark)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.label_a, r.label_b) == (0, 1)
    # cos((0.5,0.5),(2,0)) = 1 / (sqrt(0.5)*2) = 0.7071...
    expect = round(1.0 / (math.sqrt(0.5) * 2.0), 4)
    assert abs(r.cos4 - expect) < 1e-9


def test_centroid_confusion(spark):
    """Toy assignment: centroids (0.5,0.5) and (2,0); vector (1.9,0.1)
    labeled 0 lands in label 1's cell; ties go to the smaller label."""
    rows = [
        (0, [1.0, 0.0]),
        (0, [0.0, 1.0]),
        (0, [1.9, 0.1]),
        (1, [2.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "label int, embedding array<float>")
    got = {
        (r.label, r.pred_label): r.n
        for r in E.centroid_confusion(df).collect()
    }
    # centroids: label0 mean = (0.9666667, 0.3666667), label1 = (2, 0)
    # (1,0): d0 = .1356, d1 = 1.0 -> 0 ; (0,1): d0 = 1.336, d1 = 5 -> 0
    # (1.9,.1): d0 = .942, d1 = .02 -> 1 ; (2,0): -> 1
    assert got == {(0, 0): 2, (0, 1): 1, (1, 1): 1}


def test_centroid_confusion_rejects_string_labels(spark):
    """String labels would inline as bare identifiers in the generated
    SQL — refused up front with a clear remedy."""
    import pytest

    df = spark.createDataFrame(
        [("a", [1.0, 0.0])], "label string, embedding array<float>"
    )
    with pytest.raises(TypeError, match="integral label"):
        E.centroid_confusion(df)


def test_covariance_matrix(spark):
    """Toy covariance: two samples (1,0) and (0,1) give var .25 per
    dim and cross-covariance -.25."""
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.0, 1.0])], "label int, embedding array<float>"
    )
    got = {
        (r.pos_i, r.pos_j): r.cov
        for r in E.covariance_matrix(df).collect()
    }
    assert got == {(0, 0): 0.25, (0, 1): -0.25, (1, 1): 0.25}


def test_deterministic_eigen_matches_numpy_and_guards():
    """deterministic_topk_eigen recovers numpy's eigh components
    (|cos| ≥ 0.999 per component) on a gapped spectrum, returns
    near-orthonormal 2^20-quantized vectors, and raises loudly when k
    exceeds the matrix rank (all-zero deflated matrix)."""
    import numpy as np
    import pytest

    rng = np.random.default_rng(11)
    A = rng.normal(size=(6, 6))
    C = A @ A.T  # symmetric PSD with generic gaps
    c12 = [[int(round(x * 1e12)) for x in row] for row in C]
    comps = E.deterministic_topk_eigen(c12, 3)
    P = np.array(comps, dtype=np.float64).T / 1048576.0
    w, V = np.linalg.eigh(C)
    for c in range(3):
        cos = abs(float(V[:, -1 - c] @ P[:, c]))
        assert cos >= 0.999, (c, cos)
    assert np.abs(P.T @ P - np.eye(3)).max() < 1e-4

    # rank-1 matrix: second component must fail loudly, not wander
    v = rng.normal(size=4)
    R1 = np.outer(v, v)
    c12r = [[int(round(x * 1e12)) for x in row] for row in R1]
    assert len(E.deterministic_topk_eigen(c12r, 1)) == 1
    with pytest.raises(ValueError, match="rank"):
        E.deterministic_topk_eigen(c12r, 3)


def test_pca_project_matches_numpy(spark):
    """Engine PCA == numpy PCA on the same rows: projections agree to
    float tolerance component-wise (deterministic sign rule), and
    projected variance is ordered by component."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(200, 6)).astype(np.float32)
    base[:, 0] *= 5.0  # dominant direction
    base[:, 1] *= 2.0
    rows = [(i, [float(x) for x in base[i]], 0) for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    out = {r.vec_id: list(r.proj) for r in E.pca_project(df, k=3).collect()}

    # numpy reference on the e6-quantized values (the engine's exact
    # covariance input), same sign rule
    X = np.round(base.astype(np.float64) * 1e6) / 1e6
    Xc = X - X.mean(axis=0)
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    P = []
    for c in range(1, 4):
        vec = V[:, -c]
        if vec[int(np.argmax(np.abs(vec)))] < 0:
            vec = -vec
        P.append(vec)
    # engine centers by exact e6 means and projects RAW (uncentered-
    # quantization) doubles; agree within covariance rounding tolerance
    want = (X - X.mean(axis=0)) @ np.array(P).T
    got = np.array([out[i] for i in range(200)])
    assert np.allclose(got, want, atol=1e-3)
    var = got.var(axis=0)
    assert var[0] >= var[1] >= var[2]
