"""procrustes_fit / apply / report (functions/distml.py): orthogonal
Procrustes alignment — numpy-twin equality, planted-rotation recovery,
partition invariance, degenerate inputs."""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.functions.distml import (
    procrustes_apply,
    procrustes_fit,
    procrustes_fit_numpy,
    procrustes_report,
)

P = "va array<double>, vb array<double>"


def _pairs_df(spark, A, B, parts=None):
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist()) for a, b in zip(A, B)], P
    )
    return df.repartition(parts) if parts else df


def test_fit_equals_numpy_twin(spark):
    rng = np.random.default_rng(3)
    A = rng.standard_normal((60, 8))
    B = rng.standard_normal((60, 8))
    W = np.asarray(procrustes_fit(_pairs_df(spark, A, B))["W"])
    assert np.allclose(W, procrustes_fit_numpy(A, B), atol=1e-9)
    # orthogonality
    assert np.allclose(W @ W.T, np.eye(8), atol=1e-9)


def test_planted_rotation_recovery(spark):
    rng = np.random.default_rng(5)
    A = rng.standard_normal((80, 6))
    R, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    B = A @ R
    model = procrustes_fit(_pairs_df(spark, A, B))
    assert model["n"] == 80
    assert np.allclose(np.asarray(model["W"]), R, atol=1e-8)


def test_partition_invariance(spark):
    rng = np.random.default_rng(11)
    A = rng.standard_normal((64, 5))
    B = rng.standard_normal((64, 5))
    w1 = np.asarray(procrustes_fit(_pairs_df(spark, A, B, parts=1))["W"])
    w7 = np.asarray(procrustes_fit(_pairs_df(spark, A, B, parts=7))["W"])
    assert np.allclose(w1, w7, atol=1e-9)


def test_apply_and_report(spark):
    rng = np.random.default_rng(13)
    A = rng.standard_normal((50, 4))
    R, _ = np.linalg.qr(rng.standard_normal((4, 4)))
    B = A @ R
    pairs = _pairs_df(spark, A, B)
    model = procrustes_fit(pairs)
    [row] = procrustes_report(pairs, model).collect()
    assert row.n_anchors == 50
    assert row.mean_cos_after_ppm >= 999_999
    assert row.mean_cos_after_ppm > row.mean_cos_before_ppm
    # apply keeps passthrough columns and rotates exactly
    src = spark.createDataFrame(
        [(1, A[0].tolist())], "id long, v array<double>"
    )
    [out] = procrustes_apply(src, model, "v").collect()
    assert out.id == 1
    assert np.allclose(
        np.asarray(out.v_aligned), A[0] @ np.asarray(model["W"]), atol=1e-12
    )


def test_width_mismatch_and_empty(spark):
    with pytest.raises(Exception, match="widths differ"):
        procrustes_fit(
            _pairs_df(
                spark,
                np.ones((3, 4)),
                [np.ones(5)] * 3,
            )
        )
    with pytest.raises(ValueError, match="no anchor rows"):
        procrustes_fit(spark.createDataFrame([], P))
    empty = procrustes_report(
        spark.createDataFrame([], P), {"W": np.eye(2)}
    )
    assert empty.count() == 0
