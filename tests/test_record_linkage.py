"""Fellegi-Sunter probabilistic record linkage
(operators/record_linkage.py): twin bit-equality, EM parameter
recovery on a planted mixture, posterior monotonicity, scoring join."""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.operators.record_linkage import (
    agreement_patterns,
    fellegi_sunter_fit,
    fellegi_sunter_fit_python,
    fellegi_sunter_score,
)

FIELDS = ["g_name", "g_nation", "g_phone"]


def _planted_rows(n_match=400, n_non=3600, seed=7):
    """Mixture with known parameters: matches agree with p=(.95,.9,.8),
    non-matches with p=(.05,.2,.1)."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(n_match):
        rows.append(tuple(int(rng.random() < p) for p in (0.95, 0.9, 0.8)))
    for _ in range(n_non):
        rows.append(tuple(int(rng.random() < p) for p in (0.05, 0.2, 0.1)))
    return rows


def _pairs_df(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows], ", ".join(f"{c} int" for c in FIELDS)
    )


def test_twin_is_bit_identical(spark):
    rows = _planted_rows()
    m = fellegi_sunter_fit(_pairs_df(spark, rows), FIELDS, n_iters=15)
    t = fellegi_sunter_fit_python(rows, 3, n_iters=15)
    assert m["lambda"] == t["lambda"]  # exact: integer counts in,
    assert m["m"] == t["m"]            # deterministic recursion out
    assert m["u"] == t["u"]
    assert m["loglik"] == t["loglik"]
    assert m["posteriors"] == t["posteriors"]


def test_em_recovers_planted_mixture(spark):
    m = fellegi_sunter_fit(
        _pairs_df(spark, _planted_rows()), FIELDS, n_iters=40
    )
    assert 0.05 < m["lambda"] < 0.15  # true 0.1
    for got, want in zip(m["m"], (0.95, 0.9, 0.8)):
        assert abs(got - want) < 0.08, (got, want)
    for got, want in zip(m["u"], (0.05, 0.2, 0.1)):
        assert abs(got - want) < 0.08, (got, want)
    ll = m["loglik"]
    assert all(b >= a - 1e-9 for a, b in zip(ll, ll[1:]))  # EM monotone


def test_posterior_monotone_in_agreements(spark):
    m = fellegi_sunter_fit(
        _pairs_df(spark, _planted_rows()), FIELDS, n_iters=40
    )
    post = m["posteriors"]
    # adding an agreement never lowers the posterior (m_k > u_k here)
    for g, p in post.items():
        for i in range(3):
            if g[i] == 0:
                g2 = tuple(1 if j == i else b for j, b in enumerate(g))
                if g2 in post:
                    assert post[g2] >= p - 1e-12
    assert post[(1, 1, 1)] > 0.9
    assert post[(0, 0, 0)] < 0.05


def test_score_join_matches_model(spark):
    rows = _planted_rows(50, 450)
    df = _pairs_df(spark, rows)
    m = fellegi_sunter_fit(df, FIELDS, n_iters=10)
    scored = {
        tuple(r[c] for c in FIELDS): r.match_ppm
        for r in fellegi_sunter_score(df, m).distinct().collect()
    }
    for g, p in m["posteriors"].items():
        assert scored[g] == int(round(p * 1_000_000))


def test_pattern_collapse_and_contracts(spark):
    df = _pairs_df(spark, [(1, 0, 1), (1, 0, 1), (0, 0, 0)])
    pats = {
        (r.g_name, r.g_nation, r.g_phone): r.n_pairs
        for r in agreement_patterns(df, FIELDS).collect()
    }
    assert pats == {(1, 0, 1): 2, (0, 0, 0): 1}
    with pytest.raises(ValueError, match="no comparison fields"):
        fellegi_sunter_fit(df, [])
    with pytest.raises(ValueError, match="model-sized"):
        fellegi_sunter_fit(df, [f"f{i}" for i in range(17)])
    with pytest.raises(ValueError, match="no candidate pairs"):
        fellegi_sunter_fit(df.where("g_name = 99"), FIELDS)
