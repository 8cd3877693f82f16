"""Probabilistic record linkage: the Fellegi-Sunter model (Fellegi &
Sunter 1969, "A Theory for Record Linkage") fitted by EM over agreement
patterns (Winkler 1988) — the model behind Splink and most production
entity-resolution scorers, re-expressed Spark-first.

Given candidate record pairs (from any blocking stage — linking.py's
block->verify machinery is the producer) with BINARY per-field
agreement columns, the model is a two-component mixture: a pair is a
true match with prior lambda; field agreements are independent
Bernoullis with P(agree | match) = m_k and P(agree | non-match) = u_k.
The posterior match probability of a pair depends ONLY on its
agreement PATTERN gamma in {0,1}^K — so:

* the corpus collapses to <= 2^K weighted pattern rows in ONE hash
  aggregate (the same skew firewall as train_bpe's word collapse and
  unigram's word table: a trillion candidate pairs become at most
  2^K rows before any model work);
* EM runs DRIVER-side on that tiny exact-integer table — bit-stable,
  no float shuffle order anywhere, so the python twin is EXACTLY equal
  (not merely allclose);
* scoring joins the fitted per-pattern posterior back as a BROADCAST
  map literal — pure JVM arithmetic, zero UDFs, whole-stage codegen.

K is capped (the pattern table must stay model-sized); Splink caps
comparison levels the same way.

No counterpart in the reference repo (it stops at triple extraction);
this is the canonicalization-stage scorer a production KG build runs
between blocking and connected components.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

_MAX_FIELDS = 16  # 2^16 pattern rows max — model-sized by construction
_EPS = 1e-9  # probability clamp: keeps EM off the 0/1 absorbing states


def agreement_patterns(
    pairs: DataFrame, field_cols: list[str]
) -> DataFrame:
    """Collapse candidate pairs to (gamma_1..gamma_K, n_pairs): one
    hash aggregate; output is <= 2^K rows."""
    if not field_cols:
        raise ValueError("fellegi_sunter: no comparison fields")
    if len(field_cols) > _MAX_FIELDS:
        raise ValueError(
            f"fellegi_sunter: {len(field_cols)} fields > {_MAX_FIELDS} "
            "(the pattern table must stay model-sized)"
        )
    gammas = [
        F.col(c).cast("int").alias(c) for c in field_cols
    ]
    return (
        pairs.select(*gammas)
        .groupBy(*field_cols)
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


def _em(
    patterns: list[tuple[tuple[int, ...], int]],
    k: int,
    n_iters: int,
    init_lambda: float,
    init_m: float,
    init_u: float,
) -> dict:
    """Exact driver-side EM on the weighted pattern table. Plain numpy
    over <= 2^K rows; deterministic given the integer counts."""
    G = np.array([g for g, _ in patterns], dtype=np.float64)  # [P, K]
    N = np.array([n for _, n in patterns], dtype=np.float64)  # [P]
    lam = float(init_lambda)
    m = np.full(k, float(init_m))
    u = np.full(k, float(init_u))
    loglik: list[float] = []
    for _ in range(n_iters):
        pm = np.prod(np.where(G == 1.0, m, 1.0 - m), axis=1)  # [P]
        pu = np.prod(np.where(G == 1.0, u, 1.0 - u), axis=1)
        num = lam * pm
        den = num + (1.0 - lam) * pu
        loglik.append(float((N * np.log(den)).sum()))
        w = num / den  # posterior match prob per pattern
        nm = (N * w).sum()
        nu = (N * (1.0 - w)).sum()
        lam = min(max(nm / N.sum(), _EPS), 1.0 - _EPS)
        m = np.clip((N * w) @ G / nm, _EPS, 1.0 - _EPS)
        u = np.clip((N * (1.0 - w)) @ G / nu, _EPS, 1.0 - _EPS)
    pm = np.prod(np.where(G == 1.0, m, 1.0 - m), axis=1)
    pu = np.prod(np.where(G == 1.0, u, 1.0 - u), axis=1)
    post = lam * pm / (lam * pm + (1.0 - lam) * pu)
    return {
        "lambda": lam,
        "m": m.tolist(),
        "u": u.tolist(),
        "loglik": loglik,
        "posteriors": {
            tuple(int(x) for x in g): float(p)
            for (g, _), p in zip(patterns, post)
        },
    }


def fellegi_sunter_fit(
    pairs: DataFrame,
    field_cols: list[str],
    n_iters: int = 20,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Fit the Fellegi-Sunter mixture. Returns {"lambda", "m", "u",
    "loglik", "posteriors": {gamma_tuple: P(match | gamma)},
    "fields"}. The distributed work is ONE aggregate; the EM recursion
    is a pure function of the exact integer pattern counts, so
    distributed and twin results are bit-identical."""
    pats = agreement_patterns(pairs, field_cols).collect()
    if not pats:
        raise ValueError("fellegi_sunter: no candidate pairs")
    plist = sorted(
        (tuple(int(r[c]) for c in field_cols), int(r.n_pairs))
        for r in pats
    )
    out = _em(
        plist, len(field_cols), n_iters, init_lambda, init_m, init_u
    )
    out["fields"] = list(field_cols)
    return out


def fellegi_sunter_fit_python(
    pair_rows: list[tuple[int, ...]],
    k: int,
    n_iters: int = 20,
    init_lambda: float = 0.1,
    init_m: float = 0.9,
    init_u: float = 0.1,
) -> dict:
    """Flat twin: same pattern collapse, same EM. Bit-identical to the
    distributed fit (integer counts in, deterministic recursion)."""
    cnt: dict[tuple[int, ...], int] = {}
    for g in pair_rows:
        g = tuple(int(x) for x in g)
        cnt[g] = cnt.get(g, 0) + 1
    if not cnt:
        raise ValueError("fellegi_sunter: no candidate pairs")
    plist = sorted(cnt.items())
    return _em(plist, k, n_iters, init_lambda, init_m, init_u)


def fellegi_sunter_score(
    pairs: DataFrame, model: dict, out_col: str = "match_ppm"
) -> DataFrame:
    """Attach the fitted posterior to every candidate pair as an
    integer ppm column: the per-pattern posterior table is query-sized
    (<= 2^K), shipped as a broadcast map literal keyed on the packed
    gamma bits — pure JVM arithmetic, no UDF, no extra shuffle."""
    fields = model["fields"]
    key = None
    for i, c in enumerate(fields):
        bit = F.col(c).cast("long") * F.lit(1 << i)
        key = bit if key is None else key + bit
    entries = []
    for g, p in sorted(model["posteriors"].items()):
        packed = sum(b << i for i, b in enumerate(g))
        entries += [F.lit(packed), F.lit(int(round(p * 1_000_000)))]
    mp = F.create_map(*entries)
    return pairs.withColumn(out_col, mp[key].cast("long"))
