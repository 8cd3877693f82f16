"""Triple classification (operators/kge.py:kge_triple_classification):
identical-recursion numpy twin of the full protocol (md5 split and
corruption, per-row scoring, threshold selection with tie and
all-negative-baseline rules, test classification) run on the SAME
collected model, plus behavior checks on a separable planted graph."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.kge import (
    _score_rows,
    kge_triple_classification,
    transe_fit,
)


def _edges_df(spark, triples):
    return spark.createDataFrame(
        triples,
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _collect_model(model):
    E = {
        r.entity_id: np.asarray(r.vec)
        for r in model["entities"].collect()
    }
    return E, model["relations"], model["rel_index"], model["scorer"]


def _twin(E, W, rel_index, scorer, triples, n_neg=1):
    ents = sorted(
        {s for s, _, _ in triples} | {o for _, _, o in triples}
    )
    n_ents = len(ents)
    labeled = []  # (predicate, is_valid, score, label)
    for s, p, o in triples:
        frac = (
            int(
                hashlib.md5(f"{s}|{p}|{o}|tcsplit".encode()).hexdigest()[:7],
                16,
            )
            / 268435456.0
        )
        is_valid = frac < 0.5
        r = rel_index.index(p)
        sp = float(
            _score_rows(scorer, E[s][None, :], W[r][None, :], E[o][None, :])[0]
        )
        for i in range(n_neg):
            h = hashlib.md5(f"{s}|{p}|{o}|{i}".encode()).hexdigest()[:7]
            neg = ents[int(h, 16) % n_ents]
            if neg == o:
                continue
            sn = float(
                _score_rows(
                    scorer, E[s][None, :], W[r][None, :], E[neg][None, :]
                )[0]
            )
            labeled.append((p, is_valid, sp, 1))
            labeled.append((p, is_valid, sn, 0))
    out = {}
    preds = sorted({p for p, _, _, _ in labeled})
    for p in preds:
        valid = [(sc, lb) for q, v, sc, lb in labeled if q == p and v]
        test = [(sc, lb) for q, v, sc, lb in labeled if q == p and not v]
        by_score = {}
        for sc, lb in valid:
            np_, nn_ = by_score.get(sc, (0, 0))
            by_score[sc] = (np_ + lb, nn_ + (1 - lb))
        tot_neg = sum(nn for _, nn in by_score.values())
        cum_pos = cum_neg = 0
        best = None  # (acc, score)
        for sc in sorted(by_score, reverse=True):
            np_, nn_ = by_score[sc]
            cum_pos += np_
            cum_neg += nn_
            acc = cum_pos + tot_neg - cum_neg
            if best is None or (acc, sc) > best:
                best = (acc, sc)
        thr = None
        if best is not None and best[0] > tot_neg:
            thr = best[1]
        n_correct = 0
        for sc, lb in test:
            pred = 1 if (thr is not None and sc >= thr) else 0
            n_correct += int(pred == lb)
        out[p] = {
            "threshold": thr,
            "n_valid": len(valid),
            "n_test": len(test),
            "n_correct": n_correct,
            "acc_ppm": (n_correct * 1_000_000) // len(test)
            if test
            else None,
        }
    return out


TRIPLES = [
    # a separable structure: relation 'likes' fans a block of subjects
    # onto a tight object cluster, 'avoids' onto a disjoint one
    *[(s, "likes", 100 + s % 3) for s in range(20)],
    *[(s, "avoids", 200 + s % 2) for s in range(20, 36)],
]


class TestTripleClassification:
    def test_matches_numpy_twin_exactly(self, spark):
        edges = _edges_df(spark, TRIPLES).localCheckpoint(eager=True)
        model = transe_fit(edges, dim=8, n_epochs=5, lr=0.5)
        got = {
            r.predicate: r.asDict()
            for r in kge_triple_classification(model, edges).collect()
        }
        E, W, rel_index, scorer = _collect_model(model)
        want = _twin(E, W, rel_index, scorer, TRIPLES)
        assert set(got) == set(want)
        for p in want:
            g, w = got[p], want[p]
            assert g["n_valid"] == w["n_valid"], p
            assert g["n_test"] == w["n_test"], p
            assert g["n_correct"] == w["n_correct"], p
            assert g["acc_ppm"] == w["acc_ppm"], p
            if w["threshold"] is None:
                assert g["threshold"] is None, p
            else:
                assert abs(g["threshold"] - w["threshold"]) < 1e-12, p

    def test_trained_model_beats_coin_flip(self, spark):
        edges = _edges_df(spark, TRIPLES).localCheckpoint(eager=True)
        model = transe_fit(edges, dim=8, n_epochs=8, lr=0.5)
        rows = kge_triple_classification(model, edges).collect()
        total = sum(r.n_test for r in rows)
        correct = sum(r.n_correct for r in rows)
        assert total > 0
        assert correct / total > 0.6  # separable plant, lenient floor

    def test_partitioning_invariant(self, spark):
        edges = _edges_df(spark, TRIPLES)
        model = transe_fit(
            edges.localCheckpoint(eager=True), dim=8, n_epochs=3, lr=0.5
        )
        a = sorted(
            map(tuple, kge_triple_classification(
                model, edges.repartition(7)
            ).collect())
        )
        b = sorted(
            map(tuple, kge_triple_classification(
                model, edges.coalesce(1)
            ).collect())
        )
        assert a == b
