"""Distributed TransE (operators/kge.py): twin parity, partitioning
invariance, learning signal, deterministic init."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.kge import (
    _hash_init,
    transe_fit,
    transe_fit_numpy,
    transe_margin_eval,
)


def _toy_edges():
    """Two 10-entity cliques under 'likes' + a cross-cluster 'knows' fan:
    enough structure that translation vectors are learnable."""
    edges = []
    for c in range(2):
        base = c * 50
        for i in range(10):
            for j in range(10):
                if i != j:
                    edges.append((base + i, "likes", base + j))
    for i in range(10):
        edges.append((i, "knows", 100 + i))
    return edges


def _edges_df(spark, edges, partitions=None):
    df = spark.createDataFrame(
        [(s, p, o, 1, "c", 0) for s, p, o in edges],
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " n_evidence long, first_conv_id string, first_turn_idx int",
    )
    return df.repartition(partitions) if partitions else df


def test_transe_matches_numpy_twin(spark):
    """The distributed run and the flat twin execute the IDENTICAL
    recursion (same hash init, same md5 negatives, same full-batch GD);
    only float summation order differs."""
    edges = _toy_edges()
    m = transe_fit(_edges_df(spark, edges), dim=8, n_epochs=5, lr=0.5)
    t = transe_fit_numpy(edges, dim=8, n_epochs=5, lr=0.5)
    assert m["rel_index"] == t["rel_index"]
    assert np.allclose(m["loss"], t["loss"], rtol=1e-9, atol=1e-12)
    assert np.allclose(m["relations"], t["relations"], atol=1e-12)
    E = {r.entity_id: np.array(r.vec) for r in m["entities"].collect()}
    assert set(E) == set(t["entities"])
    for e, v in t["entities"].items():
        assert np.allclose(E[e], v, atol=1e-12)
    # entity rows are renormalized every epoch
    for v in E.values():
        assert abs(float(np.sqrt(v @ v)) - 1.0) < 1e-9


def test_transe_partitioning_invariant(spark):
    """Full-batch gradients are sums — the input split must not change
    the trajectory beyond summation-order noise."""
    edges = _toy_edges()
    m1 = transe_fit(_edges_df(spark, edges, partitions=2), dim=8, n_epochs=3)
    m17 = transe_fit(_edges_df(spark, edges, partitions=17), dim=8, n_epochs=3)
    assert np.allclose(m1["loss"], m17["loss"], rtol=1e-9)
    assert np.allclose(m1["relations"], m17["relations"], atol=1e-12)
    e1 = {r.entity_id: np.array(r.vec) for r in m1["entities"].collect()}
    e17 = {r.entity_id: np.array(r.vec) for r in m17["entities"].collect()}
    for e in e1:
        assert np.allclose(e1[e], e17[e], atol=1e-12)


def test_transe_multi_partition_gradients_sum_not_concat(spark):
    """With AQE coalescing disabled, an entity's gradient partials arrive
    from MANY shuffle partitions; they must be SUMMED per (entity, pos)
    before regrouping to a vector — a bare collect_list would concatenate
    them into a ragged array (regression: masked at toy scale because AQE
    coalesced the pair shuffle to one partition, crashed at sf0.1)."""
    edges = _toy_edges()
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        m = transe_fit(_edges_df(spark, edges, partitions=8), dim=8, n_epochs=3)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    t = transe_fit_numpy(edges, dim=8, n_epochs=3)
    assert np.allclose(m["loss"], t["loss"], rtol=1e-9, atol=1e-12)
    E = {r.entity_id: np.array(r.vec) for r in m["entities"].collect()}
    for e, v in t["entities"].items():
        assert np.allclose(E[e], v, atol=1e-12)


def test_transe_learns_margin_ranking(spark):
    """Training must beat the untrained init on margin ranking, and
    reach a solid accuracy on the structured toy graph — the smoke that
    gradients flow in the right direction through the whole distributed
    loop."""
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    init = transe_fit(df, dim=8, n_epochs=0)
    assert init["loss"] == []
    base = transe_margin_eval(init, df)
    base_acc = _micro_acc(base)
    trained = transe_fit(df, dim=8, n_epochs=25, lr=0.5)
    acc = _micro_acc(transe_margin_eval(trained, df))
    # loss decreases monotonically under full-batch GD at this lr
    assert all(
        b <= a + 1e-12 for a, b in zip(trained["loss"], trained["loss"][1:])
    )
    assert acc > base_acc
    assert acc >= 0.8


def _micro_acc(ev_df):
    rows = ev_df.collect()
    return sum(r.n_pos_better for r in rows) / sum(r.n_pairs for r in rows)


def test_transe_eval_schema_and_ppm(spark):
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    m = transe_fit(df, dim=4, n_epochs=1)
    ev = transe_margin_eval(m, df)
    assert ev.columns == ["predicate", "n_pairs", "n_pos_better", "acc_ppm"]
    for r in ev.collect():
        assert 0 <= r.n_pos_better <= r.n_pairs
        assert r.acc_ppm == r.n_pos_better * 1000000 // r.n_pairs


def test_transe_empty_input_raises(spark):
    df = _edges_df(spark, []).where(F.lit(False))
    with pytest.raises(Exception):
        transe_fit(df, dim=4, n_epochs=1)


def test_hash_init_deterministic_and_bounded():
    ids = np.array([-5, 0, 3, 2**62], dtype=np.int64)
    a = _hash_init(ids, 16, np.uint64(0xE17E5A17))
    b = _hash_init(ids, 16, np.uint64(0xE17E5A17))
    assert np.array_equal(a, b)
    # rows are unit-normalized
    assert np.allclose(np.sqrt((a * a).sum(axis=1)), 1.0)
    # different salts decorrelate
    c = _hash_init(ids, 16, np.uint64(0x4E1A7105))
    assert not np.allclose(a, c)


# --- DistMult + filtered link-prediction ranking -----------------------

from nlp_series_relation_extraction_spark.operators.kge import (  # noqa: E402
    distmult_fit,
    kge_fit_numpy,
    kge_margin_eval,
    kge_rank_eval,
    kge_rank_eval_numpy,
    link_prediction_metrics,
)


def test_distmult_matches_numpy_twin(spark):
    """Same identical-recursion pin as TransE, trilinear scorer: the
    gradient algebra (gS = w*(en-eo), gO = -w*es, gN = w*es,
    gW = es*(en-eo)) must agree between the Arrow pass and the twin."""
    edges = _toy_edges()
    m = distmult_fit(_edges_df(spark, edges), dim=8, n_epochs=5, lr=0.5)
    t = kge_fit_numpy(edges, scorer="distmult", dim=8, n_epochs=5, lr=0.5)
    assert m["scorer"] == "distmult"
    assert np.allclose(m["loss"], t["loss"], rtol=1e-9, atol=1e-12)
    assert np.allclose(m["relations"], t["relations"], atol=1e-12)
    E = {r.entity_id: np.array(r.vec) for r in m["entities"].collect()}
    for e, v in t["entities"].items():
        assert np.allclose(E[e], v, atol=1e-12)


def test_distmult_learns_margin_ranking(spark):
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    init = distmult_fit(df, dim=8, n_epochs=0)
    base_acc = _micro_acc(kge_margin_eval(init, df))
    # DistMult needs a hotter schedule than TransE here: the trilinear
    # score moves slowly under unit-norm entities (twin-measured: 0.62
    # at lr=0.5/25ep, 0.93 at lr=2.0/25ep)
    trained = distmult_fit(df, dim=8, n_epochs=25, lr=2.0)
    acc = _micro_acc(kge_margin_eval(trained, df))
    assert acc > base_acc
    assert acc >= 0.8


def test_kge_fit_rejects_unknown_scorer(spark):
    df = _edges_df(spark, _toy_edges())
    with pytest.raises(ValueError, match="unknown scorer"):
        from nlp_series_relation_extraction_spark.operators.kge import kge_fit

        kge_fit(df, scorer="quaternion")
    with pytest.raises(ValueError, match="unknown scorer"):
        kge_fit_numpy(_toy_edges(), scorer="quaternion")


def _rank_df_to_dict(df):
    return {
        (r.subj_entity_id, r.predicate, r.obj_entity_id): r.rank
        for r in df.collect()
    }


@pytest.mark.parametrize("scorer", ["transe", "distmult", "rotate", "complex"])
def test_rank_eval_matches_numpy_twin(spark, scorer):
    """Distributed filtered ranks == twin ranks EXACTLY (integers): same
    md5 test sample, same strictly-better rule, same by-ID self-
    exclusion, same filtered correction."""
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    m = kge_fit(df, scorer=scorer, dim=8, n_epochs=4, lr=0.5)
    t = kge_fit_numpy(edges, scorer=scorer, dim=8, n_epochs=4, lr=0.5)
    got = _rank_df_to_dict(kge_rank_eval(m, df, max_test=120, chunk=16))
    want = kge_rank_eval_numpy(edges, t, max_test=120)
    assert got == want
    assert got, "md5 sample selected no test triples"
    n_ents = len({s for s, _, _ in edges} | {o for _, _, o in edges})
    assert all(1 <= r <= n_ents for r in got.values())


def test_rank_eval_chunk_invariant(spark):
    """Counts are decomposable over chunks — the chunk size must not
    change any rank."""
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    m = transe_fit(df, dim=8, n_epochs=2)
    a = _rank_df_to_dict(kge_rank_eval(m, df, max_test=60, chunk=7))
    b = _rank_df_to_dict(kge_rank_eval(m, df, max_test=60, chunk=10_000))
    assert a == b and a


def test_rank_eval_filtered_leq_raw(spark):
    """Filtering removes known-true competitors, so filtered rank <= raw
    rank everywhere; on the clique graph (9 true objects per (s, likes))
    it must strictly help somewhere."""
    edges = _toy_edges()
    df = _edges_df(spark, edges)
    m = transe_fit(df, dim=8, n_epochs=8, lr=0.5)
    filt = _rank_df_to_dict(kge_rank_eval(m, df, max_test=120, filtered=True))
    raw = _rank_df_to_dict(kge_rank_eval(m, df, max_test=120, filtered=False))
    assert set(filt) == set(raw)
    assert all(filt[k] <= raw[k] for k in filt)
    assert any(filt[k] < raw[k] for k in filt)


def test_link_prediction_metrics_math(spark):
    ranks = spark.createDataFrame(
        [(1, "p", 2, 1), (1, "p", 3, 4), (2, "q", 3, 12)],
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " rank long",
    )
    rows = {r.predicate: r for r in link_prediction_metrics(ranks).collect()}
    assert rows["p"].n_test == 2
    assert rows["p"].mrr_ppm == int((1.0 + 0.25) / 2 * 1e6)
    assert rows["p"].hits1_ppm == 500000
    assert rows["p"].hits3_ppm == 500000
    assert rows["p"].hits10_ppm == 1000000
    assert rows["q"].hits10_ppm == 0
    allr = rows["__all__"]
    assert allr.n_test == 3
    assert allr.mrr_ppm == int((1.0 + 0.25 + 1 / 12) / 3 * 1e6)


def test_rank_eval_holdout_matches_twin_and_drops_unseen(spark):
    """Held-out protocol: fit on a train split, rank test triples; the
    distributed run must equal the twin EXACTLY, including dropping
    test triples with entities/relations the fit never saw."""
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    edges = _toy_edges()
    train = [e for i, e in enumerate(edges) if i % 5 != 0]
    test = [e for i, e in enumerate(edges) if i % 5 == 0]
    # plant an unseen entity and an unseen relation in the test split
    test += [(999, "likes", 0), (0, "unseen_rel", 1)]
    m = transe_fit(_edges_df(spark, train), dim=8, n_epochs=3)
    t = kge_fit_numpy(train, scorer="transe", dim=8, n_epochs=3)
    got = _rank_df_to_dict(
        kge_rank_eval(
            m,
            _edges_df(spark, train),
            max_test=10_000,
            chunk=16,
            test_edges=_edges_df(spark, test),
        )
    )
    want = kge_rank_eval_numpy(train, t, max_test=10_000, test_list=test)
    assert got == want and got
    assert (999, "likes", 0) not in got
    assert (0, "unseen_rel", 1) not in got
    # every surviving key is a held-out triple, none from train
    assert set(got) <= set(test)


# --- RotatE -------------------------------------------------------------


def test_rotate_matches_numpy_twin(spark):
    """Complex-rotation scorer (Sun 2019): phase-relation init, rotation
    gradients, and the no-entity-renorm schedule must all agree with the
    twin recursion."""
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    edges = _toy_edges()
    m = kge_fit(_edges_df(spark, edges), scorer="rotate", dim=8,
                n_epochs=4, lr=0.5)
    t = kge_fit_numpy(edges, scorer="rotate", dim=8, n_epochs=4, lr=0.5)
    assert np.allclose(m["loss"], t["loss"], rtol=1e-9, atol=1e-12)
    assert np.allclose(m["relations"], t["relations"], atol=1e-12)
    E = {r.entity_id: np.array(r.vec) for r in m["entities"].collect()}
    for e, v in t["entities"].items():
        assert np.allclose(E[e], v, atol=1e-12)
    # rotate does NOT renormalize entities — norms drift off 1.0
    assert any(abs(float(np.sqrt(v @ v)) - 1.0) > 1e-9 for v in E.values())


def test_rotate_gradients_finite_difference():
    """Pure-numpy FD check of the rotation gradient algebra (hinge wrt
    subject/object/negative/phases) at 1e-5."""
    from nlp_series_relation_extraction_spark.operators.kge import (
        _margin_grads,
        _score_rows,
    )

    rng = np.random.default_rng(7)
    dim, n = 8, 4
    ES, EO, EN = rng.normal(size=(3, n, dim))
    WR = np.zeros((n, dim))
    WR[:, : dim // 2] = rng.uniform(-np.pi, np.pi, (n, dim // 2))

    def hinge(ES, EO, EN, WR):
        return (
            1.0
            - _score_rows("rotate", ES, WR, EO)
            + _score_rows("rotate", ES, WR, EN)
        )

    h, gS, gO, gN, gW = _margin_grads("rotate", ES, EO, EN, WR, 1.0)
    assert np.allclose(h, hinge(ES, EO, EN, WR))
    eps = 1e-6
    for which, X, G in (("S", ES, gS), ("O", EO, gO), ("N", EN, gN),
                        ("W", WR, gW)):
        num = np.zeros_like(X)
        for i in range(n):
            for j in range(dim):
                up, dn = X.copy(), X.copy()
                up[i, j] += eps
                dn[i, j] -= eps
                a = {"S": (up, EO, EN, WR), "O": (ES, up, EN, WR),
                     "N": (ES, EO, up, WR), "W": (ES, EO, EN, up)}[which]
                b = {"S": (dn, EO, EN, WR), "O": (ES, dn, EN, WR),
                     "N": (ES, EO, dn, WR), "W": (ES, EO, EN, dn)}[which]
                num[i, j] = (hinge(*a)[i] - hinge(*b)[i]) / (2 * eps)
        assert np.allclose(num, G, atol=1e-5), which


def test_rotate_learns_and_rejects_odd_dim(spark):
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    edges = _toy_edges()
    df = _edges_df(spark, edges)
    init = kge_fit(df, scorer="rotate", dim=8, n_epochs=0)
    base = _micro_acc(kge_margin_eval(init, df))
    trained = kge_fit(df, scorer="rotate", dim=8, n_epochs=25, lr=0.5)
    acc = _micro_acc(kge_margin_eval(trained, df))
    assert acc > base and acc >= 0.8
    with pytest.raises(ValueError, match="even dim"):
        kge_fit(df, scorer="rotate", dim=7)
    with pytest.raises(ValueError, match="even dim"):
        kge_fit_numpy(edges, scorer="rotate", dim=7)


# --- ComplEx ------------------------------------------------------------


def test_complex_matches_numpy_twin(spark):
    """Trilinear-in-C^d scorer (Trouillon 2016): hash init, complex
    product gradients, and the DistMult renorm schedule must all agree
    with the twin recursion."""
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    edges = _toy_edges()
    m = kge_fit(_edges_df(spark, edges), scorer="complex", dim=8,
                n_epochs=4, lr=2.0)
    t = kge_fit_numpy(edges, scorer="complex", dim=8, n_epochs=4, lr=2.0)
    assert np.allclose(m["loss"], t["loss"], rtol=1e-9, atol=1e-12)
    assert np.allclose(m["relations"], t["relations"], atol=1e-12)
    E = {r.entity_id: np.array(r.vec) for r in m["entities"].collect()}
    for e, v in t["entities"].items():
        assert np.allclose(E[e], v, atol=1e-12)
    # complex DOES renormalize entities (the DistMult schedule)
    assert all(abs(float(np.sqrt(v @ v)) - 1.0) < 1e-9 for v in E.values())


def test_complex_gradients_finite_difference():
    """Pure-numpy FD check of the complex-product gradient algebra
    (hinge wrt subject/object/negative/relation) at 1e-5."""
    from nlp_series_relation_extraction_spark.operators.kge import (
        _margin_grads,
        _score_rows,
    )

    rng = np.random.default_rng(11)
    dim, n = 8, 4
    ES, EO, EN, WR = rng.normal(size=(4, n, dim))

    def hinge(ES, EO, EN, WR):
        return (
            1.0
            - _score_rows("complex", ES, WR, EO)
            + _score_rows("complex", ES, WR, EN)
        )

    h, gS, gO, gN, gW = _margin_grads("complex", ES, EO, EN, WR, 1.0)
    assert np.allclose(h, hinge(ES, EO, EN, WR))
    eps = 1e-6
    for which, X, G in (("S", ES, gS), ("O", EO, gO), ("N", EN, gN),
                        ("W", WR, gW)):
        num = np.zeros_like(X)
        for i in range(n):
            for j in range(dim):
                up, dn = X.copy(), X.copy()
                up[i, j] += eps
                dn[i, j] -= eps
                a = {"S": (up, EO, EN, WR), "O": (ES, up, EN, WR),
                     "N": (ES, EO, up, WR), "W": (ES, EO, EN, up)}[which]
                b = {"S": (dn, EO, EN, WR), "O": (ES, dn, EN, WR),
                     "N": (ES, EO, dn, WR), "W": (ES, EO, EN, dn)}[which]
                num[i, j] = (hinge(*a)[i] - hinge(*b)[i]) / (2 * eps)
        assert np.allclose(num, G, atol=1e-5), which


def test_complex_scores_antisymmetric_unlike_distmult():
    """The reason ComplEx exists: DistMult's trilinear product is
    symmetric in (s, o) — it CANNOT rank (s,r,o) above (o,r,s) — while
    ComplEx's conj(o) breaks the exchange symmetry. Kernel-level check
    on random vectors."""
    from nlp_series_relation_extraction_spark.operators.kge import (
        _score_rows,
    )

    rng = np.random.default_rng(3)
    ES, EO, WR = rng.normal(size=(3, 16, 8))
    dm_fwd = _score_rows("distmult", ES, WR, EO)
    dm_rev = _score_rows("distmult", EO, WR, ES)
    assert np.allclose(dm_fwd, dm_rev)  # DistMult: provably symmetric
    cx_fwd = _score_rows("complex", ES, WR, EO)
    cx_rev = _score_rows("complex", EO, WR, ES)
    assert not np.allclose(cx_fwd, cx_rev)
    # conj identity: swapping s/o equals conjugating the relation
    WR_conj = np.concatenate([WR[:, :4], -WR[:, 4:]], axis=1)
    assert np.allclose(cx_rev, _score_rows("complex", ES, WR_conj, EO))


def test_complex_learns_and_rejects_odd_dim(spark):
    from nlp_series_relation_extraction_spark.operators.kge import kge_fit

    edges = _toy_edges()
    df = _edges_df(spark, edges)
    init = kge_fit(df, scorer="complex", dim=8, n_epochs=0)
    base = _micro_acc(kge_margin_eval(init, df))
    trained = kge_fit(df, scorer="complex", dim=8, n_epochs=25, lr=2.0)
    acc = _micro_acc(kge_margin_eval(trained, df))
    assert acc > base and acc >= 0.8
    with pytest.raises(ValueError, match="even dim"):
        kge_fit(df, scorer="complex", dim=7)
    with pytest.raises(ValueError, match="even dim"):
        kge_fit_numpy(edges, scorer="complex", dim=7)


def test_link_prediction_threaded_equals_serial(spark):
    """The driver query submits the four scorer pipelines from a
    thread pool (concurrent Spark jobs). Every lineage is unchanged, so
    the result must be BYTE-identical to the serial composition — this
    pins it, so a thread-safety regression (shared mutable state
    sneaking into kge_fit, a scorer reading another's model) fails
    loudly instead of shipping nondeterminism."""
    from pyspark.sql import functions as F

    from nlp_series_relation_extraction_spark.operators.kge import (
        kge_fit,
        kge_pairs,
        kge_rank_eval,
        link_prediction_metrics,
    )
    from nlp_series_relation_extraction_spark.plans import queries as Q

    sf = "/root/testdata/sf0.001"
    threaded = (
        Q.queries()["kg_link_prediction"](spark, sf).collect()
    )

    edges = Q._hierarchy_edges(spark, sf).localCheckpoint(eager=True)
    pairs = kge_pairs(edges).localCheckpoint(eager=True)
    out = None
    for scorer, lr in (
        ("transe", 0.5),
        ("distmult", 2.0),
        ("rotate", 0.5),
        ("complex", 2.0),
    ):
        ranks = kge_rank_eval(
            kge_fit(edges, scorer=scorer, dim=8, n_epochs=3, lr=lr,
                    pairs=pairs),
            edges,
            max_test=800,
            chunk=1024,
        )
        m = link_prediction_metrics(ranks).withColumn(
            "scorer", F.lit(scorer)
        )
        out = m if out is None else out.unionByName(m)
    serial = out.orderBy("scorer", "predicate").collect()

    assert [tuple(r) for r in threaded] == [tuple(r) for r in serial]
