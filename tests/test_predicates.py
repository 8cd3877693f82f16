"""Open-predicate canonicalization (operators/predicates.py): paraphrase
clustering by argument-pair overlap — planted merges, negative controls,
the stop-pair skew firewall, threshold boundaries, rewrite semantics, and
partitioning invariance. The driver query's DuckDB twin
(kg_predicate_canon) is executed by tests/test_oracle_crosscheck.py like
every other oracle."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.predicates import (
    canonicalize_predicates,
    predicate_paraphrase_edges,
)


def _claims(spark, rows):
    return spark.createDataFrame(
        rows, "subject string, predicate string, object_val string"
    )


def _family(pred, pairs):
    return [(s, pred, o) for s, o in pairs]


def test_paraphrase_family_merges_and_disjoint_stays_apart(spark):
    """Two surface forms over the same argument pairs merge (canonical =
    lexicographic min); a predicate with disjoint arguments stays its
    own cluster even when it shares an argument VALUE."""
    pairs = [(f"e{i}", f"v{i % 3}") for i in range(9)]
    rows = (
        _family("made_by", pairs)
        + _family("madeBy", pairs[:8])  # near-identical arg set
        + _family("located_in", [(f"x{i}", f"v{i % 3}") for i in range(9)])
    )
    res = canonicalize_predicates(_claims(spark, rows), threshold=0.5)
    m = {
        r["predicate"]: (r["canonical_predicate"], r["cluster_size"])
        for r in res["mapping"].collect()
    }
    assert m["made_by"] == ("madeBy", 2)  # 'madeBy' < 'made_by'
    assert m["madeBy"] == ("madeBy", 2)
    assert m["located_in"] == ("located_in", 1)
    assert res["n_clusters"] == 2


def test_transitive_chain_closes_into_one_cluster(spark):
    """A overlaps B, B overlaps C, but A and C share nothing directly:
    connected components still put all three in one cluster."""
    pa = [(f"e{i}", "o") for i in range(6)]
    pb = [(f"e{i}", "o") for i in range(3, 9)]
    pc = [(f"e{i}", "o") for i in range(6, 12)]
    rows = _family("alpha", pa) + _family("beta", pb) + _family("gamma", pc)
    res = canonicalize_predicates(
        _claims(spark, rows), threshold=0.3, min_shared=2
    )
    canon = {
        r["predicate"]: r["canonical_predicate"]
        for r in res["mapping"].collect()
    }
    assert canon == {"alpha": "alpha", "beta": "alpha", "gamma": "alpha"}


def test_stop_pair_cap_is_the_skew_firewall(spark):
    """One promiscuous argument pair asserted by MANY predicates creates
    no evidence once it exceeds max_pair_preds — with the cap raised the
    same input merges everything. (At scale this bounds the evidence
    self-join's per-key fan-out; here it pins the semantics.)"""
    preds = [f"p{i:02d}" for i in range(10)]
    rows = [("hub_s", p, "hub_o") for p in preds]
    # every predicate also has one private pair (so sizes differ from 1)
    rows += [(f"s_{p}", p, f"o_{p}") for p in preds]
    capped = canonicalize_predicates(
        _claims(spark, rows), min_shared=1, threshold=0.1, max_pair_preds=8
    )
    assert capped["n_clusters"] == 10  # hub pair dropped -> no edges
    merged = canonicalize_predicates(
        _claims(spark, rows), min_shared=1, threshold=0.1, max_pair_preds=20
    )
    assert merged["n_clusters"] == 1


def test_jaccard_threshold_boundary_inclusive(spark):
    """shared=1, sizes 2 and 2 -> jaccard = 1/3: a >= threshold of
    exactly 1/3 (in ppm) keeps the edge, just above drops it. Pinned in
    integer ppm — the same arithmetic the DuckDB twin runs."""
    rows = (
        _family("a_pred", [("s1", "o1"), ("s2", "o2")])
        + _family("b_pred", [("s1", "o1"), ("s3", "o3")])
    )
    at = predicate_paraphrase_edges(
        _claims(spark, rows), min_shared=1, threshold=0.333333
    ).collect()
    assert len(at) == 1 and at[0]["jaccard_ppm"] == 333333
    above = predicate_paraphrase_edges(
        _claims(spark, rows), min_shared=1, threshold=0.333334
    ).collect()
    assert above == []


def test_min_shared_floor(spark):
    """A single shared pair never links predicates at min_shared=2 even
    when the Jaccard is high."""
    rows = _family("pa", [("s", "o")]) + _family("pb", [("s", "o")])
    assert (
        predicate_paraphrase_edges(
            _claims(spark, rows), min_shared=2, threshold=0.1
        ).count()
        == 0
    )


def test_rewrite_preserves_rows_and_maps_only_clustered(spark):
    """The rewritten triple table has identical row count, duplicate
    claims included; clustered predicates are replaced by the canonical,
    untouched ones pass through."""
    pairs = [(f"e{i}", "o") for i in range(5)]
    rows = (
        _family("zz_form", pairs)
        + _family("aa_form", pairs)
        + _family("solo", [("x", "y")])
        + [("e0", "zz_form", "o")]  # duplicate claim survives rewrite
    )
    res = canonicalize_predicates(
        _claims(spark, rows), min_shared=2, threshold=0.5
    )
    out = res["triples"]
    assert out.count() == len(rows)
    got = set(
        r["predicate"] for r in out.select("predicate").distinct().collect()
    )
    assert got == {"aa_form", "solo"}
    assert out.columns == ["subject", "predicate", "object_val"]


def test_max_predicates_bound_raises(spark):
    rows = [(f"s{i}", f"p{i}", "o") for i in range(12)]
    with pytest.raises(ValueError, match="max_predicates"):
        canonicalize_predicates(_claims(spark, rows), max_predicates=10)


def test_partitioning_invariance(spark):
    """mapping is identical whether the claims arrive as 1 or 7 splits
    (the distributed evidence join and the driver-side closure are both
    partitioning-free)."""
    pairs = [(f"e{i}", f"v{i % 4}") for i in range(20)]
    rows = (
        _family("r_one", pairs)
        + _family("r_two", pairs[2:])
        + _family("other", [(f"q{i}", "w") for i in range(7)])
    )
    outs = []
    for n in (1, 7):
        res = canonicalize_predicates(
            _claims(spark, rows).repartition(n), threshold=0.5
        )
        outs.append(
            sorted(
                map(tuple, res["mapping"].collect())
            )
        )
    assert outs[0] == outs[1]
