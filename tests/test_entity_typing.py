"""induce_entity_types (operators/graph.py): SDType-style modal-slot
voting — hand-computed votes, ties, exclusions, confidence."""

from nlp_series_relation_extraction_spark.operators.graph import (
    induce_entity_types,
)

E = "subj_entity_id long, predicate string, obj_entity_id long"
K = "entity_id long, type string"


def _run(spark, edges, known, **kw):
    out = induce_entity_types(
        spark.createDataFrame(edges, E), spark.createDataFrame(known, K),
        **kw,
    ).collect()
    return {r.entity_id: r for r in out}


def test_subject_slot_vote(spark):
    # employs-subjects are orgs (2 typed examples); 99 is untyped and
    # appears twice as an employs-subject -> org with confidence 1.0
    edges = [
        (1, "employs", 10), (2, "employs", 11),
        (99, "employs", 12), (99, "employs", 13),
    ]
    known = [(1, "org"), (2, "org"), (10, "person"), (11, "person"),
             (12, "person"), (13, "person")]
    r = _run(spark, edges, known)[99]
    assert (r.induced_type, r.n_votes, r.n_slot_occurrences) == ("org", 2, 2)
    assert r.confidence_ppm == 1_000_000


def test_mixed_slots_majority_wins(spark):
    # 50 occurs once as employs-subject (org slot) and twice as
    # located_in-subject (place slot) -> place, confidence 2/3
    edges = [
        (1, "employs", 10),
        (2, "located_in", 11), (3, "located_in", 12),
        (50, "employs", 10),
        (50, "located_in", 11), (50, "located_in", 12),
    ]
    known = [(1, "org"), (2, "place"), (3, "place"),
             (10, "person"), (11, "region"), (12, "region")]
    r = _run(spark, edges, known)[50]
    assert r.induced_type == "place"
    assert (r.n_votes, r.n_slot_occurrences) == (2, 3)
    assert r.confidence_ppm == 2 * 1_000_000 // 3


def test_known_entities_excluded(spark):
    edges = [(1, "p", 2)]
    known = [(1, "org"), (2, "person")]
    assert _run(spark, edges, known) == {}


def test_tie_breaks_lexicographically(spark):
    # slot (p, subj) modal tie between 'aaa' and 'bbb' -> 'aaa' wins
    edges = [(1, "p", 10), (2, "p", 11), (9, "p", 12)]
    known = [(1, "bbb"), (2, "aaa"), (10, "x"), (11, "x"), (12, "x")]
    r = _run(spark, edges, known)[9]
    assert r.induced_type == "aaa"


def test_untyped_slot_occurrences_count_in_denominator(spark):
    # 7 appears in a slot with NO typed exemplars: that occurrence
    # lowers confidence but contributes no vote
    edges = [(1, "p", 10), (7, "p", 11), (7, "qqq", 12)]
    known = [(1, "org"), (10, "person"), (11, "person")]
    r = _run(spark, edges, known)[7]
    assert r.induced_type == "org"
    assert (r.n_votes, r.n_slot_occurrences) == (1, 2)
    assert r.confidence_ppm == 500_000


def test_min_slot_votes_gate(spark):
    # the (p, subj) profile rests on ONE typed example; min_slot_votes=2
    # suppresses it, so entity 9 gets no vote at all and is absent
    edges = [(1, "p", 10), (9, "p", 11)]
    known = [(1, "org"), (10, "person"), (11, "person")]
    assert 9 in _run(spark, edges, known, min_slot_votes=1)
    assert 9 not in _run(spark, edges, known, min_slot_votes=2)
