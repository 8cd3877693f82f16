"""induce_shapes (operators/shacl.py): sheXer-style shape mining —
cardinality bounds, support shares, modal object class, multi-class
entities, untyped-object predicates."""

from nlp_series_relation_extraction_spark.operators.shacl import (
    induce_shapes,
)

T = "subj long, pred string, obj long"
TY = "entity long, cls string"


def _mine(spark, triples, types, **kw):
    return {
        (r.cls, r.pred): r
        for r in induce_shapes(
            spark.createDataFrame(triples, T),
            spark.createDataFrame(types, TY),
            **kw,
        ).collect()
    }


def test_cardinality_and_support(spark):
    # class A = {1, 2, 3}; p asserted by 1 (two values) and 2 (one) ->
    # support 2/3, min_count 0 (not universal), max 2
    triples = [(1, "p", 10), (1, "p", 11), (2, "p", 10)]
    types = [(1, "A"), (2, "A"), (3, "A")]
    got = _mine(spark, triples, types)
    r = got[("A", "p")]
    assert (r.n_instances, r.n_subjects) == (3, 2)
    assert r.support_ppm == 2 * 1_000_000 // 3
    assert (r.min_count, r.max_count) == (0, 2)


def test_universal_predicate_min_count(spark):
    # every A instance asserts p -> min_count = smallest distinct count
    triples = [(1, "p", 10), (1, "p", 11), (2, "p", 10)]
    types = [(1, "A"), (2, "A")]
    r = _mine(spark, triples, types)[("A", "p")]
    assert (r.support_ppm, r.min_count, r.max_count) == (1_000_000, 1, 2)


def test_duplicate_assertions_count_once(spark):
    # the triple store is set-semantics upstream, but a duplicated obj
    # must not inflate cardinality: countDistinct
    triples = [(1, "p", 10), (1, "p", 10)]
    types = [(1, "A")]
    r = _mine(spark, triples, types)[("A", "p")]
    assert (r.min_count, r.max_count) == (1, 1)


def test_modal_object_class_and_tie(spark):
    # objects typed B twice, C twice -> tie broken lexicographically (B)
    triples = [(1, "p", 10), (1, "p", 11), (2, "p", 20), (2, "p", 21)]
    types = [(1, "A"), (2, "A"), (10, "B"), (11, "C"),
             (20, "B"), (21, "C")]
    r = _mine(spark, triples, types)[("A", "p")]
    assert r.modal_obj_class == "B"
    assert r.modal_obj_share_ppm == 500_000


def test_untyped_objects_yield_null_modal(spark):
    triples = [(1, "p", 999)]
    types = [(1, "A")]
    r = _mine(spark, triples, types)[("A", "p")]
    assert r.modal_obj_class is None
    assert r.modal_obj_share_ppm == 0


def test_multi_class_entity_contributes_to_both(spark):
    triples = [(1, "p", 10)]
    types = [(1, "A"), (1, "B"), (2, "B")]
    got = _mine(spark, triples, types)
    assert got[("A", "p")].support_ppm == 1_000_000
    assert got[("B", "p")].support_ppm == 500_000


def test_min_support_filter(spark):
    triples = [(1, "p", 10), (1, "q", 10), (2, "p", 10)]
    types = [(1, "A"), (2, "A")]
    got = _mine(spark, triples, types, min_support_ppm=750_000)
    assert ("A", "p") in got and ("A", "q") not in got
