"""OWL 2 RL boolean class-expression rules
(operators/boolean_classes.py): cls-int1/int2, cls-uni, cls-oo
semantics on hand-built graphs, cascade through the class hierarchy,
python-twin exactness on randomized graphs, and axiom-parse
validation."""

import pytest

from nlp_series_relation_extraction_spark.operators.boolean_classes import (
    boolean_class_axioms,
    owl_boolean_class_entailment,
    owl_boolean_class_python_twin,
)


def _cons(head_pred, expr, members, tag):
    """(expr, head_pred, cell0) + rdf:first/rdf:rest cons rows."""
    rows = [(expr, head_pred, f"_:{tag}0")]
    for i, m in enumerate(members):
        rows.append((f"_:{tag}{i}", "rdf:first", m))
        nxt = f"_:{tag}{i + 1}" if i + 1 < len(members) else "rdf:nil"
        rows.append((f"_:{tag}{i}", "rdf:rest", nxt))
    return rows


ONTO = (
    _cons("owl:intersectionOf", "EmployedPerson", ["Person", "Employed"], "i")
    + _cons("owl:unionOf", "Agent2", ["Person", "Org"], "u")
    + _cons("owl:oneOf", "Weekday", ["mon", "tue"], "o")
    + [("EmployedPerson", "subClassOf", "Taxpayer")]
)
FACTS = [
    ("alice", "type", "Person"),
    ("alice", "type", "Employed"),
    ("bob", "type", "Person"),
    ("acme", "type", "Org"),
    ("carol", "type", "EmployedPerson"),
]


def _run(spark, facts, onto):
    out = owl_boolean_class_entailment(
        spark.createDataFrame(
            facts, "subj string, predicate string, obj string"
        ),
        spark.createDataFrame(onto, "s string, p string, o string"),
    )
    return {(r.subj, r.predicate, r.obj) for r in out.collect()}


class TestBooleanClassRules:
    def test_rule_semantics(self, spark):
        got = _run(spark, FACTS, ONTO)
        # cls-int1: both members held => the intersection class
        assert ("alice", "type", "EmployedPerson") in got
        # ... and rdfs9 climbs off the derived type
        assert ("alice", "type", "Taxpayer") in got
        # one member alone is NOT enough
        assert ("bob", "type", "EmployedPerson") not in got
        # cls-int2: asserted intersection type decomposes to members
        assert ("carol", "type", "Person") in got
        assert ("carol", "type", "Employed") in got
        # cls-uni: either member lifts into the union
        assert ("bob", "type", "Agent2") in got
        assert ("acme", "type", "Agent2") in got
        # cls-oo: enumerated individuals typed from schema alone
        assert ("mon", "type", "Weekday") in got
        assert ("tue", "type", "Weekday") in got

    def test_matches_python_twin_exactly(self, spark):
        assert _run(spark, FACTS, ONTO) == owl_boolean_class_python_twin(
            FACTS, ONTO
        )

    def test_cascade_union_feeds_intersection(self, spark):
        # uni derives MemberClass, which is one leg of an intersection
        # whose other leg arrives via rdfs9 — needs >1 outer round
        onto = (
            _cons("owl:unionOf", "Staff", ["Intern", "FullTime"], "u")
            + _cons("owl:intersectionOf", "PaidStaff", ["Staff", "Paid"], "i")
            + [("Salaried", "subClassOf", "Paid")]
        )
        facts = [
            ("dan", "type", "Intern"),
            ("dan", "type", "Salaried"),
        ]
        got = _run(spark, facts, onto)
        assert ("dan", "type", "Staff") in got
        assert ("dan", "type", "Paid") in got
        assert ("dan", "type", "PaidStaff") in got
        assert got == owl_boolean_class_python_twin(facts, onto)

    def test_intersection_member_via_superclass(self, spark):
        # the data asserts a SUBclass of a member; rdfs9 must land
        # before cls-int1 can complete the count
        onto = _cons(
            "owl:intersectionOf", "GoodDoc", ["Reviewed", "Published"], "i"
        ) + [("PeerReviewed", "subClassOf", "Reviewed")]
        facts = [
            ("d1", "type", "PeerReviewed"),
            ("d1", "type", "Published"),
        ]
        got = _run(spark, facts, onto)
        assert ("d1", "type", "GoodDoc") in got

    def test_duplicate_member_in_axiom_not_unsatisfiable(self, spark):
        onto = _cons(
            "owl:intersectionOf", "X", ["A", "B", "A"], "i"
        )
        facts = [("e", "type", "A"), ("e", "type", "B")]
        assert ("e", "type", "X") in _run(spark, facts, onto)

    def test_no_axioms_is_plain_rdfs(self, spark):
        onto = [("A", "subClassOf", "B")]
        facts = [("e", "type", "A")]
        got = _run(spark, facts, onto)
        assert got == {("e", "type", "A"), ("e", "type", "B")}

    def test_oneof_without_facts(self, spark):
        onto = _cons("owl:oneOf", "RGB", ["red", "green", "blue"], "o")
        got = _run(spark, [], onto)
        assert got == {
            ("red", "type", "RGB"),
            ("green", "type", "RGB"),
            ("blue", "type", "RGB"),
        }

    def test_randomized_graphs_match_twin(self, spark):
        import random

        onto = (
            _cons("owl:intersectionOf", "I", ["A", "B"], "i")
            + _cons("owl:unionOf", "U", ["I", "C"], "u")
            + _cons("owl:intersectionOf", "J", ["U", "D"], "j")
            + _cons("owl:oneOf", "E", ["e0", "e1"], "o")
            + [("B", "subClassOf", "C"), ("E", "subClassOf", "D")]
        )
        ents = [f"e{i}" for i in range(10)]
        classes = ["A", "B", "C", "D", "I", "U", "J"]
        rng = random.Random(19)
        for trial in range(3):
            facts = sorted(
                {
                    (rng.choice(ents), "type", rng.choice(classes))
                    for _ in range(18)
                }
            )
            got = _run(spark, facts, onto)
            assert got == owl_boolean_class_python_twin(facts, onto), trial


class TestAxiomParsing:
    def test_parses_ordered_members(self):
        ax = boolean_class_axioms(
            _cons("owl:intersectionOf", "X", ["A", "B", "C"], "i")
        )
        assert ax["intersectionOf"] == {"X": ["A", "B", "C"]}
        assert ax["unionOf"] == {} and ax["oneOf"] == {}

    def test_cycle_raises(self):
        rows = [
            ("X", "owl:unionOf", "_:c0"),
            ("_:c0", "rdf:first", "A"),
            ("_:c0", "rdf:rest", "_:c1"),
            ("_:c1", "rdf:first", "B"),
            ("_:c1", "rdf:rest", "_:c0"),
        ]
        with pytest.raises(ValueError, match="cycles"):
            boolean_class_axioms(rows)

    def test_missing_first_raises(self):
        rows = [
            ("X", "owl:oneOf", "_:c0"),
            ("_:c0", "rdf:rest", "rdf:nil"),
        ]
        with pytest.raises(ValueError, match="no rdf:first"):
            boolean_class_axioms(rows)

    def test_dangling_rest_raises(self):
        rows = [
            ("X", "owl:unionOf", "_:c0"),
            ("_:c0", "rdf:first", "A"),
        ]
        with pytest.raises(ValueError, match="no rdf:rest"):
            boolean_class_axioms(rows)

    def test_double_axiom_raises(self):
        rows = _cons("owl:unionOf", "X", ["A"], "u") + _cons(
            "owl:unionOf", "X", ["B"], "v"
        )
        with pytest.raises(ValueError, match="two owl:unionOf"):
            boolean_class_axioms(rows)
