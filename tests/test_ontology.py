"""RDFS entailment materialization (operators/ontology.py): rule
semantics on hand-built graphs, python-twin exactness, cycle safety,
and the schema-sized-ontology contract."""

import pytest
from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.ontology import (
    rdfs_entailment,
    rdfs_entailment_python_twin,
    transitive_closure,
)

ONTO = [
    ("worksFor", "subPropertyOf", "memberOf"),
    ("memberOf", "subPropertyOf", "affiliatedWith"),
    ("memberOf", "range", "Org"),
    ("worksFor", "domain", "Person"),
    ("Person", "subClassOf", "Agent"),
    ("Org", "subClassOf", "Agent"),
    ("Intern", "subClassOf", "Person"),
]
FACTS = [
    ("alice", "worksFor", "acme"),
    ("bob", "memberOf", "club"),
    ("carol", "type", "Intern"),
]


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _run(spark, facts, onto):
    out = rdfs_entailment(
        _df(spark, facts, "subj string, predicate string, obj string"),
        _df(spark, onto, "s string, p string, o string"),
    )
    return {(r.subj, r.predicate, r.obj) for r in out.collect()}


def test_matches_python_twin_exactly(spark):
    got = _run(spark, FACTS, ONTO)
    assert got == rdfs_entailment_python_twin(FACTS, ONTO)


def test_rule_semantics(spark):
    got = _run(spark, FACTS, ONTO)
    # rdfs7 through a 2-level property chain
    assert ("alice", "memberOf", "acme") in got
    assert ("alice", "affiliatedWith", "acme") in got
    # rdfs3 via a range declared on the SUPERproperty of the asserted one
    assert ("acme", "type", "Org") in got
    # rdfs2 + rdfs9: domain type expanded up the class hierarchy
    assert ("alice", "type", "Person") in got
    assert ("alice", "type", "Agent") in got
    # rdfs9 on an ASSERTED membership, two levels up
    assert ("carol", "type", "Person") in got
    assert ("carol", "type", "Agent") in got
    # originals preserved; nothing invents facts for unrelated nodes
    assert ("bob", "memberOf", "club") in got
    assert ("bob", "type", "Person") not in got  # domain is on worksFor only
    assert ("club", "type", "Org") in got


def test_unknown_predicates_pass_through(spark):
    got = _run(spark, [("x", "likes", "y")], ONTO)
    assert got == {("x", "likes", "y")}


def test_cyclic_subclass_is_safe(spark):
    onto = [("A", "subClassOf", "B"), ("B", "subClassOf", "A")]
    got = _run(spark, [("e", "type", "A")], onto)
    assert got == {("e", "type", "A"), ("e", "type", "B")}
    assert got == rdfs_entailment_python_twin([("e", "type", "A")], onto)


def test_transitive_closure_chain_and_cycle():
    assert set(transitive_closure([("a", "b"), ("b", "c")])) == {
        ("a", "b"), ("a", "c"), ("b", "c")
    }
    cyc = set(transitive_closure([("a", "b"), ("b", "a")]))
    assert cyc == {("a", "b"), ("a", "a"), ("b", "a"), ("b", "b")}


def test_oversized_ontology_rejected(spark):
    onto = _df(
        spark,
        [(f"c{i}", "subClassOf", f"c{i+1}") for i in range(40)],
        "s string, p string, o string",
    )
    facts = _df(spark, FACTS, "subj string, predicate string, obj string")
    with pytest.raises(ValueError, match="schema-sized"):
        rdfs_entailment(facts, onto, max_ontology_rows=10)


def test_plan_is_single_scan_no_joins(spark):
    """The entailment plan scans the fact table ONCE and contains no
    joins at all: the four RDFS rules are compiled into driver-side
    map literals applied per-row, so the only exchange is the final
    distinct's aggregation shuffle."""
    facts = _df(spark, FACTS, "subj string, predicate string, obj string")
    onto = _df(spark, ONTO, "s string, p string, o string")
    plan = rdfs_entailment(facts, onto)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Scan ExistingRDD") == 1
    assert plan.count("Exchange") == 1  # the distinct's shuffle only


def test_incremental_equals_batch_and_delta_is_disjoint(spark):
    """entail(A ∪ B) == entail(A) ∪ increment(entail(A), B): the rule
    set is linear in facts, so streaming maintenance is exact."""
    from nlp_series_relation_extraction_spark.operators.ontology import (
        rdfs_entailment_increment,
    )

    onto = _df(spark, ONTO, "s string, p string, o string")
    a = _df(spark, FACTS, "subj string, predicate string, obj string")
    b = _df(
        spark,
        [("dave", "worksFor", "initech"), ("erin", "type", "Intern"),
         ("alice", "worksFor", "acme")],  # overlap with A on purpose
        "subj string, predicate string, obj string",
    )
    from nlp_series_relation_extraction_spark.operators.ontology import (
        rdfs_entailment,
    )

    closure_a = rdfs_entailment(a, onto)
    delta = rdfs_entailment_increment(closure_a, b, onto)
    batch = {
        (r.subj, r.predicate, r.obj)
        for r in rdfs_entailment(a.unionByName(b), onto).collect()
    }
    got_a = {(r.subj, r.predicate, r.obj) for r in closure_a.collect()}
    got_d = {(r.subj, r.predicate, r.obj) for r in delta.collect()}
    assert got_a | got_d == batch
    assert got_a & got_d == set()  # disjoint by construction
    # the overlapping fact (alice worksFor acme) contributed nothing new
    assert ("alice", "memberOf", "acme") not in got_d
    # the genuinely new facts entail through the full rule set
    assert ("dave", "affiliatedWith", "initech") in got_d
    assert ("erin", "type", "Agent") in got_d


def test_increment_on_empty_existing_is_full_closure(spark):
    from nlp_series_relation_extraction_spark.operators.ontology import (
        rdfs_entailment,
        rdfs_entailment_increment,
    )

    onto = _df(spark, ONTO, "s string, p string, o string")
    b = _df(spark, FACTS, "subj string, predicate string, obj string")
    empty = _df(spark, [], "subj string, predicate string, obj string")
    got = {
        (r.subj, r.predicate, r.obj)
        for r in rdfs_entailment_increment(empty, b, onto).collect()
    }
    assert got == rdfs_entailment_python_twin(FACTS, ONTO)


class TestOwlLinearRules:
    ONTO = [
        ("worksFor", "inverseOf", "employs"),
        ("employs", "subPropertyOf", "hasAgent"),
        ("hasAgent", "range", "Person"),
        ("knows", "symmetricProperty", "knows"),
    ]

    def test_prp_inv_and_chained_super(self, spark):
        facts = [("alice", "worksFor", "acme")]
        got = _run(spark, facts, self.ONTO)
        assert ("acme", "employs", "alice") in got        # prp-inv
        assert ("acme", "hasAgent", "alice") in got       # inv then rdfs7
        # range(hasAgent) types the DERIVED object = original subject
        assert ("alice", "type", "Person") in got
        assert got == rdfs_entailment_python_twin(facts, self.ONTO)

    def test_prp_symp(self, spark):
        facts = [("bob", "knows", "carol")]
        got = _run(spark, facts, self.ONTO)
        assert ("carol", "knows", "bob") in got
        assert got == rdfs_entailment_python_twin(facts, self.ONTO)

    def test_double_flip_lands_forward(self, spark):
        onto = [("a", "inverseOf", "b"), ("b", "inverseOf", "c")]
        facts = [("x", "a", "y")]
        got = _run(spark, facts, onto)
        assert got == {
            ("x", "a", "y"), ("y", "b", "x"), ("x", "c", "y")
        }
        assert got == rdfs_entailment_python_twin(facts, onto)

    def test_inverse_declared_one_way_fires_both_ways(self, spark):
        onto = [("worksFor", "inverseOf", "employs")]
        got = _run(spark, [("acme", "employs", "dana")], onto)
        assert ("dana", "worksFor", "acme") in got

    def test_increment_stays_exact_with_owl_rules(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            rdfs_entailment,
            rdfs_entailment_increment,
        )

        onto = _df(spark, self.ONTO, "s string, p string, o string")
        a = _df(spark, [("alice", "worksFor", "acme")],
                "subj string, predicate string, obj string")
        b = _df(spark, [("bob", "knows", "carol")],
                "subj string, predicate string, obj string")
        closure_a = rdfs_entailment(a, onto)
        delta = rdfs_entailment_increment(closure_a, b, onto)
        batch = {
            (r.subj, r.predicate, r.obj)
            for r in rdfs_entailment(a.unionByName(b), onto).collect()
        }
        got_a = {(r.subj, r.predicate, r.obj) for r in closure_a.collect()}
        got_d = {(r.subj, r.predicate, r.obj) for r in delta.collect()}
        assert got_a | got_d == batch and not (got_a & got_d)
