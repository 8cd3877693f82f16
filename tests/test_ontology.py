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


class TestOwlTransitive:
    """prp-trp (owl:TransitiveProperty) and the full OWL-RL fixpoint."""

    TONTO = [
        ("partOf", "transitiveProperty", "partOf"),
        ("next", "transitiveProperty", "next"),
    ]
    CHAIN = [
        ("a", "partOf", "b"),
        ("b", "partOf", "c"),
        ("c", "partOf", "d"),
        ("d", "partOf", "e"),
        ("x", "locatedIn", "y"),  # undeclared: must pass through unclosed
        ("y", "locatedIn", "z"),
    ]
    RING = [("r1", "next", "r2"), ("r2", "next", "r3"), ("r3", "next", "r1")]

    def _trans(self, spark, facts, onto, **kw):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_transitive_entailment,
        )

        out = owl_transitive_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
            **kw,
        )
        return {(r.subj, r.predicate, r.obj) for r in out.collect()}

    def test_matches_python_twin_and_closes_chain(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_transitive_python_twin,
        )

        got = self._trans(spark, self.CHAIN, self.TONTO)
        assert got == owl_transitive_python_twin(self.CHAIN, self.TONTO)
        assert ("a", "partOf", "e") in got
        # undeclared predicate passes through but is NOT closed
        assert ("x", "locatedIn", "z") not in got
        assert ("x", "locatedIn", "y") in got

    def test_cycle_terminates_with_full_reachability(self, spark):
        got = self._trans(spark, self.RING, self.TONTO)
        nodes = {"r1", "r2", "r3"}
        assert {(s, "next", o) for s in nodes for o in nodes} == got

    def test_predicate_isolation(self, spark):
        # two transitive predicates over shared vertices never mix
        facts = [("a", "partOf", "b"), ("b", "next", "c")]
        got = self._trans(spark, facts, self.TONTO)
        assert got == set(facts)

    def test_round_cap_returns_partial(self, spark):
        got = self._trans(spark, self.CHAIN, self.TONTO, max_rounds=1)
        # one doubling round: chains of length <= 2 only
        assert ("a", "partOf", "c") in got
        assert ("a", "partOf", "e") not in got

    def test_no_transitive_declaration_is_distinct_identity(self, spark):
        got = self._trans(spark, self.CHAIN + self.CHAIN[:1], ONTO)
        assert got == set(self.CHAIN)

    def test_increment_equals_batch_and_is_disjoint(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_transitive_entailment,
            owl_transitive_increment,
        )

        onto = _df(spark, self.TONTO, "s string, p string, o string")
        sch = "subj string, predicate string, obj string"
        # existing = closure of the first half; new = the bridging rest
        first, rest = self.CHAIN[:2], self.CHAIN[2:]
        existing = owl_transitive_entailment(_df(spark, first, sch), onto)
        inc = owl_transitive_increment(
            existing, _df(spark, rest, sch), onto
        )
        inc_set = {(r.subj, r.predicate, r.obj) for r in inc.collect()}
        exi_set = {(r.subj, r.predicate, r.obj) for r in existing.collect()}
        batch = self._trans(spark, self.CHAIN, self.TONTO)
        assert exi_set | inc_set == batch
        assert exi_set & inc_set == set()
        # the genuinely compositional pair (old segment + new edge)
        assert ("a", "partOf", "e") in inc_set

    def test_owl_rl_fixpoint_needs_the_alternation(self, spark):
        """subPropertyOf FEEDS the transitive predicate, and
        closure-derived pairs trigger typing — both directions of the
        linear<->transitive alternation in one graph."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_rl_entailment,
            owl_rl_python_twin,
            rdfs_entailment_python_twin,
        )

        onto = [
            ("manages", "subPropertyOf", "reportsTo"),
            ("reportsTo", "transitiveProperty", "reportsTo"),
            ("reportsTo", "domain", "Employee"),
            ("Employee", "subClassOf", "Person"),
        ]
        facts = [
            ("a", "manages", "b"),
            ("b", "reportsTo", "c"),
            ("c", "manages", "d"),
        ]
        out = owl_rl_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        got = {(r.subj, r.predicate, r.obj) for r in out.collect()}
        assert got == owl_rl_python_twin(facts, onto)
        # transitive pair only derivable AFTER rdfs7 maps manages in
        assert ("a", "reportsTo", "d") in got
        # typing fired on a closure endpoint (c only manages -> its
        # reportsTo facts exist pre-closure, but a's deep pair needed it)
        assert ("a", "type", "Person") in got
        # and the linear pass alone would NOT have found the deep pair
        lin = rdfs_entailment_python_twin(facts, onto)
        assert ("a", "reportsTo", "d") not in lin

    def test_owl_rl_without_transitive_equals_linear(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_rl_entailment,
            rdfs_entailment_python_twin,
        )

        out = owl_rl_entailment(
            _df(spark, FACTS, "subj string, predicate string, obj string"),
            _df(spark, ONTO, "s string, p string, o string"),
        )
        got = {(r.subj, r.predicate, r.obj) for r in out.collect()}
        assert got == rdfs_entailment_python_twin(FACTS, ONTO)


class TestOwlChains:
    """prp-spo2 (owl:propertyChainAxiom) — the generalized step
    fixpoint, aux decomposition hygiene, cascade/recursion semantics,
    and the chain-bearing owl_rl alternation."""

    def _chain(self, spark, facts, onto, **kw):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_chain_entailment,
        )

        out = owl_chain_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
            **kw,
        )
        return {(r.subj, r.predicate, r.obj) for r in out.collect()}

    def test_length2_chain_matches_twin(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_chain_python_twin,
        )

        onto = [("uncle", "propertyChain", "parent/brother")]
        facts = [
            ("ann", "parent", "bob"),
            ("bob", "brother", "carl"),
            ("bob", "brother", "dave"),
            ("x", "parent", "y"),  # no matching tail: derives nothing
        ]
        got = self._chain(spark, facts, onto)
        assert got == owl_chain_python_twin(facts, onto)
        assert ("ann", "uncle", "carl") in got
        assert ("ann", "uncle", "dave") in got
        assert not any(s == "x" and p == "uncle" for s, p, _ in got)

    def test_length3_chain_hides_aux_predicates(self, spark):
        onto = [("zone", "propertyChain", "in_city/in_country/in_zone")]
        facts = [
            ("shop", "in_city", "paris"),
            ("paris", "in_country", "france"),
            ("france", "in_zone", "emea"),
        ]
        got = self._chain(spark, facts, onto)
        assert ("shop", "zone", "emea") in got
        assert not any(p.startswith("__chain__") for _, p, _ in got)
        # the length-2 PREFIX alone derives nothing visible
        assert ("shop", "zone", "france") not in got

    def test_cascading_axioms_close_to_fixpoint(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_chain_python_twin,
        )

        onto = [
            ("located", "propertyChain", "works_in/based_in"),
            ("zoned", "propertyChain", "located/in_zone"),
        ]
        facts = [
            ("alice", "works_in", "acme"),
            ("acme", "based_in", "paris"),
            ("paris", "in_zone", "emea"),
        ]
        got = self._chain(spark, facts, onto)
        assert got == owl_chain_python_twin(facts, onto)
        assert ("alice", "located", "paris") in got
        assert ("alice", "zoned", "emea") in got  # consumed axiom 1's output

    def test_recursive_chain_equals_transitive_operator(self, spark):
        """q ⊑ p∘p with q == p IS transitivity: the generic step machine
        and the dedicated prp-trp loop must agree exactly."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_transitive_entailment,
        )

        facts = [(f"v{i}", "partOf", f"v{i+1}") for i in range(6)]
        chain_got = self._chain(
            spark, facts, [("partOf", "propertyChain", "partOf/partOf")]
        )
        tdf = owl_transitive_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, [("partOf", "transitiveProperty", "partOf")],
                "s string, p string, o string"),
        )
        assert chain_got == {(r.subj, r.predicate, r.obj) for r in tdf.collect()}
        assert ("v0", "partOf", "v6") in chain_got

    def test_mixed_trans_and_chain_declarations(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_chain_python_twin,
        )

        onto = [
            ("within", "transitiveProperty", "within"),
            ("sited", "propertyChain", "based_in/within"),
        ]
        facts = [
            ("acme", "based_in", "paris"),
            ("paris", "within", "france"),
            ("france", "within", "europe"),
        ]
        got = self._chain(spark, facts, onto)
        assert got == owl_chain_python_twin(facts, onto)
        # the chain consumes a CLOSED within pair
        assert ("acme", "sited", "europe") in got

    def test_reserved_prefix_and_bad_declarations_raise(self, spark):
        import pytest as _pytest

        # a chain COMPONENT using the reserved prefix
        with _pytest.raises(ValueError, match="reserved"):
            self._chain(
                spark,
                [("a", "__chain__evil", "b"), ("b", "p", "c")],
                [("q", "propertyChain", "__chain__evil/p")],
            )
        # facts carrying the reserved prefix are rejected loudly
        with _pytest.raises(ValueError, match="reserved"):
            self._chain(
                spark,
                [("a", "__chain__0_1", "b"), ("a", "p", "b"),
                 ("b", "q", "c")],
                [("r", "propertyChain", "p/q")],
            )
        with _pytest.raises(ValueError, match=">=2"):
            self._chain(
                spark, [("a", "p", "b")], [("q", "propertyChain", "p")]
            )

    def test_no_declarations_is_distinct_identity(self, spark):
        facts = [("a", "p", "b"), ("a", "p", "b")]
        assert self._chain(spark, facts, ONTO) == {("a", "p", "b")}

    def test_owl_rl_alternation_through_chains(self, spark):
        """Linear rules FEED a chain input (rdfs7), the chain output
        TRIGGERS typing (range) and a transitive predicate consumes a
        chain-derived pair — all three feedback directions in one
        graph, pinned against the naive python fixpoint."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_rl_entailment,
            owl_rl_python_twin,
            rdfs_entailment_python_twin,
        )

        onto = [
            ("manages", "subPropertyOf", "works_in"),
            ("located", "propertyChain", "works_in/based_in"),
            ("located", "range", "Place"),
            ("within", "transitiveProperty", "within"),
            ("sited", "propertyChain", "located/within"),
        ]
        facts = [
            ("alice", "manages", "acme"),
            ("acme", "based_in", "paris"),
            ("paris", "within", "france"),
            ("france", "within", "europe"),
        ]
        out = owl_rl_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        got = {(r.subj, r.predicate, r.obj) for r in out.collect()}
        assert got == owl_rl_python_twin(facts, onto)
        assert ("alice", "works_in", "acme") in got      # rdfs7
        assert ("alice", "located", "paris") in got      # chain on derived
        assert ("paris", "type", "Place") in got         # typing on chain output
        assert ("alice", "sited", "europe") in got       # chain on closed within
        assert not any(p.startswith("__chain__") for _, p, _ in got)
        lin = rdfs_entailment_python_twin(facts, onto)
        assert ("alice", "located", "paris") not in lin

    def test_owl_rl_late_tail_edge_uses_old_aux_prefix(self, spark):
        """The workset keeps aux intermediates alive across outer
        rounds: a length-3 chain whose TAIL edge only appears via a
        later linear delta still completes."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_rl_entailment,
            owl_rl_python_twin,
        )

        onto = [
            ("zone", "propertyChain", "in_city/in_country/in_zone"),
            ("zoneDecl", "subPropertyOf", "in_zone"),
            # in_zone facts only exist AFTER the chain derives a first
            # zone pair that types through... keep it simpler: the
            # tail edge arrives as a subproperty that rdfs7 maps in.
        ]
        facts = [
            ("shop", "in_city", "paris"),
            ("paris", "in_country", "france"),
            ("france", "zoneDecl", "emea"),
        ]
        out = owl_rl_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        got = {(r.subj, r.predicate, r.obj) for r in out.collect()}
        assert got == owl_rl_python_twin(facts, onto)
        assert ("shop", "zone", "emea") in got


class TestOwlEquality:
    """prp-fp / prp-ifp sameAs derivation + eq-rep rewriting fixpoint."""

    EONTO = [
        ("email", "inverseFunctionalProperty", "email"),
        ("born_in", "functionalProperty", "born_in"),
    ]

    def _run(self, spark, facts, onto, **kw):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_entailment,
        )

        out = owl_equality_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
            **kw,
        )
        return {(r.subj, r.predicate, r.obj) for r in out.collect()}

    def test_ifp_merges_subjects_and_matches_twin(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        facts = [
            ("a", "email", "x@y"),
            ("b", "email", "x@y"),
            ("c", "email", "other"),
            ("b", "likes", "tea"),
        ]
        got = self._run(spark, facts, self.EONTO)
        assert got == owl_equality_python_twin(facts, self.EONTO)
        assert ("b", "sameAs", "a") in got
        assert ("a", "likes", "tea") in got  # eq-rep rewrote the subject
        assert ("b", "likes", "tea") not in got
        assert ("c", "email", "other") in got  # untouched id stays

    def test_fp_merges_objects(self, spark):
        facts = [("a", "born_in", "pari"), ("a", "born_in", "paris")]
        got = self._run(spark, facts, self.EONTO)
        assert got == {
            ("a", "born_in", "pari"),
            ("paris", "sameAs", "pari"),
        }

    def test_cascade_needs_multiple_rounds(self, spark):
        """shared email merges people -> merged person's functional
        born_in merges cities -> merged city's functional in_region
        merges regions: 3 productive rounds, twin-exact."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        onto = self.EONTO + [("in_region", "functionalProperty", "x")]
        facts = [
            ("p1", "email", "e1"),
            ("p2", "email", "e1"),
            ("p1", "born_in", "c1"),
            ("p2", "born_in", "c2"),
            ("c1", "in_region", "r1"),
            ("c2", "in_region", "r2"),
        ]
        got = self._run(spark, facts, onto)
        assert got == owl_equality_python_twin(facts, onto)
        assert ("p2", "sameAs", "p1") in got
        assert ("c2", "sameAs", "c1") in got
        assert ("r2", "sameAs", "r1") in got
        assert ("p1", "born_in", "c1") in got
        assert ("c1", "in_region", "r1") in got

    def test_transitive_same_key_chain_is_one_component(self, spark):
        facts = [(s, "email", "e") for s in ("a", "b", "c", "d")]
        got = self._run(spark, facts, self.EONTO)
        assert {("b", "sameAs", "a"), ("c", "sameAs", "a"),
                ("d", "sameAs", "a")} <= got

    def test_no_declarations_is_distinct_identity(self, spark):
        facts = [("a", "likes", "tea"), ("a", "likes", "tea")]
        got = self._run(spark, facts, [("p", "subClassOf", "q")])
        assert got == {("a", "likes", "tea")}

    def test_canonical_is_lexicographic_min(self, spark):
        # "10" < "9" lexicographically: pin the string-min contract
        facts = [("9", "email", "e"), ("10", "email", "e")]
        got = self._run(spark, facts, self.EONTO)
        assert ("9", "sameAs", "10") in got


class TestOwlClassRules:
    """OWL 2 RL class rules (cls-hv1/hv2, cls-svf1, cls-avf) + the
    cax-dw consistency report: twin exactness, cascade depth through
    the linear interleave, cyclic propagation, and declaration
    validation."""

    def _run(self, spark, facts, onto, **kw):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_class_entailment,
        )

        out = owl_class_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
            **kw,
        )
        return {(r.subj, r.predicate, r.obj) for r in out.collect()}

    def test_hasvalue_both_directions(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_class_python_twin,
        )

        facts = [
            ("alice", "worksFor", "acme"),     # hv2 -> type AcmeStaff
            ("bob", "type", "AcmeStaff"),      # hv1 -> worksFor acme
        ]
        onto = [("AcmeStaff", "hasValue", "worksFor/acme")]
        got = self._run(spark, facts, onto)
        assert ("alice", "type", "AcmeStaff") in got
        assert ("bob", "worksFor", "acme") in got
        assert got == owl_class_python_twin(facts, onto)

    def test_svf_avf_cascade_through_subclass(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_class_python_twin,
        )

        # hv2 types the nation; svf lifts it to the customer; rdfs9
        # climbs to Flagged; avf pushes a NEW type back onto the
        # nation; a second hv1 emits a property fact from it.
        facts = [
            ("c1", "in_nation", "n1"),
            ("c2", "in_nation", "n2"),
            ("n1", "in_region", "r3"),
            ("n2", "in_region", "r9"),
        ]
        onto = [
            ("R3Nation", "hasValue", "in_region/r3"),
            ("R3Cust", "someValuesFrom", "in_nation/R3Nation"),
            ("R3Cust", "subClassOf", "Flagged"),
            ("Flagged", "allValuesFrom", "in_nation/Audited"),
            ("Audited", "hasValue", "audit_status/required"),
        ]
        got = self._run(spark, facts, onto)
        assert ("n1", "type", "R3Nation") in got
        assert ("c1", "type", "R3Cust") in got
        assert ("c1", "type", "Flagged") in got
        assert ("n1", "type", "Audited") in got
        assert ("n1", "audit_status", "required") in got
        assert not any(s == "c2" and p == "type" for s, p, _ in got)
        assert got == owl_class_python_twin(facts, onto)

    def test_cyclic_svf_walks_back_a_chain(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_class_python_twin,
        )

        # (C someValuesFrom next/C): one seed type at the chain's end
        # propagates BACKWARDS hop by hop — multi-round fixpoint.
        n = 6
        facts = [
            (f"v{i}", "next", f"v{i+1}") for i in range(n)
        ] + [(f"v{n}", "type", "Reaches")]
        onto = [("Reaches", "someValuesFrom", "next/Reaches")]
        got = self._run(spark, facts, onto)
        assert all(
            (f"v{i}", "type", "Reaches") in got for i in range(n + 1)
        )
        assert got == owl_class_python_twin(facts, onto)

    def test_no_restrictions_equals_linear_closure(self, spark):
        got = self._run(spark, FACTS, ONTO)
        assert got == rdfs_entailment_python_twin(FACTS, ONTO)

    def test_bad_declaration_formats_raise(self, spark):
        for bad in ("noslash", "/x", "p/", ""):
            with pytest.raises(ValueError, match="property/filler"):
                self._run(
                    spark,
                    [("a", "p", "b")],
                    [("C", "hasValue", bad)],
                )
        with pytest.raises(ValueError, match="type predicate"):
            self._run(
                spark,
                [("a", "p", "b")],
                [("C", "someValuesFrom", "type/D")],
            )

    def test_filler_may_contain_slash(self, spark):
        got = self._run(
            spark,
            [("a", "url", "http://x/y")],
            [("Linked", "hasValue", "url/http://x/y")],
        )
        assert ("a", "type", "Linked") in got

    def test_disjoint_violations_report(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            disjoint_violations,
        )

        facts = _df(
            spark,
            [
                ("a", "type", "Cat"), ("a", "type", "Dog"),
                ("b", "type", "Cat"),
                ("c", "type", "Dog"), ("c", "type", "Robot"),
                ("a", "likes", "Dog"),  # non-type rows never match
            ],
            "subj string, predicate string, obj string",
        )
        onto = _df(
            spark,
            [("Cat", "disjointWith", "Dog"), ("X", "subClassOf", "Y")],
            "s string, p string, o string",
        )
        got = {
            (r.subj, r.cls_a, r.cls_b)
            for r in disjoint_violations(facts, onto).collect()
        }
        assert got == {("a", "Cat", "Dog")}

    def test_disjoint_no_declarations_empty(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            disjoint_violations,
        )

        facts = _df(
            spark,
            [("a", "type", "Cat")],
            "subj string, predicate string, obj string",
        )
        onto = _df(
            spark, [("X", "subClassOf", "Y")], "s string, p string, o string"
        )
        assert disjoint_violations(facts, onto).count() == 0

    def test_randomized_graphs_match_twin(self, spark):
        import random

        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_class_python_twin,
        )

        rng = random.Random(7)
        ents = [f"e{i}" for i in range(14)]
        classes = ["A", "B", "C", "D"]
        props = ["p", "q"]
        onto = [
            ("A", "hasValue", "p/e3"),
            ("B", "someValuesFrom", "q/A"),
            ("C", "allValuesFrom", "p/D"),
            ("B", "subClassOf", "C"),
            ("q", "domain", "D"),
        ]
        for trial in range(3):
            facts = [
                (
                    rng.choice(ents),
                    rng.choice(props + ["type"]),
                    rng.choice(ents + classes),
                )
                for _ in range(25)
            ]
            facts = sorted(set(facts))
            got = self._run(spark, facts, onto)
            assert got == owl_class_python_twin(facts, onto), trial


class TestOwlHasKey:
    """OWL 2 RL prp-key (owl:hasKey): compound-key identity inference
    via block-then-verify — exactness vs the all-pairs twin, the
    intersection case adjacency chains would miss, exists-semantics on
    multi-valued properties, class gating, cascade into prp-fp, and
    the blocking guard."""

    HKONTO = [("Person", "hasKey", "ssn|dob")]

    def _run(self, spark, facts, onto, **kw):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_entailment,
        )

        out = owl_equality_entailment(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
            **kw,
        )
        return {(r.subj, r.predicate, r.obj) for r in out.collect()}

    def test_compound_key_requires_all_properties(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        facts = [
            ("a", "type", "Person"), ("b", "type", "Person"),
            ("c", "type", "Person"),
            ("a", "ssn", "s1"), ("b", "ssn", "s1"), ("c", "ssn", "s1"),
            ("a", "dob", "d1"), ("b", "dob", "d1"), ("c", "dob", "d2"),
        ]
        got = self._run(spark, facts, self.HKONTO)
        assert got == owl_equality_python_twin(facts, self.HKONTO)
        assert ("b", "sameAs", "a") in got
        # c matches on ssn only - no merge
        assert not any(s == "c" and p == "sameAs" for s, p, _ in got)

    def test_intersection_beats_adjacent_chains(self, spark):
        """p1 blocks {x,y,z} on one shared value but only x,z share a
        dob: the sorted-adjacent pairs (x,y),(y,z) contain neither
        endpoint pair - all-pairs blocking must surface (x,z)."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        facts = [
            ("x", "type", "Person"), ("y", "type", "Person"),
            ("z", "type", "Person"),
            ("x", "ssn", "s"), ("y", "ssn", "s"), ("z", "ssn", "s"),
            ("x", "dob", "d"), ("z", "dob", "d"), ("y", "dob", "other"),
        ]
        got = self._run(spark, facts, self.HKONTO)
        assert got == owl_equality_python_twin(facts, self.HKONTO)
        assert ("z", "sameAs", "x") in got
        assert not any(s == "y" and p == "sameAs" for s, p, _ in got)

    def test_multivalued_exists_semantics(self, spark):
        """A shared value EXISTS per property (OWL prp-key), even when
        each side also holds non-shared values."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        facts = [
            ("a", "type", "Person"), ("b", "type", "Person"),
            ("a", "ssn", "s1"), ("a", "ssn", "s2"),
            ("b", "ssn", "s2"), ("b", "ssn", "s3"),
            ("a", "dob", "d1"), ("b", "dob", "d1"),
        ]
        got = self._run(spark, facts, self.HKONTO)
        assert got == owl_equality_python_twin(facts, self.HKONTO)
        assert ("b", "sameAs", "a") in got

    def test_untyped_entities_never_merge(self, spark):
        facts = [
            ("a", "type", "Person"),
            ("a", "ssn", "s"), ("b", "ssn", "s"),
            ("a", "dob", "d"), ("b", "dob", "d"),
        ]
        got = self._run(spark, facts, self.HKONTO)
        assert not any(p == "sameAs" for _, p, _ in got)

    def test_key_merge_cascades_into_functional(self, spark):
        """prp-key merges two people; the merged person's functional
        employer then merges two orgs a round later - the key rule
        participates in the same fixpoint as prp-fp."""
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        onto = self.HKONTO + [("employer", "functionalProperty", "x")]
        facts = [
            ("p1", "type", "Person"), ("p2", "type", "Person"),
            ("p1", "ssn", "s"), ("p2", "ssn", "s"),
            ("p1", "dob", "d"), ("p2", "dob", "d"),
            ("p1", "employer", "org1"), ("p2", "employer", "org2"),
        ]
        got = self._run(spark, facts, onto)
        assert got == owl_equality_python_twin(facts, onto)
        assert ("p2", "sameAs", "p1") in got
        assert ("org2", "sameAs", "org1") in got
        assert ("p1", "employer", "org1") in got

    def test_single_property_key(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        onto = [("Person", "hasKey", "ssn")]
        facts = [
            ("a", "type", "Person"), ("b", "type", "Person"),
            ("a", "ssn", "s"), ("b", "ssn", "s"),
        ]
        got = self._run(spark, facts, onto)
        assert got == owl_equality_python_twin(facts, onto)
        assert ("b", "sameAs", "a") in got

    def test_blocking_guard_raises_on_hub_value(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            has_key_pairs,
        )

        facts = [("e%d" % i, "ssn", "hub") for i in range(5)] + [
            ("e%d" % i, "type", "Person") for i in range(5)
        ]
        df = _df(spark, facts, "subj string, predicate string, obj string")
        with pytest.raises(ValueError, match="does not behave like a key"):
            has_key_pairs(df, [("Person", ("ssn",))], max_block=3).count()

    def test_bad_declaration_raises(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            _has_key_axioms,
        )

        with pytest.raises(ValueError, match="hasKey"):
            _has_key_axioms([("Person", "hasKey", "ssn||dob")])

    def test_randomized_twin_parity(self, spark):
        import random

        from nlp_series_relation_extraction_spark.operators.ontology import (
            owl_equality_python_twin,
        )

        rng = random.Random(11)
        ents = ["e%d" % i for i in range(8)]
        onto = self.HKONTO + [("email", "inverseFunctionalProperty", "x")]
        for trial in range(3):
            facts = [("e%d" % i, "type", "Person") for i in range(6)]
            for _ in range(20):
                facts.append(
                    (
                        rng.choice(ents),
                        rng.choice(["ssn", "dob", "email", "likes"]),
                        rng.choice(["v1", "v2", "v3", "v4"]),
                    )
                )
            facts = sorted(set(facts))
            got = self._run(spark, facts, onto)
            assert got == owl_equality_python_twin(facts, onto), trial


class TestDifferentFrom:
    """OWL 2 RL eq-diff1 consistency report: asserted differentFrom
    pairs the equality fixpoint merged anyway."""

    ONTO = [("email", "inverseFunctionalProperty", "email")]

    def _run(self, spark, facts):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            different_from_violations,
            owl_equality_entailment,
        )

        fdf = _df(spark, facts, "subj string, predicate string, obj string")
        ent = owl_equality_entailment(
            fdf, _df(spark, self.ONTO, "s string, p string, o string")
        )
        return {
            (r.subj, r.obj, r.canon)
            for r in different_from_violations(fdf, ent).collect()
        }

    def test_merged_pair_is_reported_with_canon(self, spark):
        facts = [
            ("a", "email", "e"), ("b", "email", "e"),
            ("b", "differentFrom", "a"),
        ]
        assert self._run(spark, facts) == {("b", "a", "a")}

    def test_unmerged_pair_is_not_reported(self, spark):
        facts = [
            ("a", "email", "e1"), ("b", "email", "e2"),
            ("a", "differentFrom", "b"),
        ]
        assert self._run(spark, facts) == set()

    def test_transitively_merged_pair_is_reported(self, spark):
        """a~b via e1, b~c via e2: a,c never share a key value but land
        in one component — eq-diff sees through the closure."""
        facts = [
            ("a", "email", "e1"), ("b", "email", "e1"),
            ("b", "email", "e2"), ("c", "email", "e2"),
            ("a", "differentFrom", "c"),
        ]
        assert self._run(spark, facts) == {("a", "c", "a")}

    def test_asserted_orientation_and_self_assertion(self, spark):
        facts = [
            ("a", "email", "e"), ("b", "email", "e"),
            ("a", "differentFrom", "b"),
            ("b", "differentFrom", "a"),
            ("c", "differentFrom", "c"),  # x differentFrom x: violated
        ]
        got = self._run(spark, facts)
        assert got == {("a", "b", "a"), ("b", "a", "a"), ("c", "c", "c")}


class TestPropertyAxioms:
    """prp-irp / prp-asyp / prp-pdw consistency reports."""

    def _run(self, spark, facts, onto):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import property_axiom_violations

        out = property_axiom_violations(
            _df(spark, facts,
                "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        return {tuple(r) for r in out.collect()}

    def test_irreflexive(self, spark):
        got = self._run(
            spark,
            [("a", "p", "a"), ("a", "p", "b"), ("b", "q", "b")],
            [("p", "irreflexive", "")],
        )
        assert got == {("prp-irp", "a", "p", "p", "a")}

    def test_asymmetric_reports_both_orientations(self, spark):
        got = self._run(
            spark,
            [("a", "p", "b"), ("b", "p", "a"), ("c", "p", "d")],
            [("p", "asymmetric", "")],
        )
        assert got == {
            ("prp-asyp", "a", "p", "p", "b"),
            ("prp-asyp", "b", "p", "p", "a"),
        }

    def test_asymmetric_self_loop_reports_once(self, spark):
        got = self._run(
            spark, [("a", "p", "a")], [("p", "asymmetric", "")]
        )
        assert got == {("prp-asyp", "a", "p", "p", "a")}

    def test_property_disjoint(self, spark):
        got = self._run(
            spark,
            [("a", "p", "x"), ("a", "q", "x"),      # violation
             ("b", "p", "x"), ("b", "q", "y")],      # different obj: fine
            [("p", "propertyDisjointWith", "q")],
        )
        assert got == {("prp-pdw", "a", "p", "q", "x")}

    def test_declared_orientation_only(self, spark):
        """prp-pdw reports in DECLARED orientation — q-then-p pairs
        are the same violation, not a second row."""
        got = self._run(
            spark,
            [("a", "p", "x"), ("a", "q", "x")],
            [("p", "propertyDisjointWith", "q")],
        )
        assert {r[0] for r in got} == {"prp-pdw"}
        assert len(got) == 1

    def test_no_axioms_raises(self, spark):
        with pytest.raises(ValueError, match="declares no"):
            self._run(spark, [("a", "p", "b")],
                      [("p", "subPropertyOf", "q")])

    def test_randomized_twin_equivalence(self, spark):
        import random

        from nlp_series_relation_extraction_spark.operators.ontology \
            import property_axiom_python_twin

        rng = random.Random(3)
        nodes = [f"n{i}" for i in range(12)]
        preds = ["p", "q", "r", "s"]
        facts = list({
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(250)
        })
        onto = [
            ("p", "irreflexive", ""),
            ("q", "asymmetric", ""),
            ("r", "propertyDisjointWith", "s"),
            ("p", "propertyDisjointWith", "q"),
        ]
        got = self._run(spark, facts, onto)
        want = property_axiom_python_twin(facts, onto)
        assert got == want
        assert len(want) > 10


class TestMaxCardinality:
    """cls-maxc1 / cls-maxqc1 violations, cls-maxc2 / cls-maxqc3 sameAs."""

    def _viol(self, spark, facts, onto):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import max_cardinality_violations

        out = max_cardinality_violations(
            _df(spark, facts,
                "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        return {tuple(r) for r in out.collect()}

    def _pairs(self, spark, facts, onto):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import max_cardinality_same_as

        out = max_cardinality_same_as(
            _df(spark, facts,
                "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        return {tuple(r) for r in out.collect()}

    def test_maxc1_unqualified(self, spark):
        got = self._viol(
            spark,
            [("a", "type", "C"), ("a", "banned", "x"),
             ("b", "banned", "y"),           # not typed C: fine
             ("a", "other", "z")],           # different path: fine
            [("C", "maxCardinality0", "banned")],
        )
        assert got == {("cls-maxc1", "a", "C", "banned", "x")}

    def test_maxqc1_filler_typing_respected(self, spark):
        got = self._viol(
            spark,
            [("a", "type", "C"), ("r1", "type", "Restricted"),
             ("a", "visits", "r1"),          # object typed: violation
             ("a", "visits", "r2")],         # object untyped: fine
            [("C", "maxQualifiedCardinality0", "visits|Restricted")],
        )
        assert got == {("cls-maxqc1", "a", "C", "visits", "r1")}

    def test_maxc2_adjacent_chain(self, spark):
        got = self._pairs(
            spark,
            [("a", "type", "C"),
             ("a", "addr", "v1"), ("a", "addr", "v2"),
             ("a", "addr", "v3"),
             ("b", "addr", "v1"), ("b", "addr", "v9"),  # b untyped
             ("c", "type", "C"), ("c", "addr", "v1")],  # single value
            [("C", "maxCardinality1", "addr")],
        )
        assert got == {("v1", "v2"), ("v2", "v3")}

    def test_maxqc3_only_typed_values_merge(self, spark):
        got = self._pairs(
            spark,
            [("a", "type", "C"),
             ("e1", "type", "Email"), ("e2", "type", "Email"),
             ("a", "contact", "e1"), ("a", "contact", "e2"),
             ("a", "contact", "ph1")],       # untyped value ignored
            [("C", "maxQualifiedCardinality1", "contact|Email")],
        )
        assert got == {("e1", "e2")}

    def test_unqualified_and_qualified_chain_independently(self, spark):
        """A path under BOTH rules unions two separate adjacency
        chains — the qualified subset contributes its own pair."""
        got = self._pairs(
            spark,
            [("a", "type", "C"),
             ("v1", "type", "D"), ("v3", "type", "D"),
             ("a", "p", "v1"), ("a", "p", "v2"), ("a", "p", "v3")],
            [("C", "maxCardinality1", "p"),
             ("C", "maxQualifiedCardinality1", "p|D")],
        )
        assert got == {("v1", "v2"), ("v2", "v3"), ("v1", "v3")}

    def test_no_axioms_raises(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="declares no"):
            self._viol(spark, [("a", "type", "C")],
                       [("C", "maxCardinality1", "p")])
        with _pytest.raises(ValueError, match="declares no"):
            self._pairs(spark, [("a", "type", "C")],
                        [("C", "maxCardinality0", "p")])

    def test_bad_qualified_spec_raises(self, spark):
        import pytest as _pytest
        with _pytest.raises(ValueError, match="path\\|FillerClass"):
            self._viol(spark, [("a", "type", "C")],
                       [("C", "maxQualifiedCardinality0", "nofiller")])

    def test_randomized_twin_equivalence(self, spark):
        import random

        from nlp_series_relation_extraction_spark.operators.ontology \
            import max_cardinality_python_twin

        rng = random.Random(11)
        nodes = [f"n{i}" for i in range(10)]
        classes = ["C", "D", "E"]
        preds = ["p", "q", "type"]
        facts = list({
            (rng.choice(nodes), rng.choice(preds),
             rng.choice(nodes + classes))
            for _ in range(300)
        })
        onto = [
            ("C", "maxCardinality0", "p"),
            ("D", "maxQualifiedCardinality0", "q|E"),
            ("C", "maxCardinality1", "q"),
            ("D", "maxQualifiedCardinality1", "p|C"),
        ]
        want_viols, want_pairs = max_cardinality_python_twin(facts, onto)
        got_viols = self._viol(spark, facts, onto)
        got_pairs = self._pairs(spark, facts, onto)
        assert got_viols == want_viols
        assert got_pairs == want_pairs
        assert len(want_viols) > 5 and len(want_pairs) > 5


class TestNegativeAssertions:
    """prp-npa1/npa2 — asserted negative property assertions."""

    def _run(self, spark, facts, negatives):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import negative_assertion_violations

        out = negative_assertion_violations(
            _df(spark, facts,
                "subj string, predicate string, obj string"),
            _df(spark, negatives,
                "subj string, predicate string, obj string"),
        )
        return {tuple(r) for r in out.collect()}

    def test_only_asserted_negatives_fire(self, spark):
        got = self._run(
            spark,
            [("a", "p", "b"), ("a", "p", "c"), ("b", "q", "a")],
            [("a", "p", "b"),            # asserted: violation
             ("a", "p", "z"),            # not asserted: fine
             ("b", "p", "a")],           # different predicate: fine
        )
        assert got == {("a", "p", "b")}

    def test_duplicates_collapse(self, spark):
        got = self._run(
            spark,
            [("a", "p", "b"), ("a", "p", "b")],
            [("a", "p", "b"), ("a", "p", "b")],
        )
        assert got == {("a", "p", "b")}

    def test_randomized_twin_equivalence(self, spark):
        import random

        from nlp_series_relation_extraction_spark.operators.ontology \
            import negative_assertion_python_twin

        rng = random.Random(23)
        nodes = [f"n{i}" for i in range(8)]
        preds = ["p", "q"]
        mk = lambda n: list({
            (rng.choice(nodes), rng.choice(preds), rng.choice(nodes))
            for _ in range(n)
        })
        facts, negs = mk(120), mk(60)
        got = self._run(spark, facts, negs)
        want = negative_assertion_python_twin(facts, negs)
        assert got == want
        assert len(want) > 5


class TestComplementOf:
    """cls-com via disjoint_violations(kind='complementOf')."""

    def test_complement_pairs_fire(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import disjoint_violations

        facts = _df(
            spark,
            [("a", "type", "Active"), ("a", "type", "Inactive"),
             ("b", "type", "Active"),
             ("c", "type", "Inactive")],
            "subj string, predicate string, obj string",
        )
        onto = _df(
            spark,
            [("Active", "complementOf", "Inactive"),
             ("Active", "disjointWith", "Retired")],  # other kind ignored
            "s string, p string, o string",
        )
        out = disjoint_violations(facts, onto, kind="complementOf")
        assert {tuple(r) for r in out.collect()} == {
            ("a", "Active", "Inactive")
        }


def _onto_list(head, members):
    rows = []
    for i, m in enumerate(members):
        cell = head if i == 0 else f"{head}#{i}"
        nxt = f"{head}#{i + 1}" if i + 1 < len(members) else "rdf:nil"
        rows.append((cell, "rdf:first", m))
        rows.append((cell, "rdf:rest", nxt))
    return rows


class TestAllDifferent:
    """eq-diff2/eq-diff3 via RDF-list axioms + canonical grouping."""

    def _run(self, spark, onto, entailed):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import all_different_violations

        out = all_different_violations(
            _df(spark, onto, "s string, p string, o string"),
            _df(spark, entailed,
                "subj string, predicate string, obj string"),
        )
        return {tuple(r) for r in out.collect()}

    def test_merged_members_fire_group(self, spark):
        onto = (
            [("ax1", "allDifferentMembers", "L1")]
            + _onto_list("L1", ["a", "b", "c"])
        )
        entailed = [("b", "sameAs", "a"), ("z", "sameAs", "a")]
        got = self._run(spark, onto, entailed)
        # a and b share canon 'a'; c alone never reported; z not a member
        assert got == {("ax1", "a", "a"), ("ax1", "a", "b")}

    def test_three_way_merge_reports_all(self, spark):
        onto = (
            [("ax1", "allDifferentMembers", "L1")]
            + _onto_list("L1", ["a", "b", "c", "d"])
        )
        entailed = [("b", "sameAs", "a"), ("c", "sameAs", "a")]
        got = self._run(spark, onto, entailed)
        assert got == {("ax1", "a", "a"), ("ax1", "a", "b"),
                       ("ax1", "a", "c")}

    def test_axioms_are_independent(self, spark):
        onto = (
            [("ax1", "allDifferentMembers", "L1"),
             ("ax2", "allDifferentMembers", "L2")]
            + _onto_list("L1", ["a", "b"])
            + _onto_list("L2", ["a", "c"])
        )
        entailed = [("b", "sameAs", "a")]
        got = self._run(spark, onto, entailed)
        assert got == {("ax1", "a", "a"), ("ax1", "a", "b")}

    def test_no_merges_is_empty(self, spark):
        onto = (
            [("ax1", "allDifferentMembers", "L1")]
            + _onto_list("L1", ["a", "b"])
        )
        assert self._run(spark, onto, [("x", "other", "y")]) == set()


class TestAllDisjointClasses:
    """cax-adc via RDF-list axioms + per-entity held-class grouping."""

    def _run(self, spark, facts, onto):
        from nlp_series_relation_extraction_spark.operators.ontology \
            import all_disjoint_classes_violations

        out = all_disjoint_classes_violations(
            _df(spark, facts,
                "subj string, predicate string, obj string"),
            _df(spark, onto, "s string, p string, o string"),
        )
        return {tuple(r) for r in out.collect()}

    def test_doubly_typed_entity_fires(self, spark):
        onto = (
            [("ax1", "allDisjointMembers", "L1")]
            + _onto_list("L1", ["Cat", "Dog", "Fish"])
        )
        facts = [
            ("rex", "type", "Cat"), ("rex", "type", "Dog"),
            ("tom", "type", "Cat"),
            ("nem", "type", "Fish"), ("nem", "type", "Plant"),
        ]
        got = self._run(spark, facts, onto)
        assert got == {("ax1", "rex", "Cat"), ("ax1", "rex", "Dog")}

    def test_triple_typed_reports_all_three(self, spark):
        onto = (
            [("ax1", "allDisjointMembers", "L1")]
            + _onto_list("L1", ["A", "B", "C"])
        )
        facts = [("x", "type", "A"), ("x", "type", "B"),
                 ("x", "type", "C")]
        got = self._run(spark, facts, onto)
        assert got == {("ax1", "x", "A"), ("ax1", "x", "B"),
                       ("ax1", "x", "C")}

    def test_classes_outside_axiom_ignored(self, spark):
        onto = (
            [("ax1", "allDisjointMembers", "L1")]
            + _onto_list("L1", ["A", "B"])
        )
        facts = [("x", "type", "A"), ("x", "type", "Z")]
        assert self._run(spark, facts, onto) == set()


# --- OWL 2 RL equivalences (cax-eqc1/2, prp-eqp1/2) ----------------------


class TestEquivalences:
    ONTO_EQ = ONTO + [
        ("employedBy", "equivalentProperty", "worksFor"),
        ("Staff", "equivalentClass", "Person"),
    ]

    def test_equivalent_property_fires_both_ways(self, spark):
        got = _run(
            spark,
            [("d", "employedBy", "acme"), ("e", "worksFor", "beta")],
            self.ONTO_EQ,
        )
        # prp-eqp1: employedBy fact entails the worksFor fact...
        assert ("d", "worksFor", "acme") in got
        # ...and composes with rdfs7 and rdfs2/3 above worksFor
        assert ("d", "memberOf", "acme") in got
        assert ("d", "type", "Person") in got
        assert ("acme", "type", "Org") in got
        # prp-eqp2: the other direction
        assert ("e", "employedBy", "beta") in got

    def test_equivalent_class_fires_both_ways(self, spark):
        got = _run(
            spark,
            [("s", "type", "Staff"), ("p", "type", "Intern")],
            self.ONTO_EQ,
        )
        # cax-eqc1 + rdfs9 through the equivalence
        assert ("s", "type", "Person") in got
        assert ("s", "type", "Agent") in got
        # cax-eqc2: Person-typed (via Intern) entails Staff
        assert ("p", "type", "Person") in got
        assert ("p", "type", "Staff") in got

    def test_twin_parity_with_equivalences(self, spark):
        facts = FACTS + [("d", "employedBy", "acme"), ("s", "type", "Staff")]
        assert _run(spark, facts, self.ONTO_EQ) == (
            rdfs_entailment_python_twin(facts, self.ONTO_EQ)
        )


# --- scm-* schema (TBox) closure -----------------------------------------


class TestSchemaClosure:
    ONTO_SCM = [
        ("A", "type", "Class"),
        ("B", "type", "Class"),
        ("A", "subClassOf", "B"),
        ("B", "subClassOf", "A"),
        ("C", "subClassOf", "A"),
        ("p", "type", "ObjectProperty"),
        ("p", "equivalentProperty", "q"),
        ("q", "domain", "B"),
        ("q", "range", "C"),
        ("r", "subPropertyOf", "p"),
    ]

    def _closed(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            schema_closure,
        )

        df = schema_closure(
            _df(spark, self.ONTO_SCM, "s string, p string, o string")
        )
        return {(r.s, r.p, r.o) for r in df.collect()}

    def test_rule_inventory(self, spark):
        c = self._closed(spark)
        # scm-cls reflexives + Thing/Nothing bounds
        assert ("A", "subClassOf", "A") in c
        assert ("A", "subClassOf", "owl:Thing") in c
        assert ("owl:Nothing", "subClassOf", "B") in c
        # scm-eqc2 from the mutual subsumption
        assert ("A", "equivalentClass", "B") in c
        # scm-eqc1 is its inverse direction
        assert ("B", "subClassOf", "A") in c
        # scm-sco through the cycle
        assert ("C", "subClassOf", "B") in c
        # scm-op + scm-eqp1/2
        assert ("p", "subPropertyOf", "p") in c
        assert ("p", "subPropertyOf", "q") in c
        assert ("q", "equivalentProperty", "p") in c or (
            "p",
            "equivalentProperty",
            "q",
        ) in c
        # scm-dom1/dom2 and scm-rng1/rng2 compose through spo and sco
        assert ("p", "domain", "B") in c
        assert ("p", "domain", "A") in c  # B subClassOf A
        assert ("r", "domain", "A") in c  # r subPropertyOf p
        assert ("r", "range", "C") in c
        assert ("r", "range", "B") in c  # C subClassOf A ... A sco B

    def test_matches_python_twin_and_contains_input(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            schema_closure_python,
        )

        c = self._closed(spark)
        assert c == schema_closure_python(self.ONTO_SCM)
        assert set(self.ONTO_SCM) <= c

    def test_idempotent(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            schema_closure_python,
        )

        c = schema_closure_python(self.ONTO_SCM)
        assert schema_closure_python(sorted(c)) == c

    def test_oversized_rejected(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            schema_closure,
        )

        big = _df(spark, self.ONTO_SCM, "s string, p string, o string")
        with pytest.raises(ValueError, match="schema-sized"):
            schema_closure(big, max_ontology_rows=3)


class TestAllDisjointProperties:
    ONTO = [
        ("axp", "allDisjointPropertyMembers", "L"),
        ("L", "rdf:first", "paid"), ("L", "rdf:rest", "L1"),
        ("L1", "rdf:first", "disputed"), ("L1", "rdf:rest", "L2"),
        ("L2", "rdf:first", "comped"), ("L2", "rdf:rest", "rdf:nil"),
    ]

    def _run(self, spark, facts):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            all_disjoint_properties_violations,
        )

        out = all_disjoint_properties_violations(
            _df(spark, facts, "subj string, predicate string, obj string"),
            _df(spark, self.ONTO, "s string, p string, o string"),
        )
        return sorted(
            (r.axiom, r.subj, r.obj, r.predicate) for r in out.collect()
        )

    def test_pairs_with_two_members_report_each_held_property(self, spark):
        facts = [
            ("c1", "paid", "o1"), ("c1", "disputed", "o1"),   # violates
            ("c1", "paid", "o2"),                                # fine
            ("c2", "paid", "o3"), ("c2", "comped", "o3"),
            ("c2", "disputed", "o3"),                            # 3-way
            ("c3", "placed", "o4"), ("c3", "paid", "o4"),       # non-member
            ("c4", "paid", "o5"), ("c4", "paid", "o5"),         # dup fact
        ]
        got = self._run(spark, facts)
        assert got == [
            ("axp", "c1", "o1", "disputed"),
            ("axp", "c1", "o1", "paid"),
            ("axp", "c2", "o3", "comped"),
            ("axp", "c2", "o3", "disputed"),
            ("axp", "c2", "o3", "paid"),
        ]

    def test_no_axiom_members_no_violations(self, spark):
        from nlp_series_relation_extraction_spark.operators.ontology import (
            all_disjoint_properties_violations,
        )

        facts = _df(
            spark,
            [("c1", "paid", "o1"), ("c1", "disputed", "o1")],
            "subj string, predicate string, obj string",
        )
        onto = _df(spark, [("x", "unrelated", "y")],
                   "s string, p string, o string")
        assert all_disjoint_properties_violations(facts, onto).count() == 0
