"""Rule application / KG completion (operators/graph.py:
apply_composition_rules): held-out-fact recovery through the
mine->apply composition, known-fact exclusion, max-confidence and
n_rules conventions. kg_rule_apply carries the bit-exact DuckDB oracle
(tests/test_oracle_crosscheck.py)."""

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.graph import (
    apply_composition_rules,
    mine_composition_rules,
)


def _edges(spark, triples):
    return spark.createDataFrame(
        [(s, p, o) for s, p, o in triples],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )


def _rules(spark, rows):
    return spark.createDataFrame(
        rows, "p1 string, p2 string, p3 string, confidence_ppm long"
    )


class TestApplyCompositionRules:
    def test_recovers_held_out_fact(self, spark):
        # in(x, y) ^ part_of(y, z) => located(x, z); located planted for
        # x=1..3 but WITHHELD for x=4 — mining then applying must
        # produce exactly the withheld fact
        triples = [(x, "in", 10) for x in (1, 2, 3, 4)]
        triples += [(10, "part_of", 20)]
        triples += [(x, "located", 20) for x in (1, 2, 3)]
        e = _edges(spark, triples)
        rules = mine_composition_rules(
            e, min_support=2, min_confidence_ppm=500_000
        )
        got = apply_composition_rules(e, rules).collect()
        assert [(r.subj_entity_id, r.predicate, r.obj_entity_id)
                for r in got] == [(4, "located", 20)]
        # rule confidence = 3/4
        assert got[0].confidence_ppm == 750_000
        assert got[0].n_rules == 1

    def test_known_facts_never_re_predicted(self, spark):
        triples = [(1, "in", 10), (10, "part_of", 20), (1, "located", 20)]
        e = _edges(spark, triples)
        rules = _rules(spark, [("in", "part_of", "located", 1_000_000)])
        assert apply_composition_rules(e, rules).collect() == []

    def test_max_confidence_over_multiple_rules(self, spark):
        # two rules predict (1, located, 20) with different confidences
        triples = [
            (1, "in", 10), (10, "part_of", 20),
            (1, "near", 11), (11, "part_of", 20),
        ]
        e = _edges(spark, triples)
        rules = _rules(
            spark,
            [
                ("in", "part_of", "located", 600_000),
                ("near", "part_of", "located", 800_000),
            ],
        )
        got = apply_composition_rules(e, rules).collect()
        assert len(got) == 1
        assert got[0].confidence_ppm == 800_000
        assert got[0].n_rules == 2

    def test_empty_rules_empty_output(self, spark):
        e = _edges(spark, [(1, "in", 10), (10, "part_of", 20)])
        rules = _rules(spark, [])
        assert apply_composition_rules(e, rules).collect() == []

    def test_partitioning_invariant(self, spark):
        triples = [(x, "in", x % 3 + 10) for x in range(30)]
        triples += [(y, "part_of", 20) for y in (10, 11, 12)]
        triples += [(x, "located", 20) for x in range(0, 30, 2)]
        e = _edges(spark, triples)
        rules = _rules(spark, [("in", "part_of", "located", 500_000)])
        a = sorted(map(tuple, apply_composition_rules(
            e.repartition(7), rules
        ).collect()))
        b = sorted(map(tuple, apply_composition_rules(
            e.coalesce(1), rules
        ).collect()))
        assert a == b and len(a) == 15
