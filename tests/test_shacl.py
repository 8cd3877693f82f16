"""SHACL core validation (operators/shacl.py): each constraint
component against hand-built graphs, set-semantics of asserted facts,
target scoping, the empty report on conforming data, and a randomized
equivalence run against the plain-Python twin."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.shacl import (
    shacl_validate,
    shacl_validate_python_twin,
)


def _facts(spark, rows):
    return spark.createDataFrame(rows, "subj string, predicate string, obj string")


def _types(spark, rows):
    return spark.createDataFrame(rows, "node string, cls string")


def _collect(df):
    return {tuple(r) for r in df.collect()}


FACTS = [
    ("c1", "hasName", "Customer#1"),
    ("c1", "inNation", "n1"),
    ("c2", "inNation", "n1"),          # c2: no name -> minCount
    ("c2", "inNation", "n1"),          # duplicate assertion: one value
    ("c3", "hasName", "Customer#3"),
    ("c3", "hasName", "Other#3"),      # two names -> maxCount + pattern
    ("c3", "inNation", "x9"),          # x9 not a Nation -> class
    ("x9", "hasName", "notatarget"),   # not a Customer: ignored
]
TYPES = [
    ("c1", "Customer"),
    ("c2", "Customer"),
    ("c3", "Customer"),
    ("n1", "Nation"),
    ("x9", "Widget"),
]


class TestShaclValidate:
    def test_cardinality_components(self, spark):
        got = _collect(
            shacl_validate(
                _facts(spark, FACTS),
                _types(spark, TYPES),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [
                      {"path": "hasName", "min_count": 1, "max_count": 1},
                  ]}],
            )
        )
        assert got == {
            ("c2", "S", "hasName", "minCount", "0"),
            ("c3", "S", "hasName", "maxCount", "2"),
        }

    def test_min_count_sees_wholly_absent_nodes(self, spark):
        """A target with NO assertion for the path at all must appear
        with count 0 — the left join vs the targets frame."""
        got = _collect(
            shacl_validate(
                _facts(spark, [("c1", "other", "v")]),
                _types(spark, [("c1", "Customer"), ("c2", "Customer")]),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [{"path": "hasName", "min_count": 1}]}],
            )
        )
        assert got == {
            ("c1", "S", "hasName", "minCount", "0"),
            ("c2", "S", "hasName", "minCount", "0"),
        }

    def test_duplicate_assertions_are_one_value(self, spark):
        """Set semantics: re-extracting the same triple never trips
        maxCount (cf. cardinality_profile's dedup-first rule)."""
        got = _collect(
            shacl_validate(
                _facts(spark, [("c1", "hasName", "A"),
                               ("c1", "hasName", "A")]),
                _types(spark, [("c1", "Customer")]),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [{"path": "hasName", "max_count": 1}]}],
            )
        )
        assert got == set()

    def test_class_component(self, spark):
        got = _collect(
            shacl_validate(
                _facts(spark, FACTS),
                _types(spark, TYPES),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [{"path": "inNation", "cls": "Nation"}]}],
            )
        )
        assert got == {("c3", "S", "inNation", "class", "x9")}

    def test_has_value_component(self, spark):
        got = _collect(
            shacl_validate(
                _facts(spark, [("c1", "src", "tpch")]),
                _types(spark, [("c1", "Customer"), ("c2", "Customer")]),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [{"path": "src", "has_value": "tpch"}]}],
            )
        )
        assert got == {("c2", "S", "src", "hasValue", "tpch")}

    def test_in_and_pattern_components(self, spark):
        got = _collect(
            shacl_validate(
                _facts(spark, FACTS),
                _types(spark, TYPES),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [
                      {"path": "hasName", "pattern": "^Customer#"},
                      {"path": "inNation", "in": ["n1", "n2"]},
                  ]}],
            )
        )
        assert got == {
            ("c3", "S", "hasName", "pattern", "Other#3"),
            ("c3", "S", "inNation", "in", "x9"),
        }

    def test_non_targets_never_reported(self, spark):
        """x9 has a non-conforming name but is not a Customer."""
        got = _collect(
            shacl_validate(
                _facts(spark, FACTS),
                _types(spark, TYPES),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [
                      {"path": "hasName", "pattern": "^Customer#"},
                  ]}],
            )
        )
        assert {r[0] for r in got} == {"c3"}

    def test_conforming_graph_is_empty_report(self, spark):
        got = _collect(
            shacl_validate(
                _facts(spark, [("c1", "hasName", "Customer#1"),
                               ("c1", "inNation", "n1")]),
                _types(spark, [("c1", "Customer"), ("n1", "Nation")]),
                [{"shape": "S", "target_class": "Customer",
                  "properties": [
                      {"path": "hasName", "min_count": 1, "max_count": 1,
                       "pattern": "^Customer#"},
                      {"path": "inNation", "cls": "Nation",
                       "min_count": 1},
                  ]}],
            )
        )
        assert got == set()

    def test_validation_errors(self, spark):
        f, t = _facts(spark, FACTS), _types(spark, TYPES)
        with pytest.raises(ValueError, match="no shapes"):
            shacl_validate(f, t, [])
        with pytest.raises(ValueError, match="missing 'path'"):
            shacl_validate(
                f, t, [{"shape": "S", "target_class": "C",
                        "properties": [{"min_count": 1}]}])
        with pytest.raises(ValueError, match="unsupported constraint"):
            shacl_validate(
                f, t, [{"shape": "S", "target_class": "C",
                        "properties": [{"path": "p", "max_len": 3}]}])
        with pytest.raises(ValueError, match="no constraint component"):
            shacl_validate(
                f, t, [{"shape": "S", "target_class": "C",
                        "properties": [{"path": "p"}]}])
        with pytest.raises(ValueError, match="non-empty value list"):
            shacl_validate(
                f, t, [{"shape": "S", "target_class": "C",
                        "properties": [{"path": "p", "in": []}]}])

    def test_no_cartesian_in_plan(self, spark):
        df = shacl_validate(
            _facts(spark, FACTS),
            _types(spark, TYPES),
            [{"shape": "S", "target_class": "Customer",
              "properties": [
                  {"path": "hasName", "min_count": 1, "max_count": 2,
                   "pattern": "^C"},
                  {"path": "inNation", "cls": "Nation",
                   "in": ["n1"], "has_value": "n1"},
              ]}],
        )
        txt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "Cartesian" not in txt

    def test_randomized_twin_equivalence(self, spark):
        rng = random.Random(7)
        nodes = [f"e{i}" for i in range(40)]
        preds = ["a", "b", "c"]
        facts = [
            (rng.choice(nodes), rng.choice(preds),
             rng.choice(nodes + ["lit1", "lit2", "zz"]))
            for _ in range(300)
        ]
        types = list({
            (n, rng.choice(["T", "U", "V"])) for n in nodes
        })
        shapes = [
            {"shape": "TS", "target_class": "T", "properties": [
                {"path": "a", "min_count": 1, "max_count": 2},
                {"path": "b", "cls": "U"},
            ]},
            {"shape": "US", "target_class": "U", "properties": [
                {"path": "c", "in": ["lit1", "lit2"]},
                {"path": "a", "pattern": "^e"},
                {"path": "b", "has_value": "lit1"},
            ]},
        ]
        got = _collect(
            shacl_validate(_facts(spark, facts), _types(spark, types),
                           shapes)
        )
        want = shacl_validate_python_twin(facts, types, shapes)
        assert got == want
        assert len(want) > 10  # the random graph genuinely violates
