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


class TestShaclRound5Components:
    """sh:datatype, sh:minLength/maxLength, value-range (§4.3), and
    property-pair (§4.6) components."""

    def test_datatype_component(self, spark):
        facts = [
            ("c1", "age", "42"),
            ("c2", "age", "-7"),
            ("c3", "age", "4.5"),      # not xsd:integer
            ("c4", "age", "forty"),    # not a number at all
        ]
        types = [(f"c{i}", "C") for i in range(1, 5)]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, types),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "age", "datatype": "xsd:integer"},
                ]}],
            )
        )
        assert got == {
            ("c3", "S", "age", "datatype", "4.5"),
            ("c4", "S", "age", "datatype", "forty"),
        }

    def test_datatype_date_and_boolean(self, spark):
        facts = [
            ("c1", "born", "1991-05-17"),
            ("c2", "born", "1991-5-17"),     # not padded: violates
            ("c1", "ok", "true"),
            ("c2", "ok", "yes"),             # violates
        ]
        types = [("c1", "C"), ("c2", "C")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, types),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "born", "datatype": "xsd:date"},
                    {"path": "ok", "datatype": "xsd:boolean"},
                ]}],
            )
        )
        assert got == {
            ("c2", "S", "born", "datatype", "1991-5-17"),
            ("c2", "S", "ok", "datatype", "yes"),
        }

    def test_length_components(self, spark):
        facts = [("c1", "code", "ab"), ("c1", "code", "abcdef"),
                 ("c1", "code", "abcd")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, [("c1", "C")]),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "code", "min_length": 3, "max_length": 5},
                ]}],
            )
        )
        assert got == {
            ("c1", "S", "code", "minLength", "ab"),
            ("c1", "S", "code", "maxLength", "abcdef"),
        }

    def test_range_components_and_noncomparable(self, spark):
        facts = [
            ("c1", "score", "5"),
            ("c1", "score", "0"),       # < minInclusive 1
            ("c1", "score", "10"),      # == maxInclusive: fine
            ("c1", "score", "11"),      # > maxInclusive
            ("c1", "score", "NaNish"),  # not comparable: violates both
        ]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, [("c1", "C")]),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "score", "min_inclusive": 1,
                     "max_inclusive": 10},
                ]}],
            )
        )
        assert got == {
            ("c1", "S", "score", "minInclusive", "0"),
            ("c1", "S", "score", "maxInclusive", "11"),
            ("c1", "S", "score", "minInclusive", "NaNish"),
            ("c1", "S", "score", "maxInclusive", "NaNish"),
        }

    def test_exclusive_bounds(self, spark):
        facts = [("c1", "x", "1"), ("c1", "x", "2"), ("c1", "x", "3")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, [("c1", "C")]),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "x", "min_exclusive": 1, "max_exclusive": 3},
                ]}],
            )
        )
        assert got == {
            ("c1", "S", "x", "minExclusive", "1"),
            ("c1", "S", "x", "maxExclusive", "3"),
        }

    def test_equals_pair(self, spark):
        facts = [
            ("c1", "ship", "NY"), ("c1", "bill", "NY"),   # equal: fine
            ("c2", "ship", "LA"), ("c2", "bill", "SF"),   # both sides
            ("c3", "ship", "TX"),                          # one side only
        ]
        types = [("c1", "C"), ("c2", "C"), ("c3", "C")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, types),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "ship", "equals": "bill"},
                ]}],
            )
        )
        assert got == {
            ("c2", "S", "ship", "equals", "LA"),
            ("c2", "S", "ship", "equals", "SF"),
            ("c3", "S", "ship", "equals", "TX"),
        }

    def test_disjoint_pair(self, spark):
        facts = [
            ("c1", "likes", "a"), ("c1", "owns", "b"),    # disjoint: fine
            ("c2", "likes", "a"), ("c2", "owns", "a"),    # shared value
        ]
        types = [("c1", "C"), ("c2", "C")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, types),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "likes", "disjoint": "owns"},
                ]}],
            )
        )
        assert got == {("c2", "S", "likes", "disjoint", "a")}

    def test_less_than_pair(self, spark):
        facts = [
            ("c1", "start", "1"), ("c1", "end", "5"),     # fine
            ("c2", "start", "7"), ("c2", "end", "3"),     # 7 >= 3
            ("c3", "start", "2"), ("c3", "end", "oops"),  # not comparable
        ]
        types = [("c1", "C"), ("c2", "C"), ("c3", "C")]
        got = _collect(
            shacl_validate(
                _facts(spark, facts), _types(spark, types),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "start", "less_than": "end"},
                ]}],
            )
        )
        assert got == {
            ("c2", "S", "start", "lessThan", "7!<3"),
            ("c3", "S", "start", "lessThan", "2!<oops"),
        }

    def test_unsupported_datatype_raises(self, spark):
        with pytest.raises(ValueError, match="not supported"):
            shacl_validate(
                _facts(spark, [("c1", "p", "v")]),
                _types(spark, [("c1", "C")]),
                [{"shape": "S", "target_class": "C", "properties": [
                    {"path": "p", "datatype": "xsd:duration"},
                ]}],
            )

    def test_randomized_twin_equivalence_round5(self, spark):
        rng = random.Random(11)
        nodes = [f"e{i}" for i in range(30)]
        numerics = [str(x) for x in
                    [0, 1, 2.5, 3, 7, 10, 11, -4, "x", "1991-05-17"]]
        facts = [
            (rng.choice(nodes), rng.choice(["a", "b", "c", "d"]),
             rng.choice(numerics + nodes))
            for _ in range(400)
        ]
        types = list({(n, rng.choice(["T", "U"])) for n in nodes})
        shapes = [
            {"shape": "TS", "target_class": "T", "properties": [
                {"path": "a", "datatype": "xsd:integer"},
                {"path": "b", "min_inclusive": 0, "max_exclusive": 10},
                {"path": "c", "min_length": 2, "max_length": 3},
            ]},
            {"shape": "US", "target_class": "U", "properties": [
                {"path": "a", "equals": "b"},
                {"path": "c", "disjoint": "d"},
                {"path": "b", "less_than": "c"},
            ]},
        ]
        got = _collect(
            shacl_validate(_facts(spark, facts), _types(spark, types),
                           shapes)
        )
        want = shacl_validate_python_twin(facts, types, shapes)
        assert got == want
        assert len(want) > 20


class TestShaclClosed:
    """sh:closed + sh:ignoredProperties (§4.8.1)."""

    def _run(self, spark, facts, types, shapes):
        return _collect(
            shacl_validate(_facts(spark, facts), _types(spark, types),
                           shapes)
        )

    def test_closed_reports_undeclared_paths(self, spark):
        got = self._run(
            spark,
            [("c1", "hasName", "N1"), ("c1", "rogue", "v"),
             ("c1", "noted", "w"),
             ("x9", "rogue", "v2")],         # not a target: ignored
            [("c1", "Customer"), ("x9", "Widget")],
            [{"shape": "S", "target_class": "Customer",
              "closed": True, "ignored": ["noted"],
              "properties": [{"path": "hasName", "min_count": 1}]}],
        )
        assert got == {("c1", "S", "rogue", "closed", "v")}

    def test_closed_only_shape(self, spark):
        """A shape may be pure-closed (no property constraints)."""
        got = self._run(
            spark,
            [("c1", "anything", "v")],
            [("c1", "Customer")],
            [{"shape": "S", "target_class": "Customer",
              "closed": True, "ignored": ["noted"],
              "properties": []}],
        )
        assert got == {("c1", "S", "anything", "closed", "v")}

    def test_ignored_without_closed_raises(self, spark):
        with pytest.raises(ValueError, match="requires 'closed'"):
            self._run(spark, [("c1", "p", "v")], [("c1", "Customer")],
                      [{"shape": "S", "target_class": "Customer",
                        "ignored": ["noted"],
                        "properties": [{"path": "p", "min_count": 1}]}])

    def test_randomized_twin_with_closed(self, spark):
        rng = random.Random(7)
        nodes = [f"c{i}" for i in range(8)]
        preds = ["hasName", "inNation", "rogue1", "rogue2", "noted"]
        facts = list({
            (rng.choice(nodes), rng.choice(preds), f"v{rng.randrange(6)}")
            for _ in range(150)
        })
        types = [(n, "Customer" if i % 2 == 0 else "Widget")
                 for i, n in enumerate(nodes)]
        shapes = [{"shape": "S", "target_class": "Customer",
                   "closed": True, "ignored": ["noted"],
                   "properties": [{"path": "hasName", "min_count": 1},
                                  {"path": "inNation", "max_count": 2}]}]
        got = self._run(spark, facts, types, shapes)
        want = shacl_validate_python_twin(facts, types, shapes)
        assert got == want
        assert any(r[3] == "closed" for r in want)


class TestShaclTerms:
    """sh:nodeKind / sh:uniqueLang / sh:languageIn over parsed frames."""

    def _run(self, spark, parsed, types, shapes):
        from nlp_series_relation_extraction_spark.operators.shacl import (
            shacl_validate_terms,
        )
        pf = spark.createDataFrame(
            parsed,
            "subj string, predicate string, obj string, "
            "obj_kind string, lang string",
        )
        return _collect(
            shacl_validate_terms(pf, _types(spark, types), shapes)
        )

    TYPES = [("c1", "Customer"), ("c2", "Customer"), ("x9", "Widget")]

    def test_node_kind(self, spark):
        parsed = [
            ("c1", "knows", "http://x/e1", "iri", None),
            ("c1", "knows", "_:b0", "bnode", None),
            ("c1", "knows", "plain", "literal", None),
            ("x9", "knows", "plain2", "literal", None),  # not a target
        ]
        shapes = [{"shape": "S", "target_class": "Customer",
                   "properties": [{"path": "knows",
                                   "node_kind": "BlankNodeOrIRI"}]}]
        got = self._run(spark, parsed, self.TYPES, shapes)
        assert got == {("c1", "S", "knows", "nodeKind", "plain")}

    def test_unique_lang(self, spark):
        parsed = [
            ("c1", "label", "Chair", "literal", "en"),
            ("c1", "label", "Seat", "literal", "en"),     # dup en
            ("c1", "label", "Chaise", "literal", "fr"),
            ("c2", "label", "Table", "literal", "en"),    # singleton
            ("c2", "label", "plain", "literal", None),    # untagged x2:
            ("c2", "label", "plain2", "literal", None),   # never conflict
        ]
        shapes = [{"shape": "S", "target_class": "Customer",
                   "properties": [{"path": "label",
                                   "unique_lang": True}]}]
        got = self._run(spark, parsed, self.TYPES, shapes)
        assert got == {("c1", "S", "label", "uniqueLang", "en")}

    def test_language_in(self, spark):
        parsed = [
            ("c1", "label", "Chair", "literal", "en"),
            ("c1", "label", "Stuhl", "literal", "de"),    # not allowed
            ("c1", "label", "bare", "literal", None),     # untagged
            ("c1", "label", "http://x/e1", "iri", None),  # IRI
        ]
        shapes = [{"shape": "S", "target_class": "Customer",
                   "properties": [{"path": "label",
                                   "language_in": ["en", "fr"]}]}]
        got = self._run(spark, parsed, self.TYPES, shapes)
        assert got == {
            ("c1", "S", "label", "languageIn", "Stuhl"),
            ("c1", "S", "label", "languageIn", "bare"),
            ("c1", "S", "label", "languageIn", "http://x/e1"),
        }

    def test_bad_node_kind_raises(self, spark):
        with pytest.raises(ValueError, match="not one of"):
            self._run(spark, [("c1", "p", "v", "iri", None)], self.TYPES,
                      [{"shape": "S", "target_class": "Customer",
                        "properties": [{"path": "p",
                                        "node_kind": "Iri"}]}])

    def test_empty_language_in_raises(self, spark):
        with pytest.raises(ValueError, match="non-empty tag list"):
            self._run(spark, [("c1", "p", "v", "iri", None)], self.TYPES,
                      [{"shape": "S", "target_class": "Customer",
                        "properties": [{"path": "p",
                                        "language_in": []}]}])

    def test_randomized_twin_equivalence(self, spark):
        from nlp_series_relation_extraction_spark.operators.shacl import (
            shacl_terms_python_twin,
        )
        rng = random.Random(19)
        nodes = [f"c{i}" for i in range(8)]
        kinds = ["iri", "bnode", "literal"]
        langs = [None, "en", "fr", "de"]
        parsed = list({
            (rng.choice(nodes), rng.choice(["label", "knows"]),
             f"v{rng.randrange(12)}", rng.choice(kinds),
             rng.choice(langs))
            for _ in range(250)
        })
        # lang only makes sense on literals — mirror the parser contract
        parsed = [
            (s, p, o, k, la if k == "literal" else None)
            for s, p, o, k, la in parsed
        ]
        types = [(n, "Customer" if i % 2 == 0 else "Widget")
                 for i, n in enumerate(nodes)]
        shapes = [{"shape": "S", "target_class": "Customer",
                   "properties": [
                       {"path": "knows", "node_kind": "BlankNodeOrIRI"},
                       {"path": "label", "unique_lang": True,
                        "language_in": ["en", "fr"]},
                   ]}]
        got = self._run(spark, parsed, types, shapes)
        want = shacl_terms_python_twin(parsed, types, shapes)
        assert got == want
        for comp in ("nodeKind", "uniqueLang", "languageIn"):
            assert any(r[3] == comp for r in want)
