"""SKOS vocabulary QA (operators/skos.py): each rule on hand-built
schemes plus a randomized twin equivalence run."""

import random

from nlp_series_relation_extraction_spark.operators.skos import (
    skos_report,
    skos_report_python_twin,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows,
        "subj string, predicate string, obj string, "
        "obj_kind string, lang string",
    )


def _run(spark, rows):
    return {tuple(r) for r in skos_report(_df(spark, rows)).collect()}


def _lbl(s, text, lang):
    return (s, "skos:prefLabel", text, "literal", lang)


def _iri(s, p, o):
    return (s, p, o, "iri", None)


class TestSkosReport:
    def test_multi_pref_label(self, spark):
        rows = [
            _lbl("a", "Chair", "en"), _lbl("a", "Seat", "en"),
            _lbl("a", "Chaise", "fr"),
            _lbl("b", "Table", "en"),
            _lbl("c", "plain1", None), _lbl("c", "plain2", None),
        ]
        assert _run(spark, rows) == {("multi-pref-label", "a", "en")}

    def test_broader_cycle(self, spark):
        rows = [
            _iri("a", "skos:broader", "b"),
            _iri("b", "skos:broader", "c"),
            _iri("c", "skos:broader", "a"),     # 3-cycle
            _iri("d", "skos:broader", "d"),     # self-loop
            _iri("e", "skos:broader", "a"),     # into the cycle: e is
        ]                                        # NOT itself cyclic
        got = _run(spark, rows)
        cyc = {(r[1], r[2]) for r in got if r[0] == "broader-cycle"}
        assert {"a", "b", "c", "d"} == {s for s, _ in cyc}
        assert ("d", "d") in cyc
        assert "e" not in {s for s, _ in cyc}

    def test_related_broader_clash_both_orientations(self, spark):
        rows = [
            _iri("x", "skos:broader", "m"),
            _iri("m", "skos:broader", "top"),
            _iri("top", "skos:related", "x"),   # clashes via closure
            _iri("p", "skos:related", "q"),     # unrelated: fine
        ]
        got = {r for r in _run(spark, rows)
               if r[0] == "related-broader-clash"}
        assert got == {("related-broader-clash", "x", "top")}

    def test_orphan_and_false_top(self, spark):
        rows = [
            _iri("root", "skos:topConceptOf", "S"),
            _iri("kid", "skos:broader", "root"),
            _iri("kid", "skos:inScheme", "S"),
            _iri("lost", "skos:inScheme", "S"),           # orphan
            _iri("fake", "skos:topConceptOf", "S"),
            _iri("fake", "skos:broader", "root"),          # false top
        ]
        got = _run(spark, rows)
        assert ("orphan-concept", "lost", "S") in got
        assert ("top-with-broader", "fake", "S") in got
        assert not any(r[1] in ("root", "kid") for r in got)

    def test_clean_scheme_is_empty(self, spark):
        rows = [
            _iri("root", "skos:topConceptOf", "S"),
            _iri("kid", "skos:broader", "root"),
            _iri("kid", "skos:inScheme", "S"),
            _lbl("kid", "Kid", "en"), _lbl("kid", "Enfant", "fr"),
        ]
        assert _run(spark, rows) == set()

    def test_randomized_twin_equivalence(self, spark):
        rng = random.Random(41)
        concepts = [f"k{i}" for i in range(14)]
        rows = []
        for c in concepts:
            for la in ("en", "fr"):
                for _ in range(rng.randrange(3)):
                    rows.append(_lbl(c, f"t{rng.randrange(30)}", la))
            if rng.random() < 0.7:
                rows.append(
                    _iri(c, "skos:broader", rng.choice(concepts))
                )
            if rng.random() < 0.4:
                rows.append(
                    _iri(c, "skos:related", rng.choice(concepts))
                )
            if rng.random() < 0.5:
                rows.append(_iri(c, "skos:inScheme", "S"))
            if rng.random() < 0.2:
                rows.append(_iri(c, "skos:topConceptOf", "S"))
        rows = list(set(rows))
        got = _run(spark, rows)
        want = skos_report_python_twin(rows)
        assert got == want
        assert len(want) > 5
