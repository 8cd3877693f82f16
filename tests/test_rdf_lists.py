"""RDF collection flattening (operators/rdf_lists.py): Wyllie
pointer-jumping ranking vs the sequential-walk twin, anomaly
reporting, deep chains, and the cycle guard."""

import random

import pytest

from nlp_series_relation_extraction_spark.operators.rdf_lists import (
    flatten_rdf_lists,
    flatten_rdf_lists_python_twin,
    rdf_list_anomalies,
)


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "subj string, predicate string, obj string"
    )


def _chain(head: str, members: list[str]) -> list[tuple[str, str, str]]:
    rows = []
    for i, m in enumerate(members):
        cell = head if i == 0 else f"{head}#{i}"
        nxt = f"{head}#{i + 1}" if i + 1 < len(members) else "rdf:nil"
        rows.append((cell, "rdf:first", m))
        rows.append((cell, "rdf:rest", nxt))
    return rows


def _run(spark, rows, **kw):
    return {
        tuple(r)
        for r in flatten_rdf_lists(_df(spark, rows), **kw).collect()
    }


class TestFlatten:
    def test_single_list(self, spark):
        got = _run(spark, _chain("L", ["a", "b", "c"]))
        assert got == {("L", 0, "a"), ("L", 1, "b"), ("L", 2, "c")}

    def test_singleton_and_forest(self, spark):
        rows = (
            _chain("L1", ["x"])
            + _chain("L2", ["p", "q"])
            + [("n1", "knows", "n2")]  # non-list facts ignored
        )
        got = _run(spark, rows)
        assert got == {
            ("L1", 0, "x"), ("L2", 0, "p"), ("L2", 1, "q"),
        }

    def test_deep_chain_needs_doubling(self, spark):
        members = [f"m{i}" for i in range(130)]
        got = _run(spark, _chain("D", members))
        assert got == {("D", i, m) for i, m in enumerate(members)}

    def test_cycle_raises(self, spark):
        rows = [
            ("a", "rdf:first", "x"), ("a", "rdf:rest", "b"),
            ("b", "rdf:first", "y"), ("b", "rdf:rest", "a"),
        ]
        with pytest.raises(ValueError, match="cycle"):
            _run(spark, rows, max_rounds=6)

    def test_randomized_twin_equivalence(self, spark):
        rng = random.Random(31)
        rows = []
        for li in range(12):
            n = rng.randrange(1, 20)
            rows += _chain(f"L{li}", [f"v{rng.randrange(40)}"
                                      for _ in range(n)])
        got = _run(spark, rows)
        want = flatten_rdf_lists_python_twin(rows)
        assert got == want
        assert len(want) > 50


class TestAnomalies:
    def _run(self, spark, rows):
        return {
            tuple(r)
            for r in rdf_list_anomalies(_df(spark, rows)).collect()
        }

    def test_clean_forest_is_empty(self, spark):
        rows = _chain("L", ["a", "b"]) + _chain("M", ["c"])
        assert self._run(spark, rows) == set()

    def test_all_four_rules(self, spark):
        rows = [
            # shared tail: t has two predecessors (and no first)
            ("a", "rdf:first", "x"), ("a", "rdf:rest", "t"),
            ("b", "rdf:first", "y"), ("b", "rdf:rest", "t"),
            # multi-first + multi-rest on c (nil successors never count)
            ("c", "rdf:first", "u"), ("c", "rdf:first", "v"),
            ("c", "rdf:rest", "rdf:nil"),
            ("c", "rdf:rest", "d"),
            ("c", "rdf:rest", "e"),
        ]
        got = self._run(spark, rows)
        assert got == {
            ("shared-tail", "t", "2"),
            ("multi-first", "c", "2"),
            ("multi-rest", "c", "2"),
            ("no-first", "t", ""),
            ("no-first", "d", ""),
            ("no-first", "e", ""),
        }
