"""Incremental view maintenance (operators/maintenance.py:agg_view +
maintain_agg_view, the Gupta 1993 delta rule): maintained view ==
recomputed view bit-for-bit for count/sum under inserts and retractions,
including group birth (insert into an unseen key) and group death
(count maintained to zero drops the row)."""

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.maintenance import (
    agg_view,
    maintain_agg_view,
)

KEYS = ["k"]


def _m():
    # Column expressions need an active session; build per call
    return {"v": F.col("v").cast("long")}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _snap(df):
    return sorted(tuple(r) for r in df.collect())


def test_inserts_and_deletes_match_full_recompute(spark):
    base = _df(spark, [("a", 1), ("a", 2), ("b", 5), ("c", 7)])
    adds = _df(spark, [("a", 10), ("d", 3)])  # d: group birth
    dels = _df(spark, [("a", 1), ("c", 7)])  # c: group death
    maintained = maintain_agg_view(
        agg_view(base, KEYS, _m()), KEYS, _m(), adds=adds,
        deletes=dels,
    )
    full = _df(spark, [("a", 2), ("a", 10), ("b", 5), ("d", 3)])
    assert _snap(maintained) == _snap(agg_view(full, KEYS, _m()))
    got = {r["k"]: (r["view_count"], r["sum_v"]) for r in maintained.collect()}
    assert got == {"a": (2, 12), "b": (1, 5), "d": (1, 3)}
    assert "c" not in got  # count reached zero -> row dropped


def test_no_delta_is_identity(spark):
    base = _df(spark, [("x", 4), ("y", 6), ("x", 1)])
    view = agg_view(base, KEYS, _m())
    assert _snap(maintain_agg_view(view, KEYS, _m())) == _snap(view)


def test_adds_only_and_deletes_only(spark):
    base = _df(spark, [("x", 4), ("y", 6)])
    view = agg_view(base, KEYS, _m())
    after_add = maintain_agg_view(
        view, KEYS, _m(), adds=_df(spark, [("x", 1)])
    )
    assert {r["k"]: r["sum_v"] for r in after_add.collect()} == {
        "x": 5,
        "y": 6,
    }
    after_del = maintain_agg_view(
        view, KEYS, _m(), deletes=_df(spark, [("y", 6)])
    )
    assert {r["k"]: r["sum_v"] for r in after_del.collect()} == {"x": 4}


def test_chained_maintenance_equals_one_shot(spark):
    # applying two deltas one at a time == applying their union once ==
    # full recompute (associativity, the property the streaming sink
    # leans on)
    base = _df(spark, [("a", 1), ("b", 2)])
    d1 = _df(spark, [("a", 3)])
    d2 = _df(spark, [("b", 4), ("c", 9)])
    view = agg_view(base, KEYS, _m())
    step = maintain_agg_view(view, KEYS, _m(), adds=d1)
    step = maintain_agg_view(step, KEYS, _m(), adds=d2)
    once = maintain_agg_view(
        view, KEYS, _m(), adds=d1.unionByName(d2)
    )
    full = agg_view(
        base.unionByName(d1).unionByName(d2), KEYS, _m()
    )
    assert _snap(step) == _snap(once) == _snap(full)


def test_negative_sums_survive_while_count_positive(spark):
    # retracting a large value can push the SUM negative while the
    # group still exists — the drop rule is on count, not sum
    base = _df(spark, [("a", 10), ("a", -3)])
    view = agg_view(base, KEYS, _m())
    out = maintain_agg_view(
        view, KEYS, _m(), deletes=_df(spark, [("a", 10)])
    )
    got = [(r["k"], r["view_count"], r["sum_v"]) for r in out.collect()]
    assert got == [("a", 1, -3)]
