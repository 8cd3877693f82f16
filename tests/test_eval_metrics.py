"""DataFrame eval vs reference-semantics plain-Python on edge cases."""

from pyspark.sql import Row

from nlp_series_relation_extraction_spark.evaluation.metrics import (
    entity_em,
    triple_prf,
)


def _triple(conv, turn, pred, subj, obj):
    return Row(
        conv_id=conv, turn_idx=turn, predicate=pred, subject=subj, object=obj
    )


def _reference_metric(gold_by_turn, pred_by_turn):
    """Plain-Python replica of calculate_metric + run_evaluate accumulation."""
    tp = fp = fn = 0
    keys = set(gold_by_turn) | set(pred_by_turn)
    for k in keys:
        gold = gold_by_turn.get(k, [])
        pred = pred_by_turn.get(k, [])
        t = 0
        for spo in pred:
            if any(
                spo[0] == g[0] and spo[1] == g[1] and spo[2] == g[2] for g in gold
            ):
                t += 1
            else:
                fp += 1
        tp += t
        fn += len(gold) - t
    return tp, fp, fn


def test_triple_prf_matches_reference_semantics(spark):
    gold = [
        _triple("c1", 0, "作者", "甲", {"@value": "乙"}),
        _triple("c1", 0, "主演", "丙", {"@value": "丁"}),
        _triple("c2", 1, "获奖", "戊", {"@value": "奖", "inWork": "作"}),
    ]
    pred = [
        _triple("c1", 0, "作者", "甲", {"@value": "乙"}),  # tp
        _triple("c1", 0, "作者", "甲", {"@value": "乙"}),  # duplicate tp (both count)
        _triple("c1", 0, "主演", "丙", {"@value": "错"}),  # fp (object differs)
        _triple("c2", 1, "获奖", "戊", {"@value": "奖"}),  # fp (missing slot)
        _triple("c2", 1, "获奖", "戊", {"inWork": "作", "@value": "奖"}),  # tp (map order irrelevant)
    ]
    got = triple_prf(
        spark.createDataFrame(pred), spark.createDataFrame(gold)
    ).collect()[0]

    g = {("c1", 0): [("作者", "甲", (("@value", "乙"),)), ("主演", "丙", (("@value", "丁"),))],
         ("c2", 1): [("获奖", "戊", (("@value", "奖"), ("inWork", "作")))]}
    p = {("c1", 0): [("作者", "甲", (("@value", "乙"),)),
                      ("作者", "甲", (("@value", "乙"),)),
                      ("主演", "丙", (("@value", "错"),))],
         ("c2", 1): [("获奖", "戊", (("@value", "奖"),)),
                      ("获奖", "戊", (("@value", "奖"), ("inWork", "作")))]}
    tp, fp, fn = _reference_metric(g, p)
    assert (got.tp, got.fp, got.fn) == (tp, fp, fn) == (3, 2, 0)
    assert abs(got.precision - 3 / 5) < 1e-12
    assert abs(got.recall - 1.0) < 1e-12


def test_triple_prf_zero_guards(spark):
    empty = spark.createDataFrame(
        [], "conv_id string, turn_idx int, predicate string, subject string, "
        "object map<string,string>",
    )
    gold = spark.createDataFrame([_triple("c", 0, "作者", "甲", {"@value": "乙"})])
    got = triple_prf(empty, gold).collect()[0]
    assert (got.tp, got.fp, got.fn) == (0, 0, 1)
    assert got.precision == 0.0 and got.recall == 0.0 and got.f1 == 0.0


def test_entity_em(spark):
    pred = spark.createDataFrame(
        [("c1", 0, "甲"), ("c1", 0, "甲"), ("c1", 0, "乙"), ("c2", 0, "丙")],
        "conv_id string, turn_idx int, mention string",
    )
    gold = spark.createDataFrame(
        [("c1", 0, "甲"), ("c1", 0, "丁"), ("c2", 0, "丙")],
        "conv_id string, turn_idx int, mention string",
    )
    got = entity_em(pred, gold).collect()[0]
    # per-turn set semantics: pred sets {甲,乙},{丙} gold {甲,丁},{丙} -> em=2
    assert (got.em, got.pred_num, got.gold_num) == (2, 3, 3)
    assert abs(got.entity_precision - 100 * 2 / 3) < 1e-9
