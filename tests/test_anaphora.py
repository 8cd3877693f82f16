"""resolve_anaphora (operators/conversation.py): recency-heuristic
pronoun binding over a conversation mention stream."""

import pytest

from nlp_series_relation_extraction_spark.operators.conversation import (
    resolve_anaphora,
)

SCHEMA = (
    "conv_id string, turn_idx int, mention_idx int, surface string, "
    "entity_type string, is_pronoun boolean"
)


def _df(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_pronoun_binds_nearest_preceding_compatible_mention(spark):
    rows = [
        ("c1", 0, 0, "周星驰", "人物", False),
        ("c1", 0, 1, "《功夫》", "影视作品", False),
        ("c1", 1, 0, "他", "人物", True),          # -> 周星驰
        ("c1", 2, 0, "李安", "人物", False),
        ("c1", 3, 0, "他", "人物", True),          # -> 李安 (recency)
        ("c1", 3, 1, "该片", "影视作品", True),     # -> 《功夫》 cross-turn
        ("c2", 0, 0, "她", "人物", True),          # conversation-initial
    ]
    got = {
        (r.conv_id, r.turn_idx, r.mention_idx): r
        for r in resolve_anaphora(_df(spark, rows)).collect()
    }
    assert got[("c1", 1, 0)].antecedent_surface == "周星驰"
    assert got[("c1", 3, 0)].antecedent_surface == "李安"
    assert got[("c1", 3, 0)].antecedent_turn_idx == 2
    assert got[("c1", 3, 1)].antecedent_surface == "《功夫》"
    assert got[("c2", 0, 0)].antecedent_surface is None
    assert got[("c2", 0, 0)].resolved_surface is None
    # non-pronouns resolve to themselves, antecedent stays NULL
    assert got[("c1", 2, 0)].resolved_surface == "李安"
    assert got[("c1", 2, 0)].antecedent_surface is None


def test_pronoun_never_binds_another_pronoun(spark):
    rows = [
        ("c", 0, 0, "张三", "人物", False),
        ("c", 1, 0, "他", "人物", True),
        ("c", 2, 0, "他", "人物", True),  # skips turn-1 pronoun -> 张三
    ]
    got = {
        r.turn_idx: r for r in resolve_anaphora(_df(spark, rows)).collect()
    }
    assert got[2].antecedent_surface == "张三"
    assert got[2].antecedent_turn_idx == 0


def test_by_type_false_binds_across_types(spark):
    rows = [
        ("c", 0, 0, "《功夫》", "影视作品", False),
        ("c", 1, 0, "他", "人物", True),
    ]
    typed = resolve_anaphora(_df(spark, rows), by_type=True).collect()
    untyped = resolve_anaphora(_df(spark, rows), by_type=False).collect()
    t = {r.turn_idx: r for r in typed}
    u = {r.turn_idx: r for r in untyped}
    assert t[1].antecedent_surface is None  # 他 can't bind a work
    assert u[1].antecedent_surface == "《功夫》"


def test_max_turn_gap_nulls_stale_bindings(spark):
    rows = [
        ("c", 0, 0, "张三", "人物", False),
        ("c", 9, 0, "他", "人物", True),
        ("c", 10, 0, "李四", "人物", False),
        ("c", 12, 0, "他", "人物", True),
    ]
    got = {
        r.turn_idx: r
        for r in resolve_anaphora(
            _df(spark, rows), max_turn_gap=3
        ).collect()
    }
    assert got[9].antecedent_surface is None  # 9 turns back: stale
    assert got[12].antecedent_surface == "李四"  # 2 turns back: fresh


def test_same_turn_ordering_uses_mention_idx(spark):
    rows = [
        ("c", 0, 0, "张三", "人物", False),
        ("c", 0, 1, "李四", "人物", False),
        ("c", 0, 2, "他", "人物", True),  # later in the SAME turn -> 李四
    ]
    got = {
        r.mention_idx: r
        for r in resolve_anaphora(_df(spark, rows)).collect()
    }
    assert got[2].antecedent_surface == "李四"
    assert got[2].antecedent_mention_idx == 1


def test_driver_query_matches_duckdb(spark):
    """Full parity with the registered oracle at sf0.001 (the driver
    runs the same compare at sf0.01)."""
    import duckdb

    from nlp_series_relation_extraction_spark.plans.queries import (
        oracle_sql,
        queries,
    )

    sf = "/root/testdata/sf0.001"
    got = (
        queries()["conv_anaphora"](spark, sf)
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{sf}/orders.parquet'"
    )
    want = (
        con.execute(oracle_sql()["conv_anaphora"])
        .fetchdf()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert list(got.columns) == list(want.columns)
    assert got["is_pronoun"].sum() > 0
    assert got["antecedent_surface"].notna().sum() > 0
    import pandas as pd

    pd.testing.assert_frame_equal(got, want, check_dtype=True)
