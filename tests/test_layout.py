"""zorder_pruning_report (functions/layout.py): morton interleave
correctness, pruning payoff on a grid, determinism."""

import pytest

from nlp_series_relation_extraction_spark.functions.layout import (
    morton_code_expr,
    zorder_pruning_report,
)

T = "x long, y long"


def _morton_py(x, y, bits=16):
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_morton_expr_matches_python(spark):
    import pyspark.sql.functions as F

    rows = [(x, y) for x in [0, 1, 5, 255, 1023] for y in [0, 2, 7, 600]]
    df = spark.createDataFrame(rows, T).select(
        "x", "y", F.expr(morton_code_expr("x", "y", 16)).alias("z")
    )
    for r in df.collect():
        assert r.z == _morton_py(r.x, r.y), (r.x, r.y)


def test_zorder_prunes_better_on_grid(spark):
    # 64x64 grid of points; box = 1/8 x 1/8 corner
    rows = [(x, y) for x in range(64) for y in range(64)]
    rep = {
        r.layout: r
        for r in zorder_pruning_report(
            spark.createDataFrame(rows, T),
            "x", "y", (0, 7), (0, 7), n_buckets=64,
        ).collect()
    }
    nat, zo = rep["natural"], rep["zorder"]
    assert nat.n_rows_in_box == 64 and zo.n_rows_in_box == 64
    # natural (sorted by x) touches the buckets covering x<=7: 1/8 of
    # them; zorder touches only the buckets whose rectangle meets the
    # corner: with 64 buckets of 64 points each, exactly 1
    assert zo.n_touched < nat.n_touched
    assert zo.n_touched == 1
    assert nat.n_touched == 8


def test_deterministic_across_partitionings(spark):
    rows = [((i * 37) % 256, (i * 91) % 256) for i in range(2000)]
    df1 = spark.createDataFrame(rows, T)
    df2 = spark.createDataFrame(rows, T).repartition(13)
    a = sorted(map(tuple, zorder_pruning_report(
        df1, "x", "y", (10, 60), (100, 140)).collect()))
    b = sorted(map(tuple, zorder_pruning_report(
        df2, "x", "y", (10, 60), (100, 140)).collect()))
    assert a == b


def test_param_guards(spark):
    df = spark.createDataFrame([(1, 1)], T)
    with pytest.raises(ValueError, match="bits"):
        morton_code_expr("x", "y", 40)
    with pytest.raises(ValueError, match="n_buckets"):
        zorder_pruning_report(df, "x", "y", (0, 1), (0, 1), n_buckets=1)
