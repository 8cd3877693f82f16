"""Table compaction and skew diagnostics (operators/maintenance.py)."""

import pyspark.sql.functions as F
import pytest

from nlp_series_relation_extraction_spark.operators.maintenance import (
    compact_table,
    plan_compaction,
    skew_report,
)


def _fragmented_table(spark, path, n_files=40, rows=4_000):
    # 40 tiny files — the shape an incremental sink accretes
    spark.range(rows).select(
        F.col("id"),
        (F.col("id") % 97).alias("key"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    ).repartition(n_files).write.mode("overwrite").parquet(path)


def test_plan_compaction_counts_files(spark, tmp_path):
    src = str(tmp_path / "frag")
    _fragmented_table(spark, src)
    plan = plan_compaction(spark, src, target_bytes=1 << 30)
    assert plan["n_files"] == 40
    assert plan["total_bytes"] > 0
    assert plan["target_files"] == 1  # everything fits one 1GiB target


def test_compact_preserves_rows_and_hits_target(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "packed")
    _fragmented_table(spark, src)
    stats = compact_table(spark, src, dst, target_bytes=1 << 30)
    assert stats["rows"] == 4_000
    assert stats["after"]["n_files"] == 1
    assert stats["after"]["n_files"] < stats["before"]["n_files"]
    # content identical, not just counted
    a = spark.read.parquet(src)
    b = spark.read.parquet(dst)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_compact_sorted_clusters_ranges(spark, tmp_path):
    src, dst = str(tmp_path / "frag"), str(tmp_path / "sorted")
    _fragmented_table(spark, src)
    # force 4 output files; range-clustering on id must make file key
    # ranges disjoint (the property that lets min/max stats prune scans)
    total = plan_compaction(spark, src, target_bytes=1 << 30)["total_bytes"]
    compact_table(
        spark, src, dst, target_bytes=max(total // 4, 1), sort_cols=["id"]
    )
    per_file = (
        spark.read.parquet(dst)
        .select(F.input_file_name().alias("f"), "id")
        .groupBy("f")
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    assert len(per_file) >= 2
    spans = sorted((r.lo, r.hi) for r in per_file)
    for (a_lo, a_hi), (b_lo, b_hi) in zip(spans, spans[1:]):
        assert a_hi < b_lo  # disjoint -> prunable


def test_compaction_detects_row_loss(spark, tmp_path, monkeypatch):
    # a rewrite that drops rows must raise, not return stats
    src, dst = str(tmp_path / "frag"), str(tmp_path / "broken")
    _fragmented_table(spark, src, n_files=4, rows=100)
    import nlp_series_relation_extraction_spark.operators.maintenance as M

    real_read = spark.read.parquet

    class _Reader:
        def __init__(self, spark):
            self._spark = spark

        def parquet(self, p):
            df = real_read(p)
            return df.where(F.col("id") != 0) if p == dst else df

    monkeypatch.setattr(
        type(spark), "read", property(lambda s: _Reader(s))
    )
    with pytest.raises(AssertionError, match="row-count mismatch"):
        M.compact_table(spark, src, dst, target_bytes=1 << 30)


def test_skew_report_flags_hot_key(spark):
    # one key holds half the rows among 101 keys -> skew_x ~ 50
    df = spark.range(2_000).select(
        F.when(F.col("id") < 1_000, F.lit(7))
        .otherwise(F.col("id") % 100 + 100)
        .alias("k")
    )
    rows = skew_report(df, ["k"], top_k=3).collect()
    assert rows[0].rank == 1 and rows[0].key == "7"
    assert rows[0].share_ppm == 500_000
    assert rows[0].skew_x >= 40
    assert rows[1].skew_x <= 1  # everything else is near-mean


def test_skew_report_topk_plan_is_take_ordered(spark):
    df = spark.range(1_000).select((F.col("id") % 13).alias("k"))
    plan = (
        skew_report(df, ["k"], top_k=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_compact_refuses_in_place(spark, tmp_path):
    """mode('overwrite') deletes dst before the lazy src scan runs — an
    in-place compact would destroy the table, so it must raise upfront
    (and leave the source intact)."""
    import pytest

    src = str(tmp_path / "frag")
    _fragmented_table(spark, src)
    with pytest.raises(ValueError, match="dst_path"):
        compact_table(spark, src, src)
    # symlink-equivalent path spelled differently is still in-place
    with pytest.raises(ValueError, match="dst_path"):
        compact_table(spark, src, src + "/../frag")
    assert spark.read.parquet(src).count() == 4_000
