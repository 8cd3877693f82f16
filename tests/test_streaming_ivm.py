"""Stream-maintained aggregate view (streaming/ivm.py): draining N
micro-batches == one batch agg_view over the full input (associativity
makes batch boundaries invisible), replayed batch ids are no-ops, and
untouched buckets' files stay byte-identical across a batch."""

import os

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.maintenance import (
    agg_view,
)
from nlp_series_relation_extraction_spark.streaming.ivm import (
    read_current_view,
    upsert_view_batch,
)

KEYS = ["k"]


def _m():
    return {"v": F.col("v").cast("long")}


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, v long")


def _snap(df):
    return sorted(tuple(r) for r in df.select("k", "view_count", "sum_v").collect())


def _all_files(path):
    out = {}
    for root, _dirs, files in os.walk(path):
        for fn in files:
            p = os.path.join(root, fn)
            out[p] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def test_stream_of_batches_equals_one_batch_aggregate(spark, tmp_path):
    d = str(tmp_path / "view")
    batches = [
        [("a", 1), ("b", 2)],
        [("a", 3), ("c", 4)],
        [("b", 5), ("a", 6), ("d", 1)],
        [],
        [("d", 9)],
    ]
    for i, rows in enumerate(batches):
        upsert_view_batch(
            spark, _df(spark, rows), KEYS, _m(), d, i, n_buckets=4
        )
    got = read_current_view(spark, d)
    full = agg_view(
        _df(spark, [r for b in batches for r in b]), KEYS, _m()
    )
    assert _snap(got) == _snap(full)


def test_replayed_batch_id_is_a_noop(spark, tmp_path):
    d = str(tmp_path / "view")
    upsert_view_batch(spark, _df(spark, [("a", 1)]), KEYS, _m(), d, 0)
    upsert_view_batch(spark, _df(spark, [("a", 10)]), KEYS, _m(), d, 1)
    before = _snap(read_current_view(spark, d))
    # foreachBatch at-least-once replay: same id arrives again
    upsert_view_batch(spark, _df(spark, [("a", 10)]), KEYS, _m(), d, 1)
    assert _snap(read_current_view(spark, d)) == before


def test_untouched_buckets_not_rewritten(spark, tmp_path):
    d = str(tmp_path / "view")
    # seed many keys so several buckets exist
    seed = [(f"k{i}", i) for i in range(40)]
    upsert_view_batch(spark, _df(spark, seed), KEYS, _m(), d, 0, n_buckets=8)
    files_before = _all_files(d)
    # a single-key delta touches exactly one bucket
    upsert_view_batch(spark, _df(spark, [("k3", 100)]), KEYS, _m(), d, 1)
    files_after = _all_files(d)
    untouched_same = [
        p
        for p in files_before
        if p in files_after and files_before[p] == files_after[p]
        and "/b" in p
    ]
    # most bucket files must be byte/mtime-identical (only one bucket
    # plus the manifest changed)
    changed = [
        p for p in files_before
        if p in files_after and files_before[p] != files_after[p]
    ]
    assert len(untouched_same) > 0
    assert all("_CURRENT" in p or "/b" in p for p in changed)
    # and the view is still correct
    got = {
        r["k"]: r["sum_v"] for r in read_current_view(spark, d).collect()
    }
    assert got["k3"] == 3 + 100
    assert got["k7"] == 7
