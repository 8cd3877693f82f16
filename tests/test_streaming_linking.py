"""Streaming entity linking (streaming/linking.py): stream==batch state
equality under micro-batch splits, checkpointed resume across two
drains, replayed-batch idempotence, and version expiry."""

import os

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.linking import (
    link_mentions,
)
from nlp_series_relation_extraction_spark.streaming.linking import (
    link_mention_batch,
    read_current_aliases,
    read_current_state,
    stream_mentions_into,
)

SCHEMA = "conv_id string, turn_idx int, mention string"
# near-dup chain (see test_link_increment.py): A~B, B~C, A!~C
A, B, C = "abcdef", "abcdefghi", "bcdefghij"
NAMES = [A, Z0 := "zzz corp", C, "acme corp", "acme corp.", B, Z0, A]


def _rows(names):
    return [(f"c{i}", i, m) for i, m in enumerate(names)]


def _write_batches(spark, base, batches):
    src = os.path.join(base, "mentions_in")
    for i, names in enumerate(batches):
        spark.createDataFrame(_rows(names), SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    return src


def _drain(spark, src, base, tag):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_mentions_into(
        stream,
        os.path.join(base, "state"),
        os.path.join(base, f"ckpt_{tag}"),
    )
    q.awaitTermination()


def _state_tuples(df):
    return sorted(
        (r.mention_norm, r.mention_id, r.n_occurrences, r.entity_id)
        for r in df.collect()
    )


def _full_state(spark, names):
    out = link_mentions(spark.createDataFrame(_rows(names), SCHEMA))
    return out["distinct_mentions"].join(out["components"], "mention_id").select(
        "mention_norm",
        "mention_id",
        "n_occurrences",
        F.col("component_id").alias("entity_id"),
    )


def test_stream_equals_batch(spark, tmp_path):
    base = str(tmp_path)
    batches = [NAMES[0:3], NAMES[3:6], NAMES[6:]]
    src = _write_batches(spark, base, batches)
    _drain(spark, src, base, "a")
    got = read_current_state(spark, os.path.join(base, "state"))
    want = _full_state(spark, [n for b in batches for n in b])
    assert _state_tuples(got) == _state_tuples(want)
    # the alias snapshot projection is ready for the edge sink
    al = read_current_aliases(spark, os.path.join(base, "state"))
    assert set(al.columns) == {"mention_norm", "entity_id"}
    by_norm = {r.mention_norm: r.entity_id for r in al.collect()}
    assert by_norm[A] == by_norm[B] == by_norm[C]


def test_resume_second_drain_continues_state(spark, tmp_path):
    base = str(tmp_path)
    src = _write_batches(spark, base, [NAMES[0:4]])
    _drain(spark, src, base, "a")
    mid = read_current_state(spark, os.path.join(base, "state"))
    assert mid is not None and mid.count() > 0
    # more files arrive; SAME checkpoint -> only the new files fold in
    _write_batches(spark, base, [NAMES[4:]])
    _drain(spark, src, base, "a")
    got = read_current_state(spark, os.path.join(base, "state"))
    assert _state_tuples(got) == _state_tuples(_full_state(spark, NAMES))


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    base = str(tmp_path)
    state_dir = os.path.join(base, "state")
    b1 = spark.createDataFrame(_rows([A, Z0]), SCHEMA)
    link_mention_batch(spark, b1, state_dir, 0)
    before = _state_tuples(read_current_state(spark, state_dir))
    # crash-replay of batch 0 with different content must be a no-op
    b_replay = spark.createDataFrame(_rows([C, C, C]), SCHEMA)
    link_mention_batch(spark, b_replay, state_dir, 0)
    assert _state_tuples(read_current_state(spark, state_dir)) == before
    # the NEXT id folds normally
    link_mention_batch(spark, b_replay, state_dir, 1)
    after = _state_tuples(read_current_state(spark, state_dir))
    assert after != before


def test_versions_expire_but_live_retained(spark, tmp_path):
    base = str(tmp_path)
    state_dir = os.path.join(base, "state")
    for i, names in enumerate([[A], [B], [C], [Z0]]):
        link_mention_batch(
            spark,
            spark.createDataFrame(_rows(names), SCHEMA),
            state_dir,
            i,
            retain=2,
        )
    versions = sorted(
        d for d in os.listdir(state_dir) if d.startswith("v")
    )
    assert versions == ["v000002", "v000003"]
    assert read_current_state(spark, state_dir).count() == 4
