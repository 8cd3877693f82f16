"""Pipeline resume idempotency, JSONL I/O, multimodal plumbing, streaming."""

import json
import os

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.functions.multimodal import (
    extract_features,
    frame_sample,
    synthesize_media,
)
from nlp_series_relation_extraction_spark.plans.pipeline import run_kg_pipeline
from nlp_series_relation_extraction_spark.sources.io import (
    read_duie_jsonl,
    write_prediction_jsonl,
)
from nlp_series_relation_extraction_spark.sources.synthetic import synth_transcripts


def _collect_triples(dfs):
    return sorted(
        (r.conv_id, r.turn_idx, r.predicate, r.subject,
         json.dumps(dict(r.object), sort_keys=True, ensure_ascii=False))
        for r in dfs["triples"].collect()
    )


def test_pipeline_resume_idempotent(spark, tmp_path):
    wd = str(tmp_path / "kg")
    t = synth_transcripts(spark, 120, seed=42, partitions=4)
    out1 = run_kg_pipeline(spark, t, wd, head="mpn", planted=True)
    first = _collect_triples(out1)
    edges1 = sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id, r.n_evidence)
        for r in out1["edges"].collect()
    )
    # simulate a rerun after interruption: everything checkpointed -> all
    # stages resume from disk and outputs are byte-identical
    out2 = run_kg_pipeline(spark, t, wd, head="mpn", planted=True)
    assert _collect_triples(out2) == first
    edges2 = sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id, r.n_evidence)
        for r in out2["edges"].collect()
    )
    assert edges2 == edges1
    # metrics + lineage were recorded for both runs; second run all resumed
    metrics = [
        json.loads(line)
        for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    stages = {m["stage"] for m in metrics}
    assert {"triples", "mentions", "entities", "aliases",
            "triples_canonical", "edges"} <= stages
    second_run = metrics[len(metrics) // 2:]
    assert all(m["status"] == "resumed" for m in second_run)
    assert os.path.exists(os.path.join(wd, "lineage.jsonl"))


def test_partial_resume_recomputes_missing_stage(spark, tmp_path):
    import shutil

    wd = str(tmp_path / "kg2")
    t = synth_transcripts(spark, 80, seed=7, partitions=4)
    out1 = run_kg_pipeline(spark, t, wd, head="bio", planted=True)
    want = sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id)
        for r in out1["edges"].collect()
    )
    # kill a downstream stage (simulates failure mid-pipeline)
    shutil.rmtree(os.path.join(wd, "edges"))
    out2 = run_kg_pipeline(spark, t, wd, head="bio", planted=True)
    got = sorted(
        (r.subj_entity_id, r.predicate, r.obj_entity_id)
        for r in out2["edges"].collect()
    )
    assert got == want


def test_duie_jsonl_roundtrip(spark, tmp_path):
    recs = [
        {
            "text": "《甲》是乙写的小说",
            "spo_list": [
                {
                    "predicate": "作者",
                    "subject": "甲",
                    "subject_type": "图书作品",
                    "object": {"@value": "乙"},
                    "object_type": {"@value": "人物"},
                }
            ],
        },
        {"text": "没有关系的句子"},
    ]
    p = tmp_path / "in.jsonl"
    p.write_text(
        "\n".join(json.dumps(r, ensure_ascii=False) for r in recs),
        encoding="utf-8",
    )
    df = read_duie_jsonl(spark, str(p))
    rows = df.orderBy("conv_id").collect()
    assert len(rows) == 2
    assert rows[0].text == "《甲》是乙写的小说"
    assert json.loads(rows[0].gold_json)[0]["predicate"] == "作者"
    assert json.loads(rows[1].gold_json) == []

    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
    )

    res = extract_turn_results(df, head="mpn", planted=True)
    out_dir = str(tmp_path / "pred")
    write_prediction_jsonl(res, out_dir)
    lines = []
    for fn in os.listdir(out_dir):
        if fn.startswith("part-"):
            with open(os.path.join(out_dir, fn), encoding="utf-8") as f:
                lines += [json.loads(x) for x in f if x.strip()]
    assert len(lines) == 2
    by_text = {x["conv_id"]: x for x in lines}
    extracted = [x for x in lines if x["spo_list"]]
    assert extracted and extracted[0]["spo_list"][0]["predicate"] == "作者"
    # non-ASCII preserved verbatim (ensure_ascii=False semantics) — read
    # ALL part files: the sink writes one per partition
    raw = "".join(
        open(os.path.join(out_dir, f), encoding="utf-8").read()
        for f in os.listdir(out_dir)
        if f.startswith("part-")
    )
    assert "作者" in raw


def test_multimodal_plumbing(spark):
    docs = spark.createDataFrame(
        [(0, "some payload text"), (1, "another one")],
        "doc_id long, text string",
    )
    media = synthesize_media(docs, "doc_id", "text")
    assert dict(media.dtypes)["content"] == "binary"
    feats = extract_features(media).collect()
    assert len(feats) == 2
    assert all(len(r.features) == 32 for r in feats)
    assert all(r.n_bytes > 0 for r in feats)
    # deterministic across runs
    feats2 = extract_features(media).collect()
    assert [r.features for r in sorted(feats, key=lambda r: r.media_id)] == [
        r.features for r in sorted(feats2, key=lambda r: r.media_id)
    ]
    frames = frame_sample(media, every_n=5)
    assert frames.count() >= 2
    # NULL content with a decodable format must fall back to the fake
    # features, not crash the decoder inside the UDF
    import pyspark.sql.functions as _F

    null_media = media.withColumn(
        "content", _F.lit(None).cast("binary")
    )
    nf = extract_features(null_media).collect()
    assert len(nf) == 2 and all(len(r.features) == 32 for r in nf)
    assert all(r.n_bytes == 0 for r in nf)


def test_decode_image_real_ppm_bmp_roundtrip():
    import numpy as np

    from nlp_series_relation_extraction_spark.functions import multimodal

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    # PPM encode -> decode roundtrip is exact
    back = multimodal.decode_image(multimodal.encode_image_ppm(img), "image/ppm")
    assert (back == img).all()
    # PPM with a comment header line still parses
    commented = b"P6\n# a comment\n9 6\n255\n" + img.tobytes()
    assert (multimodal.decode_image(commented, "ppm") == img).all()
    # hand-built 24-bit BMP (bottom-up, BGR, 4-byte padded rows)
    h, w = img.shape[:2]
    stride = (w * 3 + 3) & ~3
    raster = b""
    for row in img[::-1]:
        raster += row[:, ::-1].tobytes() + b"\0" * (stride - w * 3)
    header = (
        b"BM" + (54 + len(raster)).to_bytes(4, "little") + b"\0\0\0\0"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little") + h.to_bytes(4, "little")
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(raster).to_bytes(4, "little")
        + b"\0" * 16
    )
    assert (multimodal.decode_image(header + raster, "image/bmp") == img).all()


def test_decode_image_exotic_formats_still_integration_point():
    import pytest as _pytest

    from nlp_series_relation_extraction_spark.functions import multimodal

    # every built-in format decodes natively now; the integration-point
    # contract remains for genuinely unknown formats
    with _pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x00" * 8, "image/avif")


def test_resize_and_real_feature_path():
    import numpy as np

    from nlp_series_relation_extraction_spark.functions import multimodal

    img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
    small = multimodal.resize_image(img, 3, 2)
    assert small.shape == (2, 3, 3)
    feats = multimodal.image_features(img)
    assert feats.shape == (32,)
    # real stats, not a hash fake: channel means are the actual pixel means
    assert np.allclose(feats[:3], img.astype(np.float32).mean(axis=(0, 1)))


def test_video_frame_extract_real_bytes(spark):
    import numpy as np

    from nlp_series_relation_extraction_spark.functions import multimodal

    docs = spark.createDataFrame(
        [(0, "clip zero"), (1, "clip one")], "doc_id long, text string"
    )
    vids = multimodal.synthesize_video(docs, "doc_id", "text", n_frames=6)
    frames = multimodal.frame_extract(vids, every_n=2).collect()
    assert sorted((r.media_id, r.frame_idx) for r in frames) == [
        (0, 0), (0, 2), (0, 4), (1, 0), (1, 2), (1, 4),
    ]
    # every extracted frame is a genuine decodable PPM of the declared dims
    for r in frames:
        arr = multimodal.decode_image(bytes(r.frame), "image/ppm")
        assert arr.shape == (6, 8, 3) and arr.dtype == np.uint8


def test_frame_extract_null_media_rows_skipped(spark):
    """ADVICE r2: a NULL payload (or null meta -> NaN n_frames after Arrow
    conversion) must be skipped like extract_features' fallback, not crash
    on len(None)/int(NaN)."""
    from nlp_series_relation_extraction_spark.functions import multimodal

    docs = spark.createDataFrame([(0, "clip zero")], "doc_id long, text string")
    good = multimodal.synthesize_video(docs, "doc_id", "text", n_frames=4)
    nulls = spark.createDataFrame(
        [
            (100, None, ("video/ppm-stack", 8, 6, 4)),  # null payload
            (101, b"P6 not really", None),  # null meta -> null n_frames
            (102, b"", ("video/ppm-stack", 8, 6, None)),  # null n only
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.frame_extract(good.unionByName(nulls), every_n=2).collect()
    assert sorted((r.media_id, r.frame_idx) for r in out) == [(0, 0), (0, 2)]


def test_streaming_matches_batch(spark, tmp_path):
    from nlp_series_relation_extraction_spark.operators.extract import extract_triples
    from nlp_series_relation_extraction_spark.streaming.incremental import (
        extract_triples_stream,
        read_transcripts_stream,
        run_available_now,
    )

    src = str(tmp_path / "stream_src")
    t = synth_transcripts(spark, 60, seed=3, partitions=3)
    t.drop("gold_json").write.mode("overwrite").parquet(src)

    stream = read_transcripts_stream(spark, src)
    assert stream.isStreaming
    out_path = str(tmp_path / "stream_out")
    run_available_now(
        extract_triples_stream(stream, head="bio"),
        out_path,
        str(tmp_path / "ckpt"),
    )
    got = sorted(
        (r.conv_id, r.turn_idx, r.predicate, r.subject)
        for r in spark.read.parquet(out_path).collect()
    )
    want = sorted(
        (r.conv_id, r.turn_idx, r.predicate, r.subject)
        for r in extract_triples(t, head="bio", planted=False).collect()
    )
    assert got == want


def test_windowed_stream_equals_batch(spark, tmp_path):
    from nlp_series_relation_extraction_spark.streaming.incremental import (
        read_transcripts_stream,
    )
    from nlp_series_relation_extraction_spark.streaming.windowed import (
        turns_per_window,
    )

    src = str(tmp_path / "wsrc")
    t = synth_transcripts(spark, 100, seed=4, partitions=3)
    t.drop("gold_json").write.mode("overwrite").parquet(src)

    out_path = str(tmp_path / "wout")

    def drain():
        q = (
            turns_per_window(read_transcripts_stream(spark, src))
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "wckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    # append mode only emits windows the watermark has passed; a late
    # sentinel row (1 day ahead) in a second drain advances the watermark
    # past every real window, so they all close and emit
    spark.createDataFrame(
        [("sentinel", 0, "user", "x", None, None)],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    ).withColumn(
        "ts", F.lit("2024-01-02 12:00:00").cast("timestamp")
    ).write.mode("append").parquet(src)
    drain()

    got = sorted(
        (str(r.window_start), r.role, r.n_turns, r.n_convs_approx)
        for r in spark.read.parquet(out_path).collect()
    )
    want = sorted(
        (str(r.window_start), r.role, r.n_turns, r.n_convs_approx)
        for r in turns_per_window(
            spark.read.parquet(src).where(F.col("conv_id") != "sentinel")
        ).collect()
    )
    assert got == want and len(got) > 0


def test_stream_stream_interval_join_equals_batch(spark, tmp_path):
    """Watermarked stream-stream inner join (user turns x same-conv tool
    turns within a bounded lag) drained with availableNow must equal the
    batch interval join over the same rows."""
    from nlp_series_relation_extraction_spark.streaming.incremental import (
        read_transcripts_stream,
    )
    from nlp_series_relation_extraction_spark.streaming.join import (
        user_turns_with_tool_results,
    )

    src = str(tmp_path / "jsrc")
    t = synth_transcripts(spark, 120, seed=6, partitions=3)
    t.drop("gold_json").write.mode("overwrite").parquet(src)
    batch_df = spark.read.parquet(src)

    out_path = str(tmp_path / "jout")
    q = (
        user_turns_with_tool_results(read_transcripts_stream(spark, src))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    def key(r):
        return (r.conv_id, r.turn_idx, r.tool_turn_idx, r.tool, str(r.tool_ts))

    got = sorted(key(r) for r in spark.read.parquet(out_path).collect())
    want = sorted(
        key(r) for r in user_turns_with_tool_results(batch_df).collect()
    )
    assert got == want and len(want) > 0


def test_stateful_first_seen_mentions(spark, tmp_path):
    from nlp_series_relation_extraction_spark.streaming.incremental import (
        read_transcripts_stream,
    )
    from nlp_series_relation_extraction_spark.streaming.stateful import (
        first_seen_mentions_stream,
    )

    src = str(tmp_path / "ssrc")
    t = synth_transcripts(spark, 80, seed=21, partitions=2)
    t.drop("gold_json").write.mode("overwrite").parquet(src)

    out_path = str(tmp_path / "sout")
    q = (
        first_seen_mentions_stream(read_transcripts_stream(spark, src))
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "sckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_path).collect()
    assert len(rows) > 0
    # each (conv, mention) appears exactly once — streaming dedup invariant
    pairs = [(r.conv_id, r.mention) for r in rows]
    assert len(pairs) == len(set(pairs))
    # and matches the batch first-seen answer
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_triples,
    )
    from pyspark.sql import functions as F2

    trip = extract_triples(t, head="mpn", planted=False)
    mentions = trip.select("conv_id", F2.col("subject").alias("mention")).unionByName(
        trip.select("conv_id", F2.element_at("object", "@value").alias("mention"))
    ).where(F2.length("mention") > 0)
    want = {(r.conv_id, r.mention) for r in mentions.distinct().collect()}
    assert set(pairs) == want


def test_stateful_first_seen_dedups_across_micro_batches(spark, tmp_path):
    """A conversation SPANNING micro-batches must re-enter its existing
    state (GroupState.get is a property in PySpark 4 — calling it only
    crashes on this path, which a single-batch drain never hits) and
    keep deduping: a mention emitted in batch 1 must not re-emit when
    the same conversation continues in batch 2."""
    from nlp_series_relation_extraction_spark.streaming.stateful import (
        first_seen_mentions_stream,
    )

    sch = "conv_id string, turn_idx int, text string"
    # the planted-style text both turns share produces the same mention
    txt = "《星河》是李明写的小说"
    src = str(tmp_path / "s2src")
    spark.createDataFrame([("cX", 0, txt)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame([("cX", 1, txt)], sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(sch)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out_path = str(tmp_path / "s2out")
    q = (
        first_seen_mentions_stream(stream)
        .writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", str(tmp_path / "s2ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(out_path).collect()
    mentions = [(r.conv_id, r.mention) for r in rows]
    assert len(mentions) == len(set(mentions))  # deduped ACROSS batches
    assert all(r.turn_idx == 0 for r in rows)  # first-seen wins


def test_pipeline_with_gold_eval_stage(spark, tmp_path):
    from nlp_series_relation_extraction_spark.sources.synthetic import gold_triples

    wd = str(tmp_path / "kg_eval")
    t = synth_transcripts(spark, 100, seed=42, partitions=3)
    gold = gold_triples(spark, t)
    out = run_kg_pipeline(spark, t, wd, head="mpn", planted=True, gold=gold)
    ev = out["eval"].collect()[0]
    # planted extraction must reproduce gold exactly through the pipeline
    assert (ev.fp, ev.fn) == (0, 0)
    assert ev.precision == 1.0 and ev.recall == 1.0 and ev.f1 == 1.0
    assert ev.tp > 50


def test_resume_with_changed_params_recomputes(spark, tmp_path):
    wd = str(tmp_path / "kg3")
    t = synth_transcripts(spark, 60, seed=5, partitions=2)
    out_bio = run_kg_pipeline(spark, t, wd, head="bio", planted=True)
    bio_triples = _collect_triples(out_bio)
    # same workdir, different head: stale bio checkpoints must NOT be
    # resumed and mislabeled as mpn output
    out_mpn = run_kg_pipeline(spark, t, wd, head="mpn", planted=True)
    metrics = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    second = [m for m in metrics[len(metrics) // 2:] if m["stage"] == "triples"]
    assert second and second[0]["status"] == "computed"
    # and a third run with the same params resumes again
    out_mpn2 = run_kg_pipeline(spark, t, wd, head="mpn", planted=True)
    assert _collect_triples(out_mpn2) == _collect_triples(out_mpn)


def test_param_change_invalidates_downstream_stages(spark, tmp_path):
    """Switching head (or link threshold) must recompute the WHOLE chain,
    not just the stage that owns the parameter: downstream stages record the
    full upstream fingerprint, so mentions/entities/aliases/canonical/edges
    from the old run are never resumed into the new run's output."""
    wd = str(tmp_path / "kg_fp")
    t = synth_transcripts(spark, 60, seed=5, partitions=2)
    run_kg_pipeline(spark, t, wd, head="mpn", planted=True)
    # same workdir, head switched: every downstream stage must match a
    # fresh bio-only run, not carry mpn-derived rows
    out_mixed = run_kg_pipeline(spark, t, wd, head="bio", planted=True)
    wd_fresh = str(tmp_path / "kg_fp_fresh")
    out_fresh = run_kg_pipeline(spark, t, wd_fresh, head="bio", planted=True)
    for stage in ("mentions", "entities", "aliases", "triples_canonical",
                  "edges"):
        got = sorted(map(tuple, out_mixed[stage].collect()))
        want = sorted(map(tuple, out_fresh[stage].collect()))
        assert got == want, f"stage {stage} resumed stale cross-head data"
    # link-threshold change in the same workdir invalidates linking onward
    out_thr = run_kg_pipeline(
        spark, t, wd, head="bio", planted=True, link_threshold=0.9
    )
    wd_thr = str(tmp_path / "kg_fp_thr")
    out_thr_fresh = run_kg_pipeline(
        spark, t, wd_thr, head="bio", planted=True, link_threshold=0.9
    )
    for stage in ("entities", "aliases"):
        got = sorted(map(tuple, out_thr[stage].collect()))
        want = sorted(map(tuple, out_thr_fresh[stage].collect()))
        assert got == want, f"stage {stage} resumed stale-threshold data"


def test_stage_kill_at_manifest_flip_boundary(spark, tmp_path):
    """A driver killed mid-write can never make a half-materialized stage
    readable: StageStore commits are versioned directories flipped live by
    one atomic manifest write. Simulates the crash window — a new version
    directory partially written, manifest not yet flipped — and asserts
    the previous committed version stays the read path, a resume cleans
    the orphan and recomputes, and snapshot expiry keeps exactly
    {current, previous}."""
    from nlp_series_relation_extraction_spark.plans.pipeline import StageStore

    wd = str(tmp_path / "stages")
    store = StageStore(spark, wd)
    df_a = spark.range(10).withColumnRenamed("id", "x")
    store.run_stage("s", lambda: df_a, inputs=[], params={"p": "a"})
    assert store.done("s", {"p": "a"})
    assert sorted(r.x for r in store.read("s").collect()) == list(range(10))
    v1 = os.path.basename(store.path("s"))
    assert v1 == "v000001"

    # crash window: rerun under params b died after writing SOME parquet
    # into the next version dir but BEFORE the manifest flip
    orphan = os.path.join(wd, "s", "v000002")
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-00000.parquet"), "wb") as f:
        f.write(b"torn")  # no _SUCCESS, not even valid parquet
    # old version remains committed + readable; new params not done
    assert store.done("s", {"p": "a"})
    assert not store.done("s", {"p": "b"})
    assert os.path.basename(store.path("s")) == "v000001"
    assert sorted(r.x for r in store.read("s").collect()) == list(range(10))

    # resume under params b: orphan replaced, clean recompute, atomic flip
    df_b = spark.range(5).withColumnRenamed("id", "x")
    store.run_stage("s", lambda: df_b, inputs=[], params={"p": "b"})
    assert store.done("s", {"p": "b"}) and not store.done("s", {"p": "a"})
    assert os.path.basename(store.path("s")) == "v000002"
    assert sorted(r.x for r in store.read("s").collect()) == list(range(5))
    assert not os.path.exists(os.path.join(orphan, "part-00000.parquet"))
    # previous version is retained for in-flight readers...
    assert os.path.exists(os.path.join(wd, "s", "v000001", "_SUCCESS"))

    # ...and a third commit expires it: exactly {previous, current} remain
    df_c = spark.range(3).withColumnRenamed("id", "x")
    store.run_stage("s", lambda: df_c, inputs=[], params={"p": "c"})
    versions = sorted(
        d for d in os.listdir(os.path.join(wd, "s")) if d.startswith("v")
    )
    assert versions == ["v000002", "v000003"]
    assert sorted(r.x for r in store.read("s").collect()) == list(range(3))


def test_stage_manifest_commit_is_params_atomic(spark, tmp_path):
    """Params live IN the manifest: there is no state where a success
    marker exists but params are missing/stale (the old layout wrote
    <name>._params.json AFTER the parquet _SUCCESS). A version dir with
    _SUCCESS but no manifest is NOT done — the commit point is the flip."""
    from nlp_series_relation_extraction_spark.plans.pipeline import StageStore

    wd = str(tmp_path / "stages2")
    store = StageStore(spark, wd)
    # crash AFTER the parquet job fully succeeded (with _SUCCESS) but
    # BEFORE the manifest flip: stage must read as not-done
    vdir = os.path.join(wd, "t", "v000001")
    spark.range(4).write.parquet(vdir)
    assert os.path.exists(os.path.join(vdir, "_SUCCESS"))
    assert not store.done("t")
    assert not store.done("t", {"p": 1})
    # resume recomputes into v000001 (replacing the uncommitted orphan)
    store.run_stage(
        "t",
        lambda: spark.range(7).withColumnRenamed("id", "x"),
        inputs=[],
        params={"p": 1},
    )
    assert store.done("t", {"p": 1})
    assert store.read("t").count() == 7


def test_reference_format_prediction_sink(spark, tmp_path):
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
    )
    from nlp_series_relation_extraction_spark.sources.io import (
        write_prediction_jsonl_reference_format,
    )

    t = synth_transcripts(spark, 30, seed=9, partitions=2)
    res = extract_turn_results(t, head="mpn", planted=True, keep_text=True)
    out_dir = str(tmp_path / "refpred")
    write_prediction_jsonl_reference_format(res, out_dir)
    lines = []
    for fn in sorted(os.listdir(out_dir)):
        if fn.startswith("part-"):
            with open(os.path.join(out_dir, fn), encoding="utf-8") as f:
                lines += [json.loads(x) for x in f if x.strip()]
    assert len(lines) == 30
    # exactly the reference's record shape: {"text": ..., "spo_list": [...]}
    assert all(set(x) == {"text", "spo_list"} for x in lines)
    withspo = [x for x in lines if x["spo_list"]]
    assert withspo and {"predicate", "subject", "subject_type", "object",
                        "object_type"} <= set(withspo[0]["spo_list"][0])


def test_linking_deterministic_across_runs(spark):
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_triples,
        mentions_from_triples,
    )
    from nlp_series_relation_extraction_spark.operators.linking import link_mentions

    t = synth_transcripts(spark, 150, seed=3, partitions=4)
    trip = extract_triples(t, head="mpn", planted=True).localCheckpoint(eager=True)
    m = mentions_from_triples(trip)

    def run():
        out = link_mentions(m)
        return sorted(
            (r.entity_id, r.canonical_name, r.n_mentions, r.n_occurrences)
            for r in out["entities"].collect()
        )

    assert run() == run()


def test_streaming_kmeans_census_equals_batch_and_resumes(spark, tmp_path):
    """The live cluster census (frozen centroids, integer quantized sums)
    after draining a stream equals the batch census; appending files and
    resuming from the checkpoint folds only the new vectors in and still
    equals the full-corpus batch census — the same mergeable-state
    contract as the HLL test below, for the drift-monitor use."""
    import numpy as np

    from nlp_series_relation_extraction_spark.functions.distml import (
        kmeans_census,
        kmeans_fit_numpy,
    )
    from nlp_series_relation_extraction_spark.streaming.kmeans import (
        kmeans_census_stream,
    )

    rng = np.random.default_rng(71)
    centers = rng.normal(size=(3, 4)) * 5.0
    V1 = centers[np.arange(200) % 3] + rng.normal(size=(200, 4))
    V2 = centers[np.arange(120) % 3] + rng.normal(size=(120, 4))
    C, _ = kmeans_fit_numpy(V1, 3, n_iter=5)

    src = str(tmp_path / "ksrc")

    def write(V, off, mode):
        rows = [(off + i, [float(x) for x in v]) for i, v in enumerate(V)]
        spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        ).write.mode(mode).parquet(src)

    write(V1, 0, "overwrite")

    def drain(name):
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            kmeans_census_stream(stream, "vec_id", "embedding", C)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "kckpt"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.cluster, r.pos, r.s)
            for r in spark.sql(f"select * from {name}").collect()
        }

    def batch(V):
        rows = [(i, [float(x) for x in v]) for i, v in enumerate(V)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        return {
            (r.cluster, r.pos, r.s)
            for r in kmeans_census(df, "vec_id", "embedding", C).collect()
        }

    got1 = drain("kcs1")
    assert got1 == batch(V1) and len(got1) == 3 * 5  # k*(d+1) rows

    write(V2, 200, "append")
    got2 = drain("kcs2")
    assert got2 == batch(np.vstack([V1, V2]))


def test_streaming_hll_stream_equals_batch_and_resumes(spark, tmp_path):
    """The HLL register state after draining a stream equals the batch
    sketch; adding files and resuming from the checkpoint folds ONLY the
    new data in, and the state still equals the full-corpus batch sketch
    (the incremental-maintenance contract of a mergeable sketch)."""
    from nlp_series_relation_extraction_spark.functions.sketch import (
        hll_registers,
    )
    from nlp_series_relation_extraction_spark.streaming.sketches import (
        hll_registers_stream,
    )

    src = str(tmp_path / "hsrc")
    spark.range(0, 3_000).selectExpr("id as k").write.mode(
        "overwrite"
    ).parquet(src)

    def drain(name):
        stream = (
            spark.readStream.schema("k long")
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            hll_registers_stream(stream, "k")
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "hckpt"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {
            (r.idx, r.max_rho)
            for r in spark.sql(f"select * from {name}").collect()
        }

    got1 = drain("hll_s1")
    want1 = {
        (r.idx, r.max_rho)
        for r in hll_registers(
            spark.range(0, 3_000).selectExpr("id as k"), "k"
        ).collect()
    }
    assert got1 == want1 and len(got1) > 0

    # new data arrives; the SAME checkpoint resumes and folds it in
    spark.range(3_000, 5_000).selectExpr("id as k").write.mode(
        "append"
    ).parquet(src)
    got2 = drain("hll_s2")
    want2 = {
        (r.idx, r.max_rho)
        for r in hll_registers(
            spark.range(0, 5_000).selectExpr("id as k"), "k"
        ).collect()
    }
    assert got2 == want2
    assert got2 != got1  # the increment actually changed the state


def test_streaming_cm_sketch_equals_batch(spark, tmp_path):
    from nlp_series_relation_extraction_spark.functions.sketch import (
        cm_sketch,
    )
    from nlp_series_relation_extraction_spark.streaming.sketches import (
        cm_sketch_stream,
    )

    src = str(tmp_path / "csrc")
    words = spark.range(0, 2_000).selectExpr(
        "concat('w', cast(id % 37 as string)) as word"
    )
    words.write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("word string")
        .option("maxFilesPerTrigger", 2)
        .parquet(src)
    )
    q = (
        cm_sketch_stream(stream, "word")
        .writeStream.format("memory")
        .queryName("cm_s")
        .option("checkpointLocation", str(tmp_path / "cckpt"))
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.j, r.bucket, r.cnt)
        for r in spark.sql("select * from cm_s").collect()
    }
    want = {
        (r.j, r.bucket, r.cnt) for r in cm_sketch(words, "word").collect()
    }
    assert got == want and len(got) > 0


def test_turns_with_context_window_and_order(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        turns_with_context,
    )

    t = spark.createDataFrame(
        [
            ("c1", 0, "user", "hello"),
            ("c1", 1, "assistant", "hi"),
            ("c1", 2, "user", "who won"),
            ("c1", 3, "assistant", "spain"),
            ("c2", 0, "user", "solo"),
        ],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        (r.conv_id, r.turn_idx): (r.context_text, r.n_context_turns)
        for r in turns_with_context(t, k=2).collect()
    }
    assert got[("c1", 0)] == ("", 0)
    assert got[("c1", 1)] == ("user: hello", 1)
    # oldest-first, capped at k=2
    assert got[("c1", 2)] == ("user: hello [CTX] assistant: hi", 2)
    assert got[("c1", 3)] == ("assistant: hi [CTX] user: who won", 2)
    assert got[("c2", 0)] == ("", 0)  # conversations never leak context


def test_turns_with_context_null_text_keeps_slot(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        turns_with_context,
    )

    t = spark.createDataFrame(
        [("c", 0, "user", None), ("c", 1, "assistant", "hi")],
        "conv_id string, turn_idx int, role string, text string",
    )
    got = {
        r.turn_idx: (r.context_text, r.n_context_turns)
        for r in turns_with_context(t, k=2).collect()
    }
    # the NULL-text turn still occupies its context slot (as 'user: ')
    assert got[1] == ("user: ", 1)


def test_streaming_kg_edge_table_equals_batch(spark, tmp_path):
    """Continuous KG construction end-to-end: stream transcripts in
    micro-batches -> extract -> canonicalize -> versioned edge-table
    upsert (streaming/kg_sink.py); the committed table must equal the
    batch build over the full corpus — merge_edge_increment's
    associativity makes micro-batch boundaries invisible. A second drain
    with MORE files resumes from the checkpoint and folds only the new
    conversations in."""
    from pyspark.sql import functions as SF

    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_triples,
    )
    from nlp_series_relation_extraction_spark.operators.graph import (
        canonical_triples,
        edge_table,
    )
    from nlp_series_relation_extraction_spark.operators.linking import (
        norm_expr,
    )
    from nlp_series_relation_extraction_spark.streaming.incremental import (
        extract_triples_stream,
        read_transcripts_stream,
    )
    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        stream_edges_into,
    )

    src = str(tmp_path / "ksrc")
    table = str(tmp_path / "kedges")
    ckpt = str(tmp_path / "kckpt")

    def write_batch(n, seed):
        synth_transcripts(spark, n, seed=seed, partitions=2).drop(
            "gold_json"
        ).write.mode("append").parquet(src)

    write_batch(120, seed=7)

    def aliases_for(triples):
        # deterministic alias snapshot derived from the mention set: both
        # the streaming loop and the batch twin receive the SAME dimension
        m = (
            triples.select(norm_expr(SF.col("subject")).alias("mention_norm"))
            .unionByName(
                triples.select(
                    norm_expr(
                        SF.element_at(SF.col("object"), "@value")
                    ).alias("mention_norm")
                )
            )
            .distinct()
        )
        return m.select(
            "mention_norm", SF.xxhash64("mention_norm").alias("entity_id")
        )

    def batch_edges():
        tr = extract_triples(
            spark.read.parquet(src), head="mpn", planted=False
        )
        return edge_table(canonical_triples(tr, aliases_for(tr)))

    # the snapshot must cover everything both runs will see: build it over
    # the FULL final corpus (batch 1 + batch 2 mentions)
    write_batch(80, seed=11)
    full_tr = extract_triples(
        spark.read.parquet(src), head="mpn", planted=False
    )
    aliases = aliases_for(full_tr).localCheckpoint(eager=True)

    def drain():
        stream = extract_triples_stream(
            read_transcripts_stream(spark, src).drop("gold_json"),
            head="mpn",
        )
        q = stream_edges_into(stream, aliases, table, ckpt)
        q.awaitTermination()

    drain()
    got = {
        tuple(r)
        for r in read_current_edges(spark, table)
        .select(
            "subj_entity_id", "predicate", "obj_entity_id", "n_evidence"
        )
        .collect()
    }
    want = {
        tuple(r)
        for r in edge_table(canonical_triples(full_tr, aliases))
        .select(
            "subj_entity_id", "predicate", "obj_entity_id", "n_evidence"
        )
        .collect()
    }
    assert got == want and len(got) > 0

    # incremental resume: new conversations arrive, the SAME checkpoint
    # folds only them in, and the table equals the fresh batch build again
    write_batch(60, seed=23)
    tr3 = extract_triples(spark.read.parquet(src), head="mpn", planted=False)
    # the alias SNAPSHOT is static per drain (production re-links on its
    # own cadence); reuse the old snapshot for increment + batch twin
    stream = extract_triples_stream(
        read_transcripts_stream(spark, src).drop("gold_json"), head="mpn"
    )
    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        stream_edges_into as sei,
    )

    q = sei(stream, aliases, table, ckpt)
    q.awaitTermination()
    got2 = {
        tuple(r)
        for r in read_current_edges(spark, table)
        .select(
            "subj_entity_id", "predicate", "obj_entity_id", "n_evidence"
        )
        .collect()
    }
    want2 = {
        tuple(r)
        for r in edge_table(canonical_triples(tr3, aliases))
        .select(
            "subj_entity_id", "predicate", "obj_entity_id", "n_evidence"
        )
        .collect()
    }
    assert got2 == want2
    assert got2 != got  # the increment actually changed the table


def test_kg_sink_replay_is_idempotent_and_versions_expire(spark, tmp_path):
    """foreachBatch delivers at-least-once: re-running a batch whose
    version was already committed (crash between manifest flip and
    checkpoint advance) must be a no-op, not a double-count; and old
    version directories are pruned to the newest two."""
    import os

    from pyspark.sql import functions as SF

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        upsert_edge_batch,
    )

    table = str(tmp_path / "redges")
    os.makedirs(table)
    triples = spark.createDataFrame(
        [("c1", 0, "p", "alpha beta", {"@value": "gamma delta"})],
        "conv_id string, turn_idx int, predicate string, subject string,"
        " object map<string,string>",
    )
    aliases = spark.createDataFrame(
        [("alpha beta", 1), ("gamma delta", 2)],
        "mention_norm string, entity_id long",
    )
    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        COMPACT_DELTAS,
    )

    for b in range(4):
        upsert_edge_batch(spark, triples, aliases, table, b)
    once = {tuple(r) for r in read_current_edges(spark, table).collect()}
    assert {r[3] for r in once} == {4}  # n_evidence = one per batch
    # replay an OLD batch: committed version is newer -> no-op
    upsert_edge_batch(spark, triples, aliases, table, 2)
    # replay the LATEST batch (the actual crash window) -> no-op too
    upsert_edge_batch(spark, triples, aliases, table, 3)
    again = {tuple(r) for r in read_current_edges(spark, table).collect()}
    assert again == once
    # one subject entity -> every batch touches exactly one bucket.
    # Merge-on-read: run enough further batches to force >=2 compaction
    # cycles, then check the fold stays exact and disk stays bounded
    # (referenced = 1 base + up to COMPACT_DELTAS-1 deltas; expiry keeps
    # at most COMPACT_DELTAS unreferenced dirs for in-flight readers).
    n_more = 2 * COMPACT_DELTAS + 1
    for b in range(4, 4 + n_more):
        upsert_edge_batch(spark, triples, aliases, table, b)
    cur = {tuple(r) for r in read_current_edges(spark, table).collect()}
    assert {r[3] for r in cur} == {4 + n_more}  # every batch folded once
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        st = json.load(f)
    assert any(st["deltas"].values()) or st["buckets"]  # manifest shape
    bdirs = [n for n in os.listdir(table) if n.startswith("b")]
    assert len(bdirs) == 1
    versions = [
        n
        for n in os.listdir(os.path.join(table, bdirs[0]))
        if n.startswith("v")
    ]
    n_ref = 1 + len(next(iter(st["deltas"].values()), []))
    assert len(versions) <= n_ref + COMPACT_DELTAS  # expiry bounds disk


def test_kg_sink_batch_ids_beyond_zero_padding(spark, tmp_path):
    """Batch ids past 999999 overflow the 6-digit zero padding; the
    replay check and version expiry must compare NUMERIC ids ('v1000000'
    sorts before 'v999999' lexicographically — a string compare would
    treat every new batch as a replay and expire the newest version)."""
    import os

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        upsert_edge_batch,
    )

    table = str(tmp_path / "bigids")
    os.makedirs(table)
    triples = spark.createDataFrame(
        [("c1", 0, "p", "alpha beta", {"@value": "gamma delta"})],
        "conv_id string, turn_idx int, predicate string, subject string,"
        " object map<string,string>",
    )
    aliases = spark.createDataFrame(
        [("alpha beta", 1), ("gamma delta", 2)],
        "mention_norm string, entity_id long",
    )
    upsert_edge_batch(spark, triples, aliases, table, 999_999)
    upsert_edge_batch(spark, triples, aliases, table, 1_000_000)
    cur = read_current_edges(spark, table).collect()
    assert {r[3] for r in cur} == {2}  # both batches folded in
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        assert json.loads(f.read())["batch_id"] == 1_000_000
    # replaying the newest big id is still a no-op
    upsert_edge_batch(spark, triples, aliases, table, 1_000_000)
    assert {r[3] for r in read_current_edges(spark, table).collect()} == {2}


def test_kg_sink_rewrites_only_touched_buckets(spark, tmp_path):
    """Bucket-pruned upsert: a batch whose increment touches a strict
    subset of buckets must leave every other bucket's committed files
    BYTE-IDENTICAL on disk (not rewritten) — per-batch I/O is O(touched
    buckets + increment), the parquet expression of Iceberg MERGE INTO
    partition pruning."""
    import hashlib

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        upsert_edge_batch,
    )

    table = str(tmp_path / "bedges")
    os.makedirs(table)
    mentions = [f"entity number {i}" for i in range(40)]
    aliases = spark.createDataFrame(
        [(m, i + 1) for i, m in enumerate(mentions)],
        "mention_norm string, entity_id long",
    )

    def triples_for(pairs):
        return spark.createDataFrame(
            [
                ("c1", i, "p", s, {"@value": o})
                for i, (s, o) in enumerate(pairs)
            ],
            "conv_id string, turn_idx int, predicate string,"
            " subject string, object map<string,string>",
        )

    # batch 0: 40 distinct subjects -> populates most of the 8 buckets
    upsert_edge_batch(
        spark,
        triples_for([(mentions[i], mentions[(i + 1) % 40]) for i in range(40)]),
        aliases, table, 0, n_buckets=8,
    )
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        state0 = json.load(f)
    assert state0["n_buckets"] == 8 and len(state0["buckets"]) > 2

    def snapshot():
        with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
            st = json.load(f)
        refs = {
            b: [v] + list((st.get("deltas") or {}).get(b, []))
            for b, v in st["buckets"].items()
        }
        out = {}
        for b, vs in refs.items():
            for v in vs:
                d = os.path.join(table, f"b{int(b):04d}", v)
                for fn in sorted(os.listdir(d)):
                    p = os.path.join(d, fn)
                    if os.path.isfile(p):
                        with open(p, "rb") as fh:
                            out[(b, v, fn)] = hashlib.sha256(
                                fh.read()
                            ).hexdigest()
        st["_refs"] = refs
        return st, out

    state0b, before = snapshot()
    # batch 1: ONE subject -> touches exactly one bucket
    upsert_edge_batch(
        spark, triples_for([(mentions[0], mentions[1])]), aliases, table, 1,
    )
    state1, after = snapshot()
    changed = {
        b
        for b in state1["_refs"]
        if state0b["_refs"].get(b) != state1["_refs"][b]
    }
    assert len(changed) == 1  # exactly one bucket gained a version
    (touched,) = changed
    untouched_keys = [k for k in before if k[0] != touched]
    assert untouched_keys  # the subset is strict
    for key in untouched_keys:
        assert after[key] == before[key]  # byte-identical, never rewritten
    # and the merged table is still correct
    rows = {
        (r.subj_entity_id, r.obj_entity_id): r.n_evidence
        for r in read_current_edges(spark, table).collect()
    }
    assert rows[(1, 2)] == 2  # the repeated edge accumulated evidence
    assert len(rows) == 40 and set(rows.values()) == {1, 2}


def test_kg_sink_alias_replay_remaps_and_prunes(spark, tmp_path):
    """replay_alias_remap: folding a linking delta (old_id -> new_id)
    into the committed edge table must (a) equal a python twin applying
    the same remap + merge fold, (b) rewrite ONLY buckets holding an
    affected endpoint or receiving a moved subject — all other buckets'
    files stay byte-identical, (c) be a no-op on a second application
    (the old ids are gone), and (d) fold collapsed edges' evidence."""
    import hashlib

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        replay_alias_remap,
        upsert_edge_batch,
    )

    table = str(tmp_path / "redges")
    os.makedirs(table)
    mentions = [f"entity number {i}" for i in range(40)]
    aliases = spark.createDataFrame(
        [(m, i + 1) for i, m in enumerate(mentions)],
        "mention_norm string, entity_id long",
    )
    pairs = [(mentions[i], mentions[(i + 1) % 40]) for i in range(40)]
    pairs.append((mentions[6], mentions[5]))  # (7,6): fold target of (5,6)
    triples = spark.createDataFrame(
        [("c1", i, "p", s, {"@value": o}) for i, (s, o) in enumerate(pairs)],
        "conv_id string, turn_idx int, predicate string,"
        " subject string, object map<string,string>",
    )
    upsert_edge_batch(spark, triples, aliases, table, 0, n_buckets=8)

    def snapshot():
        with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
            st = json.load(f)
        out = {}
        for b, v in st["buckets"].items():
            d = os.path.join(table, f"b{int(b):04d}", v)
            for fn in sorted(os.listdir(d)):
                p = os.path.join(d, fn)
                if os.path.isfile(p):
                    with open(p, "rb") as fh:
                        out[(b, v, fn)] = hashlib.sha256(fh.read()).hexdigest()
        return st, out

    before_rows = {
        (r.subj_entity_id, r.predicate, r.obj_entity_id): (
            r.n_evidence, r.first_conv_id, r.first_turn_idx,
        )
        for r in read_current_edges(spark, table).collect()
    }
    _, before = snapshot()

    # linking delta: entity 5 was merged into entity 7
    remap_rows = {5: 7}
    remap = spark.createDataFrame(
        list(remap_rows.items()), "old_id long, new_id long"
    )
    stats = replay_alias_remap(spark, table, remap)
    assert stats["epoch"] == 1 and stats["touched"]
    assert len(stats["touched"]) < 8  # strict subset: pruning is real

    # (a) python twin: identical remap + fold semantics
    expected = {}
    for (s, p, o), (n, cid, tix) in before_rows.items():
        key = (remap_rows.get(s, s), p, remap_rows.get(o, o))
        if key in expected:
            en, ecid, etix = expected[key]
            expected[key] = (en + n, *min((ecid, etix), (cid, tix)))
        else:
            expected[key] = (n, cid, tix)
    after_rows = {
        (r.subj_entity_id, r.predicate, r.obj_entity_id): (
            r.n_evidence, r.first_conv_id, r.first_turn_idx,
        )
        for r in read_current_edges(spark, table).collect()
    }
    assert after_rows == expected
    # (d) the collapsed edge's evidence added: (5,p,6)+(7,p,6) -> n=2
    assert after_rows[(7, "p", 6)][0] == 2
    assert (5, "p", 6) not in after_rows and (4, "p", 5) not in after_rows
    assert after_rows[(4, "p", 7)][0] == 1  # object endpoint remapped

    # (b) untouched buckets byte-identical
    st1, after = snapshot()
    touched_set = {str(b) for b in stats["touched"]}
    untouched_keys = [k for k in before if k[0] not in touched_set]
    assert untouched_keys  # strict subset
    for key in untouched_keys:
        assert after[key] == before[key]
    # version names sort after the batch version they rewrote
    for b in touched_set & set(st1["buckets"]):
        assert st1["buckets"][b].startswith("v000000.r1")

    # (c) idempotent re-application: no rows reference old id 5 anymore
    stats2 = replay_alias_remap(spark, table, remap)
    assert stats2["touched"] == []
    st2, after2 = snapshot()
    assert after2 == after and st2["buckets"] == st1["buckets"]

    # a later batch commit still works and preserves the relink epoch
    upsert_edge_batch(
        spark,
        spark.createDataFrame(
            [("c2", 0, "p", mentions[0], {"@value": mentions[1]})],
            "conv_id string, turn_idx int, predicate string,"
            " subject string, object map<string,string>",
        ),
        aliases, table, 1,
    )
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        st3 = json.load(f)
    assert st3["batch_id"] == 1 and st3["relink_epoch"] == 1


def test_kg_sink_alias_replay_moves_rows_and_empties_bucket(spark, tmp_path):
    """A subject remap moves its rows to the destination id's bucket; a
    source bucket left with zero rows drops out of the manifest so
    readers never resurrect its pre-replay contents."""
    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        _bucket_expr,
        read_current_edges,
        replay_alias_remap,
        upsert_edge_batch,
    )

    table = str(tmp_path / "medges")
    os.makedirs(table)
    # find two entity ids in different buckets of 4
    ids = spark.createDataFrame(
        [(i,) for i in range(1, 30)], "subj_entity_id long"
    ).withColumn("b", _bucket_expr(4))
    by_bucket = {}
    for r in ids.collect():
        by_bucket.setdefault(r.b, []).append(r.subj_entity_id)
    buckets_with = [b for b, v in by_bucket.items() if v]
    assert len(buckets_with) >= 2
    b_src, b_dst = buckets_with[0], buckets_with[1]
    src_id, dst_id = by_bucket[b_src][0], by_bucket[b_dst][0]

    mentions = {src_id: f"m {src_id}", dst_id: f"m {dst_id}", 999: "m 999"}
    aliases = spark.createDataFrame(
        [(m, i) for i, m in mentions.items()], "mention_norm string, entity_id long"
    )
    # one edge whose subject sits alone in bucket b_src
    triples = spark.createDataFrame(
        [("c1", 0, "p", mentions[src_id], {"@value": mentions[999]})],
        "conv_id string, turn_idx int, predicate string,"
        " subject string, object map<string,string>",
    )
    upsert_edge_batch(spark, triples, aliases, table, 0, n_buckets=4)
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        st0 = json.load(f)
    assert str(b_src) in st0["buckets"]

    remap = spark.createDataFrame(
        [(src_id, dst_id)], "old_id long, new_id long"
    )
    stats = replay_alias_remap(spark, table, remap)
    assert set(stats["touched"]) == {b_src, b_dst}
    assert stats["moved_src"] == [b_src]
    with open(os.path.join(table, "_CURRENT"), encoding="utf-8") as f:
        st1 = json.load(f)
    assert str(b_src) not in st1["buckets"]  # emptied source dropped
    assert str(b_dst) in st1["buckets"]
    rows = read_current_edges(spark, table).collect()
    assert len(rows) == 1 and rows[0].subj_entity_id == dst_id


def test_kg_sink_version_key_orders_replays_between_batches():
    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        _version_key,
    )

    names = ["v000002", "v000001.r2", "v000001", "v000001.r10"]
    assert sorted(names, key=_version_key) == [
        "v000001", "v000001.r2", "v000001.r10", "v000002",
    ]
    # beyond the zero padding, numeric order still holds
    assert _version_key("v1000000") > _version_key("v999999.r3")


def test_streaming_violation_monitor_equals_batch_and_resumes(spark, tmp_path):
    """The live ontology-violation monitor (frozen induced schema, SUM
    counts per predicate) after draining a typed edge stream equals the
    batch count; appending files and resuming from the checkpoint folds
    only the new edges and still equals the full batch — the drift-watch
    contract for a continuously-built KG."""
    from nlp_series_relation_extraction_spark.operators.graph import (
        violations_against_schema,
    )
    from nlp_series_relation_extraction_spark.streaming.constraints import (
        violation_monitor_stream,
    )

    sch = "subj_entity_id long, subj_type string, predicate string," \
          " obj_entity_id long, obj_type string"

    def rows(n, off):
        # ~1/7 domain violations ('org'), ~1/5 range violations ('town')
        return [
            (
                off + i,
                "org" if i % 7 == 0 else "person",
                "born_in" if i % 2 == 0 else "works_at",
                1000 + i,
                "town" if i % 5 == 0 else ("city" if i % 2 == 0 else "company"),
            )
            for i in range(n)
        ]

    schema = spark.createDataFrame(
        [("born_in", "person", "city"), ("works_at", "person", "company")],
        "predicate string, domain_type string, range_type string",
    )
    src = str(tmp_path / "vsrc")
    spark.createDataFrame(rows(140, 0), sch).write.mode("overwrite").parquet(src)

    def drain(name):
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 2)
            .parquet(src)
        )
        q = (
            violation_monitor_stream(stream, schema)
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / "vckpt"))
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return {tuple(r) for r in spark.sql(f"select * from {name}").collect()}

    def batch(all_rows):
        df = spark.createDataFrame(all_rows, sch)
        return {
            tuple(r)
            for r in violations_against_schema(df, schema).collect()
        }

    got1 = drain("viol1")
    assert got1 == batch(rows(140, 0)) and len(got1) == 2
    # non-vacuous: planted noise must register
    by_pred = {t[0]: t for t in got1}
    assert by_pred["born_in"][4] > 0 and by_pred["born_in"][5] > 0

    extra = rows(90, 140)
    spark.createDataFrame(extra, sch).write.mode("append").parquet(src)
    got2 = drain("viol2")
    assert got2 == batch(rows(140, 0) + extra)


def test_role_transitions_counts_and_probs(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        role_transitions,
    )

    t = spark.createDataFrame(
        [
            ("c1", 0, "user"), ("c1", 1, "assistant"), ("c1", 2, "user"),
            ("c2", 0, "user"), ("c2", 1, "assistant"), ("c2", 2, "tool"),
        ],
        "conv_id string, turn_idx int, role string",
    )
    got = {
        (r.from_role, r.to_role): (r.n, r.prob)
        for r in role_transitions(t).collect()
    }
    assert got[("user", "assistant")] == (2, 1.0)
    assert got[("assistant", "user")] == (1, 0.5)
    assert got[("assistant", "tool")] == (1, 0.5)
    # no cross-conversation pair: c1 turn 2 -> c2 turn 0 must not appear
    assert ("user", "user") not in got


def test_sequence_ngrams_contiguous_over_nonnull_tokens(spark):
    from nlp_series_relation_extraction_spark.operators.conversation import (
        sequence_ngrams,
    )

    t = spark.createDataFrame(
        [
            ("u1", 0, "search"), ("u1", 1, None), ("u1", 2, "kb"),
            ("u1", 3, "search"), ("u1", 4, "kb"),
            ("u2", 0, "search"), ("u2", 1, "kb"), ("u2", 2, "search"),
        ],
        "key string, pos int, tok string",
    )
    got = {
        r.ngram: r.n_occurrences
        for r in sequence_ngrams(t, "key", ["pos"], "tok", n=2).collect()
    }
    # u1's null at pos 1 drops out: search->kb counted at (0,2)
    assert got["search -> kb"] == 3
    assert got["kb -> search"] == 2
    assert "kb -> kb" not in got
    import pytest as _pytest

    with _pytest.raises(ValueError, match=">= 2"):
        sequence_ngrams(t, "key", ["pos"], "tok", n=1)


def test_streaming_role_transitions_equals_batch_and_resumes(spark, tmp_path):
    """Stateful transition pairing over a turn stream: draining all
    micro-batches yields partial counts whose sum equals the batch
    role_transitions matrix — including pairs that straddle micro-batch
    boundaries (carried through the per-conversation state). Appending
    later turns and resuming from the checkpoint folds only the new
    pairs; first-drain + second-drain partials still sum to the full
    batch matrix."""
    from nlp_series_relation_extraction_spark.operators.conversation import (
        role_transitions,
    )
    from nlp_series_relation_extraction_spark.streaming.transitions import (
        role_transitions_stream,
    )

    sch = "conv_id string, turn_idx int, role string"
    roles = ["user", "assistant", "tool", "assistant", "user",
             "assistant", "tool", "tool"]

    def rows(lo, hi):
        # turns lo..hi-1 of 6 conversations, role = rotating pattern
        # offset per conv so several transition cells get mass
        return [
            (f"c{c}", i, roles[(i + c) % len(roles)])
            for c in range(6)
            for i in range(lo, hi)
        ]

    src = str(tmp_path / "rtsrc")
    # two files per drain, split MID-conversation: turn order across
    # files respects per-conv order (the documented arrival contract),
    # and every file boundary forces a state-bridged pair
    spark.createDataFrame(rows(0, 3), sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    spark.createDataFrame(rows(3, 5), sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    out_path = str(tmp_path / "rtout")

    def drain():
        # parquet sink: append mode + checkpoint recovery (memory sink
        # can't recover in append mode); cumulative partials on disk
        stream = (
            spark.readStream.schema(sch)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            role_transitions_stream(stream)
            .writeStream.format("parquet")
            .option("path", out_path)
            .option("checkpointLocation", str(tmp_path / "rtckpt"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        out: dict = {}
        for r in spark.read.parquet(out_path).collect():
            k = (r.from_role, r.to_role)
            out[k] = out.get(k, 0) + r.n
        return out

    def batch(all_rows):
        df = spark.createDataFrame(all_rows, sch)
        return {
            (r.from_role, r.to_role): r.n
            for r in role_transitions(df).collect()
        }

    got1 = drain()
    want1 = batch(rows(0, 5))
    assert got1 == want1
    assert len(want1) >= 4  # non-vacuous: several cells populated

    # ordered append: later turns only, then resume from the checkpoint
    spark.createDataFrame(rows(5, 8), sch).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got2 = drain()  # same checkpoint: only the new file folds in
    assert got2 == batch(rows(0, 8))
    # the resumed drain really did bridge the file boundary: the new
    # mass is exactly 3 new turns per conv INCLUDING the turn-4 -> 5
    # pair carried through state
    assert sum(got2.values()) - sum(got1.values()) == 6 * 3


def test_pipeline_optional_predicate_canonicalization(spark, tmp_path):
    """canonicalize_preds=True adds the pred_mapping /
    triples_pred_canonical stages between entity canonicalization and
    the edge table. The reference's closed 55-predicate schema has no
    paraphrase surface forms, so the mapping is the identity here
    (cluster_size 1 everywhere), the edge table matches the default
    path's, and the stage resumes idempotently; planted paraphrase
    MERGING is pinned at operator level in tests/test_predicates.py."""
    t = synth_transcripts(spark, 120, seed=42, partitions=4)
    base = run_kg_pipeline(
        spark, t, str(tmp_path / "kg_base"), head="mpn", planted=True
    )
    wd = str(tmp_path / "kg_pred")
    out = run_kg_pipeline(
        spark, t, wd, head="mpn", planted=True, canonicalize_preds=True
    )
    mapping = out["pred_mapping"].collect()
    assert mapping and all(
        r.predicate == r.canonical_predicate and r.cluster_size == 1
        for r in mapping
    )
    preds_in_triples = {
        r.predicate
        for r in out["triples_canonical"].select("predicate")
        .distinct().collect()
    }
    assert {r.predicate for r in mapping} == preds_in_triples

    def edge_set(dfs):
        return sorted(
            (r.subj_entity_id, r.predicate, r.obj_entity_id, r.n_evidence)
            for r in dfs["edges"].collect()
        )

    assert edge_set(out) == edge_set(base)  # identity rewrite
    # resume: all stages (including the two new ones) come back from disk
    out2 = run_kg_pipeline(
        spark, t, wd, head="mpn", planted=True, canonicalize_preds=True
    )
    assert edge_set(out2) == edge_set(out)
    metrics = [
        json.loads(line) for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    by_stage = {}
    for m in metrics:
        by_stage.setdefault(m["stage"], []).append(m["status"])
    assert by_stage["pred_mapping"][-1] == "resumed"
    assert by_stage["triples_pred_canonical"][-1] == "resumed"
    # a pred_threshold change invalidates the new stages (fingerprint
    # rule: any upstream param change recomputes downstream)
    out3 = run_kg_pipeline(
        spark, t, wd, head="mpn", planted=True, canonicalize_preds=True,
        pred_threshold=0.7,
    )
    metrics3 = [
        json.loads(line) for line in open(os.path.join(wd, "metrics.jsonl"))
    ]
    assert metrics3[-6:] and any(
        m["stage"] == "pred_mapping" and m["status"] == "computed"
        for m in metrics3[len(metrics):]
    )
    assert edge_set(out3) == edge_set(out)
