"""Profile the bench-only composite entries (kg_linking_10x,
kg_scc_rmat[_10x], streaming_kg_sink_20b, sink growth) outside the frozen
bench.py, with event logging for scripts/parse_eventlog.py.

  python scripts/profile_bench10x.py <which> [...]
  which in: linking10x scc_rmat sink20b sink_growth gazetteer10x distant10x
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0,
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
)

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.plans import queries as Q
from nlp_series_relation_extraction_spark.session import get_spark
from nlp_series_relation_extraction_spark.sources.synthetic import (
    synth_transcripts,
)
from nlp_series_relation_extraction_spark.operators.extract import (
    extract_triples,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
EVENTLOG_DIR = os.environ.get("NRE_EVENTLOG_DIR", "/tmp/nre_eventlog")


def docs10(spark):
    return (
        Q.t(spark, SF_DIR, "documents")
        .select(
            "doc_id",
            "text",
            F.explode(F.expr("sequence(0, 9)")).alias("cp"),
        )
        .select(
            (F.col("doc_id") * 10 + F.col("cp")).alias("doc_id"),
            F.expr(
                "concat_ws(' ', transform(split(text, ' '),"
                " w -> concat('c', cast(cp as string), w)))"
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )


def run_linking10x(spark):
    from nlp_series_relation_extraction_spark.operators.linking import (
        link_mentions,
    )

    d10 = docs10(spark)
    w10 = "split(text, ' ')"
    mentions10 = d10.select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        F.explode(
            F.expr(
                f"case when size({w10}) >= 2 then "
                f"transform(sequence(1, size({w10}) - 1),"
                f" i -> concat_ws(' ', slice({w10}, i, 2))) "
                f"else array() end"
            )
        ).alias("mention"),
    )
    t0 = time.time()
    n = link_mentions(mentions10, threshold=0.5, max_block=200)[
        "entities"
    ].count()
    print(f"kg_linking_10x: {time.time()-t0:.3f}s entities={n}")


def run_gazetteer10x(spark):
    from nlp_series_relation_extraction_spark.operators.gazetteer import (
        gazetteer_match,
    )

    d10 = docs10(spark)
    ws10 = F.split(F.col("text"), " ")
    gaz10 = (
        d10.where((F.col("doc_id") % 25 == 0) & (F.size(ws10) >= 5))
        .select(
            F.col("doc_id").alias("entity_id"),
            F.concat_ws(
                " ", F.element_at(ws10, 4), F.element_at(ws10, 5)
            ).alias("name"),
        )
        .where((F.element_at(ws10, 4) != "") & (F.element_at(ws10, 5) != ""))
    )
    t0 = time.time()
    n = gazetteer_match(d10, gaz10).count()
    print(f"gazetteer_match_10x: {time.time()-t0:.3f}s rows={n}")


def run_scc_rmat(spark):
    from nlp_series_relation_extraction_spark.operators.graph import (
        strongly_connected_components as _scc,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        rmat_edges as _rmat,
    )

    for ne, sc, label in ((60_000, 13, "1x"), (600_000, 16, "10x")):
        g = _rmat(spark, ne, sc).select(
            F.col("src").alias("subj_entity_id"),
            F.col("dst").alias("obj_entity_id"),
        )
        t0 = time.time()
        n = _scc(g).count()
        print(f"kg_scc_rmat_{label}: {time.time()-t0:.3f}s verts={n}")


def run_sink20b(spark):
    import shutil as _sh
    import tempfile as _tf

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        upsert_edge_batch,
    )

    sink_dir = _tf.mkdtemp(prefix="nre_prof_kgsink_")
    try:
        n_batches = 20
        stream_t = synth_transcripts(spark, 8_000, seed=42).localCheckpoint(
            eager=True
        )
        trip_all = (
            extract_triples(stream_t, head="mpn", planted=True)
            .withColumn(
                "_b", F.abs(F.xxhash64("conv_id")) % F.lit(n_batches)
            )
            .repartition(4)
            .localCheckpoint(eager=True)
        )
        aliases = (
            trip_all.select(F.col("subject").alias("m"))
            .unionByName(
                trip_all.select(F.element_at("object", "@value").alias("m"))
            )
            .distinct()
            .select(
                F.lower(F.trim("m")).alias("mention_norm"),
                F.xxhash64(F.lower(F.trim("m"))).alias("entity_id"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        lat = []
        t_all = time.time()
        for b in range(n_batches):
            batch = trip_all.where(F.col("_b") == b).drop("_b")
            tb = time.time()
            upsert_edge_batch(spark, batch, aliases, sink_dir, b)
            lat.append(time.time() - tb)
        total = time.time() - t_all
        lat.sort()
        print(
            f"streaming_kg_sink_20b: {total:.3f}s "
            f"p50={lat[len(lat)//2]:.3f} p95={lat[-1]:.3f}"
        )
    finally:
        _sh.rmtree(sink_dir, ignore_errors=True)


def run_sink_growth(spark):
    import shutil as _sh
    import tempfile as _tf

    from nlp_series_relation_extraction_spark.streaming.kg_sink import (
        read_current_edges,
        replay_alias_remap,
        upsert_edge_batch,
    )

    dir_a = _tf.mkdtemp(prefix="nre_prof_sink1x_")
    dir_b = _tf.mkdtemp(prefix="nre_prof_sink10x_")
    try:
        probe_subj = "growth probe subject"
        probe_pairs = [
            (probe_subj, f"growth probe object {i}") for i in range(20)
        ]
        probe_mentions = [probe_subj] + [o for _, o in probe_pairs]

        def _sink_aliases(tr):
            base = (
                tr.select(F.col("subject").alias("m"))
                .unionByName(
                    tr.select(F.element_at("object", "@value").alias("m"))
                )
                .distinct()
            )
            probe = spark.createDataFrame(
                [(m,) for m in probe_mentions], "m string"
            )
            return (
                base.unionByName(probe)
                .select(
                    F.lower(F.trim("m")).alias("mention_norm"),
                    F.xxhash64(F.lower(F.trim("m"))).alias("entity_id"),
                )
                .distinct()
                .localCheckpoint(eager=True)
            )

        def _probe_batch(b):
            return spark.createDataFrame(
                [
                    (f"probe{b}", i, "p", s, {"@value": o})
                    for i, (s, o) in enumerate(probe_pairs)
                ],
                "conv_id string, turn_idx int, predicate string,"
                " subject string, object map<string,string>",
            )

        def _seed_and_probe(d, n_turns, n_buckets):
            tr = extract_triples(
                synth_transcripts(spark, n_turns, seed=7),
                head="mpn", planted=True,
            ).localCheckpoint(eager=True)
            aliases = _sink_aliases(tr)
            upsert_edge_batch(spark, tr, aliases, d, 0, n_buckets=n_buckets)
            lat = []
            for b in range(1, 6):
                tb = time.time()
                upsert_edge_batch(spark, _probe_batch(b), aliases, d, b)
                lat.append(time.time() - tb)
            tr.unpersist()
            lat.sort()
            return lat[min(int(len(lat) * 0.95), len(lat) - 1)]

        p95_1x = _seed_and_probe(dir_a, 8_000, 8)
        p95_10x = _seed_and_probe(dir_b, 80_000, 80)
        print(
            f"sink_growth p95 1x={p95_1x:.3f} 10x={p95_10x:.3f}"
            f" ratio={p95_10x/max(p95_1x,1e-9):.2f}"
        )
        subj_ids = [
            r[0]
            for r in read_current_edges(spark, dir_b)
            .select("subj_entity_id")
            .distinct()
            .orderBy("subj_entity_id")
            .limit(40)
            .collect()
        ]
        remap_df = spark.createDataFrame(
            list(zip(subj_ids[:20], subj_ids[20:40])),
            "old_id long, new_id long",
        )
        tb = time.time()
        stats = replay_alias_remap(spark, dir_b, remap_df)
        print(
            f"sink_relink: {time.time()-tb:.3f}s "
            f"touched={len(stats['touched'])}/{stats['n_buckets']}"
        )
    finally:
        _sh.rmtree(dir_a, ignore_errors=True)
        _sh.rmtree(dir_b, ignore_errors=True)


def run_distant10x(spark):
    from nlp_series_relation_extraction_spark.operators.distant import (
        distant_supervision,
    )

    d10 = docs10(spark)
    tk10 = "split(text, ' ')"
    kb10 = (
        d10.where(
            (F.col("doc_id") % 97 == 0) & (F.expr(f"size({tk10})") >= 5)
        )
        .select(
            F.expr(f"concat_ws(' ', slice({tk10}, 1, 2))").alias("subj_text"),
            F.lit("cooccur").alias("predicate"),
            F.expr(f"concat_ws(' ', slice({tk10}, 4, 2))").alias("obj_text"),
        )
        .where(F.col("subj_text") != F.col("obj_text"))
        .distinct()
    )
    t0 = time.time()
    n = distant_supervision(d10, kb10).count()
    print(f"kg_distant_10x: {time.time()-t0:.3f}s rows={n}")


RUNNERS = {
    "linking10x": run_linking10x,
    "scc_rmat": run_scc_rmat,
    "sink20b": run_sink20b,
    "sink_growth": run_sink_growth,
    "gazetteer10x": run_gazetteer10x,
    "distant10x": run_distant10x,
}


def main():
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    extra = {}
    if os.environ.get("NRE_EVENTLOG", "0") == "1":
        # NOTE: event logging measurably slows job-heavy runs (up to
        # ~2-3x on thousand-job queries) — enable only to inspect job
        # structure, never for timing comparisons
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": EVENTLOG_DIR,
        }
    spark = get_spark(
        app_name="nre-prof-10x",
        master=f"local[{CPUS}]",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers like bench.py does
    extract_triples(
        synth_transcripts(spark, 2_000, seed=42), head="bio", planted=False
    ).count()
    for which in sys.argv[1:]:
        spark.sparkContext.setJobDescription(which)
        RUNNERS[which](spark)
        spark.sparkContext.setJobDescription(None)
    print("eventlog:", os.path.join(
        EVENTLOG_DIR, spark.sparkContext.applicationId))
    spark.stop()


if __name__ == "__main__":
    main()
