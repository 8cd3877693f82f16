"""Physical-plan regression tests: the plans must stay the plans we chose.

These guard the scale properties the engine is designed around — column
pruning into the scan, predicate pushdown, broadcast joins for dimension
sides, partial+final aggregation — so a refactor that silently degrades a
plan (e.g. breaks pruning by touching extra columns) fails CI, not a 100TB
run.
"""

import re

from nlp_series_relation_extraction_spark.operators.extract import extract_triples
from nlp_series_relation_extraction_spark.plans import queries as Q
from nlp_series_relation_extraction_spark.sources.synthetic import synth_transcripts

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_extraction_scan_prunes_to_three_columns(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    synth_transcripts(spark, 50, seed=1, partitions=2).write.parquet(p)
    plan = _plan(extract_triples(spark.read.parquet(p), head="mpn"))
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    # gold_json/role/tool/ts must NOT reach the scan in hash mode
    assert cols == {"conv_id", "turn_idx", "text"}


def test_filter_pushdown_reaches_scan(spark):
    plan = _plan(Q.q_filter_pushdown_agg(spark, SF))
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(l_discount,0.02)" in plan
    assert "LessThan(l_quantity,24.0)" in plan or "LessThan(l_quantity,24" in plan


def test_dimension_joins_broadcast(spark):
    plan = _plan(Q.q_top_customer_revenue(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    plan5 = _plan(Q.q_nation_revenue(spark, SF))
    assert plan5.count("BroadcastHashJoin") >= 3


def test_aggregation_is_partial_plus_final(spark):
    plan = _plan(Q.q_pricing_summary(spark, SF))
    # two HashAggregate nodes (partial + final) around one shuffle
    assert plan.count("HashAggregate") >= 2
    assert "Exchange" in plan


def test_eval_join_is_semi(spark):
    plan = _plan(Q.q_kg_eval_prf(spark, SF))
    assert "LeftSemi" in plan


def test_fingerprint_is_single_aggregation_no_window(spark):
    """doc_fingerprint must stay the one-shuffle agg plan (slice of the
    sorted per-doc hash list), not a window row_number pass — the window
    variant fully sorts every shingle row per partition."""
    plan = _plan(Q.q_doc_fingerprint(spark, SF))
    assert "Window" not in plan
    assert "HashAggregate" in plan or "ObjectHashAggregate" in plan or "SortAggregate" in plan


def test_jaccard_query_reads_materialized_shingles(spark):
    """The capped jaccard query materializes the shingle stage once: all
    four consumers (sizes, df cap, both join sides) must read the
    checkpointed RDD, not re-evaluate the split/slice/explode expression."""
    plan = _plan(Q.q_dedup_jaccard(spark, SF))
    # localCheckpoint shows up as ExistingRDD scans; the parquet scan and
    # the shingle expression must NOT appear in the final plan
    assert "Scan ExistingRDD" in plan
    assert "Scan parquet" not in plan
    # hot-shingle cap join is a broadcast LEFT ANTI (no shuffle of the
    # shingle table against the tiny hot list)
    assert "LeftAnti" in plan and "BroadcastHashJoin" in plan


def test_linking_block_cap_is_broadcast_anti(spark):
    """candidate_pairs drops oversized blocks via a broadcast left-anti
    join against the (tiny) oversized-block list — never a shuffled join
    of the full block table."""
    from nlp_series_relation_extraction_spark.operators.linking import (
        candidate_pairs,
        distinct_mentions,
        normalize_mentions,
    )
    from pyspark.sql import functions as F

    m = spark.createDataFrame(
        [("c", 0, f"mention{i}") for i in range(30)],
        "conv_id string, turn_idx int, mention string",
    )
    dm = distinct_mentions(normalize_mentions(m))
    plan = _plan(candidate_pairs(dm))
    assert "LeftAnti" in plan
    assert "BroadcastHashJoin" in plan


def test_near_dup_self_join_reads_materialized_buckets(spark):
    """embedding_near_dup's candidate self-join must consume the
    checkpointed bucket table on BOTH sides (ExistingRDD scans, zero
    MapInPandas in the join plan): the bucketize UDF runs once, not per
    join side — the round-3 subquadratic rewrite's fan-out rule."""
    from nlp_series_relation_extraction_spark.functions.similarity import (
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = embedding_near_dup_pairs(emb, "vec_id", "embedding", bits=10)
    plan = _plan(out)
    assert "ExistingRDD" in plan  # checkpointed bucket table
    # candidate generation runs no Python: the only Arrow stage (bucketize)
    # already materialized; the exact-threshold join is pure Catalyst
    assert plan.count("MapInPandas") == 0, plan


def test_balanced_sample_rates_broadcast_and_pruned_scan(spark):
    """balanced_sample's per-group rate dim must broadcast onto the corpus
    (the data rows are never shuffled) and the corpus scan must prune to
    exactly the projected columns + group key."""
    plan = _plan(Q.q_balanced_sample(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    m = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    widest = max(
        ({c.split(":")[0] for c in g.split(",")} for g in m), key=len
    )
    assert widest == {"doc_id", "lang", "source"}, widest


def test_lm_scoring_scans_prune_to_text(spark):
    """lm_quality touches documents three times (counts, vocab, scoring
    probe) — every scan must prune to (doc_id,text) or narrower, and the
    count aggregations must be partial+final (map-side combine is the hot
    -stopword-bigram skew bound)."""
    plan = _plan(Q.q_lm_quality(spark, SF))
    for g in re.findall(r"ReadSchema: struct<([^>]*)>", plan):
        cols = {c.split(":")[0] for c in g.split(",")}
        assert cols <= {"doc_id", "text"}, cols
    assert plan.count("HashAggregate") >= 4  # partial+final on both counts


def test_cluster_keep_component_loop_reads_materialized_pairs(spark):
    """near_dup_clusters materializes the LSH pair edges once: the
    connected-components consumers must read the checkpointed RDD, not
    re-run the shingle->minhash->band self-join (measured 3x at sf0.1)."""
    from nlp_series_relation_extraction_spark.functions.dedup import (
        near_dup_clusters,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(near_dup_clusters(docs, "doc_id", "text"))
    assert "ExistingRDD" in plan
    # the band self-join must be gone from the final labels plan
    assert "md5" not in plan.lower()


def test_extraction_exchange_partition_count_is_pinned(spark, tmp_path):
    """Round-4 scale fix: the pre-UDF repartition(conv_id) must carry an
    EXPLICIT partition count (REPARTITION_BY_NUM). A bare column
    repartition is AQE-coalescible BY BYTES, and transcript rows are tiny
    while per-row UDF cost is large — at sf0.1 AQE folded the whole
    extraction into one task (measured 8.6s -> 1.6s on 32 cores when
    pinned). Compute-parallel stages size partitions by cores, not bytes."""
    p = str(tmp_path / "t.parquet")
    synth_transcripts(spark, 50, seed=1, partitions=2).write.parquet(p)
    plan = _plan(extract_triples(spark.read.parquet(p), head="mpn"))
    assert "REPARTITION_BY_NUM" in plan, plan
    dp = spark.sparkContext.defaultParallelism
    assert re.search(rf"hashpartitioning\(conv_id#\d+, {dp}\)", plan), plan


def test_sequence_ngrams_single_window_node(spark):
    # all lead(token, i) positions must fold into ONE Window node — a
    # per-position window would shuffle the stream n-1 times
    plan = _plan(Q.q_event_sequence_ngrams(spark, SF))
    # formatted plans list each node twice (tree + detail): count the
    # detail headers
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 1, plan
    # and the gram aggregation keeps map-side partials
    assert "partial_count" in plan


def test_role_transitions_normalizer_windows_aggregated_matrix(spark):
    # lead() window over turns + normalizer window over the AGGREGATED
    # matrix = exactly two Window nodes, with the count aggregation
    # (partial+final) between them
    plan = _plan(Q.q_role_transitions(spark, SF))
    assert len(re.findall(r"^\(\d+\) Window", plan, re.M)) == 2, plan
    assert "partial_count" in plan


def test_entity_pmi_joint_counts_have_map_side_combine(spark):
    plan = _plan(Q.q_kg_entity_pmi(spark, SF))
    # pair aggregation and entity-count aggregation both partial+final
    assert plan.count("partial_count") >= 2, plan


def test_node2vec_candidate_weighting_no_cartesian(spark):
    # the candidate fan-out is an equi-join on the current vertex and
    # the stay-classification is an equi-left-join on (prev, cand):
    # no BroadcastNestedLoopJoin / CartesianProduct may appear
    from nlp_series_relation_extraction_spark.operators.graph import (
        node2vec_walks,
    )

    edges = spark.createDataFrame(
        [(1, "r", 2), (2, "r", 3), (1, "r", 3)],
        "subj_entity_id long, predicate string, obj_entity_id long",
    )
    plan = _plan(node2vec_walks(edges, walk_len=2, n_walks=1))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_distant_supervision_dims_broadcast_no_cartesian(spark):
    plan = _plan(Q.q_kg_distant_supervision(spark, SF))
    # the surface dictionary and the KB are dimensions: broadcast,
    # never a doc x surface cartesian
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_minus_bgp_is_anti_join_on_shared_vars(spark):
    plan = _plan(Q.q_kg_bgp_minus(spark, SF))
    # SPARQL MINUS must compile to one anti join, not except/distinct
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_entity_summary_pred_counts_broadcast(spark):
    plan = _plan(Q.q_kg_entity_summary(spark, SF))
    # the predicate-frequency table is vocabulary-sized: broadcast side
    assert "BroadcastHashJoin" in plan
    # exactly one window (the per-subject top-k), not one per column
    assert plan.count("Window") >= 1
    assert "CartesianProduct" not in plan


def test_fact_conflicts_no_cartesian_and_partial_agg(spark):
    plan = _plan(Q.q_kg_fact_conflicts(spark, SF))
    # the interval self-join is an equi-join on the key columns
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or (
        "BroadcastHashJoin" in plan
    )


def test_sparql_agg_partial_final_no_extra_exchange(spark):
    plan = _plan(Q.q_kg_sparql_agg(spark, SF))
    # SPARQL GROUP BY compiles to hash aggregation with a map-side
    # partial (keys + count/count-distinct/min/max), never a window
    assert "HashAggregate" in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_filter_exists_is_semi_join_on_shared_vars(spark):
    plan = _plan(Q.q_kg_filter_exists(spark, SF))
    # FILTER EXISTS must compile to one semi join — never an inner join
    # + distinct (which would multiply then dedup the probe side)
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_path_expr_nps_prunes_branches_no_cartesian(spark):
    plan = _plan(Q.q_kg_path_expr(spark, SF))
    # the negated property set's NOT-IN hits literal predicate columns:
    # Catalyst must constant-fold the excluded union branches away, so
    # the supplier scan disappears from the plan entirely
    assert "supplier.parquet" not in plan
    assert "customer.parquet" in plan and "nation.parquet" in plan
    # every '/' composition is an equi-join (broadcast here: the step
    # sides are nation-sized); never a cartesian
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_sparql_update_anti_join_no_cartesian(spark):
    plan = _plan(Q.q_kg_sparql_update(spark, SF))
    # the delete set subtracts via one anti join on the triple key —
    # never except/distinct or a cartesian
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_owl_class_restriction_tables_broadcast(spark):
    from nlp_series_relation_extraction_spark.operators.ontology import (
        _class_rule_pass,
    )

    facts = spark.createDataFrame(
        [("a", "p", "b"), ("b", "type", "C")],
        "subj string, predicate string, obj string",
    )
    schema = "cls string, prop string, filler string"
    hv = spark.createDataFrame([("H", "p", "b")], schema)
    svf = spark.createDataFrame([("S", "p", "C")], schema)
    avf = spark.createDataFrame([("C", "p", "D")], schema)
    plan = _plan(_class_rule_pass(facts, facts, hv, svf, avf, "type"))
    # restriction declarations are schema-sized: every rule joins them
    # as broadcasts; the only non-broadcast joins key on (entity, prop)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_owl_chain_step_table_broadcast(spark):
    # the fixpoint loop checkpoints eagerly, so pin the lazy per-round
    # derivation (_step_compose) the loop executes
    from nlp_series_relation_extraction_spark.operators.ontology import (
        _step_compose,
    )

    facts = spark.createDataFrame(
        [("a", "p", "b"), ("b", "q", "c")],
        "subj string, predicate string, obj string",
    )
    steps_df = spark.createDataFrame(
        [("p", "q", "r")], "lp string, rp string, op string"
    )
    plan = _plan(_step_compose(facts, facts, steps_df))
    # the step table joins as a broadcast on each side; the data-data
    # composition keys on (vertex, predicate) — no cartesian anywhere
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_haskey_block_verify_no_cartesian(spark):
    from nlp_series_relation_extraction_spark.operators.ontology import (
        has_key_pairs,
    )

    facts = spark.createDataFrame(
        [("a", "type", "P"), ("b", "type", "P"),
         ("a", "k1", "v"), ("b", "k1", "v"),
         ("a", "k2", "w"), ("b", "k2", "w")],
        "subj string, predicate string, obj string",
    )
    plan = _plan(has_key_pairs(facts, [("P", ("k1", "k2"))]))
    # block on k1 (hash agg), verify k2 via keyed joins; the class
    # gate is a semi-join — never a cartesian anywhere
    assert "CartesianProduct" not in plan


def test_direct_mapping_single_scan_per_table_no_join(spark):
    from nlp_series_relation_extraction_spark.operators.rdb2rdf import (
        direct_mapping,
    )

    df = direct_mapping(
        {
            "nation": spark.read.parquet(SF + "/nation.parquet"),
            "region": spark.read.parquet(SF + "/region.parquet"),
        },
        {"nation": "n_nationkey", "region": "r_regionkey"},
        {"nation": [("n_regionkey", "region")]},
    )
    plan = _plan(df)
    # FK reference IRIs are concats over the key VALUE: zero joins,
    # zero exchanges — triples stream out at scan bandwidth
    assert "Join" not in plan
    assert "Exchange" not in plan
