"""Driver-contract registry consistency + sf0.001 smoke of every query."""

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.plans import queries as Q

SF = "/root/testdata/sf0.001"


def test_every_oracle_has_a_query():
    qs, osql = Q.queries(), Q.oracle_sql()
    assert set(osql) <= set(qs)
    # the Arrow-UDF extraction queries are deliberately rows-only (their
    # exactness is covered by planted P/R=1.0 + reference-scorer tests);
    # everything SQL-expressible — incl. LSH ANN and the full linking
    # pipeline — carries a DuckDB oracle
    rows_only = set(qs) - set(osql)
    allowed = ("kg_extract_", "kg_entities", "kg_graph", "kg_train",
               "kg_selfeval", "media_features", "audio_features",
               "audio_flac_features",
               "ann_topk_ivf", "ann_topk_pq", "kg_pagerank",
               "kg_communities", "semantic_dedup", "video_frames",
               # distributed model fits: iterative multi-job recursions,
               # twin-pinned in tests/test_distml.py
               "kmeans_embeddings", "pca_embeddings", "quality_classifier",
               # KG embedding fits + ranking: iterative, twin-pinned in
               # tests/test_kge.py
               "kg_transe_eval", "kg_link_prediction",
               # iterative peeling to fixpoint, python-twin-pinned in
               # tests/test_graph_analytics.py
               "kg_kcore",
               # truss peeling to fixpoint, python-twin-pinned in
               # tests/test_ktruss.py
               "kg_ktruss",
               # walks->pairs->fit composition; every stage twin-pinned
               "kg_deepwalk_embeddings",
               # seeded power iteration, numpy-twin-pinned in
               # tests/test_graph_analytics.py::TestPersonalizedPageRank
               "kg_personalized_pagerank",
               # iterative hub/authority power iteration, numpy-twin-
               # pinned in tests/test_graph_analytics.py::TestHITS
               "kg_hits",
               # TruthFinder-style trust/confidence fixpoint, dict-twin-
               # pinned in tests/test_fusion.py (majority vote, the SQL-
               # expressible fuser, IS oracle-checked as kg_fact_fusion)
               "kg_fact_fusion_trust",
               # HyperANF: iterative HLL sketch merge (float estimates),
               # md5-identical python twin at 1e-9 in
               # tests/test_graph_analytics.py::TestHyperANF
               "kg_anf_curve",
               # Brandes sigma/delta recursion (float shares), exact
               # twin parity in full/sampled/truncated regimes in
               # tests/test_graph_analytics.py::TestBetweenness
               "kg_betweenness",
               # unigram-LM EM fit (float expected-count sums), twin
               # parity + Viterbi semantics in tests/test_unigram.py
               "unigram_token_counts",
               # Fellegi-Sunter EM: SQL cannot run the recursion; twin
               # BIT-equality pinned in tests/test_record_linkage.py
               "kg_record_linkage",
               # driver-side SVD (Procrustes fit) over Arrow partial
               # sums, twin-pinned in tests/test_procrustes.py
               "kg_embedding_align",
               # per-component integer Hungarian (optimal assignment is
               # not SQL-expressible); global-matrix twin + brute-force
               # permutation parity in tests/test_ceaf.py
               "kg_ceaf_eval",
               # iterative synchronous gain-move recursion,
               # identical-recursion python twin in tests/test_louvain.py
               "kg_louvain",
               # CoNLL mean includes the CEAF-e term (Hungarian);
               # member math pinned in tests/test_ceaf.py, MUC/B3
               # members oracle-checked as kg_muc_eval/kg_clustering_eval
               "kg_conll_score",
               # float PageRank power iteration over the turn-similarity
               # graph; identical-recursion twin in tests/test_textrank.py
               "conv_textrank",
               # iterative KGE fit + float-score thresholds; full
               # protocol twin in tests/test_kge_tc.py
               "kg_triple_classification",
               # Borůvka MSF: stateful contraction recursion; Kruskal
               # twin exact edge-set equality in tests/test_msf.py
               "kg_msf",
               # batched densest-subgraph peel with snapshot tracking;
               # exact-integer twin in tests/test_densest.py
               "kg_densest",
               # h-index coreness fixpoint; cross-validated against the
               # classic peeling twin in tests/test_coreness.py
               "kg_coreness")
    assert all(k.startswith(allowed) for k in rows_only), rows_only


def test_rows_only_queries_documented_in_coverage():
    """COVERAGE.md's 'Rows-only driver queries -> their pytest oracles'
    table must list EXACTLY the queries() entries without an oracle_sql()
    twin — a new rows-only query without a documented pytest oracle (or a
    stale row for a query that gained a SQL oracle) fails here."""
    import os
    import re

    rows_only = set(Q.queries()) - set(Q.oracle_sql())
    path = os.path.join(os.path.dirname(__file__), "..", "COVERAGE.md")
    with open(path, encoding="utf-8") as f:
        text = f.read()
    section = text.split("## Rows-only driver queries")[1]
    documented = set(re.findall(r"^\| `([a-z0-9_]+)` \|", section, re.M))
    assert documented == rows_only, (
        f"undocumented rows-only queries: {sorted(rows_only - documented)}; "
        f"stale COVERAGE.md rows: {sorted(documented - rows_only)}"
    )


@pytest.mark.parametrize("name", sorted(Q.queries().keys()))
def test_query_smoke_sf0001(spark, name):
    df = Q.queries()[name](spark, SF)
    rows = df.limit(5000).collect()
    assert rows is not None
    # stable, non-empty schema
    assert len(df.columns) >= 1


def test_encoder_weight_roundtrip(tmp_path):
    from nlp_series_relation_extraction_spark.core.encoders import (
        HashEncoder,
        load_encoder,
        save_encoder,
    )

    enc = HashEncoder(42)
    p = str(tmp_path / "weights.npz")
    save_encoder(enc, p)
    enc2 = load_encoder(p)
    toks = ["[CLS]", "甲", "乙", "abc", "[SEP]"]
    assert np.allclose(enc.bio_probs(toks), enc2.bio_probs(toks))
    assert enc.b_rel == enc2.b_rel
