"""ranking_eval (functions/retrieval.py): trec_eval-core nDCG@k / MRR /
P@k / R@k semantics pinned against hand-computed integer-ppm values and
the DuckDB twin (bit-exact)."""

import duckdb
import pytest

from nlp_series_relation_extraction_spark.functions.retrieval import (
    _discounts_ppm,
    ranking_eval,
    ranking_eval_sql,
)

K = 5
DISC = _discounts_ppm(K)

# run: (query_id, rank, unit)
RUN = [
    # q1: relevant b@1, a@3, c@4; z/d unjudged
    (1, 1, "b"), (1, 2, "z"), (1, 3, "a"), (1, 4, "c"), (1, 5, "d"),
    # q2: nothing relevant retrieved (x never surfaces)
    (2, 1, "m"), (2, 2, "n"),
    # q3: run exists but q3 has no relevant judgment -> excluded
    (3, 1, "a"),
    # q4 has a relevant judgment but NO run rows at all
]
# qrels: (query_id, unit, grade)
QRELS = [
    (1, "a", 2), (1, "b", 1), (1, "c", 1),
    (2, "x", 1),
    (3, "a", 0),          # judged non-relevant only -> query excluded
    (4, "u", 3),          # relevant but never retrieved
]


def _expected():
    # q1
    dcg1 = (2 ** 1 - 1) * DISC[0] + (2 ** 2 - 1) * DISC[2] + (2 ** 1 - 1) * DISC[3]
    idcg1 = (2 ** 2 - 1) * DISC[0] + (2 ** 1 - 1) * DISC[1] + (2 ** 1 - 1) * DISC[2]
    q1 = (1, 3, 3, dcg1 * 1_000_000 // idcg1, 1_000_000,
          3 * 1_000_000 // K, 1_000_000)
    q2 = (2, 1, 0, 0, 0, 0, 0)
    idcg4 = (2 ** 3 - 1) * DISC[0]
    assert idcg4 > 0
    q4 = (4, 1, 0, 0, 0, 0, 0)
    return [q1, q2, q4]


COLS = ["query_id", "n_rel", "rel_ret", "ndcg_ppm", "rr_ppm",
        "p_at_k_ppm", "recall_ppm"]


def test_ranking_eval_hand_computed(spark):
    run = spark.createDataFrame(RUN, "query_id long, rank int, unit string")
    qrels = spark.createDataFrame(
        QRELS, "query_id long, unit string, grade int"
    )
    got = sorted(
        tuple(r) for r in ranking_eval(run, qrels, k=K)
        .select(*COLS).collect()
    )
    assert got == sorted(_expected())


def test_ranking_eval_duckdb_twin_bit_exact(spark):
    run_cte = " UNION ALL ".join(
        f"SELECT {q}::BIGINT AS query_id, {r} AS rank, '{u}' AS unit"
        for q, r, u in RUN
    )
    qrels_cte = " UNION ALL ".join(
        f"SELECT {q}::BIGINT AS query_id, '{u}' AS unit, {g} AS grade"
        for q, u, g in QRELS
    )
    sql = ranking_eval_sql(run_cte, qrels_cte, k=K) + " ORDER BY query_id"
    oracle = [tuple(r) for r in duckdb.sql(sql).fetchall()]
    run = spark.createDataFrame(RUN, "query_id long, rank int, unit string")
    qrels = spark.createDataFrame(
        QRELS, "query_id long, unit string, grade int"
    )
    got = [
        tuple(r)
        for r in ranking_eval(run, qrels, k=K)
        .orderBy("query_id").select(*COLS).collect()
    ]
    assert got == oracle


def test_ranking_eval_rank_beyond_k_ignored(spark):
    """A relevant hit at rank k+1 contributes nothing (run rows past k
    are cut before scoring)."""
    run = spark.createDataFrame(
        [(1, 6, "a")], "query_id long, rank int, unit string"
    )
    qrels = spark.createDataFrame(
        [(1, "a", 1)], "query_id long, unit string, grade int"
    )
    [row] = ranking_eval(run, qrels, k=K).collect()
    assert (row.rel_ret, row.ndcg_ppm, row.rr_ppm) == (0, 0, 0)


def test_discount_table_values():
    assert DISC == [1000000, 630930, 500000, 430677, 386853]
    assert _discounts_ppm(1) == [1000000]
