"""mips_topk_lsh (functions/similarity.py): asymmetric norm-augmentation
MIPS — exactness of the reduction, high-norm retrieval, recall floor."""

import math
import random

from nlp_series_relation_extraction_spark.functions.similarity import (
    brute_force_topk,
    mips_topk_lsh,
)

E = "vec_id long, embedding array<float>"


def _mk(spark, rows):
    return spark.createDataFrame(rows, E)


def _topk(df):
    return {
        (r.query_id, r.rank): (r.neighbor_id, r.qdot) for r in df.collect()
    }


def test_high_norm_vector_wins_over_aligned_low_norm(spark):
    # query q = e0; candidate A = 0.2*e0 (perfectly aligned, tiny norm),
    # candidate B = 3.0*(cos25deg e0 + sin25deg e1) (larger dot). MIPS
    # must return B first; cosine ranking would pick A.
    c, s = math.cos(0.44), math.sin(0.44)
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),            # the query
        (1, [0.2, 0.0, 0.0, 0.0]),            # aligned, low norm
        (2, [3.0 * c, 3.0 * s, 0.0, 0.0]),    # off-angle, high norm
    ]
    got = _topk(mips_topk_lsh(_mk(spark, rows), "vec_id", "embedding",
                              query_ids=[0], k=2, bits=2, tables=16))
    assert got[(0, 1)][0] == 2
    assert got[(0, 2)][0] == 1


def test_scores_are_exact_original_dots(spark):
    # the augmentation must not leak into the reported qdot: it equals
    # brute_force_topk's quantized integer dot for the same pair
    rng = random.Random(3)
    rows = [
        (i, [rng.uniform(-1, 1) * (1 + i % 4) for _ in range(8)])
        for i in range(40)
    ]
    df = _mk(spark, rows)
    mips = _topk(mips_topk_lsh(df, "vec_id", "embedding",
                               query_ids=[0, 1], k=3, bits=2, tables=24))
    brute = _topk(brute_force_topk(df, "vec_id", "embedding",
                                   query_ids=[0, 1], k=39))
    brute_dots = {
        (q, n): d for (q, _), (n, d) in brute.items()
    }
    for (q, _), (n, d) in mips.items():
        assert brute_dots[(q, n)] == d


def test_recall_floor_on_norm_spread_corpus(spark):
    # 300 vectors, norms spread 1x-5x: recall@5 vs exact MIPS >= 0.8 at
    # bits=4/tables=24 (OR-amplification covers the augmented sphere)
    rng = random.Random(11)
    rows = [
        (
            i,
            [rng.gauss(0, 1) * (1 + (i % 5)) for _ in range(16)],
        )
        for i in range(300)
    ]
    df = _mk(spark, rows)
    qids = list(range(8))
    mips = mips_topk_lsh(df, "vec_id", "embedding", query_ids=qids,
                         k=5, bits=4, tables=24)
    brute = brute_force_topk(df, "vec_id", "embedding", query_ids=qids, k=5)
    m = {(r.query_id, r.neighbor_id) for r in mips.collect()}
    b = {(r.query_id, r.neighbor_id) for r in brute.collect()}
    recall = len(m & b) / len(b)
    assert recall >= 0.8, recall


def test_output_schema_matches_brute(spark):
    rows = [(i, [float(i), 1.0]) for i in range(6)]
    df = _mk(spark, rows)
    mips = mips_topk_lsh(df, "vec_id", "embedding", query_ids=[1], k=2,
                         bits=1, tables=8)
    brute = brute_force_topk(df, "vec_id", "embedding", query_ids=[1], k=2)
    assert mips.columns == brute.columns
