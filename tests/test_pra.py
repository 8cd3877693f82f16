"""pra_path_features (operators/graph.py): Lao & Cohen 2010 path-
constrained random-walk features — hand-computed walk probabilities,
multi-mid summation, fan-out cap, candidate conditioning."""

from nlp_series_relation_extraction_spark.operators.graph import (
    pra_path_features,
)

E = "subj_entity_id long, predicate string, obj_entity_id long"
C = "src long, dst long"


def _feat(spark, edges, cands, **kw):
    e = spark.createDataFrame(edges, E)
    c = spark.createDataFrame(cands, C)
    return {
        (r.src, r.dst, r.path): r.prob_ppm
        for r in pra_path_features(e, c, **kw).collect()
    }


def test_two_step_multi_mid_sum(spark):
    # 1 -a-> {2, 3} (w = 500000 each); 2 -b-> 9 (w 1e6); 3 -b-> {9, 8}
    # (w 500000 each). P(1 ->a/b-> 9) = .5*1 + .5*.5 = .75
    edges = [
        (1, "a", 2), (1, "a", 3),
        (2, "b", 9), (3, "b", 9), (3, "b", 8),
    ]
    got = _feat(spark, edges, [(1, 9), (1, 8)])
    assert got[(1, 9, "a/b")] == 750_000
    # P(1 ->a/b-> 8) = .5 * .5 = .25
    assert got[(1, 8, "a/b")] == 250_000
    assert len(got) == 2  # no length-1 edges between candidates


def test_length1_and_parallel_paths(spark):
    # direct edge AND a 2-step path between the same candidate pair ->
    # two feature rows with distinct path keys
    edges = [
        (1, "knows", 9),
        (1, "a", 2), (2, "b", 9),
        (1, "a", 3),  # dangling branch halves the a-step weight
    ]
    got = _feat(spark, edges, [(1, 9)])
    assert got[(1, 9, "knows")] == 1_000_000
    assert got[(1, 9, "a/b")] == 500_000
    assert len(got) == 2


def test_candidate_conditioning(spark):
    # paths exist to 9 from both 1 and 5; only candidate (1, 9) scores
    edges = [(1, "a", 9), (5, "a", 9)]
    got = _feat(spark, edges, [(1, 9)])
    assert got == {(1, 9, "a"): 1_000_000}


def test_fanout_cap_drops_hub_steps(spark):
    # node 1's 'a' step fans to 3 targets; cap 2 removes that step
    # entirely (both as step 1 and step 2) but keeps the 'c' step
    edges = [
        (1, "a", 2), (1, "a", 3), (1, "a", 4),
        (1, "c", 2),
        (2, "b", 9),
    ]
    got = _feat(spark, edges, [(1, 9), (1, 2)], max_step_fanout=2)
    assert (1, 9, "a/b") not in got
    assert got[(1, 2, "c")] == 1_000_000
    assert got[(1, 9, "c/b")] == 1_000_000


def test_truncating_ppm_division(spark):
    # 1 -a-> {2,3,4} (w = 333333 ppm, already truncated); 2 -b-> 9 (1e6)
    # prob = 333333 * 1000000 div 1e6 = 333333 (not rounded to 333334)
    edges = [
        (1, "a", 2), (1, "a", 3), (1, "a", 4),
        (2, "b", 9),
    ]
    got = _feat(spark, edges, [(1, 9)])
    assert got[(1, 9, "a/b")] == 333_333
