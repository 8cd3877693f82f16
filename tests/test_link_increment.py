"""Incremental entity linking (operators/linking.py:link_increment):
exact equality with the full-batch pipeline across batch folds —
including cross-batch merges through the contracted CC graph — plus
count accumulation and the no-new-mentions fast path. The driver query
kg_linking_increment is additionally hash-checked against the FULL-batch
recursive-CTE DuckDB oracle (tests/test_oracle_crosscheck.py), which is
the equality contract verified by an independent engine."""

from pyspark.sql import functions as F

from nlp_series_relation_extraction_spark.operators.linking import (
    link_increment,
    link_mentions,
)

# chain fixture (2-gram jaccard, threshold 0.5):
#   A = "abcdef"    ~ B = "abcdefghi"  (5/8  = 0.625)
#   B = "abcdefghi" ~ C = "bcdefghij"  (7/9  = 0.78)
#   A               vs C               (4/9  = 0.44 -> NOT an edge)
# so A and C co-link ONLY transitively through B.
A, B, C = "abcdef", "abcdefghi", "bcdefghij"
Z = "zzz corp"  # stable unrelated mention occurring in every batch


def _occ(spark, mentions):
    rows = [(f"c{i}", i, m) for i, m in enumerate(mentions)]
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, mention string"
    )


def _state_tuples(state_df):
    return sorted(
        (r.mention_norm, r.mention_id, r.n_occurrences, r.entity_id)
        for r in state_df.collect()
    )


def _entity_tuples(entities_df):
    return sorted(
        (r.entity_id, r.canonical_name, r.n_mentions, r.n_occurrences)
        for r in entities_df.collect()
    )


def _full_state(spark, mentions):
    """Full-batch reference state via link_mentions."""
    out = link_mentions(_occ(spark, mentions), threshold=0.5)
    dm, comps = out["distinct_mentions"], out["components"]
    state = dm.join(comps, "mention_id").select(
        "mention_norm",
        "mention_id",
        "n_occurrences",
        F.col("component_id").alias("entity_id"),
    )
    return state, out["entities"]


class TestLinkIncrement:
    def test_first_batch_equals_full_batch(self, spark):
        batch = [A, B, Z, Z]
        inc = link_increment(None, _occ(spark, batch))
        full_state, full_entities = _full_state(spark, batch)
        assert _state_tuples(inc["state"]) == _state_tuples(full_state)
        assert _entity_tuples(inc["entities"]) == _entity_tuples(
            full_entities
        )

    def test_bridge_mention_merges_prior_entities(self, spark):
        # A (batch 1) and C (batch 2) are separate entities until the
        # bridge B arrives in batch 3 — the incremental fold must merge
        # them into the same entity the full batch produces
        batches = [[A, Z], [C, Z], [B, Z]]
        state = None
        for b in batches:
            out = link_increment(state, _occ(spark, b))
            state = out["state"]
        full_state, full_entities = _full_state(
            spark, [m for b in batches for m in b]
        )
        assert _state_tuples(state) == _state_tuples(full_state)
        assert _entity_tuples(out["entities"]) == _entity_tuples(
            full_entities
        )
        # and the merge actually happened: A, B, C share one entity id
        eids = {
            r.entity_id: r.mention_norm for r in state.collect()
        }
        by_norm = {r.mention_norm: r.entity_id for r in state.collect()}
        assert by_norm[A] == by_norm[B] == by_norm[C]
        assert by_norm[Z] != by_norm[A]
        assert len(eids) >= 1

    def test_mid_state_entities_are_coherent(self, spark):
        # after batch 2 (before the bridge) A and C are DISTINCT entities
        out1 = link_increment(None, _occ(spark, [A, Z]))
        out2 = link_increment(out1["state"], _occ(spark, [C, Z]))
        by_norm = {
            r.mention_norm: r.entity_id for r in out2["state"].collect()
        }
        assert by_norm[A] != by_norm[C]

    def test_known_mentions_only_accumulate_counts(self, spark):
        out1 = link_increment(None, _occ(spark, [A, B, Z]))
        out2 = link_increment(out1["state"], _occ(spark, [Z, Z, A]))
        s1 = {r.mention_norm: r for r in out1["state"].collect()}
        s2 = {r.mention_norm: r for r in out2["state"].collect()}
        assert set(s1) == set(s2)
        for norm in s1:
            assert s1[norm].entity_id == s2[norm].entity_id
        assert s2[Z].n_occurrences == s1[Z].n_occurrences + 2
        assert s2[A].n_occurrences == s1[A].n_occurrences + 1

    def test_three_fold_equals_full_on_wider_corpus(self, spark):
        # a bigger deterministic corpus with repeated + near-dup names
        base = [
            "acme corp", "acme corp.", "acme corporation",
            "globex", "globex inc", "initech", "initech llc",
            A, B, C, Z,
        ]
        mentions = [base[(i * 7) % len(base)] for i in range(60)]
        thirds = [mentions[0::3], mentions[1::3], mentions[2::3]]
        state = None
        for part in thirds:
            out = link_increment(state, _occ(spark, part))
            state = out["state"]
        full_state, full_entities = _full_state(spark, mentions)
        assert _state_tuples(state) == _state_tuples(full_state)
        assert _entity_tuples(out["entities"]) == _entity_tuples(
            full_entities
        )
