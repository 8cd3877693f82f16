"""Multi-layer attention encoder (core/attention.py) — round-3 VERDICT
ask #3: a REAL 2-layer transformer forward behind the same encoder
interface, shipped through the npz weights lifecycle, with distributed
(batched, padded, length-bucketed) extraction equal to the per-row local
forward."""

import json
import os

import numpy as np
import pytest

from nlp_series_relation_extraction_spark.core.attention import AttnEncoder
from nlp_series_relation_extraction_spark.core.encoders import (
    HashEncoder,
    load_encoder,
    save_encoder,
)


def _toks(n, base=0x4E00):
    return ["[CLS]"] + [chr(base + 7 * i) for i in range(n)] + ["[SEP]"]


def test_trunk_is_a_real_transformer():
    """Context sensitivity the hash mixer cannot fake: changing ONE distant
    token changes every position's representation (full bidirectional
    attention), and outputs are deterministic given the seed."""
    e = AttnEncoder(seed=42)
    t1 = _toks(20)
    t2 = list(t1)
    t2[-2] = "改"  # last content token
    C1, C2 = e.encode(t1), e.encode(t2)
    # EARLIER positions see the later change (bidirectional attention —
    # the cumsum mixer in HashEncoder is causal and cannot do this)
    assert np.abs(C1[1] - C2[1]).max() > 1e-5
    assert np.allclose(AttnEncoder(seed=42).encode(t1), C1)
    assert not np.allclose(AttnEncoder(seed=7).encode(t1), C1)


def test_batched_forward_equals_per_row():
    """Padding appears only as masked keys: every valid position of the
    padded batched forward equals the per-row forward (f32 rounding)."""
    e = AttnEncoder(seed=42)
    batch = [_toks(5), _toks(31), _toks(12), _toks(1)]
    Cb, lens = e.encode_batch(batch)
    for i, toks in enumerate(batch):
        assert lens[i] == len(toks)
        assert np.allclose(Cb[i, : lens[i]], e.encode(toks), atol=1e-4)


def test_npz_roundtrip_restores_trunk_and_calibration(tmp_path):
    e = AttnEncoder(seed=42)
    p = str(tmp_path / "attn.npz")
    save_encoder(e, p)
    e2 = load_encoder(p)
    assert isinstance(e2, AttnEncoder)
    t = _toks(17)
    assert np.allclose(e2.encode(t), e.encode(t))
    assert e2.b_bio == pytest.approx(e.b_bio, abs=1e-12)
    assert np.allclose(e2.bio_probs(t), e.bio_probs(t))
    # hash checkpoints still load as HashEncoder (dispatch key absent)
    ph = str(tmp_path / "hash.npz")
    save_encoder(HashEncoder(seed=42), ph)
    assert not isinstance(load_encoder(ph), AttnEncoder)


def test_calibrated_fire_rate_is_realistic():
    """The inherited calibration runs through the attention trunk: decoded
    BIO fire rate lands in the same realistic band as the hash trunk's."""
    e = AttnEncoder(seed=42)
    rate = float((e.bio_probs(_toks(120)) > 0.5).mean())
    assert 0.0005 < rate < 0.05


@pytest.mark.parametrize("head", ["bio", "mpn", "mhs", "biaffine"])
def test_distributed_extraction_equals_per_row_local(spark, tmp_path, head):
    """The ask's pin, for ALL FOUR heads (round-4 ask #3 extended the
    batched trunk forward past BIO to the span heads): kg-extraction
    through Spark (Arrow batches, padded+chunked batch_forward, length
    bucketing, npz shipping, executor singletons) yields EXACTLY the
    per-row local forward's triples."""
    from nlp_series_relation_extraction_spark.core.heads import extract_row
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        synth_pandas,
        synth_transcripts,
    )

    p = str(tmp_path / "attn_ship.npz")
    save_encoder(AttnEncoder(seed=42), p)
    n = 120
    turns = extract_turn_results(
        synth_transcripts(spark, n, seed=42),
        head=head,
        planted=False,
        batch_forward=True,
        weights_path=p,
    ).collect()
    got = {
        (r.conv_id, r.turn_idx): sorted(
            (
                t.predicate,
                t.subject,
                json.dumps(dict(t.object), sort_keys=True, ensure_ascii=False),
            )
            for t in r.triples
        )
        for r in turns
    }
    want = {}
    n_triples = 0
    for _, row in synth_pandas(n, seed=42).iterrows():
        res = extract_row(head, row.text, seed=42, weights_path=p)
        want[(row.conv_id, row.turn_idx)] = sorted(
            (
                s["predicate"],
                s["subject"],
                json.dumps(s["object"], sort_keys=True, ensure_ascii=False),
            )
            for s in res["spo_list"]
        )
        n_triples += len(res["spo_list"])
    assert got == want
    assert n_triples > 0  # the forward actually fires


@pytest.mark.parametrize(
    "name",
    [
        "kg_extract_bio_attn",
        "kg_extract_mpn_attn",
        "kg_extract_mhs_attn",
        "kg_extract_biaffine_attn",
    ],
)
def test_driver_query_smoke(spark, name):
    """The attention-trunk extraction queries run end-to-end at sf0.001
    with rows > 0 and a stable schema; the weights artifact is created on
    demand."""
    from nlp_series_relation_extraction_spark.plans.queries import (
        attn_weights_path,
        queries,
    )

    df = queries()[name](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert df.columns == [
        "conv_id", "turn_idx", "predicate", "subject", "subject_type",
        "object_json",
    ]
    assert len(rows) > 0
    assert os.path.exists(attn_weights_path())


@pytest.mark.parametrize("head", ["mpn", "mhs", "biaffine"])
def test_chunked_batch_forward_is_chunk_boundary_invariant(head, tmp_path):
    """The memory-bounded chunking of the batched trunk forward
    (core/heads.py ATTN_CELL_BUDGET) must not change results: a budget so
    small every row is its own chunk decodes identically to one big
    chunk, and both equal the per-row path — under BOTH trunks (the
    attention trunk is where padding masks could leak across rows)."""
    from nlp_series_relation_extraction_spark.core import heads as H
    from nlp_series_relation_extraction_spark.core.heads import (
        extract_row,
        extract_rows_batch,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        synth_pandas,
    )

    p = str(tmp_path / "attn.npz")
    save_encoder(AttnEncoder(seed=42), p)
    texts = synth_pandas(40, seed=11).text.tolist()
    for wp in (None, p):
        big = extract_rows_batch(head, texts, seed=42, weights_path=wp)
        old = H.ATTN_CELL_BUDGET
        try:
            H.ATTN_CELL_BUDGET = 1  # degenerate: one row per chunk
            tiny = extract_rows_batch(head, texts, seed=42, weights_path=wp)
        finally:
            H.ATTN_CELL_BUDGET = old
        assert big == tiny
        perrow = [
            extract_row(head, t, seed=42, weights_path=wp) for t in texts
        ]
        assert big == perrow
