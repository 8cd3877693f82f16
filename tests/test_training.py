"""Distributed BIO/mpn-head training: loss must decrease across Spark epochs."""

import numpy as np

from nlp_series_relation_extraction_spark.operators.train import (
    running_mean_20,
    train_bio_head,
    train_mhs_head,
    train_mpn_head,
)
from nlp_series_relation_extraction_spark.sources.synthetic import synth_transcripts


def test_distributed_sgd_reduces_masked_bce(spark):
    t = synth_transcripts(spark, 240, seed=42, partitions=4)
    res = train_bio_head(t, epochs=4, lr=0.08)
    h = res["loss_history"]
    assert len(h) == 4
    assert all(b < a for a, b in zip(h, h[1:]))  # strictly decreasing
    assert res["best_loss"] == min(h)
    assert res["weights"].shape == (64, 112)
    assert np.isfinite(res["weights"]).all()


def test_training_deterministic(spark):
    t = synth_transcripts(spark, 120, seed=7, partitions=3)
    a = train_bio_head(t, epochs=2, lr=0.05)
    b = train_bio_head(t, epochs=2, lr=0.05)
    assert a["loss_history"] == b["loss_history"]


def test_mpn_joint_sgd_reduces_loss(spark):
    t = synth_transcripts(spark, 240, seed=42, partitions=4)
    res = train_mpn_head(t, epochs=4, lr=0.4)
    h = res["loss_history"]
    assert len(h) == 4
    assert all(b < a for a, b in zip(h, h[1:]))  # strictly decreasing
    assert res["best_loss"] == min(h)
    assert res["w_sub"].shape == (64, 2)
    assert res["w_po"].shape == (64, 110)
    assert np.isfinite(res["w_sub"]).all() and np.isfinite(res["w_po"]).all()
    # both joint-loss components improve end-to-end
    assert res["sub_loss_history"][-1] < res["sub_loss_history"][0]
    assert res["po_loss_history"][-1] < res["po_loss_history"][0]


def test_mpn_training_deterministic_and_partition_invariant(spark):
    t1 = synth_transcripts(spark, 120, seed=7, partitions=3)
    a = train_mpn_head(t1, epochs=2, lr=0.3)
    b = train_mpn_head(t1, epochs=2, lr=0.3)
    assert a["loss_history"] == b["loss_history"]
    # 1 vs 4 partitions: same math up to f32 partial-sum regrouping
    c = train_mpn_head(t1, epochs=2, lr=0.3, num_partitions=1)
    d = train_mpn_head(t1, epochs=2, lr=0.3, num_partitions=4)
    assert np.allclose(c["loss_history"], d["loss_history"], rtol=1e-5)


def test_mpn_gradient_matches_finite_difference():
    """The analytic map-side gradient equals the numeric directional
    derivative of the joint loss (pure numpy, replicating the epoch UDF on
    a tiny corpus; central difference vs <grad, direction>)."""
    import json

    from nlp_series_relation_extraction_spark.core.encoders import (
        HashEncoder,
        PlantedEncoder,
        _sigmoid,
    )
    from nlp_series_relation_extraction_spark.core.tokenization import (
        normalize_text,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import synth_pandas

    pdf = synth_pandas(8, seed=11)
    enc_h = HashEncoder(42)
    pe = PlantedEncoder()
    eps = 1e-7

    def loss_and_grad(ws, wp):
        gs = np.zeros_like(ws)
        gp = np.zeros_like(wp)
        total = 0.0
        n = 0
        for text, gj in zip(pdf["text"], pdf["gold_json"]):
            text = normalize_text(text)
            sub_y, enc = pe.mpn_planted(text, json.loads(gj), max_len=512)
            L = len(enc["tokens"])
            in_subj = sorted(s for s in enc["spoes"] if s[1] <= L - 1)
            if not in_subj:
                continue
            chosen = in_subj[0]
            po_y = pe.mpn_po_probs(enc, [chosen])[0].reshape(L, -1)
            C = enc_h.encode(enc["tokens"]).astype(np.float64)
            p_sub = _sigmoid(2.0 * (C @ ws) + enc_h.b_sub)
            Cc = enc_h.cond_encode(
                C.astype(np.float32), chosen
            ).astype(np.float64)
            p_po = _sigmoid(2.0 * (Cc @ wp) + enc_h.b_po)
            total += float(
                -(sub_y * np.log(p_sub + eps)
                  + (1 - sub_y) * np.log(1 - p_sub + eps)).mean(axis=1).sum()
            )
            total += float(
                -(po_y * np.log(p_po + eps)
                  + (1 - po_y) * np.log(1 - p_po + eps))
                .reshape(L, -1, 2).mean(axis=2).sum()
            )
            gs += C.T @ (p_sub - sub_y)
            gp += Cc.T @ (p_po - po_y)
            n += L
        n = max(n, 1)
        return total / n, gs / n, gp / n

    Ws = np.array(enc_h.w_sub, dtype=np.float64)
    Wp = np.array(enc_h.w_po, dtype=np.float64)
    _, gs, gp = loss_and_grad(Ws, Wp)
    rng = np.random.default_rng(0)
    Ds = rng.standard_normal(Ws.shape)
    Ds /= np.linalg.norm(Ds)
    Dp = rng.standard_normal(Wp.shape)
    Dp /= np.linalg.norm(Dp)
    h = 1e-4
    for W0, D, g, other in ((Ws, Ds, gs, "sub"), (Wp, Dp, gp, "po")):
        if other == "sub":
            lp = loss_and_grad(Ws + h * D, Wp)[0]
            lm = loss_and_grad(Ws - h * D, Wp)[0]
        else:
            lp = loss_and_grad(Ws, Wp + h * D)[0]
            lm = loss_and_grad(Ws, Wp - h * D)[0]
        numeric = (lp - lm) / (2 * h)
        analytic = float((g * D).sum())
        assert np.isclose(numeric, analytic, rtol=1e-3, atol=1e-8), (
            other, numeric, analytic,
        )


def test_mpn_loss_approaches_zero_on_tiny_corpus(spark):
    """Output layers can drive the planted-label joint BCE toward zero on a
    small corpus — the optimizability sanity the reference gets from its
    best-F1 epoch selection."""
    t = synth_transcripts(spark, 4, seed=3, partitions=1)
    res = train_mpn_head(t, epochs=60, lr=2.0)
    h = res["loss_history"]
    assert h[-1] < 0.15 * h[0], f"loss did not approach zero: {h[0]} -> {h[-1]}"


def test_mhs_sgd_reduces_weighted_loss(spark):
    t = synth_transcripts(spark, 160, seed=42, partitions=4)
    res = train_mhs_head(t, epochs=3, lr=0.2)
    h = res["loss_history"]
    assert len(h) == 3 and all(b < a for a, b in zip(h, h[1:]))
    assert res["weights"]["w_start"].shape == (64, 27)
    assert res["weights"]["w_end"].shape == (64, 27)
    assert res["weights"]["w_rel"].shape == (32, 55)
    assert res["sub_loss_history"][-1] < res["sub_loss_history"][0]
    assert res["rel_loss_history"][-1] < res["rel_loss_history"][0]
    # deterministic across runs
    res2 = train_mhs_head(t, epochs=3, lr=0.2)
    assert res2["loss_history"] == h


def test_biaffine_sgd_reduces_weighted_loss(spark):
    t = synth_transcripts(spark, 120, seed=42, partitions=4)
    res = train_mhs_head(t, epochs=3, lr=0.2, biaffine=True)
    h = res["loss_history"]
    assert len(h) == 3 and all(b < a for a, b in zip(h, h[1:]))
    assert res["weights"]["w_bi1"].shape == (32, 55, 32)
    assert res["weights"]["w_bi2"].shape == (65, 55)
    assert all(np.isfinite(v).all() for v in res["weights"].values())


def test_mhs_gradient_matches_finite_difference():
    """Directional-derivative check for the mhs pair-scorer gradient and
    the biaffine w_bi1 gradient (pure numpy, replicating the epoch UDF)."""
    import json

    from nlp_series_relation_extraction_spark.core.encoders import (
        HashEncoder,
        PlantedEncoder,
        _sigmoid,
    )
    from nlp_series_relation_extraction_spark.core.tokenization import (
        normalize_text,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import synth_pandas

    pdf = synth_pandas(6, seed=5)
    enc_h = HashEncoder(42)
    pe = PlantedEncoder()
    eps = 1e-7

    def loss_and_grads(w_rel, w_bi1, biaffine):
        g = np.zeros_like(w_bi1 if biaffine else w_rel)
        total = 0.0
        n = 0
        for text, gj in zip(pdf["text"], pdf["gold_json"]):
            text = normalize_text(text)
            ys, ye, yc, enc = pe.mhs_planted(text, json.loads(gj), max_len=512)
            L = len(enc["tokens"])
            C = enc_h.encode(enc["tokens"]).astype(np.float64)
            f1, f2 = enc_h.head_tail_features(C.astype(np.float32))
            f1 = f1.astype(np.float64)
            f2 = f2.astype(np.float64)
            if biaffine:
                z1 = np.einsum(
                    "xoj,yj->xyo", np.einsum("xi,ioj->xoj", f1, w_bi1), f2
                )
                pair = np.concatenate(
                    [
                        np.broadcast_to(f1[:, None, :], (L, L, 32)),
                        np.broadcast_to(f2[None, :, :], (L, L, 32)),
                        np.ones((L, L, 1)),
                    ],
                    axis=-1,
                )
                pc = _sigmoid(
                    z1 + pair @ np.asarray(enc_h.w_bi2, np.float64) + enc_h.b_bi
                )
                d = pc - yc
                tmp = np.einsum("xi,xyo->iyo", f1, d)
                g += np.einsum("iyo,yj->ioj", tmp, f2)
            else:
                inter = np.maximum(f1[:, None, :] + f2[None, :, :], 0.0)
                pc = _sigmoid(2.0 * (inter @ w_rel) + enc_h.b_rel)
                d = pc - yc
                g += 2.0 * (
                    inter.reshape(L * L, -1).T @ d.reshape(L * L, -1)
                )
            total += float(
                -(yc * np.log(pc + eps) + (1 - yc) * np.log(1 - pc + eps)).sum()
            )
            n += L
        n = max(n, 1)
        return total / n, g / n

    rng = np.random.default_rng(1)
    Wr = np.asarray(enc_h.w_rel, np.float64)
    W1 = np.asarray(enc_h.w_bi1, np.float64)
    h = 1e-4
    for biaffine in (False, True):
        W0 = W1 if biaffine else Wr
        D = rng.standard_normal(W0.shape)
        D /= np.linalg.norm(D)
        _, g = loss_and_grads(Wr, W1, biaffine)
        if biaffine:
            lp = loss_and_grads(Wr, W1 + h * D, True)[0]
            lm = loss_and_grads(Wr, W1 - h * D, True)[0]
        else:
            lp = loss_and_grads(Wr + h * D, W1, False)[0]
            lm = loss_and_grads(Wr - h * D, W1, False)[0]
        numeric = (lp - lm) / (2 * h)
        analytic = float((g * D).sum())
        assert np.isclose(numeric, analytic, rtol=1e-3, atol=1e-8), (
            biaffine, numeric, analytic,
        )


def test_trained_weights_feed_distributed_extraction(spark, tmp_path):
    """The train -> save_encoder -> weights_path loop: distributed
    extraction with a trained checkpoint must (a) differ from seed-weight
    extraction and (b) exactly equal the per-row oracle loading the same
    checkpoint — the reference's train/torch.save/eval lifecycle."""
    from nlp_series_relation_extraction_spark.core.encoders import (
        encoder_with_weights,
        save_encoder,
    )
    from nlp_series_relation_extraction_spark.core.heads import extract_row
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_triples,
    )

    t = synth_transcripts(spark, 60, seed=42, partitions=3).localCheckpoint(
        eager=True
    )
    res = train_bio_head(t, epochs=5, lr=3.0)  # aggressive: move weights far
    path = str(tmp_path / "bio_trained.npz")
    save_encoder(encoder_with_weights(42, w_bio=res["weights"]), path)

    def rows(df):
        return sorted(
            (r.conv_id, r.turn_idx, r.predicate, r.subject)
            for r in df.select(
                "conv_id", "turn_idx", "predicate", "subject"
            ).collect()
        )

    with_w = rows(extract_triples(t, head="bio", weights_path=path))
    base = rows(extract_triples(t, head="bio"))
    assert with_w != base, "trained checkpoint did not change extraction"
    oracle = []
    for r in t.select("conv_id", "turn_idx", "text").collect():
        for s in extract_row("bio", r.text, weights_path=path)["spo_list"]:
            oracle.append((r.conv_id, r.turn_idx, s["predicate"], s["subject"]))
    assert with_w == sorted(oracle)


def test_warmup_linear_reference_schedule():
    from nlp_series_relation_extraction_spark.operators.train import (
        warmup_linear,
    )

    # ramp 0 -> 1 over the warmup fraction
    assert warmup_linear(0.0, 0.1) == 0.0
    assert warmup_linear(0.05, 0.1) == 0.5
    # linear decay 1 -> 0 afterwards: max((p-1)/(w-1), 0)
    assert abs(warmup_linear(0.1, 0.1) - 1.0) < 1e-12
    assert abs(warmup_linear(0.55, 0.1) - 0.5) < 1e-12
    assert warmup_linear(1.0, 0.1) == 0.0


def test_bert_adam_optimizer_converges_and_is_deterministic(spark):
    """The reference's BertAdam (no bias correction, decoupled weight
    decay, per-tensor clipping, warmup_linear) as the driver-side update:
    loss decreases and runs are bit-reproducible."""
    t = synth_transcripts(spark, 160, seed=42, partitions=4)
    res = train_bio_head(t, epochs=4, lr=0.05, optimizer="bert_adam")
    h = res["loss_history"]
    assert h[-1] < h[0]
    res2 = train_bio_head(t, epochs=4, lr=0.05, optimizer="bert_adam")
    assert res2["loss_history"] == h
    resm = train_mpn_head(t, epochs=4, lr=0.05, optimizer="bert_adam")
    assert resm["loss_history"][-1] < resm["loss_history"][0]


def test_bert_adam_update_math():
    import numpy as np

    from nlp_series_relation_extraction_spark.operators.train import (
        BertAdamState,
    )

    opt = BertAdamState(lr=0.1, t_total=2, warmup=0.1, weight_decay=0.01,
                        max_grad_norm=-1)
    p = np.array([1.0, -2.0])
    g = np.array([0.5, 0.5])
    out = opt.update({"w": p}, {"w": g})["w"]
    # step 1 of 2 -> progress 0.5 -> decay branch lr factor 5/9
    lr_t = 0.1 * max((0.5 - 1.0) / (0.1 - 1.0), 0.0)
    m = 0.1 * g          # (1-b1)*g
    v = 0.001 * g * g    # (1-b2)*g^2
    want = p - lr_t * (m / (np.sqrt(v) + 1e-6) + 0.01 * p)
    assert np.allclose(out, want, rtol=0, atol=1e-12)
    # per-tensor clipping rescales to max_grad_norm
    opt2 = BertAdamState(lr=0.1, t_total=2, warmup=0.1, max_grad_norm=0.1,
                         weight_decay=0.0)
    big = np.array([3.0, 4.0])  # norm 5 -> scaled to 0.1
    out2 = opt2.update({"w": np.zeros(2)}, {"w": big})["w"]
    g2 = big * (0.1 / 5.0)
    m2 = 0.1 * g2
    v2 = 0.001 * g2 * g2
    want2 = -lr_t * (m2 / (np.sqrt(v2) + 1e-6))
    assert np.allclose(out2, want2, rtol=0, atol=1e-12)


def test_running_mean_20_reference_quirk():
    # run_mpn.py:60-64 divides by 20 even before 20 values exist
    assert running_mean_20([1.0]) == [1.0 / 20]
    xs = [float(i) for i in range(30)]
    out = running_mean_20(xs)
    assert out[29] == sum(xs[10:30]) / 20
    assert out[5] == sum(xs[:6]) / 20


def test_long_text_truncation_bounds_work():
    from nlp_series_relation_extraction_spark.core.heads import HEADS, extract_row

    long_text = "《甲乙丙》是丁写的小说" + "很长的内容" * 300  # ~1500 chars
    for head in HEADS:
        res = extract_row(head, long_text, max_len=120)
        assert isinstance(res["spo_list"], list)  # bounded, no crash


def test_bert_adam_every_epoch_gets_nonzero_lr():
    """ADVICE r2: with t_total=epochs the final epoch ran at
    lr=warmup_linear(1.0)=0 — a full epoch of distributed gradients
    discarded. Trainers pass t_total=epochs+1 so progress runs
    1/(E+1)..E/(E+1): strictly positive lr at EVERY epoch, and the warmup
    ramp is actually exercised when E is large enough."""
    import numpy as np

    from nlp_series_relation_extraction_spark.operators.train import (
        BertAdamState,
    )

    for epochs in (1, 2, 3, 20):
        opt = BertAdamState(lr=0.1, t_total=epochs + 1, warmup=0.1)
        lrs = []
        for _ in range(epochs):
            lrs.append(opt.lr_scheduled())
            opt.update({"w": np.zeros(2)}, {"w": np.ones(2)})
        assert all(lr > 0 for lr in lrs), (epochs, lrs)
    # warmup ramp exercised at 20 epochs: first two steps are on the ramp
    # (1/21 and 2/21 < 0.1) and increasing
    opt = BertAdamState(lr=0.1, t_total=21, warmup=0.1)
    l1 = opt.lr_scheduled()
    opt.update({"w": np.zeros(2)}, {"w": np.ones(2)})
    l2 = opt.lr_scheduled()
    assert 0 < l1 < l2


def test_trainers_final_epoch_moves_weights():
    """End-to-end pin of the same ADVICE finding: the LAST epoch's update
    must change the weights under optimizer='bert_adam'."""
    import numpy as np

    from nlp_series_relation_extraction_spark.operators.train import (
        BertAdamState,
    )

    epochs = 3
    opt = BertAdamState(lr=0.1, t_total=epochs + 1, warmup=0.1)
    w = np.zeros(4)
    for _ in range(epochs):
        prev = w.copy()
        w = opt.update({"w": w}, {"w": np.ones(4)})["w"]
    assert not np.allclose(w, prev)  # final epoch applied a real update


def test_early_stop_halts_after_patience(spark):
    """Reference lifecycle parity (run_mpn.py:183-204, --early_stop):
    training stops after N consecutive non-improving epochs; the kept
    weights stay the best epoch's. A divergent lr makes loss rise
    immediately, so history is cut at 1 + patience epochs."""
    from nlp_series_relation_extraction_spark.operators.train import (
        train_bio_head,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        synth_transcripts,
    )

    data = synth_transcripts(spark, 40, seed=3)
    div = train_bio_head(data, epochs=10, lr=500.0, early_stop=2)
    assert len(div["loss_history"]) < 10  # stopped early
    assert div["best_loss"] == min(div["loss_history"])
    # patience resets on improvement: a converging run uses all epochs
    conv = train_bio_head(data, epochs=4, lr=0.05, early_stop=2)
    assert len(conv["loss_history"]) == 4
