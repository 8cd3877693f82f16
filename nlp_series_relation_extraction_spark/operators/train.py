"""Distributed training of the BIO head's output layer (data-parallel).

The reference trains its heads with masked BCE over per-token multi-hot
labels (``run_baseline.py:26-37``), epochs with best-model selection
(``run_baseline.py:200-222``). This module re-expresses that lifecycle
Spark-first for the BIO head's linear output layer over the frozen
deterministic context encoder:

* labels come from the same planting semantics as the fixtures
  (``core.labeling.bio_token_labels``);
* each epoch is ONE Spark job: an Arrow-batched ``mapInPandas`` computes
  per-partition gradient sums + masked-BCE loss sums (map-side combine),
  the driver averages, applies the update, and re-broadcasts weights via
  the next job's closure — classic synchronous data-parallel SGD;
* best-epoch weights are kept (the reference's best-F1 selection, on loss).

This is deliberately the *output layer only*: the encoder stands in for a
frozen pretrained BERT (the reference's two-LR param groups put ~10x the
learning rate on non-BERT layers for the same reason, run_baseline.py:43-63).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..config import BIO_NUM_LABELS
from ..core.encoders import HashEncoder, _sigmoid
from ..core.heads import get_hash_encoder
from ..core.labeling import bio_token_labels
from ..core.tokenization import normalize_text

_GRAD_SCHEMA = "grad binary, loss double, n_tokens long"


def _epoch_udf(weights: np.ndarray, bias: float, seed: int):
    """Per-partition gradient/loss sums for the masked-BCE objective."""

    def run(batches):
        encoder = get_hash_encoder(seed)
        H, O = weights.shape
        gsum = np.zeros((H, O), dtype=np.float64)
        loss_sum = 0.0
        n_tokens = 0
        for pdf in batches:
            for text, gold_json in zip(pdf["text"], pdf["gold_json"]):
                import json

                text = normalize_text(text)
                enc = bio_token_labels(text, json.loads(gold_json))
                y = np.asarray(enc["labels"], dtype=np.float32)
                C = encoder.encode(enc["tokens"])  # frozen features [L, H]
                z = np.float32(2.0) * (C @ weights.astype(np.float32)) + np.float32(bias)
                p = _sigmoid(z)
                eps = 1e-7
                loss_sum += float(
                    -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum()
                )
                # d/dW of BCE(sigmoid(2 CW + b)) = 2 C^T (p - y)
                gsum += 2.0 * (C.T @ (p - y)).astype(np.float64)
                n_tokens += y.shape[0]
        yield pd.DataFrame(
            {
                "grad": [gsum.astype(np.float32).tobytes()],
                "loss": [loss_sum],
                "n_tokens": [n_tokens],
            }
        )

    return run


def train_bio_head(
    transcripts: DataFrame,
    epochs: int = 5,
    lr: float = 0.05,
    seed: int = 42,
    num_partitions: int | None = None,
) -> dict:
    """Synchronous data-parallel SGD on the BIO output layer.

    ``transcripts`` must carry (text, gold_json). Returns dict with the
    best weights, bias, and the per-epoch loss history (monotone decrease
    is asserted in tests as the convergence check).
    """
    base = HashEncoder(seed)
    H = base.w_bio.shape[0]
    W = np.array(base.w_bio, dtype=np.float64)
    b = float(base.b_bio)

    df = transcripts.select("text", "gold_json")
    if num_partitions:
        df = df.repartition(num_partitions)
    # every epoch is a fresh action over the same rows: materialize once
    df = df.localCheckpoint(eager=True)

    history: list[float] = []
    best = (np.inf, W.copy())
    for _ in range(epochs):
        parts = df.mapInPandas(
            _epoch_udf(W, b, seed), schema=_GRAD_SCHEMA
        ).collect()
        gsum = np.zeros((H, BIO_NUM_LABELS), dtype=np.float64)
        loss = 0.0
        n = 0
        for r in parts:
            gsum += np.frombuffer(r.grad, dtype=np.float32).reshape(
                H, BIO_NUM_LABELS
            )
            loss += r.loss
            n += r.n_tokens
        mean_loss = loss / max(n, 1)
        history.append(mean_loss)
        if mean_loss < best[0]:
            best = (mean_loss, W.copy())
        W = W - lr * (gsum / max(n, 1))
    return {
        "weights": best[1].astype(np.float32),
        "bias": b,
        "loss_history": history,
        "best_loss": best[0],
    }
