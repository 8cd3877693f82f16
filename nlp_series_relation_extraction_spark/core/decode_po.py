"""Batch helpers for the two-stage mpn path (pyspark-free, worker-side).

Kept out of ``core.heads`` so the Spark module stays a thin shell: these run
inside mapInPandas workers and only need numpy/pandas.
"""

from __future__ import annotations

import pandas as pd

from .decode_span import decode_po_for_subject, decode_subject_spans
from .heads import _truncate, get_hash_encoder
from .tokenization import tokenize_framed


def decode_subjects_rows(pdf: pd.DataFrame, seed: int, max_len: int) -> pd.DataFrame:
    """Stage-1 batch: per turn, decode subject spans from pointer probs."""
    out = {
        "conv_id": pdf["conv_id"],
        "turn_idx": pdf["turn_idx"],
        "text": pdf["text"],
        "subjects": [],
    }
    encoder = get_hash_encoder(seed)
    for text in pdf["text"]:
        if text is None or isinstance(text, float):  # null/NaN turn text
            out["subjects"].append([])
            continue
        tokens = _truncate(tokenize_framed(text)[0], max_len)
        spans = decode_subject_spans(encoder.subject_probs(tokens), len(tokens))
        out["subjects"].append([(int(a), int(b)) for a, b in spans])
    return pd.DataFrame(out)


def decode_po_rows(pdf: pd.DataFrame, seed: int, max_len: int) -> pd.DataFrame:
    """Stage-2 batch: per (turn, subject) row, conditional object decode."""
    out = {
        "conv_id": pdf["conv_id"],
        "turn_idx": pdf["turn_idx"],
        "s0": pdf["s0"],
        "s1": pdf["s1"],
        "po": [],
    }
    encoder = get_hash_encoder(seed)
    for text, s0, s1 in zip(pdf["text"], pdf["s0"], pdf["s1"]):
        if text is None or isinstance(text, float):
            out["po"].append([])
            continue
        tokens = _truncate(tokenize_framed(text)[0], max_len)
        po = encoder.po_probs(tokens, [(int(s0), int(s1))])[0]
        out["po"].append(
            [
                (int(o0), int(o1), int(p))
                for o0, o1, p in decode_po_for_subject(po, len(tokens))
            ]
        )
    return pd.DataFrame(out)
