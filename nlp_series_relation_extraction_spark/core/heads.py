"""Per-sentence extraction for the four heads: text -> (entities, spo_list).

Pure functions (numpy + the core decode modules) with no Spark dependency.
They are the single source of truth for head semantics: the Spark
``mapInPandas`` stage in ``operators/extract.py`` maps them over Arrow
batches, and the pytest oracle maps them over plain pandas rows — so any
distribution-layer bug (partitioning, Arrow conversion, ordering, explode)
shows up as a diff against an otherwise-identical computation.

Head lifecycles mirror the reference run scripts:
* bio      — run_baseline.py eval path: encode -> sigmoid -> threshold ->
             find_entity -> cross product -> n-ary affiliation.
* mpn      — run_mpn.py eval path: subject pointers -> per-subject fan-out ->
             conditional object pointers -> convert_spo_contour ->
             convert2ressult.
* mhs      — run_mhs.py eval path: typed spans -> [L,L,R] selection cube ->
             convert_spo_contour2 -> convert2ressult.
* biaffine — run_mhs_biaffine.py: same decode as mhs, biaffine-scored cube.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from .decode_bio import decode_bio_sentence
from .decode_span import (
    decode_pair_cube,
    decode_po_for_subject,
    decode_span_sentence,
    decode_subject_spans,
    decode_typed_spans,
)
from .encoders import HashEncoder, PlantedEncoder
from .tokenization import (
    normalize_text,
    tokenize_for_bio,
    tokenize_framed,
    truncate_framed,
)

HEADS = ("bio", "mpn", "mhs", "biaffine")
# the reference's --max_len default (utils/finetuning_argparse.py:9)
DEFAULT_MAX_LEN = 512

_hash_encoder_cache: dict[tuple[int, str | None], HashEncoder] = {}
_planted_encoder = PlantedEncoder()


def get_hash_encoder(seed: int = 42, weights_path: str | None = None) -> HashEncoder:
    """Per-process lazy singleton, like the reference's per-worker model.

    ``weights_path`` loads a trained checkpoint (npz from
    ``core.encoders.save_encoder`` — the torch.load analogue of reference
    run_baseline.py:215-222) instead of deriving weights from the seed; the
    path must be worker-visible (local FS here; ``SparkFiles.get`` after
    ``spark-submit --files`` on a cluster)."""
    key = (seed, weights_path)
    enc = _hash_encoder_cache.get(key)
    if enc is None:
        if weights_path:
            from .encoders import load_encoder

            enc = load_encoder(weights_path)
        else:
            enc = HashEncoder(seed)
        _hash_encoder_cache[key] = enc
    return enc


# frame-preserving truncation (single definition in core.tokenization)
_truncate = truncate_framed


def extract_bio_row(
    text: str,
    planted_gold: list[dict] | None = None,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    weights_path: str | None = None,
) -> dict[str, Any]:
    text = normalize_text(text)
    if planted_gold is not None:
        # one tokenization pass: the label encoder already produced the
        # offset mapping alongside the labels
        from .labeling import bio_token_labels

        enc = bio_token_labels(text, planted_gold, max_len=max_len)
        probs = np.asarray(enc["labels"], dtype=np.float32)
        offsets = enc["offset_mapping"]
    else:
        tokens, offsets = tokenize_for_bio(text)
        tokens = _truncate(tokens, max_len)
        offsets = offsets[: len(tokens)]
        probs = get_hash_encoder(seed, weights_path).bio_probs(tokens)
    return decode_bio_sentence(text, probs, offsets)


def extract_mpn_row(
    text: str,
    planted_gold: list[dict] | None = None,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    weights_path: str | None = None,
) -> dict[str, Any]:
    text = normalize_text(text)
    if planted_gold is not None:
        sub_probs, enc = _planted_encoder.mpn_planted(
            text, planted_gold, max_len=max_len
        )
        tokens = enc["tokens"]
        tok_start, tok_end = enc["tok_to_orig_start"], enc["tok_to_orig_end"]
        subjects = decode_subject_spans(sub_probs, len(tokens))
        po = _planted_encoder.mpn_po_probs(enc, subjects)
    else:
        tokens, tok_start, tok_end = tokenize_framed(text)
        tokens = _truncate(tokens, max_len)
        encoder = get_hash_encoder(seed, weights_path)
        sub_probs = encoder.subject_probs(tokens)
        subjects = decode_subject_spans(sub_probs, len(tokens))
        po = (
            encoder.po_probs(tokens, subjects)
            if subjects
            else np.zeros((0, len(tokens), 1, 2), dtype=np.float32)
        )
    spoes: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
    for k, s in enumerate(subjects):
        spoes.setdefault(s, []).extend(decode_po_for_subject(po[k], len(tokens)))
    return decode_span_sentence(text, spoes, tok_start, tok_end, subjects)


def extract_mhs_row(
    text: str,
    planted_gold: list[dict] | None = None,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    biaffine: bool = False,
    weights_path: str | None = None,
) -> dict[str, Any]:
    text = normalize_text(text)
    if planted_gold is not None:
        start, end, cube, enc = _planted_encoder.mhs_planted(
            text, planted_gold, max_len=max_len
        )
        tokens = enc["tokens"]
        tok_start, tok_end = enc["tok_to_orig_start"], enc["tok_to_orig_end"]
        spans, end_list, _ = decode_typed_spans(start, end, n_tokens=len(tokens))
        spoes = decode_pair_cube(cube, end_list, spans)
    else:
        tokens, tok_start, tok_end = tokenize_framed(text)
        tokens = _truncate(tokens, max_len)
        encoder = get_hash_encoder(seed, weights_path)
        start, end = encoder.typed_span_probs(tokens)
        # spans first, then score ONLY the span-end pair restriction of the
        # cube: decode never reads anything else, and the full [L,L,R] cube
        # is the dominant cost of this head (O(L^2 R) vs O(E^2 R), E ~ a
        # handful of span ends)
        spans, end_list, _ = decode_typed_spans(start, end, n_tokens=len(tokens))
        ends = sorted(set(end_list))
        sub = encoder.pair_cube_at(tokens, ends, biaffine=biaffine)
        spoes = decode_pair_cube(sub, end_list, spans, is_subcube=True)
    return decode_span_sentence(text, spoes, tok_start, tok_end, spans)


# Memory bound for the padded batched trunk forward: the dominant tensor
# under the attention trunk is the per-layer score tensor [B, n_heads, Lm,
# Lm] — B*Lm^2 "attention cells" times n_heads*4 bytes. 2^23 cells with 4
# heads is ~134 MB per chunk, independent of the Arrow batch size (4096
# rows at Lm=512 unchunked would be ~17 GB). The reference hits the same
# wall and answers with batch sizes 15-25 for the [L,L,55] heads
# (run_mhs_biaffine.py); here the cube is end-restricted so attention is
# what needs bounding. Chunks follow the length-sorted row order
# (sortWithinPartitions in operators/extract.py), so dynamic padding
# within a chunk stays dense.
ATTN_CELL_BUDGET = 1 << 23


def _encode_rows_chunked(
    encoder, toks_list: list[list[str]], cell_budget: int | None = None
) -> list[np.ndarray]:
    """One padded batched trunk forward per memory-bounded chunk; returns
    the valid [L_i, H] context slice per row. Valid positions equal the
    per-row forward (exactly for HashEncoder; to f32 rounding for
    AttnEncoder — pinned in tests). The budget is read at CALL time so
    tests can shrink it to force chunk boundaries."""
    if cell_budget is None:
        cell_budget = ATTN_CELL_BUDGET
    out: list[np.ndarray | None] = [None] * len(toks_list)
    i, n = 0, len(toks_list)
    while i < n:
        j = i + 1
        mx = max(len(toks_list[i]), 1)
        while j < n:
            m2 = max(mx, len(toks_list[j]))
            if (j - i + 1) * m2 * m2 > cell_budget:
                break
            mx = m2
            j += 1
        C, lens = encoder.encode_batch(toks_list[i:j])
        for k in range(i, j):
            out[k] = C[k - i, : lens[k - i]].copy()
        i = j
    return out  # type: ignore[return-value]


def extract_rows_batch(
    head: str,
    texts: list[str],
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    weights_path: str | None = None,
) -> list[dict[str, Any]]:
    """Batched extraction for ANY head: ONE padded trunk forward per
    memory-bounded chunk (the reference's collate+batched-forward shape,
    dataset_baseline.py:180-184) feeds the per-row head projections and
    threshold decode via the from-context twins. This is how the span
    heads (mpn/mhs/biaffine — the reference's best, model_mhs_biaffine.py:
    94-143) run under a realistic-cost encoder: trunk cost is batched,
    the [.,.,R] scoring stays end-restricted per row. Used by BOTH the
    Spark UDF and the pytest oracle."""
    encoder = get_hash_encoder(seed, weights_path)
    normed = [normalize_text(t) for t in texts]
    if head == "bio":
        toks_offs = [tokenize_for_bio(t) for t in normed]
        toks = [_truncate(t, max_len) for t, _ in toks_offs]
        ctxs = _encode_rows_chunked(encoder, toks)
        out = []
        for i, text in enumerate(normed):
            L = len(toks[i])
            probs = encoder.bio_probs_from(ctxs[i])
            out.append(decode_bio_sentence(text, probs, toks_offs[i][1][:L]))
        return out
    framed = [tokenize_framed(t) for t in normed]
    toks = [_truncate(t, max_len) for t, _, _ in framed]
    ctxs = _encode_rows_chunked(encoder, toks)
    out = []
    for i, text in enumerate(normed):
        Ci = ctxs[i]
        L = Ci.shape[0]
        tok_start, tok_end = framed[i][1], framed[i][2]
        if head == "mpn":
            sub_probs = encoder.subject_probs_from(Ci)
            subjects = decode_subject_spans(sub_probs, L)
            po = (
                encoder.po_probs_from(Ci, subjects)
                if subjects
                else np.zeros((0, L, 1, 2), dtype=np.float32)
            )
            spoes: dict[tuple[int, int], list[tuple[int, int, int]]] = {}
            for k, s in enumerate(subjects):
                spoes.setdefault(s, []).extend(decode_po_for_subject(po[k], L))
            out.append(
                decode_span_sentence(text, spoes, tok_start, tok_end, subjects)
            )
        elif head in ("mhs", "biaffine"):
            start, end = encoder.typed_span_probs_from(Ci)
            spans, end_list, _ = decode_typed_spans(start, end, n_tokens=L)
            ends = sorted(set(end_list))
            sub = encoder.pair_cube_at_from(
                Ci[list(ends)], biaffine=(head == "biaffine")
            )
            spoes2 = decode_pair_cube(sub, end_list, spans, is_subcube=True)
            out.append(
                decode_span_sentence(text, spoes2, tok_start, tok_end, spans)
            )
        else:
            raise ValueError(f"unknown head: {head!r}")
    return out


def extract_bio_rows_batch(
    texts: list[str],
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    weights_path: str | None = None,
) -> list[dict[str, Any]]:
    """Batched hash-mode BIO extraction (see extract_rows_batch)."""
    return extract_rows_batch(
        "bio", texts, seed=seed, max_len=max_len, weights_path=weights_path
    )


def extract_row(
    head: str,
    text: str,
    gold_json: str | None = None,
    seed: int = 42,
    max_len: int = DEFAULT_MAX_LEN,
    weights_path: str | None = None,
) -> dict[str, Any]:
    """Dispatch one turn through a head. ``gold_json`` (JSON-encoded
    spo_list) switches on planted mode; ``weights_path`` runs the hash
    branch with a trained checkpoint instead of seed-derived weights."""
    planted = json.loads(gold_json) if gold_json else None
    if head == "bio":
        return extract_bio_row(text, planted, seed, max_len, weights_path)
    if head == "mpn":
        return extract_mpn_row(text, planted, seed, max_len, weights_path)
    if head == "mhs":
        return extract_mhs_row(text, planted, seed, max_len, weights_path=weights_path)
    if head == "biaffine":
        return extract_mhs_row(
            text, planted, seed, max_len, biaffine=True, weights_path=weights_path
        )
    raise ValueError(f"unknown head: {head!r}")
