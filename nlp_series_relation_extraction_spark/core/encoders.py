"""Pluggable deterministic encoders standing in for the reference's BERT.

The reference's four heads are BERT + small dense layers with *trained*
weights. Shipping a checkpoint is impossible here (no torch/transformers in
the runtime) and unnecessary: every stage AROUND the encoder — tokenization,
offset maps, thresholds, span pairing, n-ary merge, dedup, eval — is where
triple-level parity lives. Two encoders share one interface:

* ``PlantedEncoder`` — turns gold labels (via ``core.labeling``) into 0/1
  "probabilities", so thresholds/pairing decode them back; end-to-end tests
  then assert P/R == 1.0 against gold and exact equality against the
  plain-Python oracle.
* ``HashEncoder`` — a seeded, pure-numpy forward pass with the same tensor
  shapes as the reference models ([L,112] BIO logits; [L,2]+[L,55,2] mpn;
  [L,27]+[L,L,55] mhs; biaffine einsum), used for throughput benchmarking
  with realistic firing sparsity. Fully deterministic given (seed, tokens).

Both are instantiated lazily once per executor process (module-level
singleton), mirroring the reference's per-process model load.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np

from ..config import BIO_NUM_LABELS, E_NUM, R_NUM
from .labeling import bio_token_labels, span_gold_spoes
from .tokenization import truncate_framed

_HIDDEN = 64


def _token_vec(token: str, dim: int = _HIDDEN) -> np.ndarray:
    """Deterministic embedding: first 8 md5 bytes seed a PCG64 draw."""
    h = hashlib.md5(token.encode("utf-8")).digest()
    rng = np.random.default_rng(int.from_bytes(h[:8], "little"))
    return rng.standard_normal(dim).astype(np.float32)


class _EmbeddingCache:
    def __init__(self, dim: int = _HIDDEN, max_size: int = 200_000):
        self._cache: dict[str, np.ndarray] = {}
        self._dim = dim
        self._max = max_size

    def get(self, token: str) -> np.ndarray:
        v = self._cache.get(token)
        if v is None:
            v = _token_vec(token, self._dim)
            if len(self._cache) < self._max:
                self._cache[token] = v
        return v


_F32_ONE = np.float32(1.0)
_F32_HALF = np.float32(0.5)


def _sigmoid(x: np.ndarray) -> np.ndarray:
    # sigmoid via tanh: np.exp has no SIMD path on this host (measured
    # ~55x slower than np.tanh per element); also keep float32 throughout
    # (python-float constants would upcast to f64)
    return _F32_HALF * (np.tanh(_F32_HALF * x) + _F32_ONE)


class HashEncoder:
    """Deterministic numpy forward pass with reference-shaped outputs.

    Firing sparsity is tuned via per-head logit biases so decoded triples per
    sentence land in a realistic range (a handful, not thousands) — decode
    cost then matches real workloads instead of degenerate cross products.
    """

    def __init__(self, seed: int = 42):
        rng = np.random.default_rng(seed)
        H = _HIDDEN

        def w(*shape):
            return (rng.standard_normal(shape) / np.sqrt(shape[0])).astype(
                np.float32
            )

        self.emb = _EmbeddingCache(H)
        # context mixer (cheap 1-layer "attention-ish" smoothing)
        self.w_mix = w(H, H)
        # heads
        self.w_bio = w(H, BIO_NUM_LABELS)
        self.w_sub = w(H, 2)
        self.w_beta = w(2 * H, H)
        self.w_gamma = w(2 * H, H)
        self.w_po = w(H, R_NUM * 2)
        self.w_start = w(H, E_NUM + 1)
        self.w_end = w(H, E_NUM + 1)
        self.w_head = w(H, 32)
        self.w_tail = w(H, 32)
        self.w_rel = w(32, R_NUM)
        # biaffine scorer
        self.w_bi1 = (rng.standard_normal((32, R_NUM, 32)) / 32).astype(np.float32)
        self.w_bi2 = w(2 * 32 + 1, R_NUM)
        self._calibrate()

    def _calibrate(self) -> None:
        """Set per-head logit biases from a fixed probe corpus so decoded
        fire rates land in a realistic range (a few spans/triples per turn)
        regardless of weight draw. Deterministic: probe tokens are fixed."""
        probe = [chr(0x4E00 + 7 * i) for i in range(360)]
        Cs = [
            self.encode(["[CLS]"] + probe[i * 30 : (i + 1) * 30] + ["[SEP]"])
            for i in range(12)
        ]
        C = np.concatenate(Cs)

        def bias(z: np.ndarray, rate: float, thr_logit: float = 0.0) -> float:
            return float(thr_logit - 2.0 * np.quantile(z, 1.0 - rate))

        self.b_bio = bias(C @ self.w_bio, 0.008)
        self.b_sub = bias(C @ self.w_sub, 0.06, 0.405)
        self.b_po = bias(C @ self.w_po, 0.0066, 0.405)
        self.b_typed = bias(
            np.concatenate([C @ self.w_start, C @ self.w_end], axis=1), 0.025
        )
        f1 = np.maximum(Cs[0] @ self.w_head, 0.0)
        f2 = np.maximum(Cs[0] @ self.w_tail, 0.0)
        inter = np.maximum(f1[:, None, :] + f2[None, :, :], 0.0)
        self.b_rel = bias(inter @ self.w_rel, 0.015)
        z1 = np.einsum("xoj,yj->xyo", np.einsum("xi,ioj->xoj", f1, self.w_bi1), f2)
        L = f1.shape[0]
        pair = np.concatenate(
            [
                np.broadcast_to(f1[:, None, :], (L, L, 32)),
                np.broadcast_to(f2[None, :, :], (L, L, 32)),
                np.ones((L, L, 1), dtype=np.float32),
            ],
            axis=-1,
        )
        self.b_bi = bias(z1 + pair @ self.w_bi2, 0.05)

    # --- shared context encoding -------------------------------------
    def encode(self, tokens: Sequence[str]) -> np.ndarray:
        """[L, H] context representation: embeddings + positional wave +
        tanh-mixed rolling context."""
        L = len(tokens)
        E = np.stack([self.emb.get(t) for t in tokens])
        pos = np.arange(L, dtype=np.float32)[:, None]
        E = E + np.float32(0.1) * np.sin(pos / np.float32(10.0))
        ctx = np.cumsum(E, axis=0) / np.arange(1, L + 1, dtype=np.float32)[:, None]
        return np.tanh(E + np.float32(0.5) * (ctx @ self.w_mix))

    def encode_batch(
        self, tokens_batch: list[Sequence[str]]
    ) -> tuple[np.ndarray, list[int]]:
        """Batched [B, Lmax, H] context encoding (zero-padded). Valid
        positions carry exactly the same values as per-row ``encode`` —
        padding sits after the valid prefix, so the positional wave and the
        prefix cumsum are unaffected. Mirrors the reference's dynamic
        batch-max-len padding (dataset_baseline.py:180-184)."""
        lens = [len(t) for t in tokens_batch]
        B, Lm = len(tokens_batch), max(lens) if lens else 0
        E = np.zeros((B, Lm, _HIDDEN), dtype=np.float32)
        for i, toks in enumerate(tokens_batch):
            if toks:
                E[i, : lens[i]] = np.stack([self.emb.get(t) for t in toks])
        pos = np.arange(Lm, dtype=np.float32)[None, :, None]
        E = E + np.float32(0.1) * np.sin(pos / np.float32(10.0))
        ctx = np.cumsum(E, axis=1) / np.arange(1, Lm + 1, dtype=np.float32)[
            None, :, None
        ]
        # one [B*Lm, H] GEMM — a 3-D @ 2-D matmul degrades to B tiny GEMMs
        mixed = (ctx.reshape(-1, _HIDDEN) @ self.w_mix).reshape(B, Lm, _HIDDEN)
        return np.tanh(E + np.float32(0.5) * mixed), lens

    # --- BIO head ------------------------------------------------------
    def bio_probs_from(self, C: np.ndarray) -> np.ndarray:
        """BIO probs from a precomputed [L, H] context (the from-context
        twins let one batched trunk forward feed every head — the
        reference's model(x)->heads split, model_baseline.py:6-24)."""
        return _sigmoid(np.float32(2.0) * (C @ self.w_bio) + np.float32(self.b_bio))

    def bio_probs(self, tokens: Sequence[str]) -> np.ndarray:
        return self.bio_probs_from(self.encode(tokens))

    def bio_probs_batch(
        self, tokens_batch: list[Sequence[str]]
    ) -> tuple[np.ndarray, list[int]]:
        """[B, Lmax, 112] batched BIO probs + valid lengths."""
        C, lens = self.encode_batch(tokens_batch)
        B, Lm, H = C.shape
        logits = (C.reshape(-1, H) @ self.w_bio).reshape(B, Lm, -1)
        return _sigmoid(np.float32(2.0) * logits + np.float32(self.b_bio)), lens

    # --- mpn head -------------------------------------------------------
    def subject_probs_from(self, C: np.ndarray) -> np.ndarray:
        return _sigmoid(np.float32(2.0) * (C @ self.w_sub) + np.float32(self.b_sub))

    def subject_probs(self, tokens: Sequence[str]) -> np.ndarray:
        return self.subject_probs_from(self.encode(tokens))

    def cond_encode(
        self, C: np.ndarray, span: tuple[int, int]
    ) -> np.ndarray:
        """[L, H] subject-conditioned encoding — the conditional-layer-norm
        analogue (reference models/model_mpn.py:85-100): gamma/beta from the
        subject span's start/end context vectors re-scale the sequence."""
        s0, s1 = span
        cond = np.concatenate([C[s0], C[s1]])
        gamma = np.tanh(cond @ self.w_gamma)
        beta = np.tanh(cond @ self.w_beta)
        return C * (_F32_ONE + np.float32(0.2) * gamma) + np.float32(0.2) * beta

    def po_probs(
        self, tokens: Sequence[str], subject_spans: list[tuple[int, int]]
    ) -> np.ndarray:
        """[S, L, R, 2] conditional object pointers, one slab per subject."""
        return self.po_probs_from(self.encode(tokens), subject_spans)

    def po_probs_from(
        self, C: np.ndarray, subject_spans: list[tuple[int, int]]
    ) -> np.ndarray:
        L = C.shape[0]
        out = np.empty((len(subject_spans), L, R_NUM, 2), dtype=np.float32)
        for k, span in enumerate(subject_spans):
            Cc = self.cond_encode(C, span)
            logits = np.float32(2.0) * (Cc @ self.w_po) + np.float32(self.b_po)
            out[k] = logits.reshape(L, R_NUM, 2)
        return _sigmoid(out)

    # --- mhs / biaffine heads -------------------------------------------
    def typed_span_probs_from(
        self, C: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        return (
            _sigmoid(np.float32(2.0) * (C @ self.w_start) + np.float32(self.b_typed)),
            _sigmoid(np.float32(2.0) * (C @ self.w_end) + np.float32(self.b_typed)),
        )

    def typed_span_probs(
        self, tokens: Sequence[str]
    ) -> tuple[np.ndarray, np.ndarray]:
        return self.typed_span_probs_from(self.encode(tokens))

    def head_tail_features(self, C: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Frozen (f1, f2) head/tail projections [L, 32] — the inner layers
        below the trainable pair scorer (reference model_mhs.py:47-49)."""
        return (
            np.maximum(C @ self.w_head, 0.0),
            np.maximum(C @ self.w_tail, 0.0),
        )

    def pair_cube(self, tokens: Sequence[str]) -> np.ndarray:
        """[L, L, R] selection scores: concat-projection MLP, vectorized."""
        f1, f2 = self.head_tail_features(self.encode(tokens))
        inter = np.maximum(f1[:, None, :] + f2[None, :, :], 0.0)  # [L, L, 32]
        return _sigmoid(np.float32(2.0) * (inter @ self.w_rel) + np.float32(self.b_rel))

    def pair_cube_at(
        self,
        tokens: Sequence[str],
        positions: Sequence[int],
        biaffine: bool = False,
    ) -> np.ndarray:
        """[E, E, R] pair scores restricted to the given token positions —
        decode only reads the cube at typed-span END pairs, so computing
        the full [L, L, R] cube is O(L^2/E^2) wasted work (L ~ 40-500,
        E ~ a handful). Entries equal the full cube's at those positions:
        the restriction is a row subset of every matmul/elementwise op."""
        return self.pair_cube_at_from(
            self.encode(tokens)[list(positions)], biaffine=biaffine
        )

    def pair_cube_at_from(
        self, C: np.ndarray, biaffine: bool = False
    ) -> np.ndarray:
        """pair_cube_at from an already position-sliced [E, H] context."""
        f1, f2 = self.head_tail_features(C)
        E = f1.shape[0]
        if not biaffine:
            inter = np.maximum(f1[:, None, :] + f2[None, :, :], 0.0)
            return _sigmoid(
                np.float32(2.0) * (inter @ self.w_rel) + np.float32(self.b_rel)
            )
        z1 = np.einsum(
            "xoj,yj->xyo", np.einsum("xi,ioj->xoj", f1, self.w_bi1), f2
        )
        pair = np.concatenate(
            [
                np.broadcast_to(f1[:, None, :], (E, E, 32)),
                np.broadcast_to(f2[None, :, :], (E, E, 32)),
                np.ones((E, E, 1), dtype=np.float32),
            ],
            axis=-1,
        )
        return _sigmoid(z1 + pair @ self.w_bi2 + np.float32(self.b_bi))

    def pair_cube_biaffine(self, tokens: Sequence[str]) -> np.ndarray:
        """[L, L, R] biaffine scores: x^T W1 y + [x;y;1] W2 (reference
        models/model_mhs_biaffine.py:10-28, einsum form)."""
        C = self.encode(tokens)
        f1, f2 = self.head_tail_features(C)
        # two-step contraction: [L,R,32] then [L,L,R] — avoids the O(L^2*R*H^2)
        # naive path of the single three-operand einsum
        logits1 = np.einsum(
            "xoj,yj->xyo", np.einsum("xi,ioj->xoj", f1, self.w_bi1), f2
        )
        L = C.shape[0]
        ones = np.ones((L, L, 1), dtype=np.float32)
        pair = np.concatenate(
            [
                np.broadcast_to(f1[:, None, :], (L, L, 32)),
                np.broadcast_to(f2[None, :, :], (L, L, 32)),
                ones,
            ],
            axis=-1,
        )
        logits2 = pair @ self.w_bi2
        return _sigmoid(logits1 + logits2 + np.float32(self.b_bi))


WEIGHT_KEYS = (
    "w_mix", "w_bio", "w_sub", "w_beta", "w_gamma", "w_po", "w_start",
    "w_end", "w_head", "w_tail", "w_rel", "w_bi1", "w_bi2",
)
BIAS_KEYS = ("b_bio", "b_sub", "b_po", "b_typed", "b_rel", "b_bi")


def save_encoder(encoder: HashEncoder, path: str) -> None:
    """Checkpoint encoder weights (the torch.save(state_dict) analogue,
    reference run_baseline.py:215-217). Ship the file to executors with
    ``spark-submit --files`` and load via SparkFiles.get + load_encoder.
    AttnEncoder checkpoints carry the transformer trunk too; load_encoder
    dispatches on the marker key."""
    if not path.endswith(".npz"):
        path += ".npz"  # np.savez appends it silently; keep load symmetric
    arrays = {k: getattr(encoder, k) for k in WEIGHT_KEYS}
    arrays.update({k: np.float64(getattr(encoder, k)) for k in BIAS_KEYS})
    from .attention import AttnEncoder, attn_arrays

    if isinstance(encoder, AttnEncoder):
        arrays.update(attn_arrays(encoder))
    np.savez(path, **arrays)


def encoder_with_weights(seed: int = 42, **overrides: np.ndarray) -> HashEncoder:
    """Clone the seed-derived encoder with trained layers swapped in (the
    state_dict-update step of the reference lifecycle: train a head's
    layers, keep the frozen trunk). Pass e.g. ``w_bio=...`` or
    ``w_sub=..., w_po=...`` from operators.train results."""
    enc = HashEncoder(seed)
    for k, v in overrides.items():
        if k not in WEIGHT_KEYS and k not in BIAS_KEYS:
            raise KeyError(f"unknown encoder parameter {k!r}")
        cur = getattr(enc, k)
        v = np.asarray(v, dtype=np.float32)
        if np.shape(cur) != v.shape:
            raise ValueError(f"{k}: shape {v.shape} != {np.shape(cur)}")
        setattr(enc, k, v)
    return enc


def load_encoder(path: str) -> HashEncoder:
    """Restore an encoder from a weights file without re-deriving biases.
    Dispatches on the checkpoint contents: an ``attn_meta`` key means the
    file holds an AttnEncoder (multi-layer transformer trunk)."""
    if not path.endswith(".npz"):
        path += ".npz"
    data = np.load(path)
    if "attn_meta" in data:
        from .attention import load_attn

        enc = load_attn(data)
    else:
        enc = HashEncoder.__new__(HashEncoder)
        enc.emb = _EmbeddingCache(_HIDDEN)
    for k in WEIGHT_KEYS:
        setattr(enc, k, data[k])
    for k in BIAS_KEYS:
        setattr(enc, k, float(data[k]))
    return enc


class PlantedEncoder:
    """Gold labels as probabilities — decode must reproduce gold exactly.

    Caveat (inherent to the reference's own label encoding, which plants
    all subject spans into one shared [L,2] start/end array): NESTED gold
    subject spans collapse under nearest-end pairing, e.g. spans (2,9) and
    (5,7) decode as (2,7). The reference's training labels have the same
    property (dataset_mpn.py:166-170). Fixture generators should avoid
    nested subject mentions when asserting exact roundtrips, as the
    synthetic corpus does.

    Each method takes the raw text + gold spo_list (shipped alongside the
    batch in fixture mode) and produces 0/1 prob tensors shaped like the
    HashEncoder's, via the reference's own label-encoding semantics.
    """

    @staticmethod
    def _truncate_enc(enc: dict, max_len: int | None) -> dict:
        """Bound the framed token list at max_len (frame-preserving, the
        reference's encode(truncation=True) shape). Offset maps stay full —
        they are per-index lookup tables and in-bounds indices still map."""
        if max_len is None or len(enc["tokens"]) <= max_len:
            return enc
        enc = dict(enc)
        enc["tokens"] = truncate_framed(enc["tokens"], max_len)
        return enc

    # --- BIO -------------------------------------------------------------
    def bio_probs(
        self, text: str, spo_list: list[dict], max_len: int | None = None
    ) -> np.ndarray:
        enc = bio_token_labels(text, spo_list, max_len=max_len)
        return np.asarray(enc["labels"], dtype=np.float32)

    # --- mpn -------------------------------------------------------------
    def mpn_planted(
        self, text: str, spo_list: list[dict], max_len: int | None = None
    ):
        """(subject_probs [L,2], spoes dict, tokens, maps) with probs=1.0 at
        gold span endpoints. Subjects whose span end falls past max_len are
        not planted (reference dataset_mpn.py:165-168 plants only
        ``s[1] <= max_len - 1``; :173-174 skips over-long chosen subjects)."""
        enc = self._truncate_enc(
            span_gold_spoes(text, spo_list, with_types=False), max_len
        )
        L = len(enc["tokens"])
        sub = np.zeros((L, 2), dtype=np.float32)
        for s0, s1 in enc["spoes"].keys():
            if s1 <= L - 1:
                sub[s0, 0] = 1.0
                sub[s1, 1] = 1.0
        return sub, enc

    def mpn_po_probs(
        self,
        enc: dict,
        subject_spans: list[tuple[int, int]],
    ) -> np.ndarray:
        L = len(enc["tokens"])
        out = np.zeros((len(subject_spans), L, R_NUM, 2), dtype=np.float32)
        for k, s in enumerate(subject_spans):
            for o0, o1, p in enc["spoes"].get(tuple(s), []):
                # objects past the (possibly truncated) length are dropped,
                # reference dataset_mpn.py:177-180 (o[1] <= max_len - 1)
                if o1 <= L - 1:
                    out[k, o0, p, 0] = 1.0
                    out[k, o1, p, 1] = 1.0
        return out

    # --- mhs / biaffine ----------------------------------------------------
    def mhs_planted(
        self, text: str, spo_list: list[dict], max_len: int | None = None
    ):
        """(start_probs [L,E+1], end_probs [L,E+1], cube [L,L,R], enc).

        Truncation parity with reference dataset_mhs.py:164-175: subject
        typed labels need ``s[1] <= max_len-1``, object typed labels need
        ``o[1] <= max_len-1`` (planted even when the subject is out of
        bounds), the cube entry needs BOTH ends in bounds."""
        enc = self._truncate_enc(
            span_gold_spoes(text, spo_list, with_types=True), max_len
        )
        L = len(enc["tokens"])
        start = np.zeros((L, E_NUM + 1), dtype=np.float32)
        end = np.zeros((L, E_NUM + 1), dtype=np.float32)
        cube = np.zeros((L, L, R_NUM), dtype=np.float32)
        for (s0, s1, st), olist in enc["spoes"].items():
            if st is None:
                continue
            s_in = s1 <= L - 1
            if s_in:
                start[s0, st] = 1.0
                end[s1, st] = 1.0
            for o0, o1, ot, p in olist:
                o_in = o1 <= L - 1
                if o_in and ot is not None:
                    start[o0, ot] = 1.0
                    end[o1, ot] = 1.0
                if o_in and s_in:
                    cube[s1, o1, p] = 1.0
        return start, end, cube, enc
