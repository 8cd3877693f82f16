"""Multi-layer attention encoder: the realistic-compute trunk option.

The reference's heads sit on a genuine BERT forward (reference
``models/model_baseline.py:6-24``: ``BertModel`` -> sequence output ->
small dense heads; same trunk in ``model_mpn.py``/``model_mhs.py``).
``HashEncoder`` stands that in with a cheap mixer so decode semantics can
be tested at high throughput; ``AttnEncoder`` here is the faithful-SHAPE
stand-in: a real pre-LN transformer — sinusoidal positions, per-layer
multi-head self-attention (softmax over all valid keys, bidirectional)
plus a GELU-free ReLU FFN, residuals and layer norms — in pure float32
numpy, with deterministic seeded weights.

Why it exists (round-3 VERDICT ask #3): the Arrow-batch sizing, padded
batched forward, weight-shipping (npz via ``save_encoder`` /
``weights_path``) and per-executor-singleton stories all need validating
under an encoder whose cost per token is REAL (L^2 attention, 2 layers,
FFN), not the hash mixer's. ``AttnEncoder`` subclasses ``HashEncoder``
and overrides only the trunk (``encode`` / ``encode_batch``); every head
projection, calibration and decode path is inherited unchanged, so the
same extraction operators run on either trunk by swapping the weights
file.

Batched forward == per-row forward at every valid position: padding only
ever appears as EXTRA KEYS, which the attention mask removes before
softmax; positions, layer norms and FFNs are per-row/per-position. (The
two paths run different GEMM shapes, so equality is to float32 rounding,
not bitwise — pinned with allclose + decode-equality in tests.)
"""

from __future__ import annotations

import numpy as np

from .encoders import HashEncoder, _EmbeddingCache, _HIDDEN

_NEG_INF = np.float32(-1e9)

# Checkpoint layout version: bump whenever ATTN_LAYER_KEYS, the default
# architecture, or the npz key scheme changes, so cached weight files
# from older code revisions are never silently loaded (plans/queries.py
# attn_weights_path embeds this in the cache filename).
ATTN_FORMAT = 1

# per-layer parameter names (all float32 ndarrays)
ATTN_LAYER_KEYS = (
    "wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
    "w1", "b1", "w2", "b2",
    "g1", "c1", "g2", "c2",
)


def _layer_norm(x: np.ndarray, g: np.ndarray, c: np.ndarray) -> np.ndarray:
    """LN over the hidden axis (last), eps inside the sqrt like BERT."""
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return g * (x - mu) / np.sqrt(var + np.float32(1e-6)) + c


def _softmax(x: np.ndarray) -> np.ndarray:
    m = x.max(axis=-1, keepdims=True)
    e = np.exp(x - m)
    return e / e.sum(axis=-1, keepdims=True)


def _sin_pos(L: int, H: int) -> np.ndarray:
    """Sinusoidal positional encoding [L, H] (Vaswani et al. 2017)."""
    pos = np.arange(L, dtype=np.float32)[:, None]
    i = np.arange(H // 2, dtype=np.float32)[None, :]
    ang = pos / np.power(np.float32(10000.0), (2 * i) / np.float32(H))
    out = np.empty((L, H), dtype=np.float32)
    out[:, 0::2] = np.sin(ang)
    out[:, 1::2] = np.cos(ang)
    return out


class AttnEncoder(HashEncoder):
    """2-layer pre-LN transformer trunk under the HashEncoder head suite.

    Heads, calibration (which probes through THIS trunk — super().__init__
    runs ``_calibrate`` against the overridden ``encode``), save/load and
    the per-executor singleton all come from the base class / module.
    """

    def __init__(
        self,
        seed: int = 42,
        n_layers: int = 2,
        n_heads: int = 4,
        d_ff: int = 256,
    ):
        H = _HIDDEN
        if H % n_heads:
            raise ValueError(f"hidden {H} not divisible by {n_heads} heads")
        self.n_layers, self.n_heads, self.d_ff = n_layers, n_heads, d_ff
        rng = np.random.default_rng(seed + 77_000_001)

        def w(rows, cols):
            return (rng.standard_normal((rows, cols)) / np.sqrt(rows)).astype(
                np.float32
            )

        self.attn_params: list[dict[str, np.ndarray]] = []
        for _ in range(n_layers):
            self.attn_params.append(
                {
                    "wq": w(H, H), "bq": np.zeros(H, dtype=np.float32),
                    "wk": w(H, H), "bk": np.zeros(H, dtype=np.float32),
                    "wv": w(H, H), "bv": np.zeros(H, dtype=np.float32),
                    "wo": w(H, H), "bo": np.zeros(H, dtype=np.float32),
                    "w1": w(H, d_ff), "b1": np.zeros(d_ff, dtype=np.float32),
                    "w2": w(d_ff, H), "b2": np.zeros(H, dtype=np.float32),
                    "g1": np.ones(H, dtype=np.float32),
                    "c1": np.zeros(H, dtype=np.float32),
                    "g2": np.ones(H, dtype=np.float32),
                    "c2": np.zeros(H, dtype=np.float32),
                }
            )
        self.gf = np.ones(H, dtype=np.float32)
        self.cf = np.zeros(H, dtype=np.float32)
        super().__init__(seed)  # head weights + calibration via our encode

    # --- trunk ---------------------------------------------------------
    def _embed(self, tokens) -> np.ndarray:
        E = np.stack([self.emb.get(t) for t in tokens])
        return E + _sin_pos(E.shape[0], E.shape[1])

    def _mha(self, X: np.ndarray, p: dict) -> np.ndarray:
        """[L, H] -> [L, H] multi-head self-attention (no mask: per-row
        path has no padding)."""
        L, H = X.shape
        nh, dh = self.n_heads, H // self.n_heads
        q = (X @ p["wq"] + p["bq"]).reshape(L, nh, dh).transpose(1, 0, 2)
        k = (X @ p["wk"] + p["bk"]).reshape(L, nh, dh).transpose(1, 0, 2)
        v = (X @ p["wv"] + p["bv"]).reshape(L, nh, dh).transpose(1, 0, 2)
        scores = (q @ k.transpose(0, 2, 1)) / np.float32(np.sqrt(dh))
        out = (_softmax(scores) @ v).transpose(1, 0, 2).reshape(L, H)
        return out @ p["wo"] + p["bo"]

    def encode(self, tokens) -> np.ndarray:
        X = self._embed(tokens)
        for p in self.attn_params:
            X = X + self._mha(_layer_norm(X, p["g1"], p["c1"]), p)
            Xn = _layer_norm(X, p["g2"], p["c2"])
            X = X + (np.maximum(Xn @ p["w1"] + p["b1"], 0) @ p["w2"] + p["b2"])
        return _layer_norm(X, self.gf, self.cf)

    def encode_batch(self, tokens_batch):
        """Padded batched forward [B, Lmax, H] + valid lengths. Padding is
        masked out of every softmax (keys at j >= len_i score -1e9), so
        valid positions equal the per-row forward to f32 rounding."""
        lens = [len(t) for t in tokens_batch]
        B, Lm = len(tokens_batch), max(lens) if lens else 0
        H = _HIDDEN
        X = np.zeros((B, Lm, H), dtype=np.float32)
        for i, toks in enumerate(tokens_batch):
            if toks:
                X[i, : lens[i]] = np.stack([self.emb.get(t) for t in toks])
        X = X + _sin_pos(Lm, H)[None]
        nh, dh = self.n_heads, H // self.n_heads
        # [B, 1, 1, Lm] additive key mask
        key_ix = np.arange(Lm)[None, :]
        mask = np.where(
            key_ix < np.asarray(lens)[:, None], np.float32(0.0), _NEG_INF
        )[:, None, None, :]

        def mha(Xn, p):
            q = (Xn @ p["wq"] + p["bq"]).reshape(B, Lm, nh, dh)
            k = (Xn @ p["wk"] + p["bk"]).reshape(B, Lm, nh, dh)
            v = (Xn @ p["wv"] + p["bv"]).reshape(B, Lm, nh, dh)
            q, k, v = (a.transpose(0, 2, 1, 3) for a in (q, k, v))
            scores = (q @ k.transpose(0, 1, 3, 2)) / np.float32(np.sqrt(dh))
            out = _softmax(scores + mask) @ v
            out = out.transpose(0, 2, 1, 3).reshape(B, Lm, H)
            return out @ p["wo"] + p["bo"]

        for p in self.attn_params:
            X = X + mha(_layer_norm(X, p["g1"], p["c1"]), p)
            Xn = _layer_norm(X, p["g2"], p["c2"])
            X = X + (np.maximum(Xn @ p["w1"] + p["b1"], 0) @ p["w2"] + p["b2"])
        return _layer_norm(X, self.gf, self.cf), lens


# --- npz lifecycle (dispatch hooks used by core.encoders) -------------------


def attn_arrays(encoder: AttnEncoder) -> dict[str, np.ndarray]:
    """Flatten transformer params for np.savez (save_encoder merges these
    with the head/bias arrays)."""
    out = {
        "attn_meta": np.asarray(
            [encoder.n_layers, encoder.n_heads, encoder.d_ff], dtype=np.int64
        ),
        "attn_gf": encoder.gf,
        "attn_cf": encoder.cf,
    }
    for i, p in enumerate(encoder.attn_params):
        for k in ATTN_LAYER_KEYS:
            out[f"attn{i}_{k}"] = p[k]
    return out


def load_attn(data) -> AttnEncoder:
    """Rebuild an AttnEncoder trunk from a save_encoder npz (head weights
    and calibrated biases are restored by load_encoder on top)."""
    n_layers, n_heads, d_ff = (int(x) for x in data["attn_meta"])
    enc = AttnEncoder.__new__(AttnEncoder)
    enc.n_layers, enc.n_heads, enc.d_ff = n_layers, n_heads, d_ff
    enc.emb = _EmbeddingCache(_HIDDEN)
    enc.gf, enc.cf = data["attn_gf"], data["attn_cf"]
    enc.attn_params = [
        {k: data[f"attn{i}_{k}"] for k in ATTN_LAYER_KEYS}
        for i in range(n_layers)
    ]
    return enc
