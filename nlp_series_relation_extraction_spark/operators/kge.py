"""Distributed KG-embedding training (TransE / DistMult) + filtered
link-prediction ranking over the canonical edge table.

This is the consumer the negative-sampling operator (graph.py:
corrupt_triples) exists for: learn entity/relation vectors such that
observed triples score above corrupted ones. Two public scorers:

* TransE (Bordes et al. 2013, "Translating Embeddings for Modeling
  Multi-relational Data"): score(s,r,o) = -||e_s + w_r - e_o||^2.
* DistMult (Yang et al. 2015, "Embedding Entities and Relations for
  Learning and Inference in Knowledge Bases"): the trilinear product
  score(s,r,o) = sum_d e_s[d] * w_r[d] * e_o[d].
* RotatE (Sun et al. 2019, "RotatE: Knowledge Graph Embedding by
  Relational Rotation in Complex Space"): score = -||s o r - o||^2
  with r a unit complex rotation.
* ComplEx (Trouillon et al. 2016, "Complex Embeddings for Simple Link
  Prediction"): score(s,r,o) = Re(<e_s, w_r, conj(e_o)>) — DistMult's
  trilinear product lifted to C^d, which (unlike DistMult) can model
  ANTISYMMETRIC relations because conj breaks the s/o exchange
  symmetry. Same half-stacked (re | im) entity layout as RotatE.

Scale shape — the part that matters at 10^12 turns:

* ENTITY embeddings never visit the driver. They live as a DataFrame
  (entity_id, vec) partitioned by entity id; each epoch flows gradients
  through joins keyed on entity_id (the DGL-KE partitioned-training
  shape, re-expressed as DataFrame ops):
    1. the (pos, neg) training pairs explode to LONG format — one row
       per (pair, role in subj/obj/neg) — so a SINGLE equi-join against
       the embedding table serves all three endpoints (three separate
       joins would shuffle the pair table three times);
    2. per-pair margin gradients are computed in one Arrow pass and
       pre-combined per partition into (entity_id, pos, val) scalar
       partials — map-side combine, so the gradient shuffle is
       O(touched entities x dim), i.e. model-sized, not corpus-sized;
    3. the update is one join of the embedding table with the summed
       sparse gradients + an Arrow renormalize pass, localCheckpointed
       per epoch to truncate lineage (same discipline as pagerank).
* RELATION embeddings are vocabulary-sized (the reference schema has 48
  predicates), so they ride the distml partial-sum channel: broadcast in
  the UDF closure, gradients collected as r x dim scalars per epoch.
* Negatives are the md5-deterministic corrupt_triples output, FIXED
  across epochs — full-batch gradient descent on a frozen pair set is
  deterministic end-to-end, which is what lets the numpy twin pin the
  distributed run (production resamples per epoch by salting the hash;
  determinism per epoch is preserved).
* RANKING eval (the standard filtered MRR / Hits@k protocol, Bordes
  2013 §4) scores each test triple against EVERY entity. That is
  inherently O(n_test x E x dim) compute; the implementation makes it a
  blocked matrix product with no all-pairs ROW explosion: entities are
  split into balanced chunks (pmod of the id), test triples are
  replicated once per chunk id (n_test x E/chunk slim rows), and a
  cogroup on chunk_id scores each chunk's [C, dim] matrix against the
  group's test rows in one vectorized Arrow pass, emitting only
  per-(triple, chunk) better-than-true COUNTS. Counts are decomposable,
  so rank = 1 + sum over chunks — a plain groupBy. The filtered
  correction (known true objects don't count against the rank) is one
  equi-join on (subj, predicate) scored the same way and subtracted.

Init is splitmix64-hash-based — a pure function of (id, component), so
the Spark workers and the numpy twin derive bit-identical starting
points with no RNG state to ship. Entity rows are L2-normalized at init
and after every update; relation rows at init only (both papers'
normalization schedule).

No counterpart in the reference repo (it stops at triple extraction);
this is the downstream "KG embedding + link prediction" stage a
production KG build runs on the edge table this pipeline materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.partitioning import ensure_parallelism
from .graph import corrupt_triples
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats

_GRAD_SCHEMA = "kind int, key_id long, pos int, val double"

_SCORERS = ("transe", "distmult", "rotate", "complex")

# RotatE's rotations preserve entity norms; projecting entities back to
# the unit sphere every epoch (the TransE/DistMult schedule) would fight
# the geometry, so it keeps raw entity vectors (Sun 2019 trains without
# the norm constraint). ComplEx is multiplicative like DistMult, so it
# follows DistMult's unit-sphere projection (the paper regularizes with
# L2 instead; under the margin loss the projection plays that role, and
# the twin applies the identical schedule). The twin follows this table.
_NORMALIZE_ENTITIES = {
    "transe": True,
    "distmult": True,
    "rotate": False,
    "complex": True,
}

# scorers whose entity/relation vectors are half-stacked complex (re | im)
_COMPLEX_DIM = ("rotate", "complex")


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (public domain, Vigna) — a pure uint64->uint64
    mix both the executors and the numpy twin evaluate identically."""
    z = z.astype(np.uint64, copy=True)
    z += np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


_ENT_SALT = np.uint64(0xE17E5A17)
_REL_SALT = np.uint64(0x4E1A7105)


def _hash_init(keys: np.ndarray, dim: int, salt: np.uint64) -> np.ndarray:
    """[len(keys), dim] deterministic uniform init in [-6/sqrt(d), 6/sqrt(d))
    (the TransE paper's range), rows L2-normalized."""
    k = keys.astype(np.int64).view(np.uint64)
    grid = k[:, None] * np.uint64(dim) + np.arange(dim, dtype=np.uint64)[None, :]
    u = _splitmix64(grid ^ salt).astype(np.float64) / np.float64(2**64)
    b = 6.0 / np.sqrt(dim)
    v = (u * 2.0 - 1.0) * b
    n = np.sqrt((v * v).sum(axis=1, keepdims=True))
    return v / np.maximum(n, 1e-12)


def _phase_init(keys: np.ndarray, dim: int) -> np.ndarray:
    """[len(keys), dim] RotatE relation init: phases uniform in
    [-pi, pi) in the first dim//2 slots, zeros after (phases live in
    half the width; the flat [r, dim] storage keeps one relation-table
    shape across scorers)."""
    k = keys.astype(np.int64).view(np.uint64)
    d2 = dim // 2
    grid = k[:, None] * np.uint64(d2) + np.arange(d2, dtype=np.uint64)[None, :]
    u = _splitmix64(grid ^ _REL_SALT).astype(np.float64) / np.float64(2**64)
    out = np.zeros((len(keys), dim))
    out[:, :d2] = (u * 2.0 - 1.0) * np.pi
    return out


def _cprod(X: np.ndarray, Y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Element-wise complex product of two half-stacked (re | im)
    [n, dim] arrays, returned as (re, im) halves ([n, dim//2] each)."""
    d2 = X.shape[1] // 2
    a, b = X[:, :d2], X[:, d2:]
    c, d = Y[:, :d2], Y[:, d2:]
    return a * c - b * d, a * d + b * c


def _rotate(ES: np.ndarray, WR: np.ndarray) -> np.ndarray:
    """Element-wise complex rotation s o r for RotatE: entity vectors
    are (re | im) half-stacked, relations carry phases in the first
    half. Complex L2 on (re, im) equals real L2 on the stacked layout,
    so downstream distance kernels are scorer-agnostic."""
    d2 = ES.shape[1] // 2
    a, b = ES[:, :d2], ES[:, d2:]
    c, s = np.cos(WR[:, :d2]), np.sin(WR[:, :d2])
    return np.concatenate([a * c - b * s, a * s + b * c], axis=1)


def _score_rows(
    scorer: str, ES: np.ndarray, WR: np.ndarray, EO: np.ndarray
) -> np.ndarray:
    """Row-wise triple scores ([n,dim] x3 -> [n]); HIGHER is better for
    every scorer (distances are negated)."""
    if scorer == "transe":
        X = ES + WR - EO
        return -(X * X).sum(1)
    if scorer == "rotate":
        X = _rotate(ES, WR) - EO
        return -(X * X).sum(1)
    if scorer == "complex":
        # Re(<s, r, conj(o)>) = Re(t * conj(o)) with t = s (.) r:
        # = t_re . o_re + t_im . o_im — a plain dot in the stacked layout
        d2 = ES.shape[1] // 2
        tre, tim = _cprod(ES, WR)
        return (tre * EO[:, :d2] + tim * EO[:, d2:]).sum(1)
    return (ES * WR * EO).sum(1)


def _score_candidates(
    scorer: str, ES: np.ndarray, WR: np.ndarray, C: np.ndarray
) -> np.ndarray:
    """[n, m] score matrix of n (subject, relation) contexts against m
    candidate objects — the blocked-matmul kernel of the ranking eval.
    TransE expands -||t - c||^2 = -(||t||^2 - 2 t.c + ||c||^2) so the
    inner loop is a single GEMM either way."""
    if scorer in ("transe", "rotate"):
        T = ES + WR if scorer == "transe" else _rotate(ES, WR)
        return -(
            (T * T).sum(1)[:, None]
            - 2.0 * (T @ C.T)
            + (C * C).sum(1)[None, :]
        )
    if scorer == "complex":
        # Re(t * conj(c)) over the stacked layout is again one GEMM
        tre, tim = _cprod(ES, WR)
        return np.concatenate([tre, tim], axis=1) @ C.T
    return (ES * WR) @ C.T


def _margin_grads(
    scorer: str,
    ES: np.ndarray,
    EO: np.ndarray,
    EN: np.ndarray,
    WR: np.ndarray,
    margin: float,
):
    """Margin-ranking hinge and its per-endpoint gradients (pre-mask):
    hinge = margin - score(s,r,o) + score(s,r,n). Returns
    (hinge [n], gS, gO, gN, gW — each [n,dim])."""
    if scorer == "transe":
        Xp = ES + WR - EO
        Xn = ES + WR - EN
        hinge = margin + (Xp * Xp).sum(1) - (Xn * Xn).sum(1)
        gS = 2.0 * (Xp - Xn)
        return hinge, gS, -2.0 * Xp, 2.0 * Xn, gS
    if scorer == "rotate":
        # X = rot(s, theta) - o; d|X|^2/ds is 2X rotated back by -theta,
        # d|X|^2/dtheta_j = 2(X_im SR_re - X_re SR_im)_j (SR = rot(s,
        # theta)); phase grads occupy the first half of the [n, dim] gW
        d2 = ES.shape[1] // 2
        c, s = np.cos(WR[:, :d2]), np.sin(WR[:, :d2])
        SR = _rotate(ES, WR)
        Xp = SR - EO
        Xn = SR - EN
        hinge = margin + (Xp * Xp).sum(1) - (Xn * Xn).sum(1)
        D = 2.0 * (Xp - Xn)
        Dre, Dim = D[:, :d2], D[:, d2:]
        gS = np.concatenate([Dre * c + Dim * s, -Dre * s + Dim * c], axis=1)
        gtheta = Dim * SR[:, :d2] - Dre * SR[:, d2:]
        gW = np.concatenate([gtheta, np.zeros_like(gtheta)], axis=1)
        return hinge, gS, -2.0 * Xp, 2.0 * Xn, gW
    if scorer == "complex":
        # complex-chain-rule mirror of the DistMult grads below: with
        # t = s (.) r and D = n - o, d(hinge)/do = -t, /dn = +t,
        # /ds = r (.) conj(D) conj-flipped, /dr = s (.) conj(D) ditto
        # (for score = Re(x (.) u), d/dx_re = Re(u), d/dx_im = -Im(u))
        d2 = ES.shape[1] // 2
        tre, tim = _cprod(ES, WR)
        hinge = (
            margin
            - (tre * EO[:, :d2] + tim * EO[:, d2:]).sum(1)
            + (tre * EN[:, :d2] + tim * EN[:, d2:]).sum(1)
        )
        D = EN - EO
        dre, dif = D[:, :d2], D[:, d2:]
        a, b = ES[:, :d2], ES[:, d2:]
        c, d = WR[:, :d2], WR[:, d2:]
        gS = np.concatenate([c * dre + d * dif, c * dif - d * dre], axis=1)
        gW = np.concatenate([a * dre + b * dif, a * dif - b * dre], axis=1)
        t = np.concatenate([tre, tim], axis=1)
        return hinge, gS, -t, t, gW
    sw = ES * WR
    hinge = margin - (sw * EO).sum(1) + (sw * EN).sum(1)
    gS = WR * (EN - EO)
    return hinge, gS, -sw, sw, ES * (EN - EO)


def _rel_index(edges: DataFrame) -> list[str]:
    """Sorted distinct predicates — the relation vocabulary (bounded
    collect: predicate vocabularies are schema-sized, not data-sized)."""
    return [r[0] for r in edges.select("predicate").distinct().orderBy("predicate").collect()]


def kge_pairs(edges: DataFrame, n_neg: int = 1) -> DataFrame:
    """(subj_entity_id, predicate, true_obj, neg_obj) training pairs:
    corrupt_triples output with flagged false negatives dropped (a
    corruption that equals the true object carries no ranking signal)."""
    return (
        corrupt_triples(edges, n_neg=n_neg)
        .where(~F.col("is_false_negative"))
        .select("subj_entity_id", "predicate", "true_obj", "neg_i", "neg_obj")
    )


# kept under the original name for callers/tests written against TransE
transe_pairs = kge_pairs

_PAIR_KEY = ["subj_entity_id", "predicate", "true_obj", "neg_i", "neg_obj"]


def _pairs_long(pairs: DataFrame, r_map: dict) -> DataFrame:
    """Explode training pairs to LONG format — one row per (pair,
    endpoint role) — so a SINGLE equi-join on entity_id serves all three
    endpoints instead of three separate joins each shuffling the pair
    table. Pair identity is the composite key itself (no synthetic ids
    that could collide)."""
    rel_col = F.create_map(
        *[x for p, i in r_map.items() for x in (F.lit(p), F.lit(i))]
    )[F.col("predicate")]
    return (
        pairs.withColumn("r_idx", rel_col.cast("int"))
        .select(
            *_PAIR_KEY,
            "r_idx",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(0).alias("role"),
                        F.col("subj_entity_id").alias("entity_id"),
                    ),
                    F.struct(
                        F.lit(1).alias("role"),
                        F.col("true_obj").alias("entity_id"),
                    ),
                    F.struct(
                        F.lit(2).alias("role"),
                        F.col("neg_obj").alias("entity_id"),
                    ),
                )
            ).alias("e"),
        )
        .select(
            *_PAIR_KEY,
            "r_idx",
            F.col("e.role").alias("role"),
            F.col("e.entity_id").alias("entity_id"),
        )
    )


def _packed_pairs(long_joined: DataFrame) -> DataFrame:
    """Regroup the embedding-joined long rows into ONE row per pair
    (role-sorted vec array). A pair packed into a single row can never be
    split across Arrow batches inside mapInPandas — the failure mode a
    repartition+regroup-in-pandas approach would silently hit at batch
    boundaries. The groupBy here IS the shuffle a bare repartition would
    have cost; packing is free by comparison."""
    return long_joined.groupBy(*_PAIR_KEY, "r_idx").agg(
        F.array_sort(F.collect_list(F.struct("role", "vec"))).alias("rv")
    )


def _entity_ids(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("subj_entity_id").alias("entity_id"))
        .unionByName(edges.select(F.col("obj_entity_id").alias("entity_id")))
        .distinct()
    )


def _init_entity_embeddings(edges: DataFrame, dim: int) -> DataFrame:
    """(entity_id, vec) hash-initialized embedding table, checkpointed."""

    def init_rows(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["entity_id"].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                continue
            V = _hash_init(ids, dim, _ENT_SALT)
            yield pd.DataFrame({"entity_id": ids, "vec": list(V)})

    # pin the exchange's partition count: a bare repartition("entity_id")
    # is AQE-coalescible by BYTES, and the checkpointed table's reported
    # HashPartitioning then pulls every epoch's gradient join down to the
    # same (possibly single) partition count (the round-4 extraction
    # lesson applied to the model table)
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    return (
        ensure_parallelism(_entity_ids(edges))
        .mapInPandas(init_rows, "entity_id long, vec array<double>")
        .repartition(n_part, "entity_id")
        .transform(_ckpt_nostats)
    )


def kge_fit_shared(
    edges: DataFrame,
    dim: int,
    n_neg: int = 1,
    pairs: DataFrame | None = None,
) -> dict:
    """Scorer-independent fit preparation (see ``kge_fit``'s ``shared``
    param): relation vocabulary, checkpointed long-format pair table,
    pair count, hash-initialized entity table."""
    from ..functions.partitioning import checkpoint_with_metrics

    rels = _rel_index(edges)
    r_map = {p: i for i, p in enumerate(rels)}
    if pairs is None:
        pairs = kge_pairs(edges, n_neg=n_neg)
    # repartition by entity_id (not round-robin): the checkpointed
    # table then carries hash(entity_id) partitioning, matching the
    # embedding table's, so EVERY epoch's long x emb join needs no
    # exchange on either side (round 6; the pack groupBy still
    # shuffles by pair key — that one is inherent). The row count
    # rides the checkpoint as an observed metric.
    n_part = edges.sparkSession.sparkContext.defaultParallelism
    long, _m = checkpoint_with_metrics(
        _pairs_long(pairs, r_map).repartition(n_part, "entity_id"),
        F.count(F.lit(1)).alias("n"),
    )
    n_pairs = int(_m["n"] or 0) // 3
    if n_pairs == 0:
        raise ValueError("kge_fit: no training pairs")
    return {
        "rels": rels,
        "long": long,
        "n_pairs": n_pairs,
        "emb0": _init_entity_embeddings(edges, dim),
        "dim": dim,
    }


def kge_fit(
    edges: DataFrame,
    scorer: str = "transe",
    dim: int = 16,
    n_epochs: int = 10,
    lr: float = 0.5,
    margin: float = 1.0,
    n_neg: int = 1,
    pairs: DataFrame | None = None,
    shared: dict | None = None,
) -> dict:
    """Full-batch deterministic margin-ranking fit over the edge table.

    Returns {"scorer": str, "entities": DataFrame(entity_id, vec),
    "relations": np.ndarray [r, dim], "rel_index": [predicate...],
    "loss": [...], "dim": dim}. Loss is the epoch-mean margin loss over
    all pairs.

    Per epoch: one equi-join (pairs x embeddings, long format), one
    Arrow gradient pass with per-partition pre-combine, one model-sized
    groupBy, one update join — every shuffle is keyed on entity_id and
    sized by the model, not the corpus.

    ``pairs``: precomputed kge_pairs(edges, n_neg) — pass it when
    fitting several scorers (or fitting + evaluating) on the same
    edges, so the negative-sampling prep (dense index + md5 join) runs
    once instead of per call.

    ``shared``: precomputed :func:`kge_fit_shared` state for the same
    (edges, pairs, dim) — the relation index, the checkpointed LONG
    pair table, the pair count and the checkpointed initial entity
    table are SCORER-INDEPENDENT (entity init is hash-of-id; only
    RELATION init differs per scorer), so concurrent multi-scorer fits
    (kg_link_prediction) prepare them once instead of four times.
    """
    if scorer not in _SCORERS:
        raise ValueError(f"unknown scorer {scorer!r} (want one of {_SCORERS})")
    if scorer in _COMPLEX_DIM and dim % 2:
        raise ValueError(f"{scorer} needs an even dim, got {dim}")
    if shared is None:
        shared = kge_fit_shared(edges, dim, n_neg=n_neg, pairs=pairs)
    if shared["dim"] != dim:
        raise ValueError(
            f"shared state prepared for dim={shared['dim']}, got {dim}"
        )
    rels = shared["rels"]
    r_map = {p: i for i, p in enumerate(rels)}
    W = (
        _phase_init(np.arange(len(rels)), dim)
        if scorer == "rotate"
        else _hash_init(np.arange(len(rels)), dim, _REL_SALT)
    )
    long = shared["long"]
    n_pairs = shared["n_pairs"]
    emb = shared["emb0"]

    losses: list[float] = []
    for _ in range(n_epochs):
        Wb = W.copy()

        def grad_rows(batches, Wb=Wb):
            import pandas as pd

            ent_acc: dict[int, np.ndarray] = {}
            rel_acc = np.zeros_like(Wb)
            loss_sum = 0.0
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                R = pdf["r_idx"].to_numpy(dtype=np.int64)
                ES = np.stack([np.asarray(v[0]["vec"]) for v in pdf["rv"]])
                EO = np.stack([np.asarray(v[1]["vec"]) for v in pdf["rv"]])
                EN = np.stack([np.asarray(v[2]["vec"]) for v in pdf["rv"]])
                hinge, gS, gO, gN, gW = _margin_grads(
                    scorer, ES, EO, EN, Wb[R], margin
                )
                act = np.where(hinge > 0.0)[0]
                if len(act) == 0:
                    continue
                loss_sum += float(hinge[act].sum())
                S = pdf["subj_entity_id"].to_numpy(dtype=np.int64)[act]
                O = pdf["true_obj"].to_numpy(dtype=np.int64)[act]
                N = pdf["neg_obj"].to_numpy(dtype=np.int64)[act]
                ids = np.concatenate([S, O, N])
                G = np.concatenate([gS[act], gO[act], gN[act]], axis=0)
                uid, inv = np.unique(ids, return_inverse=True)
                M = np.zeros((len(uid), G.shape[1]))
                np.add.at(M, inv, G)
                for eid, gv in zip(uid, M):  # local pre-combine per batch
                    prev = ent_acc.get(int(eid))
                    ent_acc[int(eid)] = gv if prev is None else prev + gv
                np.add.at(rel_acc, R[act], gW[act])
            kinds, keys, poss, vals = [], [], [], []
            for eid, gv in ent_acc.items():
                kinds += [0] * dim
                keys += [eid] * dim
                poss += list(range(dim))
                vals += list(np.asarray(gv, dtype=np.float64))
            nz = np.nonzero(rel_acc)
            for ri, j in zip(*nz):
                kinds.append(1)
                keys.append(int(ri))
                poss.append(int(j))
                vals.append(float(rel_acc[ri, j]))
            kinds.append(2)
            keys.append(0)
            poss.append(0)
            vals.append(loss_sum)
            yield pd.DataFrame(
                {"kind": kinds, "key_id": keys, "pos": poss, "val": vals}
            )

        packed = _packed_pairs(long.join(emb, "entity_id"))
        scal = packed.mapInPandas(grad_rows, _GRAD_SCHEMA).transform(_ckpt_nostats)

        # SUM per (entity, pos) first: an entity touched by pairs in
        # several partitions emits one partial per partition, and a bare
        # collect_list would concatenate them into a ragged array instead
        # of adding them (masked at toy scale, where AQE coalesces the
        # pair shuffle to one partition)
        grads = (
            scal.where(F.col("kind") == 0)
            .groupBy(F.col("key_id").alias("entity_id"), "pos")
            .agg(F.sum("val").alias("val"))
            .groupBy("entity_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "val"))
                    ),
                    lambda s: s["val"],
                ).alias("grad")
            )
        )

        renorm = _NORMALIZE_ENTITIES[scorer]

        def apply_update(batches, n_pairs=n_pairs, renorm=renorm):
            import pandas as pd

            for pdf in batches:
                if len(pdf) == 0:
                    continue
                V = np.stack(pdf["vec"].to_numpy())
                G = np.stack(
                    [
                        np.zeros(dim) if g is None else np.asarray(g)
                        for g in pdf["grad"]
                    ]
                )
                if G.shape[1] != dim:  # fail loud on a ragged gradient
                    raise ValueError(
                        f"gradient width {G.shape[1]} != dim {dim}"
                    )
                V = V - lr * G / n_pairs
                if renorm:
                    n = np.sqrt((V * V).sum(axis=1, keepdims=True))
                    V = V / np.maximum(n, 1e-12)
                yield pd.DataFrame(
                    {"entity_id": pdf["entity_id"], "vec": list(V)}
                )

        # the entity update and the relation-gradient collect both read
        # the CHECKPOINTED scal and are independent of each other (the
        # driver-side W update only feeds the NEXT epoch's closure), so
        # the update checkpoint is submitted from a worker thread while
        # the main thread collects the model-sized relation rows — the
        # kg_link_prediction concurrent-submission pattern one level
        # down. Lineages are unchanged, so results are byte-identical
        # to the serial order. (The update join already hash-partitions
        # its output on entity_id — re-repartitioning would add a full
        # shuffle stage per epoch for nothing.)
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as _ex:
            emb_f = _ex.submit(
                lambda: emb.join(grads, "entity_id", "left")
                .mapInPandas(
                    apply_update, "entity_id long, vec array<double>"
                )
                .transform(_ckpt_nostats)
            )
            small = (
                scal.where(F.col("kind") >= 1)
                .groupBy("kind", "key_id", "pos")
                .agg(F.sum("val").alias("val"))
                .collect()
            )
            emb = emb_f.result()
        losses.append(
            sum(r.val for r in small if r.kind == 2) / n_pairs
        )
        for r in small:
            if r.kind == 1:
                W[int(r.key_id), int(r.pos)] -= lr * r.val / n_pairs

    return {
        "scorer": scorer,
        "entities": emb,
        "relations": W,
        "rel_index": rels,
        "loss": losses,
        "dim": dim,
    }


def transe_fit(edges: DataFrame, **kw) -> dict:
    """TransE fit (see kge_fit)."""
    return kge_fit(edges, scorer="transe", **kw)


def distmult_fit(edges: DataFrame, **kw) -> dict:
    """DistMult fit (see kge_fit)."""
    return kge_fit(edges, scorer="distmult", **kw)


def complex_fit(edges: DataFrame, **kw) -> dict:
    """ComplEx fit (see kge_fit)."""
    return kge_fit(edges, scorer="complex", **kw)


def kge_fit_numpy(
    edge_list: list[tuple[int, str, int]],
    scorer: str = "transe",
    dim: int = 16,
    n_epochs: int = 10,
    lr: float = 0.5,
    margin: float = 1.0,
    n_neg: int = 1,
) -> dict:
    """Flat twin of kge_fit: identical init, identical md5 negative
    draw (re-deriving corrupt_triples' arithmetic in plain Python),
    identical full-batch recursion. Only float summation ORDER differs
    from the distributed run."""
    if scorer not in _SCORERS:
        raise ValueError(f"unknown scorer {scorer!r} (want one of {_SCORERS})")
    if scorer in _COMPLEX_DIM and dim % 2:
        raise ValueError(f"{scorer} needs an even dim, got {dim}")
    ent_ids = sorted({s for s, _, _ in edge_list} | {o for _, _, o in edge_list})
    n_ents = len(ent_ids)
    eid_by_rank = list(ent_ids)  # dense_index = row_number over sorted id
    rels = sorted({p for _, p, _ in edge_list})
    r_map = {p: i for i, p in enumerate(rels)}
    W = (
        _phase_init(np.arange(len(rels)), dim)
        if scorer == "rotate"
        else _hash_init(np.arange(len(rels)), dim, _REL_SALT)
    )
    E = {
        e: _hash_init(np.array([e]), dim, _ENT_SALT)[0] for e in ent_ids
    }

    pairs = []
    for s, p, o in edge_list:
        for i in range(n_neg):
            h = hashlib.md5(f"{s}|{p}|{o}|{i}".encode()).hexdigest()[:7]
            neg = eid_by_rank[int(h, 16) % n_ents]
            if neg != o:
                pairs.append((s, p, o, neg))
    if not pairs:
        raise ValueError("kge_fit_numpy: no training pairs")
    n_pairs = len(pairs)

    losses = []
    for _ in range(n_epochs):
        ge: dict[int, np.ndarray] = {}
        gw = np.zeros_like(W)
        loss_sum = 0.0
        for s, p, o, n in pairs:
            r = r_map[p]
            hinge, gs, go, gn, gwr = _margin_grads(
                scorer,
                E[s][None, :],
                E[o][None, :],
                E[n][None, :],
                W[r][None, :],
                margin,
            )
            if float(hinge[0]) <= 0.0:
                continue
            loss_sum += float(hinge[0])
            ge[s] = ge.get(s, 0.0) + gs[0]
            ge[o] = ge.get(o, 0.0) + go[0]
            ge[n] = ge.get(n, 0.0) + gn[0]
            gw[r] += gwr[0]
        losses.append(loss_sum / n_pairs)
        W -= lr * gw / n_pairs
        renorm = _NORMALIZE_ENTITIES[scorer]
        for e in ent_ids:
            v = E[e] - lr * np.asarray(ge.get(e, np.zeros(dim))) / n_pairs
            E[e] = (
                v / max(float(np.sqrt(v @ v)), 1e-12) if renorm else v
            )
    return {
        "scorer": scorer,
        "entities": E,
        "relations": W,
        "rel_index": rels,
        "loss": losses,
        "dim": dim,
    }


def transe_fit_numpy(edge_list, **kw) -> dict:
    return kge_fit_numpy(edge_list, scorer="transe", **kw)


def kge_margin_eval(
    model: dict,
    edges: DataFrame,
    n_neg: int = 1,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Per-predicate ranking quality of a trained model: over the SAME
    deterministic (pos, neg) pairs, how often the true object scores
    better than the corruption. Returns (predicate, n_pairs,
    n_pos_better, acc_ppm) — the link-prediction smoke a KG-embedding
    run is judged by before any downstream use.

    One join against the embedding table (long format, as in training),
    one Arrow scoring pass, one groupBy(predicate) — corpus never
    collected."""
    emb = model["entities"]
    W = model["relations"]
    scorer = model.get("scorer", "transe")
    r_map = {p: i for i, p in enumerate(model["rel_index"])}
    if pairs is None:
        pairs = kge_pairs(edges, n_neg=n_neg)
    long = _pairs_long(pairs, r_map)

    def score_rows(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            R = pdf["r_idx"].to_numpy(dtype=np.int64)
            ES = np.stack([np.asarray(v[0]["vec"]) for v in pdf["rv"]])
            EO = np.stack([np.asarray(v[1]["vec"]) for v in pdf["rv"]])
            EN = np.stack([np.asarray(v[2]["vec"]) for v in pdf["rv"]])
            ok = (
                _score_rows(scorer, ES, W[R], EO)
                > _score_rows(scorer, ES, W[R], EN)
            ).astype(np.int32)
            yield pd.DataFrame({"predicate": pdf["predicate"], "ok": ok})

    scored = _packed_pairs(long.join(emb, "entity_id")).mapInPandas(
        score_rows, "predicate string, ok int"
    )
    return (
        scored.groupBy("predicate")
        .agg(
            F.count("*").cast("long").alias("n_pairs"),
            F.sum("ok").cast("long").alias("n_pos_better"),
        )
        .select(
            "predicate",
            "n_pairs",
            "n_pos_better",
            (F.col("n_pos_better") * 1000000 / F.col("n_pairs"))
            .cast("long")
            .alias("acc_ppm"),
        )
    )


transe_margin_eval = kge_margin_eval


# --- filtered link-prediction ranking (MRR / Hits@k) -------------------

_HASH_DENOM = float(16**7)  # md5 7-hex-digit prefix -> uniform [0, 1)

_TEST_FRAC_EXPR = (
    "cast(conv(substring(md5(concat_ws('|', subj_entity_id, predicate,"
    " obj_entity_id, 'test')), 1, 7), 16, 10) as double) / 268435456.0"
)


def _test_triples(edges: DataFrame, max_test: int) -> DataFrame:
    """Deterministic md5-thresholded sample of ~max_test test triples.
    Ranking is inherently O(n_test x E), so the TEST SET is the knob
    that bounds cost — the standard protocol evaluates a fixed held-out
    set, not the whole graph."""
    n = edges.count()
    if n == 0:
        raise ValueError("kge_rank_eval: empty edge table")
    p = min(1.0, max_test / n)
    return edges.select(
        "subj_entity_id", "predicate", "obj_entity_id"
    ).where(F.expr(_TEST_FRAC_EXPR) < F.lit(p))


def kge_rank_eval(
    model: dict,
    edges: DataFrame,
    max_test: int = 2000,
    chunk: int = 1024,
    filtered: bool = True,
    test_edges: DataFrame | None = None,
    shared_ents: tuple[DataFrame, int] | None = None,
) -> DataFrame:
    """Filtered object-ranking of test triples against ALL entities.

    ``shared_ents``: optional precomputed (entity-id frame aliased to
    ``eid``, entity count) — model-independent, so concurrent
    multi-scorer evals over the same ``edges`` count the candidate set
    once instead of once per scorer.

    Returns (subj_entity_id, predicate, obj_entity_id, rank) where
    rank = 1 + #{candidate entities scoring STRICTLY better than the
    true object}, minus (if ``filtered``) candidates that are
    themselves true objects of the same (subj, predicate) in ``edges``
    (Bordes 2013's filtered protocol; strictly-better ties give the
    optimistic rank, and the numpy twin applies the identical rule).

    Plan shape (see module docstring): true scores via one entity join;
    candidate scan via pmod-hash chunking + cogroup-on-chunk_id Arrow
    GEMM emitting decomposable counts; filtered correction via one
    (subj, predicate) equi-join. No crossJoin row explosion, no
    data-sized collect (the chunk-id frame is E/chunk rows).

    ``test_edges``: where the test sample is drawn from (default: the
    training ``edges`` — in-sample smoke). Pass a HELD-OUT split for
    the honest protocol; ``edges`` still supplies the candidate entity
    set and the filtered-correction known-true set, so test triples
    whose endpoints never appeared in training are dropped by the
    embedding join (standard transductive-KGE behavior)."""
    emb = model["entities"]
    W = model["relations"]
    scorer = model.get("scorer", "transe")
    r_map = {p: i for i, p in enumerate(model["rel_index"])}
    rel_col = F.create_map(
        *[x for p, i in r_map.items() for x in (F.lit(p), F.lit(i))]
    )[F.col("predicate")]

    test = (
        _test_triples(edges if test_edges is None else test_edges, max_test)
        .withColumn("r_idx", rel_col.cast("int"))
        # a relation seen only in the held-out split has no trained
        # vector — drop, like unseen entities (transductive contract)
        .where(F.col("r_idx").isNotNull())
    )

    # true score + subject vector, one row per test triple
    joined = (
        test.join(
            emb.select(
                F.col("entity_id").alias("subj_entity_id"),
                F.col("vec").alias("es"),
            ),
            "subj_entity_id",
        )
        .join(
            emb.select(
                F.col("entity_id").alias("obj_entity_id"),
                F.col("vec").alias("eo"),
            ),
            "obj_entity_id",
        )
    )

    def true_scores(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            R = pdf["r_idx"].to_numpy(dtype=np.int64)
            ES = np.stack([np.asarray(v) for v in pdf["es"]])
            EO = np.stack([np.asarray(v) for v in pdf["eo"]])
            out = pdf[
                ["subj_entity_id", "predicate", "obj_entity_id", "r_idx", "es"]
            ].copy()
            out["true_score"] = _score_rows(scorer, ES, W[R], EO)
            yield out

    scored_test = ensure_parallelism(joined).mapInPandas(
        true_scores,
        "subj_entity_id long, predicate string, obj_entity_id long,"
        " r_idx int, es array<double>, true_score double",
    ).transform(_ckpt_nostats)

    # candidate chunks: chunk_id = pmod(id, n_chunks) — uniform enough
    # for balance, zero extra jobs (a dense-rank chunking would cost a
    # range shuffle + checkpoint + offset collect per eval), and counts
    # are chunking-invariant so the twin needs no chunk notion at all
    if shared_ents is None:
        ents = _entity_ids(edges).select(F.col("entity_id").alias("eid"))
        n_ents = ents.count()
    else:
        ents, n_ents = shared_ents
    n_chunks = max(1, (n_ents + chunk - 1) // chunk)
    chunk_long = ents.join(
        emb.select(F.col("entity_id").alias("eid"), "vec"), "eid"
    ).select(
        F.pmod(F.col("eid"), F.lit(n_chunks)).cast("long").alias("chunk_id"),
        "eid",
        "vec",
    )
    chunk_ids = (
        edges.sparkSession.range(n_chunks)
        .select(F.col("id").alias("chunk_id"))
    )
    test_repl = scored_test.crossJoin(F.broadcast(chunk_ids))

    def score_chunk(left, right):
        import pandas as pd

        if len(left) == 0 or len(right) == 0:
            return pd.DataFrame(
                {
                    "subj_entity_id": pd.Series([], dtype="int64"),
                    "predicate": pd.Series([], dtype="object"),
                    "obj_entity_id": pd.Series([], dtype="int64"),
                    "n_better": pd.Series([], dtype="int64"),
                }
            )
        C = np.stack([np.asarray(v) for v in right["vec"]])
        cids = right["eid"].to_numpy(dtype=np.int64)
        R = left["r_idx"].to_numpy(dtype=np.int64)
        ES = np.stack([np.asarray(v) for v in left["es"]])
        S = _score_candidates(scorer, ES, W[R], C)
        # the true object is excluded by ID, not by float equality: its
        # chunk score comes from the GEMM expansion while true_score
        # comes from the row kernel, and those may differ in the last ulp
        obj = left["obj_entity_id"].to_numpy(dtype=np.int64)
        n_better = (
            (S > left["true_score"].to_numpy()[:, None])
            & (cids[None, :] != obj[:, None])
        ).sum(axis=1)
        return pd.DataFrame(
            {
                "subj_entity_id": left["subj_entity_id"],
                "predicate": left["predicate"],
                "obj_entity_id": left["obj_entity_id"],
                "n_better": n_better.astype(np.int64),
            }
        )

    raw = (
        test_repl.groupBy("chunk_id")
        .cogroup(chunk_long.groupBy("chunk_id"))
        .applyInPandas(
            score_chunk,
            "subj_entity_id long, predicate string, obj_entity_id long,"
            " n_better long",
        )
        .groupBy("subj_entity_id", "predicate", "obj_entity_id")
        .agg(F.sum("n_better").alias("raw_better"))
    )

    key = ["subj_entity_id", "predicate", "obj_entity_id"]
    if not filtered:
        return scored_test.select(*key).join(raw, key).select(
            *key, (F.lit(1) + F.col("raw_better")).cast("long").alias("rank")
        )

    # filtered correction: known-true objects of the same (s, p) that
    # outscored the test object should not count against its rank
    known = edges.select(
        "subj_entity_id",
        "predicate",
        F.col("obj_entity_id").alias("other_obj"),
    ).distinct()
    fpairs = (
        scored_test.join(known, ["subj_entity_id", "predicate"])
        .join(
            emb.select(
                F.col("entity_id").alias("other_obj"),
                F.col("vec").alias("ev"),
            ),
            "other_obj",
        )
    )

    def filt_counts(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            R = pdf["r_idx"].to_numpy(dtype=np.int64)
            ES = np.stack([np.asarray(v) for v in pdf["es"]])
            EV = np.stack([np.asarray(v) for v in pdf["ev"]])
            better = (
                _score_rows(scorer, ES, W[R], EV)
                > pdf["true_score"].to_numpy()
            ) & (
                pdf["other_obj"].to_numpy() != pdf["obj_entity_id"].to_numpy()
            )
            out = pdf[
                ["subj_entity_id", "predicate", "obj_entity_id"]
            ].copy()
            out["f"] = better.astype(np.int64)
            yield out

    filt = (
        fpairs.mapInPandas(
            filt_counts,
            "subj_entity_id long, predicate string, obj_entity_id long,"
            " f long",
        )
        .groupBy(*key)
        .agg(F.sum("f").alias("filt_better"))
    )
    return (
        raw.join(filt, key, "left")
        .select(
            *key,
            (
                F.lit(1)
                + F.col("raw_better")
                - F.coalesce(F.col("filt_better"), F.lit(0))
            )
            .cast("long")
            .alias("rank"),
        )
    )


def kge_rank_eval_numpy(
    edge_list: list[tuple[int, str, int]],
    model: dict,
    max_test: int = 2000,
    filtered: bool = True,
    test_list: list[tuple[int, str, int]] | None = None,
) -> dict:
    """Flat twin of kge_rank_eval over a kge_fit_numpy model: identical
    md5 test-sample rule, identical strictly-better counting, identical
    filtered correction, identical unseen-endpoint/relation drops.
    Returns {(s, p, o): rank}."""
    scorer = model.get("scorer", "transe")
    E = model["entities"]
    W = model["relations"]
    r_map = {p: i for i, p in enumerate(model["rel_index"])}
    ent_ids = sorted(E)
    C = np.stack([E[e] for e in ent_ids])
    pool = edge_list if test_list is None else test_list
    p_keep = min(1.0, max_test / len(pool))
    known: dict[tuple[int, str], set[int]] = {}
    for s, p, o in edge_list:
        known.setdefault((s, p), set()).add(o)
    ranks = {}
    for s, p, o in pool:
        if s not in E or o not in E or p not in r_map:
            continue
        h = hashlib.md5(f"{s}|{p}|{o}|test".encode()).hexdigest()[:7]
        if int(h, 16) / _HASH_DENOM >= p_keep:
            continue
        wr = W[r_map[p]]
        true = float(
            _score_rows(scorer, E[s][None, :], wr[None, :], E[o][None, :])[0]
        )
        scores = _score_candidates(scorer, E[s][None, :], wr[None, :], C)[0]
        ids = np.asarray(ent_ids, dtype=np.int64)
        n_better = int(((scores > true) & (ids != o)).sum())
        if filtered:
            for other in known.get((s, p), ()):
                if other != o and float(
                    _score_rows(
                        scorer, E[s][None, :], wr[None, :], E[other][None, :]
                    )[0]
                ) > true:
                    n_better -= 1
        ranks[(s, p, o)] = 1 + n_better
    return ranks


def link_prediction_metrics(ranks: DataFrame) -> DataFrame:
    """(predicate, n_test, mrr_ppm, hits1_ppm, hits3_ppm, hits10_ppm)
    per predicate plus an '__all__' micro row — the standard KGE
    leaderboard numbers, ppm-scaled longs for stable comparison."""

    def agg(df, pred_col):
        return df.groupBy(pred_col.alias("predicate")).agg(
            F.count("*").cast("long").alias("n_test"),
            (F.avg(F.lit(1.0) / F.col("rank")) * 1000000)
            .cast("long")
            .alias("mrr_ppm"),
            *[
                (
                    F.sum((F.col("rank") <= k).cast("long"))
                    * 1000000
                    / F.count("*")
                )
                .cast("long")
                .alias(f"hits{k}_ppm")
                for k in (1, 3, 10)
            ],
        )

    return agg(ranks, F.col("predicate")).unionByName(
        agg(ranks, F.lit("__all__"))
    )


_TC_SPLIT_EXPR = (
    "cast(conv(substring(md5(concat_ws('|', subj_entity_id, predicate,"
    " true_obj, 'tcsplit')), 1, 7), 16, 10) as double) / 268435456.0"
)


def kge_triple_classification(
    model: dict, edges: DataFrame, n_neg: int = 1
) -> DataFrame:
    """Triple classification (Socher et al. 2013, the OTHER standard
    KGE eval beside ranking): per relation, learn a score threshold on
    a validation split (positives + md5-corrupted negatives) and report
    accuracy on the held-out test split — "is this candidate fact
    true?", the yes/no gate a KG-completion pipeline actually applies
    before inserting a predicted triple.

    Protocol, all deterministic:

    * pairs = kge_pairs (positives with their md5 corruption, false
      negatives dropped); a pair inherits its POSITIVE's split via
      md5(s|p|o|'tcsplit') — first half validation, rest test.
    * both scores per pair come from ONE Arrow pass over the packed
      embedding join (the margin-eval plan).
    * threshold per relation = the validation score maximizing
      accuracy, computed distributed: group by (relation, score), one
      descending cumulative window — accuracy at threshold t is
      #pos >= t plus #neg < t. Ties take the LARGEST score; if no
      threshold beats the all-negative baseline the relation's
      threshold is null (classify nothing positive).
    * output: (predicate, threshold, n_valid, n_test, n_correct,
      acc_ppm) over the test split.

    Rows-only at the driver (float scores); tests/test_kge_tc.py pins
    the identical-recursion numpy twin."""
    emb = model["entities"]
    W = model["relations"]
    scorer = model.get("scorer", "transe")
    r_map = {p: i for i, p in enumerate(model["rel_index"])}
    pairs = kge_pairs(edges, n_neg=n_neg)
    packed = _packed_pairs(_pairs_long(pairs, r_map).join(emb, "entity_id"))

    def score_rows(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            R = pdf["r_idx"].to_numpy(dtype=np.int64)
            ES = np.stack([np.asarray(v[0]["vec"]) for v in pdf["rv"]])
            EO = np.stack([np.asarray(v[1]["vec"]) for v in pdf["rv"]])
            EN = np.stack([np.asarray(v[2]["vec"]) for v in pdf["rv"]])
            yield pd.DataFrame(
                {
                    "subj_entity_id": pdf["subj_entity_id"],
                    "predicate": pdf["predicate"],
                    "true_obj": pdf["true_obj"],
                    "neg_i": pdf["neg_i"],
                    "s_pos": _score_rows(scorer, ES, W[R], EO),
                    "s_neg": _score_rows(scorer, ES, W[R], EN),
                }
            )

    scored = packed.mapInPandas(
        score_rows,
        "subj_entity_id long, predicate string, true_obj long,"
        " neg_i int, s_pos double, s_neg double",
    ).withColumn("is_valid", F.expr(_TC_SPLIT_EXPR) < F.lit(0.5))
    labeled = scored.select(
        "predicate", "is_valid",
        F.col("s_pos").alias("score"), F.lit(1).alias("label"),
    ).unionByName(
        scored.select(
            "predicate", "is_valid",
            F.col("s_neg").alias("score"), F.lit(0).alias("label"),
        )
    ).transform(_ckpt_nostats)

    from pyspark.sql import Window

    valid = labeled.where("is_valid")
    by_score = valid.groupBy("predicate", "score").agg(
        F.sum("label").cast("long").alias("np_"),
        F.sum(1 - F.col("label")).cast("long").alias("nn_"),
    )
    w_cum = (
        Window.partitionBy("predicate")
        .orderBy(F.desc("score"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("predicate")
    cand = (
        by_score.withColumn("cum_pos", F.sum("np_").over(w_cum))
        .withColumn("cum_neg", F.sum("nn_").over(w_cum))
        .withColumn("tot_neg", F.sum("nn_").over(w_all))
        .withColumn(
            "acc",
            F.col("cum_pos") + F.col("tot_neg") - F.col("cum_neg"),
        )
    )
    thr = (
        cand.groupBy("predicate")
        .agg(
            # ties take the LARGEST score (struct max: acc major,
            # then score)
            F.expr("max_by(score, struct(acc, score))").alias("thr"),
            F.max("acc").alias("best_acc"),
            F.max("tot_neg").alias("baseline_acc"),
        )
        .select(
            "predicate",
            F.when(
                F.col("best_acc") > F.col("baseline_acc"), F.col("thr")
            ).alias("threshold"),
        )
    )
    n_valid = valid.groupBy("predicate").agg(
        F.count("*").cast("long").alias("n_valid")
    )
    test = labeled.where(~F.col("is_valid"))
    judged = test.join(F.broadcast(thr), "predicate", "left").withColumn(
        "correct",
        (
            (
                F.col("threshold").isNotNull()
                & (F.col("score") >= F.col("threshold"))
            ).cast("int")
            == F.col("label")
        ).cast("long"),
    )
    return (
        judged.groupBy("predicate")
        .agg(
            F.min("threshold").alias("threshold"),
            F.count("*").cast("long").alias("n_test"),
            F.sum("correct").cast("long").alias("n_correct"),
        )
        .join(F.broadcast(n_valid), "predicate", "left")
        .na.fill({"n_valid": 0})
        .select(
            "predicate",
            "threshold",
            "n_valid",
            "n_test",
            "n_correct",
            F.expr("n_correct * 1000000L div n_test").cast("long").alias(
                "acc_ppm"
            ),
        )
    )
