"""Distributed KG-embedding training (TransE) over the canonical edge
table.

This is the consumer the negative-sampling operator (graph.py:
corrupt_triples) exists for: learn entity/relation vectors such that
e_subj + w_rel is close to e_obj for observed triples and far for
corrupted ones (Bordes et al. 2013, "Translating Embeddings for
Modeling Multi-relational Data" — public NeurIPS paper).

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

Init is splitmix64-hash-based — a pure function of (id, component), so
the Spark workers and the numpy twin derive bit-identical starting
points with no RNG state to ship. Entity rows are L2-normalized at init
and after every update; relation rows at init only (the paper's
normalization schedule).

No counterpart in the reference repo (it stops at triple extraction);
this is the downstream "KG embedding" stage a production KG build runs
on the edge table this pipeline materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..functions.partitioning import ensure_parallelism
from .graph import corrupt_triples

_GRAD_SCHEMA = "kind int, key_id long, pos int, val double"


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


def _rel_index(edges: DataFrame) -> list[str]:
    """Sorted distinct predicates — the relation vocabulary (bounded
    collect: predicate vocabularies are schema-sized, not data-sized)."""
    return [r[0] for r in edges.select("predicate").distinct().orderBy("predicate").collect()]


def transe_pairs(edges: DataFrame, n_neg: int = 1) -> DataFrame:
    """(subj_entity_id, predicate, true_obj, neg_obj) training pairs:
    corrupt_triples output with flagged false negatives dropped (a
    corruption that equals the true object carries no ranking signal)."""
    return (
        corrupt_triples(edges, n_neg=n_neg)
        .where(~F.col("is_false_negative"))
        .select("subj_entity_id", "predicate", "true_obj", "neg_i", "neg_obj")
    )


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


def transe_fit(
    edges: DataFrame,
    dim: int = 16,
    n_epochs: int = 10,
    lr: float = 0.5,
    margin: float = 1.0,
    n_neg: int = 1,
) -> dict:
    """Full-batch deterministic TransE over the edge table.

    Returns {"entities": DataFrame(entity_id, vec), "relations":
    np.ndarray [r, dim], "rel_index": [predicate...], "loss": [...],
    "dim": dim}. Loss is the epoch-mean margin loss over all pairs.

    Per epoch: one equi-join (pairs x embeddings, long format), one
    Arrow gradient pass with per-partition pre-combine, one model-sized
    groupBy, one update join — every shuffle is keyed on entity_id and
    sized by the model, not the corpus.
    """
    spark = edges.sparkSession
    rels = _rel_index(edges)
    r_map = {p: i for i, p in enumerate(rels)}
    W = _hash_init(np.arange(len(rels)), dim, _REL_SALT)

    pairs = transe_pairs(edges, n_neg=n_neg)
    long = ensure_parallelism(
        _pairs_long(pairs, r_map)
    ).localCheckpoint(eager=True)
    n_pairs = long.count() // 3
    if n_pairs == 0:
        raise ValueError("transe_fit: no training pairs")

    ents = (
        edges.select(F.col("subj_entity_id").alias("entity_id"))
        .unionByName(edges.select(F.col("obj_entity_id").alias("entity_id")))
        .distinct()
    )

    def init_rows(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["entity_id"].to_numpy(dtype=np.int64)
            if len(ids) == 0:
                continue
            V = _hash_init(ids, dim, _ENT_SALT)
            yield pd.DataFrame({"entity_id": ids, "vec": list(V)})

    emb = ensure_parallelism(ents).mapInPandas(
        init_rows, "entity_id long, vec array<double>"
    ).repartition("entity_id").localCheckpoint(eager=True)

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
                Xp = ES + Wb[R] - EO
                Xn = ES + Wb[R] - EN
                hinge = margin + (Xp * Xp).sum(1) - (Xn * Xn).sum(1)
                act = np.where(hinge > 0.0)[0]
                if len(act) == 0:
                    continue
                loss_sum += float(hinge[act].sum())
                GS = 2.0 * (Xp[act] - Xn[act])
                S = pdf["subj_entity_id"].to_numpy(dtype=np.int64)[act]
                O = pdf["true_obj"].to_numpy(dtype=np.int64)[act]
                N = pdf["neg_obj"].to_numpy(dtype=np.int64)[act]
                ids = np.concatenate([S, O, N])
                G = np.concatenate(
                    [GS, -2.0 * Xp[act], 2.0 * Xn[act]], axis=0
                )
                uid, inv = np.unique(ids, return_inverse=True)
                M = np.zeros((len(uid), GS.shape[1]))
                np.add.at(M, inv, G)
                for eid, gv in zip(uid, M):  # local pre-combine per batch
                    prev = ent_acc.get(int(eid))
                    ent_acc[int(eid)] = gv if prev is None else prev + gv
                np.add.at(rel_acc, R[act], GS)
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
        scal = packed.mapInPandas(grad_rows, _GRAD_SCHEMA).localCheckpoint(
            eager=True
        )
        small = (
            scal.where(F.col("kind") >= 1)
            .groupBy("kind", "key_id", "pos")
            .agg(F.sum("val").alias("val"))
            .collect()
        )
        losses.append(
            sum(r.val for r in small if r.kind == 2) / n_pairs
        )
        for r in small:
            if r.kind == 1:
                W[int(r.key_id), int(r.pos)] -= lr * r.val / n_pairs

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

        def apply_update(batches, n_pairs=n_pairs):
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
                n = np.sqrt((V * V).sum(axis=1, keepdims=True))
                V = V / np.maximum(n, 1e-12)
                yield pd.DataFrame(
                    {"entity_id": pdf["entity_id"], "vec": list(V)}
                )

        emb = (
            emb.join(grads, "entity_id", "left")
            .mapInPandas(apply_update, "entity_id long, vec array<double>")
            .repartition("entity_id")
            .localCheckpoint(eager=True)
        )

    return {
        "entities": emb,
        "relations": W,
        "rel_index": rels,
        "loss": losses,
        "dim": dim,
    }


def transe_fit_numpy(
    edge_list: list[tuple[int, str, int]],
    dim: int = 16,
    n_epochs: int = 10,
    lr: float = 0.5,
    margin: float = 1.0,
    n_neg: int = 1,
) -> dict:
    """Flat twin of transe_fit: identical init, identical md5 negative
    draw (re-deriving corrupt_triples' arithmetic in plain Python),
    identical full-batch recursion. Only float summation ORDER differs
    from the distributed run."""
    ent_ids = sorted({s for s, _, _ in edge_list} | {o for _, _, o in edge_list})
    n_ents = len(ent_ids)
    eid_by_rank = list(ent_ids)  # dense_index = row_number over sorted id
    rels = sorted({p for _, p, _ in edge_list})
    r_map = {p: i for i, p in enumerate(rels)}
    W = _hash_init(np.arange(len(rels)), dim, _REL_SALT)
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
        raise ValueError("transe_fit_numpy: no training pairs")
    n_pairs = len(pairs)

    losses = []
    for _ in range(n_epochs):
        ge: dict[int, np.ndarray] = {}
        gw = np.zeros_like(W)
        loss_sum = 0.0
        for s, p, o, n in pairs:
            r = r_map[p]
            x_pos = E[s] + W[r] - E[o]
            x_neg = E[s] + W[r] - E[n]
            hinge = margin + float(x_pos @ x_pos) - float(x_neg @ x_neg)
            if hinge <= 0.0:
                continue
            loss_sum += hinge
            gs = 2.0 * (x_pos - x_neg)
            ge[s] = ge.get(s, 0.0) + gs
            ge[o] = ge.get(o, 0.0) - 2.0 * x_pos
            ge[n] = ge.get(n, 0.0) + 2.0 * x_neg
            gw[r] += gs
        losses.append(loss_sum / n_pairs)
        W -= lr * gw / n_pairs
        for e in ent_ids:
            v = E[e] - lr * np.asarray(ge.get(e, np.zeros(dim))) / n_pairs
            E[e] = v / max(float(np.sqrt(v @ v)), 1e-12)
    return {
        "entities": E,
        "relations": W,
        "rel_index": rels,
        "loss": losses,
        "dim": dim,
    }


def transe_margin_eval(
    model: dict, edges: DataFrame, n_neg: int = 1
) -> DataFrame:
    """Per-predicate ranking quality of a trained model: over the SAME
    deterministic (pos, neg) pairs, how often the true object scores
    closer than the corruption. Returns (predicate, n_pairs,
    n_pos_better, acc_ppm) — the link-prediction smoke a KG-embedding
    run is judged by before any downstream use.

    One join against the embedding table (long format, as in training),
    one Arrow scoring pass, one groupBy(predicate) — corpus never
    collected."""
    emb = model["entities"]
    W = model["relations"]
    r_map = {p: i for i, p in enumerate(model["rel_index"])}
    pairs = transe_pairs(edges, n_neg=n_neg)
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
            Xp = ES + W[R] - EO
            Xn = ES + W[R] - EN
            ok = ((Xp * Xp).sum(1) < (Xn * Xn).sum(1)).astype(np.int32)
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
