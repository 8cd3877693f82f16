"""Weisfeiler-Leman entity-neighborhood fingerprints at KG scale.

1-WL color refinement (Weisfeiler & Leman 1968; the kernel form is
Shervashidze 2011's WL subtree kernel) assigns every node a hash that
after k rounds summarizes its ENTIRE k-hop neighborhood — labels,
predicates, directions, multiplicities. Two nodes with equal
fingerprints are structurally indistinguishable at radius k, which is
exactly the blocking key cross-snapshot KG work needs: aligning or
deduplicating entities between two 100-TB graph versions by pairwise
neighborhood comparison is quadratic and un-shippable, while joining
on a WL fingerprint column is one equi-join (the same
block-then-verify shape as ``operators/linking.py`` — WL is the
structural complement of its string blocking).

The reference repo has no graph layer — this belongs to the
beyond-reference KG surface, same contract as ``operators/graph.py``.

Plan shape (the 100-TB contract): each round is two equi-joins of the
edge table against the (node, hash) state — one keyed on the
destination to collect ``out:`` messages, one on the source for
``in:`` — followed by ONE hash aggregate per node whose value is the
SORTED message list (``sort_array(collect_list(...))``: a canonical
multiset encoding, duplicates preserved so parallel edges count).
Per-node cost is bounded by degree; hub rows fatten the aggregate but
never fan out. k rounds = 3k shuffles, all keyed on the node id —
AQE re-uses the partitioning between rounds. No UDFs anywhere: the
hash is the JVM's ``md5`` over deterministic string encodings, so the
result is bit-stable across engines (the DuckDB oracle reproduces it
with ``string_agg(... ORDER BY ...)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def wl_fingerprints(
    edges: DataFrame,
    labels: DataFrame | None = None,
    rounds: int = 2,
    subj_col: str = "subj",
    pred_col: str = "predicate",
    obj_col: str = "obj",
) -> DataFrame:
    """(node, fingerprint) after ``rounds`` of 1-WL refinement over the
    directed, predicate-labeled multigraph ``edges``.

    ``labels`` (optional, (node, label)) seeds round 0 —
    ``h0 = md5(label)``, unlabeled nodes hash the empty string. Each
    round every node combines its own hash with the canonical multiset
    of neighbor messages::

        h' = md5(h || '|' || sorted_csv of
                 {out:pred:h(dst)} ∪ {in:pred:h(src)})

    Isolated nodes refine on the empty message list, so equal-round
    fingerprints stay comparable across the whole graph. Equal
    fingerprints after k rounds <=> 1-WL cannot distinguish the nodes'
    k-hop neighborhoods (label-preserving isomorphism of unfoldings);
    as a blocking key this yields NO false negatives for exact
    structural duplicates and near-zero false-positive mass at k>=2 on
    heterogeneous graphs."""
    if rounds < 0:
        raise ValueError(f"rounds must be >= 0, got {rounds}")
    e = edges.select(
        F.col(subj_col).cast("string").alias("src"),
        F.col(pred_col).cast("string").alias("pred"),
        F.col(obj_col).cast("string").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if labels is not None:
        lab = labels.select(
            F.col(labels.columns[0]).cast("string").alias("node"),
            F.col(labels.columns[1]).cast("string").alias("lab"),
        )
        nodes = nodes.join(lab, "node", "left")
    else:
        nodes = nodes.withColumn("lab", F.lit(""))
    h = nodes.select(
        "node", F.md5(F.coalesce("lab", F.lit(""))).alias("h")
    )
    for _ in range(rounds):
        dst_h = h.select(F.col("node").alias("dst"), F.col("h").alias("nh"))
        src_h = h.select(F.col("node").alias("src"), F.col("h").alias("nh"))
        out_msgs = e.join(dst_h, "dst").select(
            F.col("src").alias("node"),
            F.concat(F.lit("out:"), F.col("pred"), F.lit(":"), F.col("nh"))
            .alias("msg"),
        )
        in_msgs = e.join(src_h, "src").select(
            F.col("dst").alias("node"),
            F.concat(F.lit("in:"), F.col("pred"), F.lit(":"), F.col("nh"))
            .alias("msg"),
        )
        sigs = (
            out_msgs.unionByName(in_msgs)
            .groupBy("node")
            .agg(
                F.concat_ws(
                    ",", F.sort_array(F.collect_list("msg"))
                ).alias("sig")
            )
        )
        h = h.join(sigs, "node", "left").select(
            "node",
            F.md5(
                F.concat(
                    F.col("h"), F.lit("|"),
                    F.coalesce(F.col("sig"), F.lit("")),
                )
            ).alias("h"),
        )
    return h.select("node", F.col("h").alias("fingerprint"))


def align_by_structure(
    edges_a: DataFrame,
    edges_b: DataFrame,
    labels_a: DataFrame | None = None,
    labels_b: DataFrame | None = None,
    rounds: int = 2,
    subj_col: str = "subj",
    pred_col: str = "predicate",
    obj_col: str = "obj",
) -> DataFrame:
    """Cross-snapshot entity alignment by WL blocking: (node_a,
    node_b, fingerprint) for every fingerprint that is a SINGLETON on
    both sides — nodes whose radius-``rounds`` neighborhood is unique
    within its own snapshot and structurally identical across them.

    This is the sound core of structural entity resolution between two
    KG versions (a fresh extraction batch vs the canonical graph, or
    two pipeline runs): singleton-block matches carry a structural
    proof (1-WL indistinguishability both ways, uniqueness both ways —
    under a pure rename they recover the rename exactly, which is the
    oracle), while multi-member blocks are exactly the candidate sets
    a content verifier (``operators/linking.py``'s string similarity)
    must adjudicate — the classic block-then-verify split, with WL as
    the blocking axis.

    Plan: two independent fingerprint computations, one count
    aggregate per side keyed on the fingerprint, and ONE equi-join of
    the two singleton sets on the fingerprint — never a cross-snapshot
    node-pair join. All shuffles are node- or fingerprint-keyed."""

    def _singletons(fps: DataFrame, out_col: str) -> DataFrame:
        return (
            fps.groupBy("fingerprint")
            .agg(
                F.count("*").alias("n"),
                F.min("node").alias(out_col),
            )
            .where(F.col("n") == 1)
            .select("fingerprint", out_col)
        )

    fa = wl_fingerprints(
        edges_a, labels_a, rounds, subj_col, pred_col, obj_col
    )
    fb = wl_fingerprints(
        edges_b, labels_b, rounds, subj_col, pred_col, obj_col
    )
    return (
        _singletons(fa, "node_a")
        .join(_singletons(fb, "node_b"), "fingerprint")
        .select("node_a", "node_b", "fingerprint")
    )


def align_by_structure_python_twin(
    edges_a: list[tuple[str, str, str]],
    edges_b: list[tuple[str, str, str]],
    labels_a: dict[str, str] | None = None,
    labels_b: dict[str, str] | None = None,
    rounds: int = 2,
) -> set[tuple[str, str, str]]:
    """Plain-python twin of :func:`align_by_structure`."""
    from collections import Counter

    ha = wl_fingerprints_python_twin(edges_a, labels_a, rounds)
    hb = wl_fingerprints_python_twin(edges_b, labels_b, rounds)
    ca, cb = Counter(ha.values()), Counter(hb.values())
    inv_a = {h: n for n, h in ha.items() if ca[h] == 1}
    inv_b = {h: n for n, h in hb.items() if cb[h] == 1}
    return {
        (inv_a[h], inv_b[h], h) for h in set(inv_a) & set(inv_b)
    }


def wl_fingerprints_python_twin(
    edges: list[tuple[str, str, str]],
    labels: dict[str, str] | None = None,
    rounds: int = 2,
) -> dict[str, str]:
    """Plain-python twin — independent recursion (dict walks, no
    joins) of the same hash definition."""
    import hashlib

    def md5(s: str) -> str:
        return hashlib.md5(s.encode("utf-8")).hexdigest()

    labels = labels or {}
    nodes = {s for s, _, _ in edges} | {o for _, _, o in edges}
    h = {n: md5(labels.get(n, "")) for n in nodes}
    for _ in range(rounds):
        msgs: dict[str, list[str]] = {n: [] for n in nodes}
        for s, p, o in edges:
            msgs[s].append(f"out:{p}:{h[o]}")
            msgs[o].append(f"in:{p}:{h[s]}")
        h = {
            n: md5(h[n] + "|" + ",".join(sorted(msgs[n]))) for n in nodes
        }
    return h
