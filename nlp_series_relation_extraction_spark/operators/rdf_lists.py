"""RDF collection (``rdf:List``) flattening at KG scale.

OWL and SHACL both serialize ordered arguments as rdf:first/rdf:rest
cons chains (owl:unionOf, owl:intersectionOf, owl:propertyChainAxiom,
sh:in, sh:languageIn — https://www.w3.org/TR/rdf-schema/#ch_collectionvocab),
and data-level KGs use the same vocabulary for ordered facts (author
lists, route waypoints). Walking a chain is trivially sequential; at
100 TB the engine cannot walk — a single ingested dump can carry
millions of lists, and a hostile one a single list with 10^8 cells.

:func:`flatten_rdf_lists` therefore runs **Wyllie's pointer-jumping
list ranking** (classic PRAM algorithm, public knowledge): every cons
cell starts with a pointer to its PREDECESSOR (rest edges reversed —
toward the head) and distance 1; each round every unfinished cell
jumps ``ptr -> ptr.ptr`` and accumulates the jumped-over distance, so
after ``ceil(log2(maxlen))`` rounds every cell knows its head and its
0-based index. Each round is ONE self-equi-join on the pointer column
(a hash shuffle keyed on cell id) + a localCheckpoint to truncate
lineage — total work O(n log maxlen), never the O(n^2) of all-pairs
reachability, and the round count is data-independent given a length
bound. A well-formed list forest is assumed; run
:func:`rdf_list_anomalies` first on untrusted dumps — shared tails,
double firsts, and dangling rests each break the unique-predecessor
invariant ranking relies on, and the report is the gate.

The reference repo has no RDF layer — this belongs to the
beyond-reference KG-construction surface, same contract as
``operators/ontology.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats
from ..functions.partitioning import checkpoint_with_metrics as _ckpt_metrics

FIRST_PREDICATE = "rdf:first"
REST_PREDICATE = "rdf:rest"
NIL = "rdf:nil"


def _cells(
    facts: DataFrame,
    first_predicate: str,
    rest_predicate: str,
    nil: str,
) -> tuple[DataFrame, DataFrame]:
    """(firsts, rests): firsts = (cell, member); rests = (cell, nxt)
    with nil-terminators dropped (nil is an IRI, not a cell)."""
    firsts = facts.where(F.col("predicate") == first_predicate).select(
        F.col("subj").alias("cell"), F.col("obj").alias("member")
    ).distinct()
    rests = facts.where(
        (F.col("predicate") == rest_predicate) & (F.col("obj") != nil)
    ).select(
        F.col("subj").alias("cell"), F.col("obj").alias("nxt")
    ).distinct()
    return firsts, rests


def flatten_rdf_lists(
    facts: DataFrame,
    first_predicate: str = FIRST_PREDICATE,
    rest_predicate: str = REST_PREDICATE,
    nil: str = NIL,
    max_rounds: int = 40,
) -> DataFrame:
    """Flatten every rdf:first/rdf:rest chain in ``facts`` (subj,
    predicate, obj) to ``(head, idx, member)`` rows — ``head`` the
    chain's first cons cell (the node OWL/SHACL axioms point at),
    ``idx`` the member's 0-based position.

    Pointer-jumping state per cell: ``(cell, ptr, d, head)`` with
    ``ptr`` the predecessor cell (reversed rest edge, toward the
    head), ``d`` the accumulated hop count, ``head`` known once the
    walk reached a cell with no predecessor. Each round doubles the
    effective pointer length, so ``max_rounds`` bounds list length at
    ``2^max_rounds`` (default 2^40; the loop exits early the first
    round every pointer is resolved — one cheap isEmpty probe per
    round, same pattern as the PageRank fixpoint)."""
    firsts, rests = _cells(facts, first_predicate, rest_predicate, nil)
    preds = rests.select(
        F.col("nxt").alias("cell"), F.col("cell").alias("ptr")
    )
    state = (
        firsts.select("cell")
        .unionByName(rests.select("cell"))
        .unionByName(rests.select(F.col("nxt").alias("cell")))
        .distinct()
        .join(preds, "cell", "left")
        .select(
            "cell",
            "ptr",
            F.when(F.col("ptr").isNull(), F.lit(0))
            .otherwise(F.lit(1)).cast("long").alias("d"),
            F.when(F.col("ptr").isNull(), F.col("cell")).alias("head"),
        )
    )
    # the unresolved-pointer probe rides each checkpoint as an observed
    # metric (one action per round; same values as the old isEmpty)
    _live_expr = F.count(F.col("ptr")).alias("live")
    state, _sm = _ckpt_metrics(state, _live_expr)
    live = int(_sm["live"] or 0)
    for _ in range(max_rounds):
        if not live:
            break
        other = state.select(
            F.col("cell").alias("o_cell"),
            F.col("ptr").alias("o_ptr"),
            F.col("d").alias("o_d"),
            F.col("head").alias("o_head"),
        )
        state, _sm = _ckpt_metrics(
            state.join(
                other, state["ptr"] == other["o_cell"], "left"
            )
            .select(
                "cell",
                F.col("o_ptr").alias("ptr"),
                (F.col("d") + F.coalesce(F.col("o_d"), F.lit(0)))
                .alias("d"),
                F.coalesce(F.col("head"), F.col("o_head")).alias("head"),
            ),
            _live_expr,
        )
        live = int(_sm["live"] or 0)
    else:
        if live:
            raise ValueError(
                f"flatten_rdf_lists: a chain exceeds 2^{max_rounds} "
                "cells or contains a cycle - raise max_rounds only if "
                "the data really holds longer lists"
            )
    return (
        state.select("cell", F.col("d").alias("idx"), "head")
        .join(firsts, "cell")
        .select("head", "idx", "member")
    )


def rdf_list_anomalies(
    facts: DataFrame,
    first_predicate: str = FIRST_PREDICATE,
    rest_predicate: str = REST_PREDICATE,
    nil: str = NIL,
) -> DataFrame:
    """Well-formedness report for the list forest — rows ``(rule,
    cell, detail)``; empty = safe to rank:

    - ``shared-tail``: a cell is the rest-TARGET of >1 cell (two lists
      merging into one tail — legal RDF, but position is then
      ambiguous per head and ranking's unique-predecessor invariant
      breaks). Detail = predecessor count.
    - ``multi-first``: a cell asserts >1 rdf:first value. Detail =
      value count.
    - ``multi-rest``: a cell asserts >1 rdf:rest successor. Detail =
      successor count.
    - ``no-first``: a cell reachable by rest edges (or starting one)
      carries no rdf:first. Detail = ''.

    Plan: three hash aggregates keyed on the cell id + one anti-join —
    each a single shuffle over the (schema-or-data-sized) cons table,
    nothing quadratic."""
    firsts, rests = _cells(facts, first_predicate, rest_predicate, nil)
    shared = (
        rests.groupBy(F.col("nxt").alias("cell"))
        .agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .select(
            F.lit("shared-tail").alias("rule"), "cell",
            F.col("n").cast("string").alias("detail"),
        )
    )
    multi_first = (
        firsts.groupBy("cell").agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .select(
            F.lit("multi-first").alias("rule"), "cell",
            F.col("n").cast("string").alias("detail"),
        )
    )
    multi_rest = (
        rests.groupBy("cell").agg(F.count("*").alias("n"))
        .where(F.col("n") > 1)
        .select(
            F.lit("multi-rest").alias("rule"), "cell",
            F.col("n").cast("string").alias("detail"),
        )
    )
    all_cells = (
        rests.select("cell")
        .unionByName(rests.select(F.col("nxt").alias("cell")))
        .distinct()
    )
    no_first = (
        all_cells.join(firsts.select("cell"), "cell", "left_anti")
        .select(
            F.lit("no-first").alias("rule"), "cell",
            F.lit("").alias("detail"),
        )
    )
    return (
        shared.unionByName(multi_first)
        .unionByName(multi_rest)
        .unionByName(no_first)
    )


def flatten_rdf_lists_python_twin(
    facts: list[tuple[str, str, str]],
    first_predicate: str = FIRST_PREDICATE,
    rest_predicate: str = REST_PREDICATE,
    nil: str = NIL,
) -> set[tuple[str, int, str]]:
    """Plain-Python oracle: walk each chain sequentially."""
    firsts: dict[str, str] = {}
    rests: dict[str, str] = {}
    targets: set[str] = set()
    for s, p, o in set(facts):
        if p == first_predicate:
            if s in firsts:
                raise ValueError(f"multi-first at {s}")
            firsts[s] = o
        elif p == rest_predicate and o != nil:
            if s in rests:
                raise ValueError(f"multi-rest at {s}")
            rests[s] = o
            targets.add(o)
    heads = (set(firsts) | set(rests)) - targets
    out: set[tuple[str, int, str]] = set()
    for h in heads:
        node, idx = h, 0
        while True:
            if node in firsts:
                out.add((h, idx, firsts[node]))
            if node not in rests:
                break
            node = rests[node]
            idx += 1
    return out
