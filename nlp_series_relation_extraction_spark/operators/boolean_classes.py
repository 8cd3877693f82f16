"""OWL 2 RL boolean class-expression rules (cls-int1/int2, cls-uni,
cls-oo) at KG scale.

W3C OWL 2 Profiles section 4.3 (the cls-* table) includes four rules
over the boolean class constructors, all serialized as RDF lists
(owl:intersectionOf / owl:unionOf / owl:oneOf each point at an
rdf:first/rdf:rest cons chain — the same encoding
:mod:`.rdf_lists` flattens for owl:AllDifferent):

* cls-int1  C intersectionOf (C1..Cn), x type Ci for ALL i => x type C
* cls-int2  C intersectionOf (C1..Cn), x type C => x type Ci for each i
* cls-uni   C unionOf (C1..Cn), x type Ci for SOME i => x type C
* cls-oo    C oneOf (e1..en) => ei type C (schema-only emission)

The reference repo has no ontology layer — this belongs to the
beyond-reference KG-construction surface, same contract as
``operators/ontology.py`` (ontology = schema-sized metadata, facts =
data-scale triples).

Plan shapes (the 100-TB contract):

* The axioms are SCHEMA — cons chains are walked driver-side off the
  collected (and row-capped) ontology, never on the cluster; member
  tables broadcast.
* cls-int1 is the only n-premise rule: one broadcast join from the
  type scan to the member table then ONE hash aggregate keyed
  (subj, expr) counting DISTINCT matched members against the arity —
  the spec's n-way self-join never materializes. Semi-naive rounds
  bound the aggregate's input to subjects touched by the delta
  (left-semi on the candidate set) so later rounds never rescan the
  whole closure.
* cls-int2 / cls-uni are one-premise: broadcast joins against the
  round's delta alone.
* cls-oo emits directly from schema (no fact premise), once.
* Derived types flow through :func:`~.ontology.rdfs_entailment_increment`
  each round, so a type derived by cls-uni climbs the class hierarchy
  before the next intersection pass sees it (a member class may be a
  SUPERclass of what the data asserts) — the same outer alternation as
  ``owl_class_entailment``; rounds are bounded by the (schema-shaped)
  cascade depth.
"""

from __future__ import annotations

from ..functions.smalldf import local_df

from ..functions.partitioning import checkpoint_nostats as _ckpt_nostats
from ..functions.partitioning import checkpoint_with_metrics as _ckpt_metrics

from pyspark.sql import DataFrame, functions as F

from .ontology import (
    TYPE_PREDICATE,
    rdfs_entailment,
    rdfs_entailment_increment,
    rdfs_entailment_python_twin,
)

INTERSECTION_PREDICATE = "owl:intersectionOf"
UNION_PREDICATE = "owl:unionOf"
ONE_OF_PREDICATE = "owl:oneOf"


def _walk_lists(
    rows: list[tuple[str, str, str]],
    head_predicate: str,
    first_predicate: str,
    rest_predicate: str,
    nil: str,
) -> dict[str, list[str]]:
    """{expr_class: ordered members} for every ``(C, head_predicate,
    list_head)`` axiom in the (schema-sized, driver-side) ontology
    rows. Cons chains are walked in plain python — the ontology is
    capped metadata by contract, so this is O(schema), not O(data);
    data-scale lists belong in facts and
    :func:`..rdf_lists.flatten_rdf_lists`. Malformed chains (missing
    rdf:first, dangling rdf:rest, cycles, shared cells reached twice
    within one walk) raise loudly — axioms are trusted input."""
    firsts: dict[str, str] = {}
    rests: dict[str, str] = {}
    heads: list[tuple[str, str]] = []
    for s, p, o in rows:
        if p == head_predicate:
            heads.append((str(s), str(o)))
        elif p == first_predicate:
            if s in firsts and firsts[s] != o:
                raise ValueError(f"cons cell {s!r} has two rdf:first values")
            firsts[str(s)] = str(o)
        elif p == rest_predicate:
            if s in rests and rests[s] != o:
                raise ValueError(f"cons cell {s!r} has two rdf:rest values")
            rests[str(s)] = str(o)
    out: dict[str, list[str]] = {}
    for expr, head in heads:
        if expr in out:
            raise ValueError(
                f"class {expr!r} carries two {head_predicate} axioms"
            )
        members: list[str] = []
        seen: set[str] = set()
        cell = head
        while cell != nil:
            if cell in seen:
                raise ValueError(
                    f"{head_predicate} list of {expr!r} cycles at {cell!r}"
                )
            seen.add(cell)
            if cell not in firsts:
                raise ValueError(
                    f"{head_predicate} list of {expr!r}: cell {cell!r} "
                    "has no rdf:first"
                )
            members.append(firsts[cell])
            if cell not in rests:
                raise ValueError(
                    f"{head_predicate} list of {expr!r}: cell {cell!r} "
                    "has no rdf:rest"
                )
            cell = rests[cell]
        if not members:
            raise ValueError(f"{head_predicate} list of {expr!r} is empty")
        out[expr] = members
    return out


def boolean_class_axioms(
    rows: list[tuple[str, str, str]],
    first_predicate: str = "rdf:first",
    rest_predicate: str = "rdf:rest",
    nil: str = "rdf:nil",
) -> dict[str, dict[str, list[str]]]:
    """Parse the three boolean constructors out of driver-side ontology
    rows: {"intersectionOf"|"unionOf"|"oneOf": {expr: members}}."""
    return {
        "intersectionOf": _walk_lists(
            rows, INTERSECTION_PREDICATE,
            first_predicate, rest_predicate, nil,
        ),
        "unionOf": _walk_lists(
            rows, UNION_PREDICATE, first_predicate, rest_predicate, nil
        ),
        "oneOf": _walk_lists(
            rows, ONE_OF_PREDICATE, first_predicate, rest_predicate, nil
        ),
    }


def _member_df(spark, axioms: dict[str, list[str]]) -> DataFrame:
    """(expr, member, arity) rows; arity = DISTINCT member count (a
    duplicated member in a hand-written axiom must not make cls-int1
    unsatisfiable)."""
    rows = [
        (expr, m, len(set(members)))
        for expr, members in sorted(axioms.items())
        for m in sorted(set(members))
    ]
    return local_df(
        spark, rows, "expr string, member string, arity int"
    )


def _bool_rule_pass(
    acc: DataFrame,
    delta: DataFrame,
    inter: DataFrame,
    uni: DataFrame,
    type_predicate: str,
) -> DataFrame:
    """One semi-naive round: every cls-int1/int2/cls-uni derivation
    with >=1 premise in ``delta`` (``delta`` is a subset of ``acc``).
    int2/uni are one-premise (delta alone); int1 restricts the full
    count-vs-arity aggregate to (subj, expr) candidates the delta
    touched, so the aggregate's input is delta-bounded."""
    tp = F.lit(type_predicate)
    d_types = delta.where(F.col("predicate") == type_predicate).select(
        F.col("subj"), F.col("obj").alias("cls")
    )
    a_types = acc.where(F.col("predicate") == type_predicate).select(
        F.col("subj"), F.col("obj").alias("cls")
    )

    # cls-uni: x type Ci => x type C
    uni_new = d_types.join(
        F.broadcast(uni), d_types["cls"] == uni["member"]
    ).select("subj", tp.alias("predicate"), F.col("expr").alias("obj"))

    # cls-int2: x type C => x type Ci
    int2 = d_types.join(
        F.broadcast(inter), d_types["cls"] == inter["expr"]
    ).select("subj", tp.alias("predicate"), F.col("member").alias("obj"))

    # cls-int1: x type Ci for ALL i => x type C — delta-bound candidates,
    # counted against the accumulated closure
    cand = (
        d_types.join(F.broadcast(inter), d_types["cls"] == inter["member"])
        .select("subj", "expr")
        .distinct()
    )
    int1 = (
        a_types.join(F.broadcast(inter), a_types["cls"] == inter["member"])
        .join(cand, ["subj", "expr"], "left_semi")
        .groupBy("subj", "expr", "arity")
        .agg(F.countDistinct("member").alias("n_held"))
        .where(F.col("n_held") == F.col("arity"))
        .select("subj", tp.alias("predicate"), F.col("expr").alias("obj"))
    )
    return uni_new.unionByName(int2).unionByName(int1)


def owl_boolean_class_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_rounds: int = 20,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """Materialize the OWL 2 RL boolean class rules (cls-int1,
    cls-int2, cls-uni, cls-oo) to fixpoint, interleaved with the
    linear RDFS/property pass — the same outer alternation as
    :func:`~.ontology.owl_class_entailment` and for the same reason:
    a type derived here must climb the class hierarchy (rdfs9) before
    an intersection whose member is the SUPERclass can fire.

    ``ontology`` carries the usual linear-rule rows plus the axiom
    rows ``(C, owl:intersectionOf|owl:unionOf|owl:oneOf, list_head)``
    and the list's own rdf:first/rdf:rest cons rows — the way OWL
    actually serializes (cf. :func:`~.ontology.all_different_violations`).
    cls-oo seeds ``(e_i, type, C)`` from schema alone. Returns the
    closed (subj, predicate, obj) set."""
    onto_rows = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto_rows) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    rows = [tuple(r) for r in onto_rows]
    ax = boolean_class_axioms(rows)
    spark = facts.sparkSession
    cols = ["subj", "predicate", "obj"]

    seed = facts.select(*cols)
    oo_rows = [
        (e, type_predicate, expr)
        for expr, members in sorted(ax["oneOf"].items())
        for e in sorted(set(members))
    ]
    if oo_rows:
        seed = seed.unionByName(
            local_df(
                spark, oo_rows, "subj string, predicate string, obj string"
            )
        )
    closure = rdfs_entailment(
        seed, ontology, type_predicate, max_ontology_rows
    ).transform(_ckpt_nostats)
    if not ax["intersectionOf"] and not ax["unionOf"]:
        return closure
    inter = _member_df(spark, ax["intersectionOf"])
    uni = _member_df(spark, ax["unionOf"])
    delta = closure
    for _ in range(max_rounds):
        derived = _bool_rule_pass(
            closure, delta, inter, uni, type_predicate
        )
        new, _nm = _ckpt_metrics(
            derived.distinct().join(closure, cols, "left_anti"),
            F.count(F.lit(1)).alias("n"),
        )
        if not _nm["n"]:
            break
        ldelta = rdfs_entailment_increment(
            closure, new, ontology, type_predicate, max_ontology_rows
        ).transform(_ckpt_nostats)
        closure = closure.unionByName(ldelta).transform(_ckpt_nostats)
        delta = ldelta
    return closure


def owl_boolean_class_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Naive-fixpoint twin — independent algorithm: every boolean rule
    applied against the FULL set each round (no deltas, no arity
    tables), alternated with the linear twin, until nothing new."""
    ax = boolean_class_axioms(list(ontology))
    seed = set(facts) | {
        (e, type_predicate, expr)
        for expr, members in ax["oneOf"].items()
        for e in members
    }
    out = rdfs_entailment_python_twin(
        sorted(seed), list(ontology), type_predicate
    )
    while True:
        new: set[tuple[str, str, str]] = set()
        typed: dict[str, set[str]] = {}
        for s, p, o in out:
            if p == type_predicate:
                typed.setdefault(s, set()).add(o)
        for expr, members in ax["unionOf"].items():
            ms = set(members)
            new |= {
                (s, type_predicate, expr)
                for s, cs in typed.items()
                if cs & ms
            }
        for expr, members in ax["intersectionOf"].items():
            ms = set(members)
            for s, cs in typed.items():
                if expr in cs:
                    new |= {(s, type_predicate, m) for m in ms}
                if ms <= cs:
                    new.add((s, type_predicate, expr))
        grown = rdfs_entailment_python_twin(
            sorted(out | new), list(ontology), type_predicate
        )
        if grown == out:
            return out
        out = grown
