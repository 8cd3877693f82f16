"""RDFS + linear-OWL-RL entailment materialization (rules rdfs2/rdfs3/
rdfs7/rdfs9 plus prp-inv/prp-symp) over a large fact table.

The ontology — ``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` /
``rdfs:domain`` / ``rdfs:range`` statements — is SCHEMA-sized metadata
(thousands of rows even for the largest public KGs), so its transitive
closures are computed driver-side from a bounded collect (same contract
as tokenizer vocabularies and ANN codebooks: model/schema artifacts may
visit the driver, data never does).

The four rules are then COMPILED into per-predicate / per-class lookup
tables embedded as ``map<string, array<string>>`` literal columns:

- ``fwd[p]``  — predicates q with a same-orientation derivation from p
  (rdfs7 chains, possibly through an EVEN number of inverse flips);
- ``rev[p]``  — predicates q derived with flipped orientation (an odd
  number of prp-inv / prp-symp flips): fact (s,p,o) emits (o,q,s);
- ``subj_types[p]`` / ``obj_types[p]`` — class-closure of the domains/
  ranges contributed by EVERY derived orientation (rdfs2/3 composed
  with rdfs9 and the flips, so a domain declared on a superproperty —
  or on the inverse's superproperty — fires for the asserted fact);
- ``cls[c]``  — strict superclasses of c (rdfs9).

The FACT table is scanned exactly ONCE: each row ``explode``s its own
entailments via ``transform`` over the map lookups — the executed plan
contains no join at all, and the final ``distinct`` is the plan's only
exchange. At 100 TB this is a single scan, map-side fan-out bounded by
the closure depth, and one shuffle on the output key (droppable when
the result feeds the existing dedup/merge stages).

The reference repo has no ontology layer — this belongs to the
beyond-reference KG-construction surface (canonicalized triples ->
typed, schema-closed triples). Semantics follow the public W3C RDF
Schema 1.1 entailment rules.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, functions as F

TYPE_PREDICATE = "type"


def transitive_closure(pairs: list[tuple[str, str]]) -> list[tuple[str, str]]:
    """Strict transitive closure of a small relation, cycle-safe
    (BFS from every mentioned node; a node inside a cycle reaches
    itself, which the entailment union/distinct tolerates)."""
    adj: dict[str, set[str]] = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
    out: list[tuple[str, str]] = []
    for n in sorted(adj):
        seen: set[str] = set()
        stack = list(adj[n])
        while stack:
            c = stack.pop()
            if c in seen:
                continue
            seen.add(c)
            stack.extend(adj.get(c, ()))
        out.extend((n, m) for m in sorted(seen))
    return out


def _map_of_lists(d: dict[str, list[str]]):
    """A ``map<string, array<string>>`` literal column from a driver-side
    dict. Returns None for an empty dict (lookup sites substitute an
    empty array)."""
    if not d:
        return None
    keys = sorted(d)
    return F.map_from_arrays(
        F.array(*[F.lit(k) for k in keys]),
        F.array(*[F.array(*[F.lit(v) for v in d[k]]) for k in keys]),
    )


def _lookup(m, key_col):
    """``m[key]`` with a missing-key/empty-map default of array<string>()."""
    empty = F.array().cast("array<string>")
    if m is None:
        return empty
    return F.coalesce(m[key_col], empty)


def rdfs_entailment(
    facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """Materialize the RDFS closure of ``facts`` under ``ontology``.

    ``facts``: columns ``(subj string, predicate string, obj string)``;
    rows with ``predicate == type_predicate`` are asserted class
    memberships (``obj`` is a class name), every other row a plain
    triple. ``ontology``: columns ``(s, p, o)`` with ``p`` in
    ``{subClassOf, subPropertyOf, domain, range, inverseOf,
    symmetricProperty}`` (the last two are the linear OWL-RL property
    rules prp-inv / prp-symp; for symmetricProperty the object column
    is ignored); must stay under ``max_ontology_rows`` (it is schema,
    not data).

    Returns the distinct union of the input facts and every triple the
    compiled rule set entails, same three columns. owl:TransitiveProperty
    is deliberately NOT here: its rule has two fact premises, so it
    needs recursion over the data — that is :func:`graph.forward_chain`
    / :func:`graph.match_path`'s job.
    """
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    comp = _compile_rules([tuple(r) for r in onto])

    m_gen = _map_of_lists(comp["fwd"])
    m_rev = _map_of_lists(comp["rev"])
    m_subj = _map_of_lists(comp["subj_types"])
    m_obj = _map_of_lists(comp["obj_types"])
    m_cls = _map_of_lists(comp["cls"])

    s, p, o = F.col("subj"), F.col("predicate"), F.col("obj")
    tp = F.lit(type_predicate)
    trip = lambda su, pr, ob: F.struct(  # noqa: E731
        su.alias("subj"), pr.alias("predicate"), ob.alias("obj")
    )
    fanout = F.when(
        p == tp,
        F.concat(
            F.array(trip(s, tp, o)),
            F.transform(_lookup(m_cls, o), lambda c: trip(s, tp, c)),
        ),
    ).otherwise(
        F.concat(
            F.array(trip(s, p, o)),
            F.transform(_lookup(m_gen, p), lambda q: trip(s, q, o)),
            F.transform(_lookup(m_rev, p), lambda q: trip(o, q, s)),
            F.transform(_lookup(m_subj, p), lambda c: trip(s, tp, c)),
            F.transform(_lookup(m_obj, p), lambda c: trip(o, tp, c)),
        )
    )
    return (
        facts.select(F.explode(fanout).alias("t"))
        .select("t.subj", "t.predicate", "t.obj")
        .distinct()
    )


def _compile_rules(onto: list[tuple[str, str, str]]) -> dict:
    """Driver-side rule compiler shared by :func:`rdfs_entailment` and
    its python twin: compose rdfs2/3/7/9 plus the LINEAR OWL-RL
    property rules prp-inv (``inverseOf``) and prp-symp
    (``symmetricProperty``) into per-predicate lookup tables.

    The derivation space for a fact with predicate p is a fixpoint over
    (orientation, predicate) states: ``fwd q`` emits (s, q, o), ``rev
    q`` emits (o, q, s); subPropertyOf preserves orientation, inverseOf
    flips it (and symmetricProperty is self-inverse). The fixpoint is
    over the SCHEMA (≤ 2·|props| states), never the data — the output
    maps keep the fact-table plan zero-join, and every added rule stays
    one-fact-premise, so incremental maintenance stays exact."""
    by_kind: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for s, k, o in onto:
        by_kind[k].append((s, o))
    subp = dict_of_sets(by_kind.get("subPropertyOf", []))
    subc = dict_of_sets(transitive_closure(by_kind.get("subClassOf", [])))
    dom = dict_of_sets(by_kind.get("domain", []))
    rng = dict_of_sets(by_kind.get("range", []))
    inv = dict_of_sets(by_kind.get("inverseOf", []))
    for a, b in by_kind.get("inverseOf", []):  # inverseOf is symmetric
        inv[b].add(a)
    for p_sym, _ in by_kind.get("symmetricProperty", []):
        inv[p_sym].add(p_sym)  # prp-symp == self-inverse

    def _cls_full(cs: set[str]) -> list[str]:
        out = set(cs)
        for c in cs:
            out |= subc.get(c, set())
        return sorted(out)

    props = set(subp) | set(dom) | set(rng) | set(inv)
    fwd: dict[str, list[str]] = {}
    rev: dict[str, list[str]] = {}
    subj_types: dict[str, list[str]] = {}
    obj_types: dict[str, list[str]] = {}
    for p in props:
        states = {("f", p)}
        stack = [("f", p)]
        while stack:
            orient, q = stack.pop()
            flip = "r" if orient == "f" else "f"
            for r in subp.get(q, ()):  # rdfs7 preserves orientation
                if (orient, r) not in states:
                    states.add((orient, r))
                    stack.append((orient, r))
            for r in inv.get(q, ()):  # prp-inv / prp-symp flip it
                if (flip, r) not in states:
                    states.add((flip, r))
                    stack.append((flip, r))
        fwd[p] = sorted(q for ori, q in states if ori == "f" and q != p)
        rev[p] = sorted(q for ori, q in states if ori == "r")
        # rdfs2/3 over every derived orientation: a fwd q types s by
        # domain(q) / o by range(q); a rev q types o by domain(q) / s
        # by range(q) (the derived fact's subject IS the original obj)
        st = set().union(
            *(dom.get(q, set()) for ori, q in states if ori == "f"),
            *(rng.get(q, set()) for ori, q in states if ori == "r"),
        )
        ot = set().union(
            *(rng.get(q, set()) for ori, q in states if ori == "f"),
            *(dom.get(q, set()) for ori, q in states if ori == "r"),
        )
        subj_types[p] = _cls_full(st)
        obj_types[p] = _cls_full(ot)
    return {
        "fwd": {k: v for k, v in fwd.items() if v},
        "rev": {k: v for k, v in rev.items() if v},
        "subj_types": {k: v for k, v in subj_types.items() if v},
        "obj_types": {k: v for k, v in obj_types.items() if v},
        "cls": {
            k: sorted(v - {k}) for k, v in subc.items() if v - {k}
        },
    }


def rdfs_entailment_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Pure-python twin of :func:`rdfs_entailment`: the SAME compiled
    maps (shared :func:`_compile_rules`), applied per fact row exactly
    as the Spark fanout does — for exactness tests."""
    comp = _compile_rules(list(ontology))
    out: set[tuple[str, str, str]] = set()
    for s, p, o in facts:
        out.add((s, p, o))
        if p == type_predicate:
            for c in comp["cls"].get(o, ()):
                out.add((s, type_predicate, c))
            continue
        for q in comp["fwd"].get(p, ()):
            out.add((s, q, o))
        for q in comp["rev"].get(p, ()):
            out.add((o, q, s))
        for c in comp["subj_types"].get(p, ()):
            out.add((s, type_predicate, c))
        for c in comp["obj_types"].get(p, ()):
            out.add((o, type_predicate, c))
    return out


def dict_of_sets(pairs: list[tuple[str, str]]) -> dict[str, set[str]]:
    d: dict[str, set[str]] = defaultdict(set)
    for a, b in pairs:
        d[a].add(b)
    return d


def rdfs_entailment_increment(
    existing: DataFrame,
    new_facts: DataFrame,
    ontology: DataFrame,
    type_predicate: str = TYPE_PREDICATE,
    max_ontology_rows: int = 100_000,
) -> DataFrame:
    """The entailment DELTA a new batch of facts adds to an existing
    materialized closure — the streaming-maintenance form of
    :func:`rdfs_entailment`.

    This is EXACT, not an approximation, because the RDFS rule set is
    LINEAR in the fact table: every rule (rdfs2/3/7/9) has exactly one
    fact premise — all other premises are ontology (schema) rows — so
    ``entail(A ∪ B) = entail(A) ∪ entail(B)`` and maintaining the
    closure under inserts needs no semi-naive recursion over the
    existing data. (Contrast rule sets with two fact premises, e.g.
    transitive properties, where an increment must join against the
    full closure — that remains :func:`graph.forward_chain`'s job.)

    Plan shape: one single-scan entailment pass over the INCREMENT
    (zero joins, same compiled-map plan as the batch operator) and one
    anti-join against the existing closure keyed on the output triple —
    per-batch cost tracks the increment, never the table. The result is
    disjoint from ``existing`` by construction; appending it (e.g.
    through the streaming KG sink's bucket-pruned upsert) reproduces
    the batch closure exactly, which the stream==batch test pins."""
    inc = rdfs_entailment(
        new_facts, ontology, type_predicate, max_ontology_rows
    )
    return inc.join(
        existing.select("subj", "predicate", "obj"),
        ["subj", "predicate", "obj"],
        "left_anti",
    )
