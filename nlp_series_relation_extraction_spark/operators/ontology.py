"""RDFS entailment materialization (rules rdfs2/rdfs3/rdfs7/rdfs9) over a
large fact table.

The ontology — ``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` /
``rdfs:domain`` / ``rdfs:range`` statements — is SCHEMA-sized metadata
(thousands of rows even for the largest public KGs), so its transitive
closures are computed driver-side from a bounded collect (same contract
as tokenizer vocabularies and ANN codebooks: model/schema artifacts may
visit the driver, data never does).

The four rules are then COMPILED into per-predicate / per-class lookup
tables embedded as ``map<string, array<string>>`` literal columns:

- ``gen_preds[p]``  — strict superproperties of p (rdfs7);
- ``subj_types[p]`` — class-closure of the domains of p and all its
  superproperties (rdfs2 composed with rdfs9, so a domain declared on a
  superproperty fires for facts asserted with a subproperty, per the
  W3C rule order);
- ``obj_types[p]``  — same for ranges (rdfs3 ∘ rdfs9);
- ``type_exp[c]``   — strict superclasses of c (rdfs9).

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
    ``{subClassOf, subPropertyOf, domain, range}``; must stay under
    ``max_ontology_rows`` (it is schema, not data).

    Returns the distinct union of the input facts and every triple the
    four RDFS rules entail, same three columns.
    """
    onto = ontology.limit(max_ontology_rows + 1).collect()
    if len(onto) > max_ontology_rows:
        raise ValueError(
            f"ontology exceeds {max_ontology_rows} rows - it should be "
            "schema-sized metadata; a table this large is data and "
            "belongs in the facts input"
        )
    by_kind: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for r in onto:
        by_kind[r[1]].append((r[0], r[2]))
    subp = dict_of_sets(transitive_closure(by_kind.get("subPropertyOf", [])))
    subc = dict_of_sets(transitive_closure(by_kind.get("subClassOf", [])))
    dom = dict_of_sets(by_kind.get("domain", []))
    rng = dict_of_sets(by_kind.get("range", []))

    # Compose the four rules into three per-PREDICATE lookup tables and
    # one per-CLASS table, all driver-side, so the big table is scanned
    # ONCE (a union-of-broadcast-joins tree would rescan it per rule):
    #   gen_preds[p]  = strict superproperties of p             (rdfs7)
    #   subj_types[p] = class-closure(domain of p and supers)   (rdfs2+9)
    #   obj_types[p]  = class-closure(range of p and supers)    (rdfs3+9)
    #   type_exp[c]   = strict superclasses of c                (rdfs9)
    def _cls_full(cs: set[str]) -> list[str]:
        out = set(cs)
        for c in cs:
            out |= subc.get(c, set())
        return sorted(out)

    props = set(subp) | set(dom) | set(rng)
    gen_preds = {p: sorted(subp.get(p, set()) - {p}) for p in props}
    subj_types = {}
    obj_types = {}
    for p in props:
        gen = {p} | subp.get(p, set())
        subj_types[p] = _cls_full(set().union(*(dom.get(q, set()) for q in gen)))
        obj_types[p] = _cls_full(set().union(*(rng.get(q, set()) for q in gen)))
    m_gen = _map_of_lists({k: v for k, v in gen_preds.items() if v})
    m_subj = _map_of_lists({k: v for k, v in subj_types.items() if v})
    m_obj = _map_of_lists({k: v for k, v in obj_types.items() if v})
    m_cls = _map_of_lists({k: sorted(v - {k}) for k, v in subc.items() if v - {k}})

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
            F.transform(_lookup(m_subj, p), lambda c: trip(s, tp, c)),
            F.transform(_lookup(m_obj, p), lambda c: trip(o, tp, c)),
        )
    )
    return (
        facts.select(F.explode(fanout).alias("t"))
        .select("t.subj", "t.predicate", "t.obj")
        .distinct()
    )


def rdfs_entailment_python_twin(
    facts: list[tuple[str, str, str]],
    ontology: list[tuple[str, str, str]],
    type_predicate: str = TYPE_PREDICATE,
) -> set[tuple[str, str, str]]:
    """Pure-python twin of :func:`rdfs_entailment` (identical recursion,
    for exactness tests)."""
    by_kind: dict[str, list[tuple[str, str]]] = defaultdict(list)
    for s, p, o in ontology:
        by_kind[p].append((s, o))
    subp = dict_of_sets(transitive_closure(by_kind.get("subPropertyOf", [])))
    subc = dict_of_sets(transitive_closure(by_kind.get("subClassOf", [])))
    dom = dict_of_sets(by_kind.get("domain", []))
    rng = dict_of_sets(by_kind.get("range", []))
    g = set()
    types = set()
    for s, p, o in facts:
        if p == type_predicate:
            types.add((s, o))
            continue
        g.add((s, p, o))
        for q in subp.get(p, ()):
            g.add((s, q, o))
    for s, p, o in list(g):
        for c in dom.get(p, ()):
            types.add((s, c))
        for c in rng.get(p, ()):
            types.add((o, c))
    for e, c in list(types):
        for d in subc.get(c, ()):
            types.add((e, d))
    return g | {(e, type_predicate, c) for e, c in types}


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
