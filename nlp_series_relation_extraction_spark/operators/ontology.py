"""RDFS entailment materialization (rules rdfs2/rdfs3/rdfs7/rdfs9) over a
large fact table.

The ontology — ``rdfs:subClassOf`` / ``rdfs:subPropertyOf`` /
``rdfs:domain`` / ``rdfs:range`` statements — is SCHEMA-sized metadata
(thousands of rows even for the largest public KGs), so its transitive
closures are computed driver-side from a bounded collect (same contract
as tokenizer vocabularies and ANN codebooks: model/schema artifacts may
visit the driver, data never does) and shipped as broadcast join tables.

The FACT table is touched exactly once, all map-side:

1. rdfs7  — broadcast-join the subPropertyOf closure to generalize every
   non-type fact ``(s, p, o)`` to ``(s, q, o)`` for each superproperty q.
2. rdfs2/3 — broadcast-join domain/range declarations against the
   GENERALIZED facts (so a domain declared on a superproperty fires for
   facts asserted with a subproperty, per the W3C rule order) to derive
   ``(s, type, C)`` / ``(o, type, C)``.
3. rdfs9  — broadcast-join the subClassOf closure to expand every
   asserted or derived type up the class hierarchy.
4. One final ``distinct`` dedups the materialization — the ONLY shuffle
   in the plan. At 100 TB this is a single scan, map-side fan-out
   bounded by the closure depth, and one exchange on the output key.

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


def _pairs_df(spark, pairs: list[tuple[str, str]], c1: str, c2: str):
    return spark.createDataFrame(pairs, f"{c1} string, {c2} string") \
        if pairs else spark.createDataFrame([], f"{c1} string, {c2} string")


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
    spark = facts.sparkSession
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
    subp_cl = transitive_closure(by_kind.get("subPropertyOf", []))
    subc_cl = transitive_closure(by_kind.get("subClassOf", []))

    nt = facts.where(F.col("predicate") != type_predicate).select(
        "subj", "predicate", "obj"
    )
    # rdfs7: original facts pass through; each closure pair fans a fact
    # out to its superproperty. Broadcast: the closure is driver-built.
    pc = F.broadcast(_pairs_df(spark, subp_cl, "p_from", "p_to"))
    g = nt.unionByName(
        nt.join(pc, nt.predicate == pc.p_from).select(
            "subj", F.col("p_to").alias("predicate"), "obj"
        )
    )
    # rdfs2 / rdfs3 over the GENERALIZED facts: a domain/range declared
    # on a superproperty types subjects/objects of subproperty facts.
    dom = F.broadcast(_pairs_df(spark, by_kind.get("domain", []), "d_p", "d_c"))
    rng = F.broadcast(_pairs_df(spark, by_kind.get("range", []), "r_p", "r_c"))
    t_dom = g.join(dom, g.predicate == dom.d_p).select(
        F.col("subj").alias("entity"), F.col("d_c").alias("cls")
    )
    t_rng = g.join(rng, g.predicate == rng.r_p).select(
        F.col("obj").alias("entity"), F.col("r_c").alias("cls")
    )
    t_asserted = facts.where(F.col("predicate") == type_predicate).select(
        F.col("subj").alias("entity"), F.col("obj").alias("cls")
    )
    traw = t_asserted.unionByName(t_dom).unionByName(t_rng)
    # rdfs9: expand every type up the class hierarchy.
    cc = F.broadcast(_pairs_df(spark, subc_cl, "c_from", "c_to"))
    tfull = traw.unionByName(
        traw.join(cc, traw.cls == cc.c_from).select(
            "entity", F.col("c_to").alias("cls")
        )
    )
    return (
        g.unionByName(
            tfull.select(
                F.col("entity").alias("subj"),
                F.lit(type_predicate).alias("predicate"),
                F.col("cls").alias("obj"),
            )
        )
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
