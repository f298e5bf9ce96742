"""PRSC reversion: RDF graph -> property graph (distributed).

Re-expresses /root/reference/src/prsc/prsc-reversion.ts as a Spark
dataflow over the canonical term-string triple table:

* κ-characterization of DATA triples (characterizeTriple,
  src/prsc/index.ts:61-73) = two regexp_replace passes over the
  serialized triple (literals -> "Literal"^^prec:valueOf placeholder,
  blank nodes -> "BlankNode"^^prec:_placeholder placeholder);
* rule identification (findTypeOfElements, prsc-reversion.ts:156-215)
  = broadcast join on the κ string + candidate vote per blank node;
* triple->element association (associateTriplesWithElements, :224-266)
  = explode blank nodes + per-triple routing (1 bnode -> it; one
  edge-bnode -> the edge; two node-bnodes -> edge-unique bucket);
* value extraction (Accessor, :335-484) = per-(rule, template-triple)
  regexes generated driver-side: constant parts of the template are
  escaped, placeholder positions become capture groups. Extraction is
  regexp_extract — no parsing UDF, fully codegen;
* edge-unique folding (extractEdgeUniques, :537-630) = groupBy
  (src, dst, rule) + map_from_entries.

Strict-mode violations (the reference throws) are collected in an
errors DataFrame; `strict=True` raises ReversionError if any.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..contexts.model import (
    PRSCCatalog,
    PVAR_DESTINATION,
    PVAR_SOURCE,
    PREC_VALUE_OF,
    SELF_TERMS,
    characterize_triple,
)
from ..rdf.terms import BlankNode, Literal, Quad, Term

#: regexes over canonical term strings (Java regex, used JVM-side)
LITERAL_RE = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>|@[A-Za-z0-9\-]+)?'
BNODE_RE = r"_:[A-Za-z0-9_.\-]+"

KAPPA_LITERAL = '"Literal"^^<http://bruy.at/prec#valueOf>'
KAPPA_BNODE = '"BlankNode"^^<http://bruy.at/prec#_placeholder>'


class ReversionError(Exception):
    pass


def kappa_col(full: Column) -> Column:
    """κ of a serialized data triple (literals first so bnode-looking
    text inside literal lexical forms is not rewritten; the placeholder
    strings contain no regex-replacement specials)."""
    col = F.regexp_replace(full, LITERAL_RE, KAPPA_LITERAL)
    col = F.regexp_replace(col, BNODE_RE, KAPPA_BNODE)
    return col


def serialize_triple_py(q: Quad) -> str:
    return f"{q.s.nt()} {q.p.nt()} {q.o.nt()}"


@dataclass
class TemplateAccessors:
    rule_idx: int
    kappa: str
    regex: str
    groups: list[tuple[int, str]]  # (capture group index, info kind)
    #: info kinds: "__src__", "__dst__", or a property key


def _template_regex(template: Quad) -> tuple[str, list[tuple[int, str]]]:
    """Template triple -> (anchored regex, capture groups)."""
    parts: list[str] = ["^"]
    groups: list[tuple[int, str]] = []
    counter = [0]

    def emit(term: Term):
        if term in SELF_TERMS or isinstance(term, BlankNode):
            counter[0] += 1
            parts.append(f"({BNODE_RE})")
        elif term == PVAR_SOURCE:
            counter[0] += 1
            groups.append((counter[0], "__src__"))
            parts.append(f"({BNODE_RE})")
        elif term == PVAR_DESTINATION:
            counter[0] += 1
            groups.append((counter[0], "__dst__"))
            parts.append(f"({BNODE_RE})")
        elif isinstance(term, Literal) and term.datatype == PREC_VALUE_OF:
            counter[0] += 1
            groups.append((counter[0], term.value))
            parts.append(f"({LITERAL_RE})")
        elif isinstance(term, Quad):
            parts.append(_re.escape("<<") + " ")
            emit(term.s)
            parts.append(" ")
            emit(term.p)
            parts.append(" ")
            emit(term.o)
            parts.append(" " + _re.escape(">>"))
        else:
            parts.append(_re.escape(term.nt()))

    emit(template.s)
    parts.append(" ")
    emit(template.p)
    parts.append(" ")
    emit(template.o)
    parts.append("$")
    return "".join(parts), groups


def _signature_map(catalog: PRSCCatalog):
    """kappa-string -> (rule_idx, kind), excluding edge-unique rules
    (findTypeOfElements, prsc-reversion.ts:157-170)."""
    sigs = catalog.signatures()
    idx_of = {id(r): i for i, r in enumerate(catalog.rules)}
    out: dict[str, tuple[int, str]] = {}
    for s in sigs:
        if s.kind == "edge-unique":
            continue
        rule = next(r for r in catalog.rules if r.identity == s.rule_identity)
        kappa = serialize_triple_py(characterize_triple(s.signature))
        if kappa in out:
            raise ReversionError(f"two rules share the signature {kappa}")
        out[kappa] = (idx_of[id(rule)], rule.kind)
    return out, sigs


def _accessor_rows(catalog: PRSCCatalog) -> list[TemplateAccessors]:
    """Unique-kappa template triples -> accessors (computeAccessibleProperties)."""
    rows = []
    for idx, rule in enumerate(catalog.rules):
        kappa_count: dict[str, int] = {}
        for tq in rule.template:
            k = serialize_triple_py(characterize_triple(tq))
            kappa_count[k] = kappa_count.get(k, 0) + 1
        for tq in rule.template:
            k = serialize_triple_py(characterize_triple(tq))
            if kappa_count[k] != 1:
                continue
            regex, groups = _template_regex(tq)
            if groups:
                rows.append(TemplateAccessors(idx, k, regex, groups))
    return rows


def revert_prsc(
    spark: SparkSession,
    triples: DataFrame,
    catalog: PRSCCatalog,
    strict: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Revert an RDF graph produced by a well-behaved PRSC context.

    Returns (nodes, edges):
      nodes: (node_id, rule_idx, labels, properties map<string,string>)
      edges: (edge_id, src_id, dst_id, rule_idx, labels, properties)
    """
    sig_map, sigs = _signature_map(catalog)
    rules = catalog.rules

    t = triples.select(
        F.concat_ws(" ", "s", "p", "o").alias("full")
    ).dropDuplicates(["full"])
    t = t.withColumn("kappa", kappa_col(F.col("full"))).cache()

    sig_rows = [(k, ri, kind) for k, (ri, kind) in sig_map.items()]
    sig_df = spark.createDataFrame(
        sig_rows or [("", -1, "")], "kappa STRING, rule_idx INT, kind STRING"
    )

    # --- element typing: candidate vote --------------------------------
    matched = t.join(F.broadcast(sig_df), "kappa", "inner")
    cand = matched.select(
        "rule_idx",
        "kind",
        F.explode(F.regexp_extract_all("full", F.lit(BNODE_RE), F.lit(0))).alias(
            "element"
        ),
    ).distinct()
    votes = cand.groupBy("element").agg(
        F.collect_set(F.when(F.col("kind") == "node", F.col("rule_idx"))).alias("nr"),
        F.collect_set(F.when(F.col("kind") == "edge", F.col("rule_idx"))).alias("er"),
    )
    # every blank node of the graph must receive a type (findElements +
    # "no candidate" error, prsc-reversion.ts:135-145,200-203)
    all_elements = (
        t.select(
            F.explode(F.regexp_extract_all("full", F.lit(BNODE_RE), F.lit(0))).alias(
                "element"
            )
        )
        .distinct()
    )
    typed = all_elements.join(votes, "element", "left").select(
        "element",
        F.when(F.size("nr") == 1, F.element_at("nr", 1))
        .when((F.size("nr") == 0) & (F.size("er") == 1), F.element_at("er", 1))
        .alias("rule_idx"),
    )
    if strict:
        n_untyped = typed.filter(F.col("rule_idx").isNull()).count()
        if n_untyped:
            raise ReversionError(f"{n_untyped} elements with ambiguous/no type")
    typed = typed.filter(F.col("rule_idx").isNotNull())
    kind_rows = [(i, r.kind) for i, r in enumerate(rules)]
    kinds_df = spark.createDataFrame(kind_rows, "rule_idx INT, kind STRING")
    typed = typed.join(F.broadcast(kinds_df), "rule_idx").cache()

    # --- associate triples with elements -------------------------------
    tb = t.select(
        "full",
        "kappa",
        F.regexp_extract_all("full", F.lit(BNODE_RE), F.lit(0)).alias("bns"),
    ).filter(F.size("bns") > 0)
    exploded = tb.select("full", "kappa", F.explode(F.array_distinct("bns")).alias("element"))
    ex_typed = exploded.join(typed, "element", "left")
    routed = ex_typed.groupBy("full", "kappa").agg(
        F.count("*").alias("n_bns"),
        F.collect_list(F.when(F.col("kind") == "edge", F.col("element"))).alias("edge_els"),
        F.collect_list(F.when(F.col("kind") == "node", F.col("element"))).alias("node_els"),
        F.first("element").alias("any_el"),
    )
    assigned = routed.withColumn(
        "owner",
        F.when(F.col("n_bns") == 1, F.col("any_el")).when(
            F.size("edge_els") == 1, F.element_at("edge_els", 1)
        ),
    )
    edge_unique_quads = assigned.filter(
        F.col("owner").isNull() & (F.size("node_els") == 2) & (F.size("edge_els") == 0)
    ).select("full", "kappa")
    if strict:
        bad = assigned.filter(
            F.col("owner").isNull()
            & ~((F.size("node_els") == 2) & (F.size("edge_els") == 0))
        ).count()
        if bad:
            raise ReversionError(f"{bad} triples with invalid blank-node shape")
    owned = assigned.filter(F.col("owner").isNotNull()).select(
        F.col("owner").alias("element"), "full", "kappa"
    )

    # --- value extraction ----------------------------------------------
    owned = owned.join(typed.select("element", "rule_idx"), "element")
    acc_rows = _accessor_rows(catalog)
    extracted = _extract_values(owned, acc_rows)

    # --- assemble elements ----------------------------------------------
    per_el = extracted.groupBy("element", "rule_idx").agg(
        F.map_from_entries(
            F.array_distinct(
                F.collect_list(
                    F.when(
                        ~F.col("info").isin("__src__", "__dst__"),
                        F.struct(F.col("info"), F.col("value")),
                    )
                )
            )
        ).alias("properties"),
        F.max(F.when(F.col("info") == "__src__", F.col("value"))).alias("src_id"),
        F.max(F.when(F.col("info") == "__dst__", F.col("value"))).alias("dst_id"),
    )
    # elements whose rule has no value-bearing template triples never
    # appear in `extracted`; restore them with empty properties
    empty_props = F.map_from_arrays(
        F.array().cast("array<string>"), F.array().cast("array<string>")
    )
    missing = typed.join(per_el.select("element"), "element", "leftanti").select(
        "element",
        "rule_idx",
        empty_props.alias("properties"),
        F.lit(None).cast("string").alias("src_id"),
        F.lit(None).cast("string").alias("dst_id"),
    )
    per_el = per_el.unionByName(missing)

    meta_rows = [
        (i, r.kind, sorted(r.labels), sorted(r.properties)) for i, r in enumerate(rules)
    ]
    meta_df = spark.createDataFrame(
        meta_rows,
        "rule_idx INT, kind STRING, labels ARRAY<STRING>, rule_props ARRAY<STRING>",
    )
    per_el = per_el.join(F.broadcast(meta_df), "rule_idx")

    if strict:
        bad_props = per_el.filter(
            F.sort_array(F.map_keys("properties")) != F.col("rule_props")
        ).count()
        if bad_props:
            raise ReversionError(f"{bad_props} elements missing properties")
        bad_edges = per_el.filter(
            (F.col("kind") == "edge")
            & (F.col("src_id").isNull() | F.col("dst_id").isNull())
        ).count()
        if bad_edges:
            raise ReversionError(f"{bad_edges} edges without source/destination")

    nodes = per_el.filter(F.col("kind") == "node").select(
        F.col("element").alias("node_id"), "rule_idx", "labels", "properties"
    )
    edges = per_el.filter(F.col("kind") == "edge").select(
        F.col("element").alias("edge_id"),
        "src_id",
        "dst_id",
        "rule_idx",
        "labels",
        "properties",
    )

    # --- edge-unique folding ---------------------------------------------
    eu_edges = _extract_edge_uniques(spark, edge_unique_quads, catalog, sigs, strict)
    if eu_edges is not None:
        edges = edges.unionByName(eu_edges)

    return nodes, edges


def _extract_values(owned: DataFrame, acc_rows: list[TemplateAccessors]) -> DataFrame:
    """Union of per-(rule, template, group) extraction branches."""
    parts = []
    for acc in acc_rows:
        base = owned.filter(
            (F.col("rule_idx") == acc.rule_idx) & (F.col("kappa") == F.lit(acc.kappa))
        )
        for gi, info in acc.groups:
            parts.append(
                base.select(
                    "element",
                    "rule_idx",
                    F.lit(info).alias("info"),
                    F.regexp_extract("full", acc.regex, gi).alias("value"),
                )
            )
    # keep rows for elements with no extractable values too
    anchor = owned.select(
        "element", "rule_idx", F.lit(None).cast("string").alias("info"),
        F.lit(None).cast("string").alias("value"),
    ).distinct()
    out = anchor
    for p in parts:
        out = out.unionByName(p)
    return out.filter(F.col("info").isNotNull() | F.col("value").isNull())


def _extract_edge_uniques(spark, edge_unique_quads, catalog, sigs, strict):
    """extractEdgeUniques (prsc-reversion.ts:537-630)."""
    eu_rules = {s.rule_identity for s in sigs if s.kind == "edge-unique"}
    if not eu_rules:
        if strict and not edge_unique_quads.isEmpty():
            raise ReversionError("edge-unique-shaped triples but no edge-unique rule")
        return None

    gens: list[TemplateAccessors] = []
    rule_idx_of = {r.identity: i for i, r in enumerate(catalog.rules)}
    for rule in catalog.rules:
        if rule.identity not in eu_rules:
            continue
        kappa_count: dict[str, int] = {}
        for tq in rule.template:
            k = serialize_triple_py(characterize_triple(tq))
            kappa_count[k] = kappa_count.get(k, 0) + 1
        for tq in rule.template:
            k = serialize_triple_py(characterize_triple(tq))
            if kappa_count[k] != 1:
                continue  # unusable (non-unique within rule)
            regex, groups = _template_regex(tq)
            gens.append(TemplateAccessors(rule_idx_of[rule.identity], k, regex, groups))

    parts = []
    for gen in gens:
        base = edge_unique_quads.filter(F.col("kappa") == F.lit(gen.kappa))
        cols = [F.lit(gen.rule_idx).alias("rule_idx")]
        src = next((gi for gi, info in gen.groups if info == "__src__"), None)
        dst = next((gi for gi, info in gen.groups if info == "__dst__"), None)
        if src is None or dst is None:
            continue
        cols.append(F.regexp_extract("full", gen.regex, src).alias("src_id"))
        cols.append(F.regexp_extract("full", gen.regex, dst).alias("dst_id"))
        props = [
            F.struct(F.lit(info).alias("info"),
                     F.regexp_extract("full", gen.regex, gi).alias("value"))
            for gi, info in gen.groups
            if info not in ("__src__", "__dst__")
        ]
        cols.append(F.array(*props).alias("props") if props else
                    F.array().cast("array<struct<info:string,value:string>>").alias("props"))
        parts.append(base.select(*cols))
    if not parts:
        return None
    all_eu = parts[0]
    for p in parts[1:]:
        all_eu = all_eu.unionByName(p)

    folded = all_eu.groupBy("rule_idx", "src_id", "dst_id").agg(
        F.map_from_entries(
            F.array_distinct(F.flatten(F.collect_list("props")))
        ).alias("properties")
    )
    meta_rows = [
        (i, sorted(r.labels), sorted(r.properties)) for i, r in enumerate(catalog.rules)
    ]
    meta_df = spark.createDataFrame(
        meta_rows, "rule_idx INT, labels ARRAY<STRING>, rule_props ARRAY<STRING>"
    )
    folded = folded.join(F.broadcast(meta_df), "rule_idx")
    if strict:
        bad = folded.filter(
            F.sort_array(F.map_keys("properties")) != F.col("rule_props")
        ).count()
        if bad:
            raise ReversionError("an edge-unique edge does not have all its properties")
    return folded.select(
        F.concat(F.lit("_:eu_"),
                 F.col("rule_idx").cast("string"), F.lit("_"),
                 F.regexp_replace("src_id", "^_:", ""), F.lit("_"),
                 F.regexp_replace("dst_id", "^_:", "")).alias("edge_id"),
        "src_id",
        "dst_id",
        "rule_idx",
        "labels",
        "properties",
    )
