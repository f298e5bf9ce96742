"""Distributed PREC-C context application over a PREC-0 quad DataFrame.

The reference applies PREC-C with sequential destructive rewrites over
an in-memory store: mark every element, refine marks rule-by-rule in
priority order (findFilterReplace), then per-mark template application
(/root/reference/src/prec-c/index.ts:46-70, rules-for-edges.ts,
rules-for-properties.ts, rules-for-nodelabels.ts).

Here the same semantics run as ONE Spark dataflow per rule domain
(SURVEY.md §2.3 J9 redesign):

* "priority-ordered first-match-wins" becomes a single WHEN-chain over
  precomputed condition flags (labels collected once via joins) — no
  R sequential passes over the data for R rules;
* template instantiation reuses the placeholder-pattern machinery
  (prec_spark.plans.patterns) — chained JVM replace(), no UDFs;
* the reference's "preserved labels" flow (metadata of IRIs still used
  by the produced graph is copied over) becomes a semi-join.

Output = produced(edges) ∪ produced(properties) ∪ produced(node
labels) ∪ preserved-subject quads ∪ pgo:Node typing quads, dedup'd —
exactly ruleBasedProduction's assembly (prec-c/index.ts:46-70), then
the optional provenance strip (removePGO, :115-125).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.patterns import compile_term, placeholder, substitute
from ..rdf.terms import PGO_NS, PREC_NS, RDF_NS, RDFS_NS, Term
from .context import PreccContext, Template, prec, pvar

A = f"<{RDF_NS}type>"
RDF_SUBJECT = f"<{RDF_NS}subject>"
RDF_PREDICATE = f"<{RDF_NS}predicate>"
RDF_OBJECT = f"<{RDF_NS}object>"
RDF_VALUE = f"<{RDF_NS}value>"
RDF_FIRST = f"<{RDF_NS}first>"
RDF_REST = f"<{RDF_NS}rest>"
RDF_NIL = f"<{RDF_NS}nil>"
RDFS_LABEL = f"<{RDFS_NS}label>"
PGO_NODE = f"<{PGO_NS}Node>"
PGO_EDGE = f"<{PGO_NS}Edge>"
PREC_PROP_KEY = f"<{PREC_NS}PropertyKey>"
PREC_PROP_KEY_VALUE = f"<{PREC_NS}PropertyKeyValue>"

#: maximum meta-property nesting depth resolved by deepResolve
_MAX_META_DEPTH = 3

# placeholder names
EDGE_MAP = {
    pvar("edge"): "EDGE",
    pvar("self"): "EDGE",
    pvar("source"): "SRC",
    pvar("destination"): "DST",
    pvar("edgeIRI"): "EDGEIRI",
    pvar("label"): "LABEL",
}
PROP_MAP = {
    pvar("holder"): "HOLDER",
    pvar("propertyKey"): "PROPKEY",
    pvar("label"): "LABEL",
    pvar("propertyNode"): "PROPNODE",
    pvar("self"): "PROPNODE",
    pvar("propertyValue"): "PROPVALUE",
    pvar("individualValue"): "INDIVVALUE",
}
NL_MAP = {
    pvar("node"): "NODE",
    pvar("self"): "NODE",
    pvar("nodeLabelIRI"): "NODELABELIRI",
    pvar("label"): "LABEL",
}


def _compile_tpl(tpl: Template, mapping: dict[Term, str]) -> list[list[str]]:
    return [
        [
            compile_term(q.s, mapping),
            compile_term(q.p, mapping),
            compile_term(q.o, mapping),
        ]
        for q in tpl.quads
    ]


def _tpl_uses(patterns: list[list[str]], name: str) -> bool:
    ph = placeholder(name)
    return any(ph in cell for row in patterns for cell in row)


def _labels_df(q: DataFrame) -> DataFrame:
    """(iri, label) — rdfs:label quads."""
    return q.filter(F.col("p") == RDFS_LABEL).select(
        F.col("s").alias("iri"), F.col("o").alias("label_lit")
    )


def _explode_and_substitute(
    df: DataFrame, bindings: dict[str, Column]
) -> DataFrame:
    ex = df.select(*df.columns, F.explode("template").alias("pattern"))
    # `g` (the winning rule's prec:targetGraph, from the broadcast
    # template catalog) rides along when present
    gcols = [F.col("g")] if "g" in df.columns else []
    return ex.select(
        substitute(F.element_at("pattern", 1), bindings).alias("s"),
        substitute(F.element_at("pattern", 2), bindings).alias("p"),
        substitute(F.element_at("pattern", 3), bindings).alias("o"),
        *gcols,
    )


def _winner_expr(conds: list[Column]) -> Column:
    """First-match-wins WHEN chain; -1 = no rule (use base template)."""
    expr = None
    for i, cond in enumerate(conds):
        expr = F.when(cond, i) if expr is None else expr.when(cond, i)
    return expr.otherwise(F.lit(-1)) if expr is not None else F.lit(-1)


def _contains_term(hay: Column, needle: Column) -> Column:
    """Term containment in a pattern string: term encodings are
    self-delimiting (<iri>, "lit", _:bn followed by non-name chars), so
    substring containment of a full IRI term is exact."""
    return F.instr(hay, needle) > 0


def apply_precc(
    spark: SparkSession, quads: DataFrame, context: PreccContext,
    with_graphs: bool = False,
) -> DataFrame:
    """Apply a PREC-C context to a PREC-0 quads DataFrame (s, p, o).

    With with_graphs=True the output carries a 4th column `g`: each
    produced triple lands in its winning rule's prec:targetGraph (the
    same engine extension the PRSC dialect supports — prsc/apply.py),
    "<>" (default graph) otherwise; preserved provenance quads stay in
    the default graph. Without it, a context that declares target
    graphs is an error rather than a silent flattening.

    The input is materialized behind a plan barrier (localCheckpoint)
    first: the PREC-C stages below reference the quads ~15 times
    (edges/properties/node-labels self-joins + preserved-subject
    semi-joins), and composing each reference with an arbitrarily deep
    upstream lineage (e.g. prec0_quads' ~20-branch union) multiplies
    the Catalyst plan exponentially — a 4 GiB driver OOMs in
    ColumnPruning on a 170-element graph without the barrier. At scale
    the barrier is also the efficient plan: the PREC-0 encoding is
    computed once, not once per downstream self-join.

    The barrier repartitions to spark.sql.shuffle.partitions first: a
    union-of-N-branches otherwise carries N x input partitions through
    the checkpoint, and every downstream stage then launches hundreds
    of concurrent tasks whose sort-page allocations livelock a small
    executor heap (observed on 4 GiB with ~240 inherited partitions).
    """
    if not with_graphs and context.has_target_graphs:
        raise ValueError(
            "context declares prec:targetGraph rules; call "
            "apply_precc(..., with_graphs=True) to receive (s, p, o, g) quads"
        )
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    quads = quads.repartition(n_parts).localCheckpoint(eager=True)
    q = _apply_bnode_mapping(spark, quads, context.blank_node_mapping)
    if context.blank_node_mapping:
        # the mapping rewrite is itself a 5-join pipeline; without a
        # second barrier every downstream reference to q re-executes it
        # (observed: ~75 concurrent broadcast exchanges OOM a 4 GiB
        # heap on a 38k-quad graph)
        q = q.localCheckpoint(eager=True)
    labels = _labels_df(q)

    # node -> collected type-labels (for sourceLabel/destinationLabel and
    # property prec:label conditions via rdf:type)
    type_labels = (
        q.filter(F.col("p") == A)
        .join(labels, F.col("o") == F.col("iri"))
        .groupBy(F.col("s").alias("elem"))
        .agg(F.collect_set("label_lit").alias("type_labels"))
    )

    edge_prod, edge_preserved, edge_self = _edges_stage(spark, q, labels, type_labels, context)
    prop_prod, prop_preserved, kept_lists = _properties_stage(
        spark, q, labels, type_labels, context, edge_self
    )
    nl_prod, nl_preserved = _node_labels_stage(spark, q, labels, context)

    preserved_subjects = (
        edge_preserved.unionByName(prop_preserved).unionByName(nl_preserved).distinct()
    )
    preserved_quads = q.join(
        preserved_subjects, q["s"] == preserved_subjects["subj"], "leftsemi"
    )
    node_typing = q.filter((F.col("p") == A) & (F.col("o") == PGO_NODE))

    default_g = F.lit("<>").alias("g")
    out = (
        edge_prod.unionByName(prop_prod)
        .unionByName(nl_prod)
        .unionByName(preserved_quads.select("s", "p", "o", default_g))
        .unionByName(node_typing.select("s", "p", "o", default_g))
        .unionByName(kept_lists.select("s", "p", "o", default_g))
        .dropDuplicates(["s", "p", "o", "g"])
    )

    if not context.keep_provenance:
        out = out.filter(
            ~(
                (F.col("p") == A)
                & F.col("o").isin(PGO_NODE, PGO_EDGE, PREC_PROP_KEY, PREC_PROP_KEY_VALUE)
            )
        )
    return out if with_graphs else out.select("s", "p", "o")


# ------------------------------------------------------- bnode mapping
def _apply_bnode_mapping(
    spark: SparkSession, q: DataFrame, mapping: dict[str, str]
) -> DataFrame:
    """prec:mapBlankNodesToPrefix — rewrite typed blank nodes to IRIs
    (reference: blankNodeMapping, prec-c/index.ts:82-110). Runs BEFORE
    rule production, so renamed elements flow through templates as
    IRIs.

    Top-level positions are rewritten with joins (no Python). Nested
    occurrences inside RDF-star term strings are rewritten with a
    distributed explode / join / fold-reassemble pass over the DISTINCT
    nested term strings — no driver-side collect, so the blank-node map
    can be O(|elements|) without bounding driver memory.
    """
    if not mapping:
        return q

    pairs = None
    for type_iri, prefix in mapping.items():
        bns = (
            q.filter(
                (F.col("p") == A)
                & (F.col("o") == f"<{type_iri}>")
                & F.col("s").startswith("_:")
            )
            .select(F.col("s").alias("bn"))
            .distinct()
        )
        m = bns.select(
            "bn",
            F.concat(
                F.lit(f"<{prefix}"), F.expr("substring(bn, 3)"), F.lit(">")
            ).alias("iri"),
        )
        pairs = m if pairs is None else pairs.unionByName(m)
    pairs = pairs.cache()

    for c in ("s", "p", "o"):
        q = (
            q.join(
                pairs.withColumnRenamed("bn", f"__bn_{c}").withColumnRenamed(
                    "iri", f"__iri_{c}"
                ),
                F.col(c) == F.col(f"__bn_{c}"),
                "left",
            )
            .withColumn(c, F.coalesce(f"__iri_{c}", c))
            .drop(f"__bn_{c}", f"__iri_{c}")
        )

    # nested occurrences (terms inside << ... >> strings): a fully
    # distributed explode/join/reassemble pass — no driver-side collect,
    # no data-sized regex. For each DISTINCT nested term string, extract
    # its bnode tokens, join them against the mapping, and fold the
    # matched (bn -> iri) replacements back over the string (longest
    # name first, so a bnode whose name prefixes another's is safe).
    from ..prsc.revert import BNODE_RE

    nested_vals = (
        q.filter(F.col("s").contains("<<")).select(F.col("s").alias("val"))
        .unionByName(
            q.filter(F.col("o").contains("<<")).select(F.col("o").alias("val"))
        )
        .distinct()
    )
    tokens = nested_vals.select(
        "val",
        F.explode(
            F.array_distinct(F.regexp_extract_all("val", F.lit(BNODE_RE), F.lit(0)))
        ).alias("bn"),
    )
    rewritten = (
        tokens.join(pairs, "bn", "inner")
        .groupBy("val")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.length("bn")).alias("neg_len"),
                        F.col("bn"),
                        F.col("iri"),
                    )
                )
            ).alias("repl")
        )
        .select(
            "val",
            F.aggregate(
                "repl",
                F.col("val"),
                lambda acc, r: F.replace(
                    acc, r.getField("bn"), r.getField("iri")
                ),
            ).alias("new_val"),
        )
    )
    for c in ("s", "o"):
        q = (
            q.join(
                rewritten.withColumnRenamed("val", f"__v_{c}").withColumnRenamed(
                    "new_val", f"__nv_{c}"
                ),
                F.col(c) == F.col(f"__v_{c}"),
                "left",
            )
            .withColumn(c, F.coalesce(f"__nv_{c}", c))
            .drop(f"__v_{c}", f"__nv_{c}")
        )
    return q


# ---------------------------------------------------------------- edges
def _edges_stage(spark, q, labels, type_labels, context: PreccContext):
    cat = context.edges
    base = prec("Edges")

    edges = q.filter((F.col("p") == A) & (F.col("o") == PGO_EDGE)).select(
        F.col("s").alias("edge")
    )
    spo = (
        q.filter(F.col("p").isin(RDF_SUBJECT, RDF_PREDICATE, RDF_OBJECT))
        .groupBy("s")
        .agg(
            F.max(F.when(F.col("p") == RDF_SUBJECT, F.col("o"))).alias("src"),
            F.max(F.when(F.col("p") == RDF_PREDICATE, F.col("o"))).alias("pred"),
            F.max(F.when(F.col("p") == RDF_OBJECT, F.col("o"))).alias("dst"),
        )
    )
    edges = edges.join(spo, edges["edge"] == spo["s"], "inner").drop("s")
    edges = edges.join(
        labels.withColumnRenamed("label_lit", "edge_label"),
        edges["pred"] == F.col("iri"),
        "left",
    ).drop("iri")
    edges = (
        edges.join(
            type_labels.withColumnRenamed("type_labels", "src_labels"),
            edges["src"] == F.col("elem"),
            "left",
        )
        .drop("elem")
        .join(
            type_labels.withColumnRenamed("type_labels", "dst_labels"),
            edges["dst"] == F.col("elem"),
            "left",
        )
        .drop("elem")
    )

    # first-match-wins rule assignment
    conds = []
    for rule in cat.rules:
        cond = F.lit(True)
        if rule.label is not None:
            cond = cond & (F.col("edge_label") == F.lit(f'"{rule.label}"'))
        for pred_term, value in rule.other:
            arr = "src_labels" if pred_term == prec("sourceLabel") else "dst_labels"
            cond = cond & F.coalesce(
                F.array_contains(F.col(arr), F.lit(value.nt())), F.lit(False)
            )
        conds.append(cond)
    edges = edges.withColumn("rule_idx", _winner_expr(conds))

    # broadcast template catalog: rule_idx -1 = base template
    rows = []
    templates = {-1: cat.base_templates[base]}
    for i, rule in enumerate(cat.rules):
        templates[i] = rule.templates[base]
    graphs = {-1: "<>"}
    for i, rule in enumerate(cat.rules):
        graphs[i] = rule.graph.nt() if rule.graph is not None else "<>"
    for idx, tpl in templates.items():
        patterns = _compile_tpl(tpl, EDGE_MAP)
        self_pats = [compile_term(t, EDGE_MAP) for t in tpl.self_is]
        rows.append(
            (idx, patterns, _tpl_uses(patterns, "EDGEIRI"), self_pats, graphs[idx])
        )
    tdf = spark.createDataFrame(
        rows,
        "rule_idx INT, template ARRAY<ARRAY<STRING>>, uses_edgeiri BOOLEAN, "
        "self_pats ARRAY<STRING>, g STRING",
    )
    edges = edges.join(F.broadcast(tdf), on="rule_idx", how="left")

    bindings = {
        "EDGE": F.col("edge"),
        "SRC": F.col("src"),
        "DST": F.col("dst"),
        "EDGEIRI": F.col("pred"),
        "LABEL": F.coalesce(F.col("edge_label"), F.lit(pvar("label").nt())),
    }
    produced = _explode_and_substitute(edges, bindings)

    # preserved predicate IRIs: template still references the original
    # predicate (rules-for-edges.ts:95-99)
    preserved = (
        edges.withColumn(
            "keep",
            F.col("uses_edgeiri")
            | F.exists(
                "template",
                lambda row: F.exists(row, lambda cell: _contains_term(cell, F.col("pred"))),
            ),
        )
        .filter(F.col("keep"))
        .select(F.col("pred").alias("subj"))
        .distinct()
    )

    # per-edge resolved self identity (for properties on edges)
    edge_self = edges.select(
        F.col("edge").alias("holder_key"),
        F.explode(
            F.transform(
                "self_pats",
                lambda pat: substitute(pat, bindings),
            )
        ).alias("resolved_self"),
    )

    return produced, preserved, edge_self


# ---------------------------------------------------------------- properties
def _properties_stage(spark, q, labels, type_labels, context: PreccContext, edge_self):
    cat = context.properties

    pk = (
        q.filter((F.col("p") == A) & (F.col("o") == PREC_PROP_KEY))
        .select(F.col("s").alias("prop_key"))
        .distinct()
    )
    inst = q.join(pk, q["p"] == pk["prop_key"], "inner").select(
        F.col("s").alias("holder"), F.col("prop_key"), F.col("o").alias("prop_node")
    )
    values = q.filter(F.col("p") == RDF_VALUE).select(
        F.col("s").alias("vs"), F.col("o").alias("value")
    )
    inst = inst.join(values, inst["prop_node"] == values["vs"], "inner").drop("vs")
    inst = inst.join(
        labels.withColumnRenamed("label_lit", "key_label"),
        inst["prop_key"] == F.col("iri"),
        "left",
    ).drop("iri")

    nodes_set = (
        q.filter((F.col("p") == A) & (F.col("o") == PGO_NODE))
        .select(F.col("s").alias("n_id"), F.lit(True).alias("is_node"))
        .distinct()
    )
    edges_set = (
        q.filter((F.col("p") == A) & (F.col("o") == PGO_EDGE))
        .select(F.col("s").alias("e_id"), F.lit(True).alias("is_edge"))
        .distinct()
    )
    inst = (
        inst.join(nodes_set, inst["holder"] == F.col("n_id"), "left").drop("n_id")
        .join(edges_set, inst["holder"] == F.col("e_id"), "left").drop("e_id")
        .fillna(False, ["is_node", "is_edge"])
    )
    # holder labels via rdf:type (node path) and via rdf:predicate (edge path)
    inst = inst.join(
        type_labels.withColumnRenamed("type_labels", "holder_type_labels"),
        inst["holder"] == F.col("elem"),
        "left",
    ).drop("elem")
    pred_labels = (
        q.filter(F.col("p") == RDF_PREDICATE)
        .join(labels, F.col("o") == F.col("iri"))
        .groupBy(F.col("s").alias("elem"))
        .agg(F.collect_set("label_lit").alias("holder_pred_labels"))
    )
    inst = inst.join(pred_labels, inst["holder"] == F.col("elem"), "left").drop("elem")

    # resolved holder identity (deepResolve for edge holders,
    # rules-for-properties.ts:333-360)
    inst = inst.join(
        edge_self, inst["holder"] == edge_self["holder_key"], "left"
    ).drop("holder_key")
    inst = inst.withColumn("holder_resolved", F.coalesce("resolved_self", "holder"))

    # rule assignment
    conds = []
    for rule in cat.rules:
        cond = F.lit(True)
        if rule.label is not None:
            cond = cond & (F.col("key_label") == F.lit(f'"{rule.label}"'))
        holder_labels = [v for (k, v) in rule.other if k == prec("label")]
        on_kinds = {v for (k, v) in rule.other if k == prec("onKind")}
        reserved_node = prec("Node") in on_kinds
        reserved_edge = prec("Edge") in on_kinds

        def label_cond(arr_col):
            c = F.lit(True)
            for v in holder_labels:
                c = c & F.coalesce(
                    F.array_contains(F.col(arr_col), F.lit(v.nt())), F.lit(False)
                )
            return c

        path_a = label_cond("holder_type_labels")  # via rdf:type
        path_b = label_cond("holder_pred_labels")  # via rdf:predicate
        if reserved_node and reserved_edge:
            kind_cond = (path_a & F.col("is_node")) | (path_b & F.col("is_edge"))
        elif reserved_node:
            kind_cond = path_a & F.col("is_node")
        elif reserved_edge:
            kind_cond = path_b & F.col("is_edge")
        else:
            kind_cond = path_a
        conds.append(cond & kind_cond)
    inst = inst.withColumn("rule_idx", _winner_expr(conds))
    inst = inst.withColumn(
        "holder_base",
        F.when(F.col("is_node"), "node")
        .when(F.col("is_edge"), "edge")
        .otherwise("meta"),
    )

    # broadcast (rule_idx, base) -> template
    base_names = {
        "node": prec("NodeProperties"),
        "edge": prec("EdgeProperties"),
        "meta": prec("MetaProperties"),
    }
    rows = []
    for key, base_term in base_names.items():
        entries = {-1: cat.base_templates[base_term]}
        for i, rule in enumerate(cat.rules):
            entries[i] = rule.templates[base_term]
        for idx, tpl in entries.items():
            always, indiv = [], []
            for tq in tpl.quads:
                row = [
                    compile_term(tq.s, PROP_MAP),
                    compile_term(tq.p, PROP_MAP),
                    compile_term(tq.o, PROP_MAP),
                ]
                if any(placeholder("INDIVVALUE") in c for c in row):
                    indiv.append(row)
                else:
                    always.append(row)
            self_always, self_indiv = [], []
            for st in tpl.self_is:
                pat = compile_term(st, PROP_MAP)
                (self_indiv if placeholder("INDIVVALUE") in pat else self_always).append(pat)
            all_cells = [c for r in always + indiv for c in r]
            uses_propkey = placeholder("PROPKEY") in "".join(all_cells)
            uses_propvalue = placeholder("PROPVALUE") in "".join(all_cells)
            g = "<>"
            if idx >= 0 and cat.rules[idx].graph is not None:
                g = cat.rules[idx].graph.nt()
            rows.append(
                (idx, key, always, indiv, uses_propkey, uses_propvalue,
                 self_always, self_indiv, g)
            )
    tdf = spark.createDataFrame(
        rows,
        "rule_idx INT, holder_base STRING, template ARRAY<ARRAY<STRING>>, "
        "indiv_template ARRAY<ARRAY<STRING>>, uses_propkey BOOLEAN, "
        "uses_propvalue BOOLEAN, self_always ARRAY<STRING>, self_indiv ARRAY<STRING>, "
        "g STRING",
    )
    inst = inst.join(F.broadcast(tdf), on=["rule_idx", "holder_base"], how="left")

    list_items = _rdf_list_items(q)  # (head, node, pos, item)

    def bindings_of():
        return {
            "HOLDER": F.col("holder_resolved"),
            "PROPKEY": F.col("prop_key"),
            "LABEL": F.coalesce(F.col("key_label"), F.lit(pvar("label").nt())),
            "PROPNODE": F.col("prop_node"),
            "PROPVALUE": F.col("value"),
        }

    def produce(df: DataFrame) -> DataFrame:
        """Instantiate always + individualValue templates for df rows."""
        bindings = bindings_of()
        out = _explode_and_substitute(df.filter(F.size("template") > 0), bindings)
        indiv_inst = df.filter(F.size("indiv_template") > 0)
        joined = indiv_inst.join(
            list_items, indiv_inst["value"] == list_items["head"], "left"
        ).withColumn("indiv_value", F.coalesce(F.col("item"), F.col("value")))
        b2 = {**bindings, "INDIVVALUE": F.col("indiv_value")}
        ip = joined.select(
            *[c for c in joined.columns], F.explode("indiv_template").alias("pattern")
        ).select(
            substitute(F.element_at("pattern", 1), b2).alias("s"),
            substitute(F.element_at("pattern", 2), b2).alias("p"),
            substitute(F.element_at("pattern", 3), b2).alias("o"),
            F.col("g"),
        )
        return out.unionByName(ip)

    def selves_of(df: DataFrame) -> DataFrame:
        """(prop_node, self) — the resolved identity/ies of each property
        instance, from the template's selfIs patterns (incl. one self
        per individual value for cartesian templates)."""
        bindings = bindings_of()
        sa = df.filter(F.size("self_always") > 0).select(
            F.col("prop_node").alias("holder_key"),
            F.explode(
                F.transform("self_always", lambda pat: substitute(pat, bindings))
            ).alias("resolved_self"),
        )
        si_rows = df.filter(F.size("self_indiv") > 0)
        joined = si_rows.join(
            list_items, si_rows["value"] == list_items["head"], "left"
        ).withColumn("indiv_value", F.coalesce(F.col("item"), F.col("value")))
        b2 = {**bindings, "INDIVVALUE": F.col("indiv_value")}
        si = joined.select(
            F.col("prop_node").alias("holder_key"),
            F.explode(
                F.transform("self_indiv", lambda pat: substitute(pat, b2))
            ).alias("resolved_self"),
        )
        return sa.unionByName(si)

    # level 0: properties whose holder is a node or an edge
    base_inst = inst.filter(F.col("holder_base") != "meta")
    produced = produce(base_inst)

    # META-properties — the holder is itself a property node; deepResolve
    # it through the parent property's selfIs instantiation(s)
    # (rules-for-properties.ts:361-386). The reference recurses, so
    # meta-of-meta chains resolve too: each round resolves the
    # unresolved holders against the previous level's selves and feeds
    # the newly-resolved instances' selves to the next round. Depth is
    # bounded by _MAX_META_DEPTH (the reference corpus uses 1; real
    # TinkerPop data cannot exceed 1 either — deeper graphs only arise
    # from hand-written PREC-0 Turtle).
    unresolved = inst.filter(F.col("holder_base") == "meta").drop(
        "holder_resolved", "resolved_self"
    )
    if not unresolved.isEmpty():
        # fixed-depth LAZY unroll — no per-round isEmpty probes (each
        # was a full Spark job; round-2 VERDICT item 9). The plan depth
        # is bounded by _MAX_META_DEPTH = 3 chained join levels; the
        # single action below both validates and gates the error path.
        level_selves = selves_of(base_inst)
        for _ in range(_MAX_META_DEPTH):
            resolved_now = (
                unresolved.join(
                    level_selves,
                    unresolved["holder"] == level_selves["holder_key"],
                    "inner",
                )
                .withColumnRenamed("resolved_self", "holder_resolved")
                .drop("holder_key")
            )
            produced = produced.unionByName(produce(resolved_now))
            unresolved = unresolved.join(
                level_selves.select(F.col("holder_key").alias("holder")),
                "holder",
                "leftanti",
            )
            level_selves = selves_of(resolved_now)
        # a meta property whose holder never resolves (orphaned value
        # node, or nesting beyond _MAX_META_DEPTH) is an error, not a
        # silent drop — the reference's recursive deepResolve has no
        # base case for it either (rules-for-properties.ts:333-386)
        bad = [r.holder for r in unresolved.select("holder").limit(3).collect()]
        if bad:
            raise ValueError(
                f"meta properties with unresolvable holders (orphaned or "
                f"nested beyond depth {_MAX_META_DEPTH}): {bad}"
            )

    # preserved property-key IRIs (usedProperties in the reference)
    preserved = (
        inst.withColumn(
            "keep",
            F.coalesce(F.col("uses_propkey"), F.lit(False))
            | F.exists(
                "template",
                lambda row: F.exists(
                    row, lambda cell: _contains_term(cell, F.col("prop_key"))
                ),
            ),
        )
        .filter(F.col("keep"))
        .select(F.col("prop_key").alias("subj"))
        .distinct()
    )

    # lists to keep: template uses PROPVALUE and value is a list head
    list_heads = list_items.select("head").distinct()
    kept_heads = (
        inst.filter(F.coalesce(F.col("uses_propvalue"), F.lit(False)))
        .join(list_heads, inst["value"] == list_heads["head"], "leftsemi")
        .select(F.col("value").alias("kept_head"))
        .distinct()
    )
    chain_nodes = list_items.join(
        kept_heads, list_items["head"] == kept_heads["kept_head"], "leftsemi"
    ).select(F.col("node").alias("subj"))
    kept_list_quads = q.join(
        chain_nodes.distinct(), q["s"] == chain_nodes["subj"], "leftsemi"
    ).select("s", "p", "o")

    return produced, preserved, kept_list_quads


def _rdf_list_items(q: DataFrame) -> DataFrame:
    """Flatten rdf:first/rdf:rest chains: (head, node, pos, item).

    Iterative frontier expansion; list lengths are tiny (property
    arrays), so the loop converges in a handful of rounds. Each round
    is a join — no driver-side data movement.
    """
    firsts = q.filter(F.col("p") == RDF_FIRST).select(
        F.col("s").alias("node"), F.col("o").alias("item")
    )
    rests = q.filter(F.col("p") == RDF_REST).select(
        F.col("s").alias("rnode"), F.col("o").alias("next")
    )
    # heads = list nodes that are not any node's rdf:rest target
    heads = firsts.join(
        rests.select(F.col("next").alias("node")), on="node", how="leftanti"
    ).select(F.col("node").alias("head"))

    frontier = heads.select("head", F.col("head").alias("node"), F.lit(0).alias("pos"))
    all_nodes = frontier

    def step(f):
        return (
            f.join(rests, f["node"] == rests["rnode"], "inner")
            .filter(F.col("next") != RDF_NIL)
            .select("head", F.col("next").alias("node"), (F.col("pos") + 1).alias("pos"))
        )

    # chunked frontier expansion: 4 LAZY steps per emptiness probe, so
    # a typical (short) property list costs ONE driver action instead
    # of one per element (round-2 VERDICT item 9); the 16-chunk cap
    # bounds positions at 64, as before.
    for _ in range(16):
        for _ in range(4):
            frontier = step(frontier)
            all_nodes = all_nodes.unionByName(frontier)
        if frontier.isEmpty():
            break
    return all_nodes.join(firsts, on="node", how="inner").select(
        "head", "node", "pos", "item"
    )


# ---------------------------------------------------------------- node labels
def _node_labels_stage(spark, q, labels, context: PreccContext):
    cat = context.node_labels
    base = prec("NodeLabels")

    nodes = q.filter((F.col("p") == A) & (F.col("o") == PGO_NODE)).select(
        F.col("s").alias("node")
    )
    typed = q.filter(F.col("p") == A).select(
        F.col("s").alias("node"), F.col("o").alias("label_iri")
    )
    nl = (
        nodes.join(typed, on="node", how="inner")
        .join(labels, F.col("label_iri") == F.col("iri"), "inner")
        .drop("iri")
        .withColumnRenamed("label_lit", "label")
    )

    conds = []
    for rule in cat.rules:
        cond = F.lit(True)
        if rule.label is not None:
            cond = cond & (F.col("label") == F.lit(f'"{rule.label}"'))
        conds.append(cond)
    nl = nl.withColumn("rule_idx", _winner_expr(conds))

    rows = []
    entries = {-1: cat.base_templates[base]}
    for i, rule in enumerate(cat.rules):
        entries[i] = rule.templates[base]
    for idx, tpl in entries.items():
        patterns = _compile_tpl(tpl, NL_MAP)
        g = "<>"
        if idx >= 0 and cat.rules[idx].graph is not None:
            g = cat.rules[idx].graph.nt()
        rows.append((idx, patterns, _tpl_uses(patterns, "NODELABELIRI"), g))
    tdf = spark.createDataFrame(
        rows,
        "rule_idx INT, template ARRAY<ARRAY<STRING>>, uses_labeliri BOOLEAN, g STRING",
    )
    nl = nl.join(F.broadcast(tdf), on="rule_idx", how="left")

    bindings = {
        "NODE": F.col("node"),
        "NODELABELIRI": F.col("label_iri"),
        "LABEL": F.col("label"),
    }
    produced = _explode_and_substitute(nl, bindings)

    preserved = (
        nl.withColumn(
            "keep",
            F.col("uses_labeliri")
            | F.exists(
                "template",
                lambda row: F.exists(
                    row, lambda cell: _contains_term(cell, F.col("label_iri"))
                ),
            ),
        )
        .filter(F.col("keep"))
        .select(F.col("label_iri").alias("subj"))
        .distinct()
    )
    return produced, preserved
