"""PREC-0 expansion: the lossless RDF transcription of a property graph.

Reproduces the quad-level output of the reference's RDFGraphBuilder
(/root/reference/src/prec/graph-builder.ts:115-345; SHACL shape in
docs/prec0shape.ttl):

* node  -> (_:n, rdf:type, pgo:Node) + per-label typing quads
* edge  -> RDF reification: rdf:subject / rdf:predicate / rdf:object
  (reification, not RDF-star, so parallel same-label edges stay
  distinct — comment at graph-builder.ts:233-237)
* property k=v -> label-suffixed predicate IRI
  vocab/{node|edge}/property/<k>/<sorted-labels-joined-by-dash>
  pointing at a property-value blank node with rdf:value
* array values -> rdf:first/rdf:rest chains

Everything is explode + string building + union — no Python, no UDFs.
Blank node ids are deterministic (derived from element ids), which is
correct up to blank-node isomorphism (the reference's own equality
criterion, test/utility.ts:35-59).

Set semantics WITHOUT a global dedup shuffle: element-keyed quad
families are injective by construction (element ids are unique, label
arrays deduplicated at load), and the repeated METADATA quads (label /
property-key IRIs, Created* typing, subclass singletons) are built from
tiny `.distinct()` dimension tables instead of being emitted per
element and deduplicated afterwards.

NOTE (SURVEY.md §7): the PRSC hot path intentionally SKIPS this
encoding and reads the relational nodes/edges directly; PREC-0 exists
for parity, for PREC-0 reversion, and as an exchange format.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .pg.projection import sanitize_id_col
from .rdf.terms import PGO_NS, PREC_NS, RDF_NS, RDFS_NS

DEFAULT_VOCAB = "http://www.example.org/vocab/"

RDF_TYPE = f"<{RDF_NS}type>"
RDFS_LABEL = f"<{RDFS_NS}label>"
RDFS_SUBCLASSOF = f"<{RDFS_NS}subClassOf>"
PGO_NODE = f"<{PGO_NS}Node>"
PGO_EDGE = f"<{PGO_NS}Edge>"

#: regex matching one term-encoded literal inside a list-encoded value
_LITERAL_RE = r'"(?:[^"\\]|\\.)*"(?:\^\^<[^>]*>)?'


def _bn(col: Column) -> Column:
    return F.concat(F.lit("_:"), sanitize_id_col(col))


def _iri(*parts: Column | str) -> Column:
    cols = [F.lit(p) if isinstance(p, str) else p for p in parts]
    return F.concat(F.lit("<"), *cols, F.lit(">"))


def _lit_str(col: Column) -> Column:
    from .pg.projection import lit_term_col

    return lit_term_col(col)


def _triples(df: DataFrame, s: Column, p: Column, o: Column) -> DataFrame:
    return df.select(s.alias("s"), p.alias("p"), o.alias("o"))


def _quad(s: Column, p: Column, o: Column) -> Column:
    """One (s, p, o) struct — element of a fused quad array."""
    return F.struct(s.alias("s"), p.alias("p"), o.alias("o"))


def _explode_quads(df: DataFrame, quads: Column) -> DataFrame:
    """Explode an array<struct<s,p,o>> column into triple rows — the
    fused form of several per-element union branches over one scan."""
    return df.select(F.explode(quads).alias("q")).select("q.s", "q.p", "q.o")


def prec0_quads(
    nodes: DataFrame,
    edges: DataFrame,
    vocab: str = DEFAULT_VOCAB,
    meta: DataFrame | None = None,
) -> DataFrame:
    """PG -> PREC-0 triples (s, p, o term strings; set semantics).

    `meta` (optional) carries TinkerPop meta-properties as a side table
    (holder_id, key, value_pos, meta map<string,array<string>>): each
    row attaches the meta map to the value node of property `key` /
    occurrence `value_pos` on `holder_id`. Meta properties reuse the
    SAME property machinery with the property-value node as holder and
    the ELEMENT's label tag in the meta-key IRI (graph-builder.ts
    388-407 intent; the reference's own meta output is untested — its
    prec-0.test.ts marks it TODO — so we implement the documented
    encoding: propval --metaKeyIRI--> metaval, metaval a
    prec:PropertyKeyValue ; rdf:value v)."""
    parts: list[DataFrame] = []
    key_dims: list[DataFrame] = []
    prec = f"<{PREC_NS}%s>"

    # ---- nodes ------------------------------------------------------
    # element-keyed quads fused into ONE explode branch per source
    # (round 5): the typing quad + per-label quads come out of a single
    # scan of nodes instead of one scan per family — at corpus scale
    # each union branch is a full pass over the PG
    n = nodes
    node_bn = _bn(F.col("node_id"))
    parts.append(
        _explode_quads(
            n,
            F.concat(
                F.array(_quad(node_bn, F.lit(RDF_TYPE), F.lit(PGO_NODE))),
                F.transform(
                    F.array_distinct("labels"),
                    lambda l: _quad(
                        node_bn,
                        F.lit(RDF_TYPE),
                        F.concat(
                            F.lit(f"<{vocab}node/label/"), l, F.lit(">")
                        ),
                    ),
                ),
            ),
        )
    )

    nlab = n.select(F.col("node_id"), F.explode(F.array_distinct("labels")).alias("label"))
    label_iri = _iri(vocab + "node/label/", F.col("label"))

    # label metadata from the (tiny) distinct-label dimension
    label_dim = nlab.select("label").distinct()
    parts.append(_triples(label_dim, label_iri, F.lit(RDFS_LABEL), _lit_str(F.col("label"))))
    parts.append(_triples(label_dim, label_iri, F.lit(RDF_TYPE), F.lit(prec % "CreatedNodeLabel")))
    parts.append(
        _triples(
            label_dim.limit(1),
            F.lit(prec % "CreatedNodeLabel"),
            F.lit(RDFS_SUBCLASSOF),
            F.lit(prec % "CreatedVocabulary"),
        )
    )

    node_props = n.select(
        F.col("node_id").alias("holder_id"), F.col("labels"), F.col("properties")
    )
    np_parts, np_dim = _property_quads(node_props, vocab + "node/property/", prec)
    parts.extend(np_parts)
    key_dims.append(np_dim)

    # ---- edges ------------------------------------------------------
    e = edges
    edge_bn = _bn(F.col("edge_id"))
    elabel_iri = _iri(vocab + "edge/label/", F.col("label"))
    # the 4 reification quads per edge in one explode branch
    parts.append(
        _explode_quads(
            e,
            F.array(
                _quad(edge_bn, F.lit(RDF_TYPE), F.lit(PGO_EDGE)),
                _quad(edge_bn, F.lit(f"<{RDF_NS}subject>"), _bn(F.col("src_id"))),
                _quad(edge_bn, F.lit(f"<{RDF_NS}object>"), _bn(F.col("dst_id"))),
                _quad(edge_bn, F.lit(f"<{RDF_NS}predicate>"), elabel_iri),
            ),
        )
    )

    elabel_dim = e.select("label").distinct()
    parts.append(_triples(elabel_dim, elabel_iri, F.lit(RDFS_LABEL), _lit_str(F.col("label"))))
    parts.append(_triples(elabel_dim, elabel_iri, F.lit(RDF_TYPE), F.lit(prec % "CreatedEdgeLabel")))
    parts.append(
        _triples(
            elabel_dim.limit(1),
            F.lit(prec % "CreatedEdgeLabel"),
            F.lit(RDFS_SUBCLASSOF),
            F.lit(prec % "CreatedVocabulary"),
        )
    )
    edge_props = e.select(
        F.col("edge_id").alias("holder_id"),
        F.array(F.col("label")).alias("labels"),
        F.col("properties"),
    )
    ep_parts, ep_dim = _property_quads(edge_props, vocab + "edge/property/", prec)
    parts.extend(ep_parts)
    key_dims.append(ep_dim)

    # ---- meta-properties (property-on-property) ----------------------
    if meta is not None:
        for kind, holders in (
            ("node", nodes.select(F.col("node_id").alias("hid"), "labels")),
            (
                "edge",
                edges.select(
                    F.col("edge_id").alias("hid"), F.array("label").alias("labels")
                ),
            ),
        ):
            mh = meta.join(holders, meta["holder_id"] == holders["hid"], "inner").select(
                F.concat(
                    F.lit("propval_"),
                    sanitize_id_col(F.col("holder_id")),
                    F.lit("_"),
                    F.col("key"),
                    F.lit("_"),
                    F.col("value_pos").cast("string"),
                ).alias("holder_id"),
                F.col("labels"),
                F.col("meta").alias("properties"),
            )
            mp_parts, mp_dim = _property_quads(mh, vocab + f"{kind}/property/", prec)
            parts.extend(mp_parts)
            key_dims.append(mp_dim)

    # exactly ONE CreatedPropertyKey subclass singleton across all
    # property families (set semantics without a global dedup)
    all_dims = key_dims[0]
    for kd in key_dims[1:]:
        all_dims = all_dims.unionByName(kd)
    parts.append(
        _triples(
            all_dims.limit(1),
            F.lit(prec % "CreatedPropertyKey"),
            F.lit(RDFS_SUBCLASSOF),
            F.lit(prec % "CreatedVocabulary"),
        )
    )

    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out


def _property_quads(
    holders: DataFrame, prop_ns: str, prec: str
) -> tuple[list[DataFrame], DataFrame]:
    """Property quads for one holder kind -> (parts, key_dim).

    holders: (holder_id, labels, properties map<string,array<string>>).
    Multi-element arrays = multi-valued properties (one value node
    each); "( ... )" list-encoded elements = array values (rdf list).
    The CreatedPropertyKey subclass singleton is NOT emitted here — the
    caller emits exactly one across all property families (node / edge
    / meta), keeping the union duplicate-free by construction.
    """
    props = (
        holders.select(
            "holder_id",
            F.array_join(F.sort_array("labels"), "-").alias("label_tag"),
            F.explode("properties").alias("key", "values"),
        )
        .select(
            "holder_id",
            "key",
            "label_tag",
            F.concat(F.lit(prop_ns), F.col("key"), F.lit("/"), F.col("label_tag")).alias(
                "prop_iri_body"
            ),
            F.posexplode("values").alias("value_pos", "value"),
        )
        .withColumn(
            # key is sanitized like the holder id: a ':' in a property
            # key must not produce an illegal bnode label, and the
            # meta-property synthetic holder (prec0_quads) relies on
            # this label equalling _bn('propval_<san(holder)>_<key>_<pos>')
            # byte-for-byte — _bn sanitizes the whole string, so the
            # key must be sanitized here too or meta triples dangle
            "value_bn",
            F.concat(
                F.lit("_:propval_"),
                sanitize_id_col(F.col("holder_id")),
                F.lit("_"),
                sanitize_id_col(F.col("key")),
                F.lit("_"),
                F.col("value_pos").cast("string"),
            ),
        )
        .withColumn("is_list", F.col("value").startswith("("))
    )

    prop_iri = _iri(F.col("prop_iri_body"))
    # metadata from the distinct (key, label_tag) dimension
    key_dim = props.select("key", "prop_iri_body").distinct()
    key_dim_iri = _iri(F.col("prop_iri_body"))

    # per-value-row quads fused into ONE explode branch (round 5): the
    # holder→value link, the PropertyKeyValue typing, and the value
    # encoding (scalar rdf:value | empty-list nil | list head +
    # rdf:first/rest chain) all come out of a single pass over the
    # exploded property rows instead of six filtered branches
    rdf_value = F.lit(f"<{RDF_NS}value>")
    nil = F.lit(f"<{RDF_NS}nil>")
    rows = props.withColumn(
        "items",
        F.when(
            F.col("is_list"),
            F.regexp_extract_all("value", F.lit(_LITERAL_RE), F.lit(0)),
        ).otherwise(F.array()),
    ).withColumn("n_items", F.size("items"))
    list_bn = lambda pos: F.concat(  # noqa: E731
        F.lit("_:list_"),
        sanitize_id_col(F.col("value_bn")),
        F.lit("_"),
        pos.cast("string"),
    )
    value_quads = (
        F.when(
            ~F.col("is_list"),
            F.array(_quad(F.col("value_bn"), rdf_value, F.col("value"))),
        )
        .when(
            F.col("n_items") == 0,
            F.array(_quad(F.col("value_bn"), rdf_value, nil)),
        )
        .otherwise(
            F.concat(
                F.array(_quad(F.col("value_bn"), rdf_value, list_bn(F.lit(0)))),
                F.flatten(
                    F.transform(
                        F.col("items"),
                        lambda item, pos: F.array(
                            _quad(list_bn(pos), F.lit(f"<{RDF_NS}first>"), item),
                            _quad(
                                list_bn(pos),
                                F.lit(f"<{RDF_NS}rest>"),
                                F.when(
                                    pos == F.col("n_items") - 1, nil
                                ).otherwise(list_bn(pos + 1)),
                            ),
                        ),
                    )
                ),
            )
        )
    )
    out = [
        _explode_quads(
            rows,
            F.concat(
                F.array(
                    _quad(_bn(F.col("holder_id")), prop_iri, F.col("value_bn")),
                    _quad(
                        F.col("value_bn"),
                        F.lit(RDF_TYPE),
                        F.lit(prec % "PropertyKeyValue"),
                    ),
                ),
                value_quads,
            ),
        ),
        _triples(key_dim, key_dim_iri, F.lit(RDFS_LABEL), _lit_str(F.col("key"))),
        _triples(key_dim, key_dim_iri, F.lit(RDF_TYPE), F.lit(prec % "PropertyKey")),
        _triples(key_dim, key_dim_iri, F.lit(RDF_TYPE), F.lit(prec % "CreatedPropertyKey")),
    ]
    return out, key_dim
