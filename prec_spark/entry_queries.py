"""Query + oracle registry backing __spark_entry__.py.

Each entry pairs a Spark implementation (DataFrame API) with an ANSI
SQL oracle DuckDB can run on the same parquet views. Column names are
aligned on both sides (driver hashes values after sorting columns by
name). Flattened/serialized output shapes (strings, ints) are used so
cross-engine value hashing is robust.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cached import cached_transcripts
from .flagship import flagship_oracle_sql, flagship_triples
from .pg.export import cypher_create_statements, gremlin_insert_statements
from .pg.projection import pg_edges, pg_nodes
from .prec0 import prec0_quads
from .text.mentions import (
    canonical_entities,
    canonical_entities_oracle_sql,
    entity_links,
    entity_links_oracle_sql,
    entity_triples,
    entity_triples_oracle_sql,
    fuzzy_links,
    fuzzy_links_oracle_sql,
    mentions_df,
    mentions_oracle_sql,
)
from .transcripts import transcripts_df, transcripts_oracle_sql
from .text.analysis import (
    doc_fingerprint,
    doc_fingerprint_oracle_sql,
    lang_id,
    lang_id_oracle_sql,
    text_stats,
    text_stats_oracle_sql,
    token_counts,
    token_counts_oracle_sql,
)
from .dedup import (
    dedup_exact,
    dedup_exact_oracle_sql,
    dedup_minhash_pairs,
    dedup_minhash_oracle_sql,
    dedup_ngram_jaccard,
    dedup_ngram_oracle_sql,
    dedup_simhash_groups,
    dedup_simhash_oracle_sql,
    dedup_simhash_cc,
    dedup_simhash_cc_oracle_sql,
    dedup_simhash_hamming,
    dedup_simhash_hamming_oracle_sql,
    embedding_neardup,
    embedding_neardup_oracle_sql,
)
from .ann import (
    ann_bruteforce,
    ann_bruteforce_oracle_sql,
    ann_ivf,
    ann_ivf_oracle_sql,
    ann_lsh,
    ann_lsh_oracle_sql,
)
from .multimodal import binary_features, binary_features_oracle_sql
from .multimodal.media import media_features, media_features_oracle_sql
from .multimodal.video import video_features, video_features_oracle_sql
from .streaming.kg import kg_stream_triples
from .named_graphs import named_graph_oracle_sql, named_graph_quads
from .precc_flagship import (
    prec0_roundtrip,
    prec0_roundtrip_oracle_sql,
    precc_oracle_sql,
    precc_transcript_triples,
    prsc_roundtrip,
    prsc_roundtrip_oracle_sql,
)


# ---------------------------------------------------------------- helpers
def _t_cte() -> str:
    return f"WITH t AS ({transcripts_oracle_sql()})"


def _pg_nodes_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = cached_transcripts(spark, sf_dir)
    return pg_nodes(t).select(
        "node_id",
        F.array_join("labels", "|").alias("labels_key"),
        F.array_join(F.sort_array(F.map_keys("properties")), "|").alias("props_key"),
    )


def _pg_nodes_oracle() -> str:
    return f"""
{_t_cte()}
SELECT 'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) AS node_id,
       'Turn|' || role AS labels_key,
       CASE WHEN tool IS NOT NULL THEN 'text|tool' ELSE 'text' END AS props_key
FROM t
UNION ALL
SELECT DISTINCT 'conv:' || conv_id, 'Conversation', 'id' FROM t
UNION ALL
SELECT DISTINCT 'tool:' || tool, 'Tool', 'name' FROM t WHERE tool IS NOT NULL
"""


def _pg_edges_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = cached_transcripts(spark, sf_dir)
    return pg_edges(t).select("edge_id", "src_id", "dst_id", "label")


def _pg_edges_oracle() -> str:
    turn = "'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR)"
    return f"""
{_t_cte()}, tm AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t
)
SELECT 'edge:next:' || conv_id || ':' || CAST(turn_idx AS VARCHAR) AS edge_id,
       {turn} AS src_id,
       'turn:' || conv_id || ':' || CAST(turn_idx + 1 AS VARCHAR) AS dst_id,
       'NEXT' AS label
FROM tm WHERE turn_idx < max_turn_idx
UNION ALL
SELECT 'edge:in:' || conv_id || ':' || CAST(turn_idx AS VARCHAR),
       {turn}, 'conv:' || conv_id, 'IN'
FROM tm
UNION ALL
SELECT 'edge:uses:' || conv_id || ':' || CAST(turn_idx AS VARCHAR),
       {turn}, 'tool:' || tool, 'USES'
FROM tm WHERE tool IS NOT NULL
"""


def _cypher_create(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = cached_transcripts(spark, sf_dir)
    return cypher_create_statements(pg_nodes(t), pg_edges(t))


def _nt_esc_sql(col: str) -> str:
    """N-Triples escape chain in SQL (mirror of nt_escape_col)."""
    out = col
    for raw, esc in [
        ("\\", "\\\\"),
        ('"', '\\"'),
        (chr(10), "\\n"),
        (chr(13), "\\r"),
        (chr(9), "\\t"),
    ]:
        raw_sql = raw.replace("'", "''")
        esc_sql = esc.replace("'", "''")
        out = f"replace({out}, '{raw_sql}', '{esc_sql}')"
    return out


def _groovy_esc_sql(col: str) -> str:
    """Groovy single-quote escape chain in SQL (mirror of
    _gremlin_string over term-escaped content: backslash/newline/tab
    escapes kept, quote flavor swapped)."""
    out = col
    for raw, esc in [
        ("\\", "\\\\"),
        (chr(10), "\\n"),
        (chr(13), "\\r"),
        (chr(9), "\\t"),
        ("'", "\\'"),
    ]:
        raw_sql = raw.replace("'", "''")
        esc_sql = esc.replace("'", "''")
        out = f"replace({out}, '{raw_sql}', '{esc_sql}')"
    return out


def _cypher_create_oracle() -> str:
    turn = "'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR)"
    text = _nt_esc_sql("text")
    tool = _nt_esc_sql("tool")
    return f"""
{_t_cte()}, tm AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t
)
SELECT 'node' AS kind,
       'CREATE (:Turn:' || role || ' {{`_prec_id`: "' || {turn}
       || '", text: "' || {text} || '"'
       || CASE WHEN tool IS NOT NULL
               THEN ', tool: "' || {tool} || '"' ELSE '' END
       || '}})' AS stmt
FROM t
UNION ALL
SELECT DISTINCT 'node',
       'CREATE (:Conversation {{`_prec_id`: "conv:' || conv_id
       || '", id: "' || conv_id || '"}})'
FROM t
UNION ALL
SELECT DISTINCT 'node',
       'CREATE (:Tool {{`_prec_id`: "tool:' || tool
       || '", name: "' || tool || '"}})'
FROM t WHERE tool IS NOT NULL
UNION ALL
SELECT 'edge',
       'MATCH (s {{`_prec_id`: "' || {turn} || '"}}), (d {{`_prec_id`: "turn:'
       || conv_id || ':' || CAST(turn_idx + 1 AS VARCHAR)
       || '"}}) CREATE (s)-[:NEXT]->(d)'
FROM tm WHERE turn_idx < max_turn_idx
UNION ALL
SELECT 'edge',
       'MATCH (s {{`_prec_id`: "' || {turn} || '"}}), (d {{`_prec_id`: "conv:'
       || conv_id || '"}}) CREATE (s)-[:IN]->(d)'
FROM tm
UNION ALL
SELECT 'edge',
       'MATCH (s {{`_prec_id`: "' || {turn} || '"}}), (d {{`_prec_id`: "tool:'
       || tool || '"}}) CREATE (s)-[:USES]->(d)'
FROM tm WHERE tool IS NOT NULL
"""


def _gremlin_insert(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = cached_transcripts(spark, sf_dir)
    return gremlin_insert_statements(pg_nodes(t), pg_edges(t))


def _gremlin_insert_oracle() -> str:
    turn = "'turn:' || conv_id || ':' || CAST(turn_idx AS VARCHAR)"
    text = _groovy_esc_sql("text")
    tool = _groovy_esc_sql("tool")
    return f"""
{_t_cte()}, tm AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t
)
SELECT 'node' AS kind,
       'g.addV(''Turn::' || role || ''').property(''_prec_id'', ''' || {turn}
       || ''').property(''text'', ''' || {text} || ''')'
       || CASE WHEN tool IS NOT NULL
               THEN '.property(''tool'', ''' || {tool} || ''')' ELSE '' END
       || '.next()' AS stmt
FROM t
UNION ALL
SELECT DISTINCT 'node',
       'g.addV(''Conversation'').property(''_prec_id'', ''conv:' || conv_id
       || ''').property(''id'', ''' || conv_id || ''').next()'
FROM t
UNION ALL
SELECT DISTINCT 'node',
       'g.addV(''Tool'').property(''_prec_id'', ''tool:' || tool
       || ''').property(''name'', ''' || tool || ''').next()'
FROM t WHERE tool IS NOT NULL
UNION ALL
SELECT 'edge',
       'g.V().has(''_prec_id'', ''' || {turn} || ''').addE(''NEXT'')'
       || '.to(__.V().has(''_prec_id'', ''turn:' || conv_id || ':'
       || CAST(turn_idx + 1 AS VARCHAR) || ''')).iterate()'
FROM tm WHERE turn_idx < max_turn_idx
UNION ALL
SELECT 'edge',
       'g.V().has(''_prec_id'', ''' || {turn} || ''').addE(''IN'')'
       || '.to(__.V().has(''_prec_id'', ''conv:' || conv_id || ''')).iterate()'
FROM tm
UNION ALL
SELECT 'edge',
       'g.V().has(''_prec_id'', ''' || {turn} || ''').addE(''USES'')'
       || '.to(__.V().has(''_prec_id'', ''tool:' || tool || ''')).iterate()'
FROM tm WHERE tool IS NOT NULL
"""


def _prec0_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nodes/edges cached: the PREC-0 expansion reads the PG once per
    # quad family (19 narrow union branches; ~20 s warm from the raw
    # transcripts vs ~10.5 s from the cached PG at sf0.1).
    # Session-scoped shared caches: repeated invocations (bench warm
    # reps, oracle gate) reuse ONE entry instead of leaking a fresh
    # cache pair per call.
    from .cached import shared_cached_df

    nodes = shared_cached_df(
        spark, f"pg_nodes:{sf_dir}",
        lambda: pg_nodes(cached_transcripts(spark, sf_dir)),
    )
    edges = shared_cached_df(
        spark, f"pg_edges:{sf_dir}",
        lambda: pg_edges(cached_transcripts(spark, sf_dir)),
    )
    return prec0_quads(nodes, edges)


def _prec0_oracle() -> str:
    """Full PREC-0 expansion of the transcript PG in ANSI SQL."""
    rdf = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    rdfs = "http://www.w3.org/2000/01/rdf-schema#"
    pgo = "http://ii.uwb.edu.pl/pgo#"
    prec = "http://bruy.at/prec#"
    vocab = "http://www.example.org/vocab/"

    a = f"'<{rdf}type>'"
    rlabel = f"'<{rdfs}label>'"
    sub = f"'<{rdfs}subClassOf>'"

    turn_bn = "'_:turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    conv_bn = "'_:conv_' || conv_id"
    tool_bn = "'_:tool_' || tool"

    # label tag = sorted labels joined by '-'; turn labels are
    # sort(['Turn', role]) = 'Turn-<role>' ('T' < lowercase).
    turn_tag = "'Turn-' || role"

    def prop_iri(kind: str, key: str, tag_sql: str) -> str:
        return f"'<{vocab}{kind}/property/{key}/' || {tag_sql} || '>'"

    def node_label_iri(label_sql: str) -> str:
        return f"'<{vocab}node/label/' || {label_sql} || '>'"

    def edge_label_iri(label: str) -> str:
        return f"'<{vocab}edge/label/{label}>'"

    # sanitized holder ids (':' -> '_'), used both for bnode names and
    # property-value bnode names
    turn_sid = "'turn_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    conv_sid = "'conv_' || conv_id"
    tool_sid = "'tool_' || tool"

    lit = "'\"' || {} || '\"'"

    branches = []

    def add(s, p, o, frm="t", where=""):
        w = f" WHERE {where}" if where else ""
        branches.append(f"SELECT {s} AS s, {p} AS p, {o} AS o FROM {frm}{w}")

    # turn nodes
    add(turn_bn, a, f"'<{pgo}Node>'")
    add(turn_bn, a, node_label_iri("'Turn'"))
    add(turn_bn, a, node_label_iri("role"))
    # label meta (DISTINCT via outer dedup)
    add(node_label_iri("'Turn'"), rlabel, "'\"Turn\"'")
    add(node_label_iri("role"), rlabel, lit.format("role"))
    add(node_label_iri("'Turn'"), a, f"'<{prec}CreatedNodeLabel>'")
    add(node_label_iri("role"), a, f"'<{prec}CreatedNodeLabel>'")
    # conversation nodes
    add(conv_bn, a, f"'<{pgo}Node>'")
    add(conv_bn, a, node_label_iri("'Conversation'"))
    add(node_label_iri("'Conversation'"), rlabel, "'\"Conversation\"'")
    add(node_label_iri("'Conversation'"), a, f"'<{prec}CreatedNodeLabel>'")
    # tool nodes
    add(tool_bn, a, f"'<{pgo}Node>'", where="tool IS NOT NULL")
    add(tool_bn, a, node_label_iri("'Tool'"), where="tool IS NOT NULL")
    add(node_label_iri("'Tool'"), rlabel, "'\"Tool\"'", where="tool IS NOT NULL")
    add(node_label_iri("'Tool'"), a, f"'<{prec}CreatedNodeLabel>'", where="tool IS NOT NULL")
    add(f"'<{prec}CreatedNodeLabel>'", sub, f"'<{prec}CreatedVocabulary>'")

    # ---- node properties -------------------------------------------
    esc_text = "replace(replace(text, '\\', '\\\\'), '\"', '\\\"')"

    def prop_quads(holder_sid, kind, key, tag_sql, value_sql, where=""):
        holder_bn = f"'_:' || {holder_sid}"
        piri = prop_iri(kind, key, tag_sql)
        pv = f"'_:propval_' || {holder_sid} || '_{key}_0'"
        add(holder_bn, piri, pv, where=where)
        add(pv, a, f"'<{prec}PropertyKeyValue>'", where=where)
        add(pv, f"'<{rdf}value>'", value_sql, where=where)
        add(piri, rlabel, f"'\"{key}\"'", where=where)
        add(piri, a, f"'<{prec}PropertyKey>'", where=where)
        add(piri, a, f"'<{prec}CreatedPropertyKey>'", where=where)

    # turn: text property (tag = Turn-<role>)
    prop_quads(turn_sid, "node", "text", turn_tag, f"'\"' || {esc_text} || '\"'")
    # turn: tool property (only tool turns)
    prop_quads(turn_sid, "node", "tool", turn_tag, lit.format("tool"), where="tool IS NOT NULL")
    # conversation: id property (conv nodes repeat per turn; outer DISTINCT dedups)
    prop_quads(conv_sid, "node", "id", "'Conversation'", lit.format("conv_id"))
    # tool: name property
    prop_quads(tool_sid, "node", "name", "'Tool'", lit.format("tool"), where="tool IS NOT NULL")
    add(f"'<{prec}CreatedPropertyKey>'", sub, f"'<{prec}CreatedVocabulary>'")

    # ---- edges ------------------------------------------------------
    def edge_quads(edge_bn, src_bn, dst_bn, label, where=""):
        iri = edge_label_iri(label)
        add(edge_bn, a, f"'<{pgo}Edge>'", frm="tm", where=where)
        add(edge_bn, f"'<{rdf}subject>'", src_bn, frm="tm", where=where)
        add(edge_bn, f"'<{rdf}object>'", dst_bn, frm="tm", where=where)
        add(edge_bn, f"'<{rdf}predicate>'", iri, frm="tm", where=where)
        add(iri, rlabel, f"'\"{label}\"'", frm="tm", where=where)
        add(iri, a, f"'<{prec}CreatedEdgeLabel>'", frm="tm", where=where)

    next_bn = "'_:edge_next_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    in_bn = "'_:edge_in_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    uses_bn = "'_:edge_uses_' || conv_id || '_' || CAST(turn_idx AS VARCHAR)"
    next_dst = "'_:turn_' || conv_id || '_' || CAST(turn_idx + 1 AS VARCHAR)"
    edge_quads(next_bn, turn_bn, next_dst, "NEXT", where="turn_idx < max_turn_idx")
    edge_quads(in_bn, turn_bn, conv_bn, "IN")
    edge_quads(uses_bn, turn_bn, tool_bn, "USES", where="tool IS NOT NULL")
    add(f"'<{prec}CreatedEdgeLabel>'", sub, f"'<{prec}CreatedVocabulary>'")

    body = "\nUNION ALL\n".join(branches)
    return f"""
{_t_cte()}, tm AS (
  SELECT *, max(turn_idx) OVER (PARTITION BY conv_id) AS max_turn_idx FROM t
)
SELECT DISTINCT s, p, o FROM (
{body}
) u
"""


def _kg_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full extract -> link -> canonicalize -> materialize output:
    PRSC context triples + mention/entity triples. One cached
    transcripts DF feeds every stage."""
    t = cached_transcripts(spark, sf_dir)
    # the two branches are each internally deduplicated and are
    # disjoint by predicate namespace — no outer dropDuplicates needed
    # (saves a full-output shuffle)
    return flagship_triples(spark, sf_dir, transcripts=t).unionByName(
        entity_triples(spark, sf_dir, transcripts=t)
    )


def _kg_triples_oracle() -> str:
    return f"""
SELECT DISTINCT s, p, o FROM (
  ({flagship_oracle_sql()})
  UNION ALL
  ({entity_triples_oracle_sql()})
) u
"""


# ---------------------------------------------------------------- registry
def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcripts": transcripts_df,
        "pg_nodes": _pg_nodes_flat,
        "pg_edges": _pg_edges_flat,
        "prec0_triples": _prec0_triples,
        "cypher_create": _cypher_create,
        "gremlin_insert": _gremlin_insert,
        "prsc_transcript_triples": flagship_triples,
        "named_graph_quads": named_graph_quads,
        "precc_triples": precc_transcript_triples,
        "prsc_roundtrip": prsc_roundtrip,
        "prec0_roundtrip": prec0_roundtrip,
        "mentions": mentions_df,
        "entity_links": entity_links,
        "fuzzy_links": fuzzy_links,
        "canonical_entities": canonical_entities,
        "entity_triples": entity_triples,
        "kg_triples": _kg_triples,
        "text_stats": text_stats,
        "lang_id": lang_id,
        "doc_fingerprint": doc_fingerprint,
        "token_counts": token_counts,
        "dedup_exact": dedup_exact,
        "dedup_minhash": dedup_minhash_pairs,
        "dedup_ngram_jaccard": dedup_ngram_jaccard,
        "dedup_simhash": dedup_simhash_groups,
        "dedup_simhash_hamming": dedup_simhash_hamming,
        "dedup_simhash_cc": dedup_simhash_cc,
        "embedding_neardup": embedding_neardup,
        "ann_bruteforce": ann_bruteforce,
        "ann_ivf": ann_ivf,
        "ann_lsh": ann_lsh,
        "multimodal_features": binary_features,
        "media_decode": media_features,
        "media_video": video_features,
        "kg_stream_triples": kg_stream_triples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "transcripts": transcripts_oracle_sql(),
        "pg_nodes": _pg_nodes_oracle(),
        "pg_edges": _pg_edges_oracle(),
        "prec0_triples": _prec0_oracle(),
        "cypher_create": _cypher_create_oracle(),
        "gremlin_insert": _gremlin_insert_oracle(),
        "prsc_transcript_triples": flagship_oracle_sql(),
        "named_graph_quads": named_graph_oracle_sql(),
        "precc_triples": precc_oracle_sql(),
        "prsc_roundtrip": prsc_roundtrip_oracle_sql(),
        "prec0_roundtrip": prec0_roundtrip_oracle_sql(),
        "mentions": mentions_oracle_sql(),
        "entity_links": entity_links_oracle_sql(),
        "fuzzy_links": fuzzy_links_oracle_sql(),
        "canonical_entities": canonical_entities_oracle_sql(),
        "entity_triples": entity_triples_oracle_sql(),
        "kg_triples": _kg_triples_oracle(),
        "text_stats": text_stats_oracle_sql(),
        "lang_id": lang_id_oracle_sql(),
        "doc_fingerprint": doc_fingerprint_oracle_sql(),
        "token_counts": token_counts_oracle_sql(),
        "dedup_exact": dedup_exact_oracle_sql(),
        "dedup_minhash": dedup_minhash_oracle_sql(),
        "dedup_ngram_jaccard": dedup_ngram_oracle_sql(),
        "dedup_simhash": dedup_simhash_oracle_sql(),
        "dedup_simhash_hamming": dedup_simhash_hamming_oracle_sql(),
        "dedup_simhash_cc": dedup_simhash_cc_oracle_sql(),
        "embedding_neardup": embedding_neardup_oracle_sql(),
        "ann_bruteforce": ann_bruteforce_oracle_sql(),
        "ann_ivf": ann_ivf_oracle_sql(),
        "ann_lsh": ann_lsh_oracle_sql(),
        "multimodal_features": binary_features_oracle_sql(),
        "media_decode": media_features_oracle_sql(),
        "media_video": video_features_oracle_sql(),
        "kg_stream_triples": _kg_triples_oracle(),
    }
