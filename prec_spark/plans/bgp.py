"""Generic quad-pattern operators over the triples DataFrame.

The reference's workhorse is a backtracking multi-pattern conjunctive
join (DStar.matchAndBind, /root/reference/src/dataset/index.ts:463-500
— SURVEY.md §2.3 J1) plus the find-filter-replace rewrite built on it
(J2, dataset/index.ts:373-445). Here the same operators are expressed
relationally:

* one pattern   -> filter + projection (variables become columns)
* a pattern list -> left-deep chain of equi-joins on shared variables
  (Catalyst reorders / broadcasts as it sees fit — the reference uses
  user order with no reordering)
* EXISTS-style condition groups -> LEFT SEMI joins
* find-filter-replace -> except + union of instantiated rows

Patterns are (s, p, o) triples — or (s, p, o, g) QUADS, matching the
reference DStar's 4-position match (dataset/index.ts:257-271) — of
term strings where "?name" marks a variable (same syntax the
reference uses). A quad table carries an optional `g` column ('<>' =
default graph); a 3-position pattern leaves the graph unconstrained
(the reference's null wildcard), and a 4-position pattern against a
graph-less table matches g against the default graph.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: term string of the default graph (NamedNode("").nt())
DEFAULT_GRAPH_NT = "<>"


def _is_var(term: str) -> bool:
    return term.startswith("?")


def _g_col(quads: DataFrame) -> Column:
    return F.col("g") if "g" in quads.columns else F.lit(DEFAULT_GRAPH_NT)


def match_pattern(quads: DataFrame, pattern: tuple) -> DataFrame:
    """Single-pattern match -> one column per variable
    (reference: DStar.matchPattern, dataset/index.ts:310-371)."""
    df = quads
    cols: dict[str, Column] = {}
    position_cols = [F.col("s"), F.col("p"), F.col("o"), _g_col(quads)]
    for pos_col, term in zip(position_cols, pattern):
        if _is_var(term):
            name = term[1:]
            if name in cols:  # repeated variable: positions must agree
                df = df.filter(pos_col == cols[name])
            else:
                cols[name] = pos_col
        else:
            df = df.filter(pos_col == term)
    return df.select(*[c.alias(n) for n, c in cols.items()])


def match_and_bind(quads: DataFrame, patterns: list[tuple[str, str, str]]) -> DataFrame:
    """Multi-pattern conjunctive join: bindings DataFrame with one
    column per variable (J1). Shared variables become equi-join keys."""
    if not patterns:
        raise ValueError("empty pattern list")
    out = match_pattern(quads, patterns[0])
    for pattern in patterns[1:]:
        step = match_pattern(quads, pattern)
        shared = [c for c in step.columns if c in out.columns]
        out = out.join(step, on=shared, how="inner") if shared else out.crossJoin(step)
    return out


def optional_bind(
    bindings: DataFrame,
    quads: DataFrame,
    patterns: list[tuple[str, str, str]],
) -> DataFrame:
    """SPARQL OPTIONAL: extend each binding with the group's variables
    when the group matches, keep the binding with NULLs when it does
    not — a left outer join on the shared variables.  The group is
    matched as its own conjunctive BGP first (OPTIONAL groups are
    internally inner-joined; only their attachment is optional)."""
    grp = match_and_bind(quads, patterns)
    shared = [c for c in grp.columns if c in bindings.columns]
    if not shared:
        raise ValueError("OPTIONAL group shares no variable with the bindings")
    return bindings.join(grp, on=shared, how="left")


def union_bind(a: DataFrame, b: DataFrame) -> DataFrame:
    """SPARQL UNION over binding frames with the same variables —
    keeps multiplicity (UNION ALL), like the SPARQL algebra."""
    if set(a.columns) != set(b.columns):
        raise ValueError("UNION operands bind different variables")
    return a.unionByName(b)


def minus_bind(bindings: DataFrame, group: DataFrame) -> DataFrame:
    """SPARQL MINUS: drop bindings compatible with ANY group binding
    on the shared variables (anti-join).  ``group`` is a prebuilt
    binding frame so callers can FILTER it first, as SPARQL allows
    inside a MINUS group."""
    shared = [c for c in group.columns if c in bindings.columns]
    if not shared:
        raise ValueError("MINUS group shares no variable with the bindings")
    return bindings.join(
        group.select(*shared).distinct(), on=shared, how="left_anti"
    )


def aggregate_bind(
    bindings: DataFrame,
    group_vars: list[str],
    aggs: dict[str, Column],
    having: Column | None = None,
) -> DataFrame:
    """SPARQL GROUP BY + aggregates + HAVING over a binding frame —
    the algebra's Group/Aggregation operators.  ``aggs`` maps output
    variable name -> aggregate Column (COUNT/SUM/MIN/MAX/...); the
    result binds ``group_vars`` plus one column per aggregate.
    ``having`` filters the aggregated frame (SPARQL HAVING).  For
    non-distinct aggregates this is a single hash aggregate: Catalyst
    plans a map-side partial aggregate per partition, so only the
    (group, partial) pairs shuffle — the binding frame itself never
    moves.  COUNT(DISTINCT x) is the exception: Spark plans a
    two-phase distinct aggregate that shuffles (group, distinct-value)
    pairs before the final aggregate, so the data-movement guarantee is
    per-distinct-value, not per-partial."""
    out = bindings.groupBy(*group_vars).agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    return out.filter(having) if having is not None else out


def slice_bind(
    bindings: DataFrame, order: list[Column], limit: int
) -> DataFrame:
    """SPARQL ORDER BY + LIMIT (the algebra's OrderBy + Slice).  The
    order spec must be a total order (add a unique variable as the
    last key) or the selected row SET is nondeterministic under ties.
    orderBy().limit() compiles to TakeOrderedAndProject: each
    partition keeps a k-row heap and only k rows per partition reach
    the driver-side merge — no global sort shuffle, so top-k stays
    cheap at any corpus size."""
    return bindings.orderBy(*order).limit(limit)


def exists_filter(
    bindings: DataFrame,
    quads: DataFrame,
    condition_groups: list[list[tuple[str, str, str]]],
) -> DataFrame:
    """Keep bindings for which EVERY condition group has >= 1 match —
    the EXISTS semantics of findFilterReplace's conditions (J2,
    dataset/index.ts:373-430). Bound variables flow into each group;
    groups are independently scoped."""
    out = bindings
    for group in condition_groups:
        grp = match_and_bind(quads, group)
        shared = [c for c in grp.columns if c in out.columns]
        if not shared:
            # a group with no shared vars: keep all iff it matches anything
            out = out if not grp.isEmpty() else out.filter(F.lit(False))
            continue
        out = out.join(grp.select(*shared).distinct(), on=shared, how="leftsemi")
    return out


def instantiate(bindings: DataFrame, pattern: tuple) -> DataFrame:
    """Bind variables in a destination pattern -> quad rows (P3,
    bindVariables, dataset/index.ts:38-67). 4-position patterns emit
    a `g` column."""
    cols = []
    for pos, term in zip(("s", "p", "o", "g"), pattern):
        cols.append(
            F.col(term[1:]).alias(pos) if _is_var(term) else F.lit(term).alias(pos)
        )
    return bindings.select(*cols)


def _key_cols(df: DataFrame) -> list[str]:
    return [c for c in ("s", "p", "o", "g") if c in df.columns]


def find_filter_replace(
    quads: DataFrame,
    source: list[tuple[str, str, str]],
    conditions: list[list[tuple[str, str, str]]],
    destination: list[tuple[str, str, str]],
) -> DataFrame:
    """The J2 rewrite: match `source`, keep bindings passing every
    condition group, delete the matched source quads, insert the
    instantiated destination quads."""
    bindings = match_and_bind(quads, source)
    bindings = exists_filter(bindings, quads, conditions)

    matched_quads = None
    for pattern in source:
        part = instantiate(bindings, pattern)
        matched_quads = part if matched_quads is None else matched_quads.unionByName(part)

    produced = None
    for pattern in destination:
        part = instantiate(bindings, pattern)
        produced = part if produced is None else produced.unionByName(part)

    # 3-position source patterns over a g-bearing table delete the
    # match in EVERY graph (DStar's null-graph wildcard delete)
    del_keys = [c for c in _key_cols(quads) if c in matched_quads.columns]
    kept = quads.join(matched_quads.distinct(), on=del_keys, how="leftanti")
    if produced is None:
        return kept
    if "g" in quads.columns and "g" not in produced.columns:
        produced = produced.withColumn("g", F.lit(DEFAULT_GRAPH_NT))
    return kept.unionByName(produced).dropDuplicates(_key_cols(quads))


# ------------------------------------------------------------------ set ops
def quads_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """U1: set union (DStar.addAll + dedup, dataset/index.ts:114-178)."""
    return a.unionByName(b).dropDuplicates(_key_cols(a))


def quads_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """U2: set difference (removeQuads/deleteMatches, :181-188,279-283)."""
    return a.join(b, on=_key_cols(a), how="leftanti")


def delete_matches(quads: DataFrame, s=None, p=None, o=None) -> DataFrame:
    """U2 variant: delete by wildcard pattern."""
    cond = F.lit(True)
    for pos, term in (("s", s), ("p", p), ("o", o)):
        if term is not None:
            cond = cond & (F.col(pos) == term)
    return quads.filter(~cond)
