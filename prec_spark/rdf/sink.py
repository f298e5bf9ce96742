"""RDF sinks (S6 in SURVEY.md §2.1).

The canonical term-string encoding makes N-Triples serialization a
single concat — `write_ntriples` emits a standard .nt dataset as
Spark text partitions (plus parquet for the structured form). Nested
RDF-star terms serialize in the `<< ... >>` RDF-star N-Triples syntax.

`write_turtle` is the reference's default output format (an n3 Writer
with prefixes, /root/reference/src/rdf/parsing.ts:15-23): @prefix
header + prefixed names wherever a term IRI starts with a declared
namespace. The dataset is the concatenation of the part files in
filename order — the header is guaranteed to be in the first part.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: default prefix table (the reference's PRECNamespace set)
DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "prec": "http://bruy.at/prec#",
    "pvar": "http://bruy.at/prec-trans#",
    "pgo": "http://ii.uwb.edu.pl/pgo#",
}

#: IRI local parts safe to abbreviate without PN_LOCAL escaping
_LOCAL = r"([A-Za-z][A-Za-z0-9_\-]*)"


def ntriples_lines(triples: DataFrame) -> DataFrame:
    return triples.select(
        F.concat(F.col("s"), F.lit(" "), F.col("p"), F.lit(" "), F.col("o"), F.lit(" .")).alias(
            "value"
        )
    )


def write_ntriples(triples: DataFrame, path: str, mode: str = "overwrite"):
    ntriples_lines(triples).write.mode(mode).text(path)


#: a quoted literal body with escaped chars (same shape as the
#: LITERAL_RE tokenizer in prsc/revert.py) — matches the full span so
#: nothing inside the quotes is visible to the prefix rewriter
_LIT_RE = r'"(?:[^"\\]|\\.)*"'
#: placeholder for masked literal spans (never appears in term
#: strings: control chars in literal content are \u-escaped upstream)
_MASK = "\x01"


def _compress(col: Column, prefixes: dict[str, str]) -> Column:
    """Rewrite <ns+local> IRIs to pfx:local inside a term string,
    WITHOUT ever touching literal content.

    Literal content is arbitrary user text (transcript/property
    values) and may spell out things like '<http://bruy.at/prec#x>';
    a naive regexp over the whole (possibly nested RDF-star) term
    string would corrupt it. So: (1) mask every quoted-literal span,
    (2) prefix-compress the masked string — this also catches
    ^^<datatype> IRIs, which sit outside the quotes — (3) splice the
    original literal spans back in order."""
    lits = F.regexp_extract_all(col, F.lit(_LIT_RE), 0)
    masked = F.regexp_replace(col, _LIT_RE, _MASK)
    for pfx, ns in prefixes.items():
        masked = F.regexp_replace(
            masked, "<" + re.escape(ns) + _LOCAL + ">", pfx + r":$1"
        )
    parts = F.split(masked, _MASK, -1)
    restored = F.aggregate(
        F.sequence(F.lit(1), F.size(lits)),
        F.element_at(parts, 1),
        lambda acc, i: F.concat(
            acc, F.element_at(lits, i), F.element_at(parts, i + F.lit(1))
        ),
    )
    return F.when(F.size(lits) == 0, masked).otherwise(restored)


def turtle_lines(
    triples: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """Prefixed-Turtle serialization as a line DataFrame; the @prefix
    header rows form their own FIRST partition, so writing the lines
    as text and concatenating the parts in filename order is a valid
    Turtle document."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    spark = triples.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{ns}> .",) for p, ns in prefixes.items()], "value string"
    ).coalesce(1)
    body = triples.select(
        F.concat_ws(
            " ",
            _compress(F.col("s"), prefixes),
            _compress(F.col("p"), prefixes),
            _compress(F.col("o"), prefixes),
            F.lit("."),
        ).alias("value")
    )
    return header.unionByName(body)


def write_turtle(
    triples: DataFrame, path: str, prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
):
    turtle_lines(triples, prefixes).write.mode(mode).text(path)


def write_triples_parquet(
    triples: DataFrame, path: str, mode: str = "overwrite", partitions: int | None = None
):
    df = triples if partitions is None else triples.repartition(partitions)
    df.write.mode(mode).parquet(path)


# ------------------------------------------------------------ named graphs

def trig_lines(
    quads: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """TriG serialization of an (s, p, o, g) quad table: default-graph
    rows ('<>') print as bare triples, named-graph rows as one-triple
    `<g> { s p o . }` blocks — both valid TriG, line-independent so the
    dataset is again the concatenation of text parts after the header
    partition."""
    prefixes = DEFAULT_PREFIXES if prefixes is None else prefixes
    spark = quads.sparkSession
    header = spark.createDataFrame(
        [(f"@prefix {p}: <{ns}> .",) for p, ns in prefixes.items()], "value string"
    ).coalesce(1)
    triple = F.concat_ws(
        " ",
        _compress(F.col("s"), prefixes),
        _compress(F.col("p"), prefixes),
        _compress(F.col("o"), prefixes),
        F.lit("."),
    )
    body = quads.select(
        F.when(F.col("g") == "<>", triple)
        .otherwise(
            F.concat(
                _compress(F.col("g"), prefixes), F.lit(" { "), triple, F.lit(" }")
            )
        )
        .alias("value")
    )
    return header.unionByName(body)


def write_trig(
    quads: DataFrame, path: str, prefixes: dict[str, str] | None = None,
    mode: str = "overwrite",
):
    trig_lines(quads, prefixes).write.mode(mode).text(path)


def write_quads_parquet(quads: DataFrame, path: str, mode: str = "overwrite"):
    """Graph-partitioned quad sink: one parquet partition directory per
    named graph (`g=...`), so graph-scoped readers prune at the scan."""
    quads.write.mode(mode).partitionBy("g").parquet(path)
