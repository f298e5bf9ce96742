"""PRSC reversion round-trip tests (reference: prsc.test.ts revertable
cases + prsc-reversion.ts)."""

import pytest

from prec_spark.contexts.model import PRSCCatalog
from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prsc.apply import apply_prsc
from prec_spark.prsc.revert import ReversionError, revert_prsc

from .test_prsc_golden import ANN_DAN_PG, ANN_DAN3_PG, POTUS_PG, PRSC_CTX, PRSC_WB_CTX, POTUS_CTX


def roundtrip(spark, pg_jsonl, ctx_ttl):
    nodes, edges = apoc_to_pg(spark, pg_jsonl)
    catalog = PRSCCatalog.from_turtle(ctx_ttl)
    triples, bad = apply_prsc(spark, nodes, edges, catalog)
    assert bad.isEmpty()
    rnodes, redges = revert_prsc(spark, triples, catalog)
    return nodes, edges, rnodes, redges, catalog


def _props_set(df, id_col):
    return {
        r[id_col]: dict(r.properties.items()) for r in df.collect()
    }


def test_roundtrip_wb_anndan(spark):
    nodes, edges, rnodes, redges, cat = roundtrip(spark, ANN_DAN_PG, PRSC_WB_CTX)
    # nodes: same count, same property multisets, labels from rules
    orig = {r.node_id: r.properties["name"][0] for r in nodes.collect()}
    rev = {r.node_id: r.properties["name"] for r in rnodes.collect()}
    assert len(rev) == len(orig) == 2
    assert sorted(rev.values()) == sorted(orig.values())
    assert all(r.labels == ["Person"] for r in rnodes.collect())
    # edge endpoints recovered (modulo the deterministic bnode renaming)
    es = redges.collect()
    assert len(es) == 1
    e = es[0]
    ann = next(k for k, v in rev.items() if v == '"Ann"')
    dan = next(k for k, v in rev.items() if v == '"Dan"')
    assert e.src_id == ann and e.dst_id == dan


def test_roundtrip_edge_unique(spark):
    """Non-wb context: the Likes edge is edge-unique; 3 parallel edges
    collapse to 1 on reversion (the information-loss case,
    ex2_anndan.test.ttl:37-42)."""
    nodes, edges, rnodes, redges, cat = roundtrip(spark, ANN_DAN3_PG, PRSC_CTX)
    assert rnodes.count() == 2
    es = redges.collect()
    assert len(es) == 1  # collapsed
    assert es[0].labels == ["Likes"]


def test_roundtrip_wb_keeps_parallel_edges(spark):
    _, _, rnodes, redges, _ = roundtrip(spark, ANN_DAN3_PG, PRSC_WB_CTX)
    assert rnodes.count() == 2
    assert redges.count() == 3


def test_roundtrip_potus(spark):
    nodes, edges, rnodes, redges, _ = roundtrip(spark, POTUS_PG, POTUS_CTX)
    rows = {r.node_id: r for r in rnodes.collect()}
    assert len(rows) == 2
    person = next(r for r in rows.values() if r.labels == ["PERSON"])
    assert set(person.properties.keys()) == {"name", "givenName"}
    assert person.properties["name"] == '"Biden"'
    country = next(r for r in rows.values() if r.labels == ["COUNTRY"])
    assert country.properties["name"] == '"United States of America"'


def test_revert_rejects_foreign_triples(spark):
    """Triples not matching any signature leave untypable blank nodes."""
    catalog = PRSCCatalog.from_turtle(PRSC_WB_CTX)
    df = spark.createDataFrame(
        [("_:x", "<http://unknown/p>", '"v"')], "s STRING, p STRING, o STRING"
    )
    with pytest.raises(ReversionError):
        revert_prsc(spark, df, catalog)
