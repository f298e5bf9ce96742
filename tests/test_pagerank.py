"""Integer PageRank (plans/pagerank.py): exactness against an
independent dict-based reference, oracle equivalence, and the
order-independence that justifies hash-gating it."""

import duckdb
import pytest

from prec_spark.plans.pagerank import (
    BASE,
    DAMP_DEN,
    DAMP_NUM,
    ITERS,
    SCALE,
    pagerank,
    pagerank_oracle_sql,
)

# a small multigraph: hub 'a' -> b,c,d; chain b->c->d; d->a (cycle);
# 'lit' objects must be ignored; 'e' is dangling (in-edges only);
# a->b appears TWICE (two predicates) and must carry mass twice
TRIPLES = [
    ("<a>", "<p1>", "<b>"),
    ("<a>", "<p2>", "<b>"),
    ("<a>", "<p1>", "<c>"),
    ("<a>", "<p1>", "<d>"),
    ("<b>", "<p1>", "<c>"),
    ("<c>", "<p1>", "<d>"),
    ("<d>", "<p1>", "<a>"),
    ("<d>", "<p1>", "<e>"),
    ("<a>", "<p1>", '"literal value"'),
    ("_:bn", "<p1>", "<a>"),
]


def reference_pagerank(triples, iters=ITERS):
    edges = [(s, o) for s, _p, o in triples if not o.startswith('"')]
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    mass = {n: SCALE for n in nodes}
    for _ in range(iters):
        nxt = {n: BASE for n in nodes}
        for s, d in edges:
            nxt[d] += (mass[s] * DAMP_NUM) // (DAMP_DEN * deg[s])
        mass = nxt
    return mass


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def test_pagerank_matches_reference(spark, tiny):
    got = {r["node"]: r["mass"] for r in pagerank(tiny).collect()}
    assert got == reference_pagerank(TRIPLES)


def test_pagerank_oracle_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE trip(s VARCHAR, p VARCHAR, o VARCHAR)")
    con.executemany("INSERT INTO trip VALUES (?, ?, ?)", TRIPLES)
    sql = pagerank_oracle_sql("SELECT s, p, o FROM trip")
    got = dict(con.execute(sql).fetchall())
    assert got == reference_pagerank(TRIPLES)


def test_pagerank_partitioning_invariance(spark, tiny):
    """The integer arithmetic makes the result independent of physical
    partitioning — the property that lets the driver hash it."""
    one = {r["node"]: r["mass"] for r in pagerank(tiny.coalesce(1)).collect()}
    many = {r["node"]: r["mass"] for r in pagerank(tiny.repartition(7)).collect()}
    assert one == many


def test_pagerank_structure(spark, tiny):
    got = {r["node"]: r["mass"] for r in pagerank(tiny).collect()}
    # literals are not nodes; bnode subjects are
    assert '"literal value"' not in got
    assert "_:bn" in got
    # every node keeps at least the teleport mass; a dangling node with
    # in-edges still accumulates
    assert all(m >= BASE for m in got.values())
    assert got["<e>"] > BASE
    # the doubled a->b edge carries mass twice: since mass(a) >= BASE
    # at every iteration and a has 4 resource out-edges, b's floor is
    # the teleport base plus two per-edge contributions from a
    assert got["<b>"] >= BASE + 2 * (BASE * DAMP_NUM) // (DAMP_DEN * 4)
