"""Connected components (plans/components.py): exactness against a
union-find reference, oracle equivalence, loud non-convergence, and
the partitioning invariance that justifies hash-gating it."""

import duckdb
import pytest

from prec_spark.plans.components import (
    SCHEMA_PREDICATES,
    components,
    components_oracle_sql,
)

# two real components: {a,b,c,d} (chain + reification wiring) and
# {x,y}; schema predicates (rdf:type to a shared class hub) and
# literal objects must NOT merge them
_TYPE = SCHEMA_PREDICATES[0].strip("<>")
TRIPLES = [
    ("<a>", "<p1>", "<b>"),
    ("<b>", "<p1>", "<c>"),
    ("<d>", "<p2>", "<c>"),
    ("<x>", "<p1>", "<y>"),
    ("<a>", "<p1>", '"literal value"'),
    ("<a>", f"<{_TYPE}>", "<Class>"),
    ("<x>", f"<{_TYPE}>", "<Class>"),
]


def reference_components(triples):
    """Union-find over the same instance-edge semantics."""
    edges = [
        (s, o)
        for s, p, o in triples
        if not o.startswith('"') and p not in SCHEMA_PREDICATES
    ]
    parent = {}

    def find(v):
        parent.setdefault(v, v)
        while parent[v] != v:
            parent[v] = parent[parent[v]]
            v = parent[v]
        return v

    for s, o in edges:
        rs, ro = find(s), find(o)
        if rs != ro:
            parent[max(rs, ro)] = min(rs, ro)
    return {v: find(v) for v in parent}


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(TRIPLES, "s string, p string, o string")


def test_components_match_reference(spark, tiny):
    got = {r["node"]: r["comp"] for r in components(tiny).collect()}
    want = reference_components(TRIPLES)
    assert got == want
    # sanity on the fixture itself: two components, hubs excluded
    assert got["<d>"] == got["<a>"] == "<a>"
    assert got["<x>"] == got["<y>"] == "<x>"
    assert "<Class>" not in got


def test_components_oracle_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE trip(s VARCHAR, p VARCHAR, o VARCHAR)")
    con.executemany("INSERT INTO trip VALUES (?, ?, ?)", TRIPLES)
    got = dict(con.execute(components_oracle_sql("SELECT s, p, o FROM trip")).fetchall())
    assert got == reference_components(TRIPLES)


def test_components_long_chain_converges(spark):
    """A 100-hop chain needs 6 nm+jump rounds (propagation radius grows
    geometrically); the default 8 rounds must converge, and an
    under-provisioned round count must fail LOUDLY, not return
    non-transitive labels."""
    chain = [(f"<n{i:03d}>", "<p>", f"<n{i + 1:03d}>") for i in range(100)]
    df = spark.createDataFrame(chain, "s string, p string, o string")
    got = {r["node"]: r["comp"] for r in components(df).collect()}
    assert set(got.values()) == {"<n000>"}
    with pytest.raises(RuntimeError, match="still changing"):
        components(df, rounds=2).collect()


def test_components_partitioning_invariance(spark, tiny):
    one = {r["node"]: r["comp"] for r in components(tiny.coalesce(1)).collect()}
    many = {r["node"]: r["comp"] for r in components(tiny.repartition(7)).collect()}
    assert one == many
