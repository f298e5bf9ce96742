"""Generic quad-pattern operators (J1 matchAndBind / J2
findFilterReplace parity — reference: test/dataset/DStar.test.ts)."""

from prec_spark.plans.bgp import (
    delete_matches,
    exists_filter,
    find_filter_replace,
    instantiate,
    match_and_bind,
    match_pattern,
    quads_difference,
    quads_union,
)
from prec_spark.rdf.turtle import parse_turtle


def quads_df(spark, ttl):
    rows = [
        (q.s.nt(), q.p.nt(), q.o.nt())
        for q in parse_turtle("@prefix ex: <http://e/> .\n" + ttl)
    ]
    return spark.createDataFrame(rows, "s STRING, p STRING, o STRING")


GRAPH = """
ex:a ex:knows ex:b .
ex:b ex:knows ex:c .
ex:a ex:name "A" .
ex:b ex:name "B" .
"""


def test_match_pattern(spark):
    df = quads_df(spark, GRAPH)
    rows = match_pattern(df, ("?x", "<http://e/knows>", "?y")).collect()
    assert {(r.x, r.y) for r in rows} == {
        ("<http://e/a>", "<http://e/b>"),
        ("<http://e/b>", "<http://e/c>"),
    }


def test_match_pattern_repeated_variable(spark):
    df = quads_df(spark, GRAPH + "ex:r ex:knows ex:r .")
    rows = match_pattern(df, ("?x", "<http://e/knows>", "?x")).collect()
    assert {r.x for r in rows} == {"<http://e/r>"}


def test_match_and_bind_chain(spark):
    df = quads_df(spark, GRAPH)
    rows = match_and_bind(
        df,
        [
            ("?x", "<http://e/knows>", "?y"),
            ("?y", "<http://e/knows>", "?z"),
        ],
    ).collect()
    assert len(rows) == 1
    assert (rows[0].x, rows[0].y, rows[0].z) == (
        "<http://e/a>", "<http://e/b>", "<http://e/c>",
    )


def test_exists_filter(spark):
    df = quads_df(spark, GRAPH)
    bindings = match_and_bind(df, [("?x", "<http://e/knows>", "?y")])
    # keep only x that also have a name
    out = exists_filter(bindings, df, [[("?x", "<http://e/name>", "?n")]])
    assert {r.x for r in out.collect()} == {"<http://e/a>", "<http://e/b>"}
    # condition on the object side: only pairs whose TARGET has a name
    out2 = exists_filter(bindings, df, [[("?y", "<http://e/name>", "?n")]])
    assert {(r.x, r.y) for r in out2.collect()} == {("<http://e/a>", "<http://e/b>")}


def test_find_filter_replace(spark):
    df = quads_df(spark, GRAPH)
    out = find_filter_replace(
        df,
        source=[("?x", "<http://e/knows>", "?y")],
        conditions=[[("?y", "<http://e/name>", "?n")]],
        destination=[("?y", "<http://e/knownBy>", "?x")],
    )
    rows = {(r.s, r.p, r.o) for r in out.collect()}
    # a knows b (b has a name) -> rewritten; b knows c (c unnamed) -> kept
    assert ("<http://e/b>", "<http://e/knownBy>", "<http://e/a>") in rows
    assert ("<http://e/b>", "<http://e/knows>", "<http://e/c>") in rows
    assert ("<http://e/a>", "<http://e/knows>", "<http://e/b>") not in rows
    # names untouched
    assert ("<http://e/a>", "<http://e/name>", '"A"') in rows


def test_set_ops(spark):
    a = quads_df(spark, "ex:a ex:p ex:b . ex:c ex:p ex:d .")
    b = quads_df(spark, "ex:a ex:p ex:b .")
    assert quads_union(a, b).count() == 2
    assert quads_difference(a, b).count() == 1
    assert delete_matches(a, p="<http://e/p>").count() == 0
    assert delete_matches(a, s="<http://e/a>").count() == 1


def test_ntriples_sink_roundtrip(spark, tmp_path):
    from prec_spark.rdf.sink import write_ntriples
    from prec_spark.rdf.turtle import parse_turtle

    df = quads_df(spark, 'ex:a ex:p "x\\ny" . ex:a ex:q ex:b .')
    out = str(tmp_path / "nt")
    write_ntriples(df, out)
    text = "\n".join(r.value for r in spark.read.text(out).collect())
    reparsed = {(q.s.nt(), q.p.nt(), q.o.nt()) for q in parse_turtle(text)}
    assert reparsed == {(r.s, r.p, r.o) for r in df.collect()}


def test_optional_bind(spark):
    """SPARQL OPTIONAL: bindings without a group match survive with a
    NULL; group-internal patterns stay conjunctive."""
    from prec_spark.plans.bgp import optional_bind

    q = quads_df(
        spark,
        "ex:t1 ex:in ex:c1 . ex:t2 ex:in ex:c1 . "
        "ex:t1 ex:tool ex:search . ex:search ex:name ex:n1 .",
    )
    base = match_and_bind(q, [("?t", "<http://e/in>", "?c")])
    got = {
        (r.t, r.tool): r
        for r in optional_bind(
            base, q,
            [("?t", "<http://e/tool>", "?tool"),
             ("?tool", "<http://e/name>", "?nm")],
        ).collect()
    }
    assert got[("<http://e/t1>", "<http://e/search>")].nm == "<http://e/n1>"
    assert ("<http://e/t2>", None) in got  # unmatched -> NULL, row kept
    assert len(got) == 2


def test_union_and_minus_bind(spark):
    """UNION keeps multiplicity; MINUS drops bindings compatible with
    the (possibly filtered) group on shared variables."""
    from pyspark.sql import functions as F

    from prec_spark.plans.bgp import minus_bind, union_bind

    q = quads_df(
        spark,
        "ex:t1 ex:m ex:e1 . ex:t1 ex:m ex:e2 . ex:t2 ex:u ex:x . "
        "ex:t1 ex:in ex:c1 . ex:t2 ex:in ex:c2 .",
    )
    a = match_and_bind(q, [("?t", "<http://e/m>", "?e")]).select(
        "t", F.lit("m").alias("src")
    )
    b = match_and_bind(q, [("?t", "<http://e/u>", "?x")]).select(
        "t", F.lit("u").alias("src")
    )
    u = union_bind(a, b)
    assert u.count() == 3  # t1 twice (multiplicity), t2 once
    grp = match_and_bind(q, [("?t", "<http://e/in>", "?c")]).filter(
        F.col("c") == "<http://e/c1>"
    )
    got = [(r.t, r.src) for r in minus_bind(u, grp).collect()]
    assert got == [("<http://e/t2>", "u")]


def test_aggregate_bind(spark):
    """SPARQL GROUP BY + aggregates + HAVING: counts are over binding
    multiplicity, DISTINCT counts over distinct bound terms, and
    HAVING filters the aggregated frame."""
    from pyspark.sql import functions as F

    from prec_spark.plans.bgp import aggregate_bind

    q = quads_df(
        spark,
        "ex:t1 ex:m ex:e1 . ex:t2 ex:m ex:e1 . ex:t2 ex:m ex:e2 . "
        "ex:t3 ex:m ex:e1 . ex:e1 ex:name \"A\" . ex:e2 ex:name \"B\" .",
    )
    b = match_and_bind(
        q,
        [("?t", "<http://e/m>", "?e"), ("?e", "<http://e/name>", "?n")],
    )
    got = {
        r.n: (r.cnt, r.n_turns, r.first)
        for r in aggregate_bind(
            b,
            ["n"],
            {
                "cnt": F.count(F.lit(1)),
                "n_turns": F.countDistinct("t"),
                "first": F.min("t"),
            },
        ).collect()
    }
    assert got == {
        '"A"': (3, 3, "<http://e/t1>"),
        '"B"': (1, 1, "<http://e/t2>"),
    }
    kept = aggregate_bind(
        b,
        ["n"],
        {"n_turns": F.countDistinct("t")},
        having=F.col("n_turns") >= 2,
    ).collect()
    assert [(r.n, r.n_turns) for r in kept] == [('"A"', 3)]


def test_slice_bind_total_order(spark):
    """ORDER BY + LIMIT: with a total order spec the selected row set
    is deterministic under ties."""
    from pyspark.sql import functions as F

    from prec_spark.plans.bgp import aggregate_bind, slice_bind

    q = quads_df(
        spark,
        "ex:t1 ex:m ex:e1 . ex:t2 ex:m ex:e1 . "
        "ex:t1 ex:m ex:e2 . ex:t2 ex:m ex:e3 .",
    )
    b = match_and_bind(q, [("?t", "<http://e/m>", "?e")])
    agg = aggregate_bind(b, ["e"], {"cnt": F.count(F.lit(1))})
    top2 = slice_bind(
        agg, [F.col("cnt").desc(), F.col("e").asc()], 2
    ).collect()
    # e1 has cnt=2; e2/e3 tie at 1 -> the name tiebreak picks e2
    assert [(r.e, r.cnt) for r in top2] == [
        ("<http://e/e1>", 2),
        ("<http://e/e2>", 1),
    ]
