"""are_disjoint_types / all_usage_of_are callable operators
(path-travelling.ts:44-57, dataset/index.ts:217-251 parity)."""

from prec_spark.plans.audit import A, all_usage_of_are, are_disjoint_types

PGO_NODE = "<http://ii.uwb.edu.pl/pgo#Node>"
PGO_EDGE = "<http://ii.uwb.edu.pl/pgo#Edge>"


def _quads(spark, rows):
    return spark.createDataFrame(rows, "s string, p string, o string")


def test_disjoint_types_true(spark):
    q = _quads(spark, [("_:a", A, PGO_NODE), ("_:b", A, PGO_EDGE)])
    assert are_disjoint_types(q, [PGO_NODE, PGO_EDGE])


def test_disjoint_types_false(spark):
    q = _quads(
        spark,
        [("_:a", A, PGO_NODE), ("_:a", A, PGO_EDGE), ("_:b", A, PGO_EDGE)],
    )
    assert not are_disjoint_types(q, [PGO_NODE, PGO_EDGE])


def test_all_usage_authorized(spark):
    q = _quads(
        spark,
        [
            ("_:e", A, PGO_EDGE),
            ("_:e", "<http://p>", "_:x"),
            ("_:other", A, PGO_NODE),
        ],
    )
    out = all_usage_of_are(
        q, "_:e", [(None, A, PGO_EDGE), ("_:e", "<http://p>", None)]
    )
    assert out is not None and out.count() == 2


def test_all_usage_unauthorized_returns_none(spark):
    q = _quads(
        spark,
        [("_:e", A, PGO_EDGE), ("_:y", "<http://q>", "_:e")],  # object use not allowed
    )
    assert all_usage_of_are(q, "_:e", [(None, A, PGO_EDGE)]) is None


def test_all_usage_finds_nested_star_occurrence(spark):
    q = _quads(
        spark,
        [("<< _:e <http://p> _:x >>", A, "<http://T>")],
    )
    # nested occurrence present but no authorized pattern covers it
    assert all_usage_of_are(q, "_:e", [("_:e", None, None)]) is None


def test_all_usage_nested_pattern_wildcards(spark):
    """The reference's RDF-star cases (DStar.test.ts:207-225): a
    pattern position may be a nested pattern quad whose OWN positions
    hold wildcards — the nested usage is judged by the nested quad's
    structure, not the enclosing quad's top-level strings."""
    toto_quad = "<< <http://ex/toto> <http://ex/likes> <http://ex/anna> >>"
    q = _quads(
        spark,
        [("<http://ex/a_former_twitter_user>", "<http://ex/says>", toto_quad)],
    )
    ok = all_usage_of_are(
        q,
        "<http://ex/toto>",
        [(
            "<http://ex/a_former_twitter_user>",
            "<http://ex/says>",
            ("<http://ex/toto>", None, None),
        )],
    )
    assert ok is not None and ok.count() == 1
    # wrong nested subject -> the usage is unauthorized
    assert (
        all_usage_of_are(
            q, "<http://ex/toto>", [(None, None, ("<http://ex/anna>", None, None))]
        )
        is None
    )


def test_prec0_revert_disjointness_precondition(spark):
    """prec0_revert must refuse a graph where an element is both a
    node and an edge (prec-0-reversion.ts:104-106 parity)."""
    import pytest

    from prec_spark.prec0_revert import Prec0ReversionError, prec0_revert

    q = _quads(
        spark,
        [("_:x", A, PGO_NODE), ("_:x", A, PGO_EDGE)],
    )
    with pytest.raises(Prec0ReversionError, match="not disjoint"):
        prec0_revert(spark, q)
