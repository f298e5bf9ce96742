"""Obsolete-vocabulary rejection (hasForbiddenTerms parity,
/root/reference/src/prec/apply-context.ts:42-99): a context using any
deprecated term must be refused with a hard error listing the terms —
including terms nested inside RDF-star template quads."""

import pytest

from prec_spark.apply_context import check_obsolete_terms, has_forbidden_terms
from prec_spark.rdf.turtle import parse_turtle

PREFIXES = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex:   <http://example.org/>
"""


@pytest.mark.parametrize(
    "ttl,expected",
    [
        # Relationship-era terminology
        ("ex:r a prec:RelationshipRule .", "RelationshipRule"),
        ("prec:Relationships prec:templatedBy prec:RDFReification .", "Relationships"),
        ("ex:r prec:IRIOfRelationshipLabel \"KNOWS\" .", "IRIOfRelationshipLabel"),
        # old PRSC type names
        ("ex:r a prec:prsc_node .", "prsc_node"),
        ("ex:r prec:nodeLabel \"Person\" .", "nodeLabel"),
        # old PREC-C terminology, nested inside a template quad
        (
            "ex:t prec:produces << pvar:entity ex:p ex:o >> .",
            "entity",
        ),
        (
            "ex:t prec:produces << ex:s ex:p pvar:relationshipIRI >> .",
            "relationshipIRI",
        ),
        ("ex:s a prec:SubstitutionTerm .", "SubstitutionTerm"),
    ],
)
def test_forbidden_term_raises(ttl, expected):
    quads = parse_turtle(PREFIXES + ttl)
    with pytest.raises(ValueError) as err:
        check_obsolete_terms(quads)
    msg = str(err.value)
    assert msg.startswith("The context contains the following forbidden terms: ")
    assert expected in msg


def test_clean_context_passes():
    quads = parse_turtle(
        PREFIXES
        + """
    ex:r a prec:EdgeRule ; prec:label "KNOWS" .
    ex:t prec:produces << pvar:source ex:p pvar:destination >> .
    """
    )
    assert has_forbidden_terms(quads) == []
    check_obsolete_terms(quads)


def test_multiple_terms_all_listed():
    quads = parse_turtle(
        PREFIXES + "ex:r a prec:RelationshipRule ; prec:nodeLabel \"X\" ."
    )
    bad = {t.nt() for t in has_forbidden_terms(quads)}
    assert bad == {
        "<http://bruy.at/prec#RelationshipRule>",
        "<http://bruy.at/prec#nodeLabel>",
    }
