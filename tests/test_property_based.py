"""Property-based round-trip invariants (hypothesis).

Random property graphs — including adversarial property values with
quotes/newlines/backslashes — must survive PG -> PREC-0 -> PG and
PG -> PRSC -> revert unchanged. This is coverage the reference does
not have (SURVEY.md §5.6: no randomized testing)."""

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from prec_spark.contexts.model import PRSCCatalog
from prec_spark.pg.apoc import apoc_to_pg
from prec_spark.prec0 import prec0_quads
from prec_spark.prec0_revert import prec0_revert
from prec_spark.prsc.apply import apply_prsc
from prec_spark.prsc.revert import revert_prsc

text_values = st.text(
    alphabet=st.characters(
        codec="ascii", min_codepoint=32, max_codepoint=126
    ) | st.sampled_from('"\\\n\r\t'),
    min_size=0,
    max_size=12,
)

node_strategy = st.fixed_dictionaries(
    {
        "label": st.sampled_from(["A", "B"]),
        "p": text_values,
    }
)

pg_strategy = st.builds(
    lambda nodes, edge_pairs: (nodes, edge_pairs),
    st.lists(node_strategy, min_size=1, max_size=5),
    st.lists(st.tuples(st.integers(0, 4), st.integers(0, 4)), max_size=5),
)

WB_CTX = """
PREFIX prec: <http://bruy.at/prec#>
PREFIX pvar: <http://bruy.at/prec-trans#>
PREFIX ex: <http://t/>
ex:ARule a prec:PRSCNodeRule ;
  prec:label "A" ; prec:propertyKey "p" ;
  prec:produces << pvar:self a ex:A >>, << pvar:self ex:p "p"^^prec:valueOf >> .
ex:BRule a prec:PRSCNodeRule ;
  prec:label "B" ; prec:propertyKey "p" ;
  prec:produces << pvar:self a ex:B >>, << pvar:self ex:pb "p"^^prec:valueOf >> .
ex:LRule a prec:PRSCEdgeRule ;
  prec:label "L" ;
  prec:produces << pvar:self a ex:L >>, << pvar:self ex:from pvar:source >>,
    << pvar:self ex:to pvar:destination >> .
"""


def to_jsonl(nodes, edge_pairs):
    docs = [
        {"type": "node", "id": str(i), "labels": [n["label"]],
         "properties": {"p": n["p"]}}
        for i, n in enumerate(nodes)
    ]
    for j, (a, b) in enumerate(edge_pairs):
        a, b = a % len(nodes), b % len(nodes)
        docs.append(
            {"type": "relationship", "id": str(100 + j), "label": "L",
             "start": {"id": str(a)}, "end": {"id": str(b)}}
        )
    return "\n".join(json.dumps(d) for d in docs)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pg_strategy)
def test_prec0_roundtrip_random(spark, pg):
    nodes, edge_pairs = pg
    jsonl = to_jsonl(nodes, edge_pairs)
    n_df, e_df = apoc_to_pg(spark, jsonl)
    quads = prec0_quads(n_df, e_df)
    rn, re = prec0_revert(spark, quads)
    orig_n = sorted((tuple(r.labels), tuple(sorted(r.properties.items())))
                    for r in n_df.collect())
    rev_n = sorted((tuple(r.labels), tuple(sorted(r.properties.items())))
                   for r in rn.collect())
    assert rev_n == orig_n
    assert re.count() == e_df.count()


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(pg_strategy)
def test_prsc_roundtrip_random(spark, pg):
    nodes, edge_pairs = pg
    jsonl = to_jsonl(nodes, edge_pairs)
    n_df, e_df = apoc_to_pg(spark, jsonl)
    catalog = PRSCCatalog.from_turtle(WB_CTX)
    assert catalog.well_behaved()
    triples, bad = apply_prsc(spark, n_df, e_df, catalog)
    assert bad.isEmpty()
    rn, re = revert_prsc(spark, triples, catalog)
    # node property multisets survive (labels come back through rules)
    orig = sorted((r.labels[0], r.properties["p"][0]) for r in n_df.collect())
    rev = sorted((r.labels[0], r.properties["p"]) for r in rn.collect())
    assert rev == orig
    assert re.count() == e_df.count()
