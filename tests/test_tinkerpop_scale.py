"""GraphSON scale-path reader parity: tinkerpop_read_json (distributed
spark.read.json + VARIANT expressions) must produce byte-identical
(nodes, edges, meta) to the driver-loop loader on a generated corpus
of 10^5 vertices (round-2 VERDICT item 6)."""

import json
import random

import pytest

from prec_spark.pg.tinkerpop import tinkerpop_read_json, tinkerpop_to_pg

N_VERTICES = 100_000
N_EDGES = 40_000


def _gen_docs():
    rng = random.Random(42)
    docs = []
    for i in range(N_VERTICES):
        props = {
            "name": [{"value": f"name-{i}"}],
            "rank": [{"value": rng.randint(0, 10_000)}],
        }
        if i % 7 == 0:
            props["score"] = [{"value": rng.randint(1, 9) / 2.0}]
        if i % 11 == 0:
            props["tags"] = [{"value": [f"t{i % 5}", f"u{i % 3}"]}]
        if i % 10 == 0:  # ~10% carry meta-properties
            props["name"][0]["meta"] = {
                "since": 2000 + i % 25,
                "src": f"sys{i % 4}",
            }
        if i % 13 == 0:  # multi-valued occurrence
            props["name"].append({"value": f"alias-{i}", "meta": {"n": i % 3}})
        docs.append(
            {
                "type": "vertex",
                "id": str(i),
                "label": "person" if i % 3 else "person::admin",
                "properties": props,
            }
        )
    for j in range(N_EDGES):
        docs.append(
            {
                "type": "edge",
                "id": f"e{j}",
                "label": "knows" if j % 2 else "follows",
                "outV": str(j % N_VERTICES),
                "inV": str((j * 7 + 1) % N_VERTICES),
                "properties": {"weight": (j % 10) / 2.0, "n": j % 5}
                if j % 3 == 0
                else None,
            }
        )
    return docs


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    docs = _gen_docs()
    p = tmp_path_factory.mktemp("graphson") / "graph.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    return docs, str(p)


def _norm_nodes(df):
    return {
        (r.node_id, tuple(r.labels), tuple(sorted((k, tuple(v)) for k, v in r.properties.items())))
        for r in df.collect()
    }


def _norm_edges(df):
    return {
        (r.edge_id, r.src_id, r.dst_id, r.label,
         tuple(sorted((k, tuple(v)) for k, v in r.properties.items())))
        for r in df.collect()
    }


def _norm_meta(df):
    return {
        (r.holder_id, r.key, r.value_pos,
         tuple(sorted((k, tuple(v)) for k, v in r.meta.items())))
        for r in df.collect()
    }


def test_reader_parity_100k(spark, corpus):
    docs, path = corpus
    n1, e1, m1 = tinkerpop_to_pg(spark, docs)
    n2, e2, m2 = tinkerpop_read_json(spark, path)
    assert _norm_nodes(n2) == _norm_nodes(n1)
    assert _norm_edges(e2) == _norm_edges(e1)
    meta2, meta1 = _norm_meta(m2), _norm_meta(m1)
    assert len(meta1) > N_VERTICES // 10  # non-vacuous meta side table
    assert meta2 == meta1


def test_reader_parity_edge_cases(spark, tmp_path):
    """Round-3 ADVICE parity gaps: integers beyond int64 must stay
    xsd:integer (the VARIANT reader sees them as DECIMAL(p,0)), and an
    explicit '"meta": {}' must be skipped like the driver's falsy
    occ.get('meta') check."""
    docs = [
        {
            "type": "vertex",
            "id": "0",
            "label": "thing",
            "properties": {
                "big": [{"value": 123456789012345678901234567890}],
                "neg": [{"value": -98765432109876543210}],
                # JSON doubles that parse to small scale-0 decimals
                # (variant strips the trailing zero) must STAY doubles
                "whole": [{"value": 3.0}],
                "name": [{"value": "x", "meta": {}}],  # empty meta: no row
                "kept": [{"value": "y", "meta": {"k": 1}}],
            },
        }
    ]
    p = tmp_path / "edge.jsonl"
    with open(p, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")
    n1, e1, m1 = tinkerpop_to_pg(spark, docs)
    n2, e2, m2 = tinkerpop_read_json(spark, str(p))
    assert _norm_nodes(n2) == _norm_nodes(n1)
    assert _norm_meta(m2) == _norm_meta(m1)
    props = {k: v for k, v in n2.collect()[0].properties.items()}
    assert props["big"] == [
        '"123456789012345678901234567890"'
        '^^<http://www.w3.org/2001/XMLSchema#integer>'
    ]
    assert props["neg"] == [
        '"-98765432109876543210"^^<http://www.w3.org/2001/XMLSchema#integer>'
    ]
    assert props["whole"] == [
        '"3.0"^^<http://www.w3.org/2001/XMLSchema#double>'
    ]
    assert {(r.holder_id, r.key) for r in m2.collect()} == {("vertex:0", "kept")}
