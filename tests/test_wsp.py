"""Weighted shortest paths: Python-replay parity on crafted graphs."""

import hashlib

from prec_spark.plans.components import cc_graph
from prec_spark.plans.wsp import ROUNDS, W_MOD, wsp


def _w(src, dst):
    h = hashlib.md5(f"w#{src}|{dst}".encode()).hexdigest()[:8]
    return int(h, 16) % W_MOD + 1


def _ref(edges, rounds=ROUNDS):
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    nodes = {a for a, _ in und}
    inf = 10**9
    dist = {n: (0 if n.startswith("_:entity_") else inf) for n in nodes}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v in und:
            nxt[v] = min(nxt[v], dist[u] + _w(u, v))
        dist = nxt
    return {n: (None if d >= inf else d) for n, d in dist.items()}


def test_wsp_matches_python_replay(spark):
    edges = [
        ("_:entity_a", "t1"), ("t1", "t2"), ("t2", "t3"), ("t3", "t4"),
        ("_:entity_b", "t4"), ("t1", "t4"), ("x1", "x2"),  # x* unreachable
        ("_:entity_a", "t3"),
    ]
    und = cc_graph(spark.createDataFrame(edges, "src string, dst string"))[0]
    got = {r.node: r.dist for r in wsp(und).collect()}
    assert got == _ref(edges)
    assert got["x1"] is None and got["x2"] is None
    # a longer-hop path can be cheaper: the replay above already pins
    # exact weighted values, but assert reachable nodes are finite
    assert all(got[n] is not None for n in got if not n.startswith("x"))


def test_wsp_round_bound_is_the_contract(spark):
    """A 3-edge path needs 3 rounds: with rounds=2 the far node stays
    unreached; with rounds=3 it resolves."""
    edges = [("_:entity_a", "m1"), ("m1", "m2"), ("m2", "m3")]
    und = cc_graph(spark.createDataFrame(edges, "src string, dst string"))[0]
    two = {r.node: r.dist for r in wsp(und, rounds=2).collect()}
    three = {r.node: r.dist for r in wsp(und, rounds=3).collect()}
    assert two["m3"] is None
    assert three["m3"] == _ref(edges, rounds=3)["m3"] is not None
