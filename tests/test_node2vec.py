"""Second-order biased walks (plans/node2vec.py) — the engine must
match an independent pure-Python simulator of the documented rule."""

import hashlib

from prec_spark.entry_queries import _kg_node2vec, _kg_triples_oracle
from prec_spark.plans.components import cc_graph
from prec_spark.plans.node2vec import (
    SAMPLE_MOD,
    W_COMMON,
    W_FAR,
    W_RETURN,
    node2vec_oracle_sql,
    node2vec_walks,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _und(spark, pairs):
    return cc_graph(spark.createDataFrame(pairs, "src string, dst string"))[0]


def _md5i(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _simulate(pairs, steps, sample_mod, cap=64):
    """Independent replay of the documented pick rule (driver-side
    Python, no Spark/SQL shared code), including the degree cap."""
    adj: dict[str, set[str]] = {}
    for s, d in pairs:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    capped = {
        n: set(
            sorted(nbs, key=lambda nb: f"{_md5i(f'cap#{n}#{nb}'):010d}{nb}")[:cap]
        )
        for n, nbs in adj.items()
    }
    out = set()
    for start in adj:
        if _md5i(f"n2v#{start}") % sample_mod != 0:
            continue
        prev, cur = start, start
        out.add((start, 0, start))
        for k in range(1, steps + 1):
            best = None
            for nb in sorted(capped[cur]):
                if nb == prev:
                    w = W_RETURN
                elif nb in adj.get(prev, set()):
                    w = W_COMMON
                else:
                    w = W_FAR
                for j in range(w):
                    h = _md5i(f"n2v#{start}#{k}#{nb}#{j}")
                    key = f"{h:010d}{nb}"
                    if best is None or key < best:
                        best, pick = key, nb
            prev, cur = cur, pick
            out.add((start, k, cur))
    return out


BARBELL = [
    ("a", "b"), ("b", "c"), ("c", "a"),   # left triangle
    ("c", "d"),                           # bridge
    ("d", "e"), ("e", "f"), ("f", "d"),   # right triangle
]


def test_matches_independent_simulator(spark):
    """Full walk-set equality on a barbell graph that exercises all
    three weight tiers (return / common / far) across 6 steps."""
    got = {
        (r.walk, r.step, r.node)
        for r in node2vec_walks(_und(spark, BARBELL), steps=6, sample_mod=1).collect()
    }
    assert got == _simulate(BARBELL, steps=6, sample_mod=1)


def test_first_step_uniform_degeneracy(spark):
    """At step 1 prev == start, so every candidate is prev-adjacent
    and the rule degenerates to the uniform W_COMMON race — pinned by
    the simulator equality on a star (all step-1 moves go to a leaf,
    step 2 must return or hop through the hub)."""
    star = [("h", f"l{i}") for i in range(6)]
    got = {
        (r.walk, r.step, r.node)
        for r in node2vec_walks(_und(spark, star), steps=2, sample_mod=1).collect()
    }
    assert got == _simulate(star, steps=2, sample_mod=1)


def test_hub_degree_cap(spark):
    """On a hub of degree > cap the engine must walk the capped view:
    simulator equality at cap=4 over a 12-leaf star."""
    star = [("h", f"l{i}") for i in range(12)]
    got = {
        (r.walk, r.step, r.node)
        for r in node2vec_walks(
            _und(spark, star), steps=3, sample_mod=1, cap=4
        ).collect()
    }
    assert got == _simulate(star, steps=3, sample_mod=1, cap=4)


def test_partition_invariance(spark):
    und = _und(spark, [(f"n{i}", f"n{(i * 7 + 1) % 23}") for i in range(23)])
    a = {
        (r.walk, r.step, r.node)
        for r in node2vec_walks(und, steps=3, sample_mod=2).collect()
    }
    b = {
        (r.walk, r.step, r.node)
        for r in node2vec_walks(und.repartition(13), steps=3, sample_mod=2).collect()
    }
    assert a == b and a


def test_kg_node2vec_oracle(spark):
    compare(
        _kg_node2vec(spark, SF_DIR),
        node2vec_oracle_sql(_kg_triples_oracle()),
        SF_DIR,
    )
