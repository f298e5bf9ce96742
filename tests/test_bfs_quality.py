"""Bounded-horizon BFS (plans/bfs.py) and the Gopher-quality / PII
operators (text/quality.py): exactness against independent references
and oracle equivalence."""

import duckdb
import pytest
from pyspark.sql import functions as F

from prec_spark.plans.bfs import HORIZON, INF, SEED_PREFIX, bfs_ids, bfs_oracle_sql
from prec_spark.plans.components import SCHEMA_PREDICATES, cc_encode, cc_graph, instance_edges

# seeds: e1; chain e1-a-b-c; isolated pair x-y (never reached);
# a literal and a schema edge that must be ignored
_TYPE = SCHEMA_PREDICATES[0]
TRIPLES = [
    (f"{SEED_PREFIX}e1", "<p>", "<a>"),
    ("<a>", "<p>", "<b>"),
    ("<b>", "<p>", "<c>"),
    ("<x>", "<p>", "<y>"),
    ("<a>", "<p>", '"literal"'),
    ("<a>", _TYPE, "<Class>"),
]


def reference_bfs(triples, horizon=HORIZON):
    edges = [
        (s, o)
        for s, p, o in triples
        if not o.startswith('"') and p not in SCHEMA_PREDICATES
    ]
    adj = {}
    for s, o in edges:
        adj.setdefault(s, set()).add(o)
        adj.setdefault(o, set()).add(s)
    dist = {v: (0 if v.startswith(SEED_PREFIX) else None) for v in adj}
    frontier = {v for v, d in dist.items() if d == 0}
    for h in range(1, horizon + 1):
        frontier = {
            u for v in frontier for u in adj[v] if dist[u] is None
        }
        for u in frontier:
            dist[u] = h
        if not frontier:
            break
    return dist


@pytest.fixture(scope="module")
def graph(spark):
    t = spark.createDataFrame(TRIPLES, "s string, p string, o string")
    und, nodes = cc_graph(instance_edges(t))
    ids, iund = cc_encode(und, nodes)
    return ids.localCheckpoint(), iund.localCheckpoint()


def test_bfs_matches_reference(spark, graph):
    ids, iund = graph
    got = {r["node"]: r["dist"] for r in bfs_ids(ids, iund).collect()}
    assert got == reference_bfs(TRIPLES)
    assert got["<c>"] == 3 and got["<x>"] is None and got[f"{SEED_PREFIX}e1"] == 0


def test_bfs_oracle_matches_reference():
    con = duckdb.connect()
    con.execute("CREATE TABLE trip(s VARCHAR, p VARCHAR, o VARCHAR)")
    con.executemany("INSERT INTO trip VALUES (?, ?, ?)", TRIPLES)
    got = dict(con.execute(bfs_oracle_sql("SELECT s, p, o FROM trip")).fetchall())
    assert got == reference_bfs(TRIPLES)


def test_bfs_horizon_caps(spark, graph):
    """horizon=2 must leave <c> (3 hops out) unreached — the bounded
    contract, not a convergence failure."""
    ids, iund = graph
    got = {r["node"]: r["dist"] for r in bfs_ids(ids, iund, horizon=2).collect()}
    assert got["<b>"] == 2 and got["<c>"] is None


# ------------------------------------------------------------- quality

def reference_quality(doc_id, text):
    from prec_spark.text.analysis import STOPWORDS
    from prec_spark.text.quality import (
        MAX_DUP_BIGRAM_PCT,
        MAX_MWL_X100,
        MAX_WORDS,
        MIN_MWL_X100,
        MIN_STOP_HITS,
        MIN_WORDS,
    )

    words = text.split(" ")
    n = len(words)
    mwl = (100 * (len(text) - n + 1)) // n
    n_stop = sum(w in STOPWORDS for w in words)
    bigrams = [f"{a} {b}" for a, b in zip(words, words[1:])]
    maxc = max((bigrams.count(b) for b in set(bigrams)), default=0)
    nbg = len(bigrams)
    dup = 0 if nbg == 0 else (100 * maxc) // nbg
    keep = (
        MIN_WORDS <= n <= MAX_WORDS
        and MIN_MWL_X100 <= mwl <= MAX_MWL_X100
        and n_stop >= MIN_STOP_HITS
        and dup <= MAX_DUP_BIGRAM_PCT
    )
    return (doc_id, n, mwl, n_stop, maxc, nbg, dup, keep)


def test_quality_gopher_matches_reference(spark, sf_dir):
    from prec_spark.text.quality import quality_gopher
    from prec_spark.session import load_table

    got = {r["doc_id"]: tuple(r) for r in quality_gopher(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    for row in docs[:50]:
        assert got[row["doc_id"]] == reference_quality(row["doc_id"], row["text"])


def test_quality_gopher_edge_cases(spark):
    """One-word doc (no bigrams), repetitive doc (dup rule fires)."""
    import prec_spark.text.quality as q

    rows = [
        (1, "solo"),
        (2, " ".join(["the a"] * 30)),  # one dominant bigram (50%)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    orig = q.load_table
    try:
        q.load_table = lambda s, d, t: df
        got = {r["doc_id"]: r.asDict() for r in q.quality_gopher(spark, "-").collect()}
    finally:
        q.load_table = orig
    assert got[1]["n_bigrams"] == 0 and got[1]["dup_bigram_pct"] == 0
    assert not got[1]["keep"]
    assert got[2]["dup_bigram_pct"] > q.MAX_DUP_BIGRAM_PCT
    assert not got[2]["keep"]
    for did, text in rows:
        assert tuple(got[did].values()) == reference_quality(did, text)


def test_pii_scrub_injection_and_negative_control(spark, sf_dir):
    from prec_spark.text.quality import pii_scrub

    rows = pii_scrub(spark, sf_dir).orderBy("doc_id").limit(5).collect()
    for r in rows:
        assert r["n_emails"] == 1 and r["n_phones"] == 1
        assert "<EMAIL>" in r["scrubbed"] and "<PHONE>" in r["scrubbed"]
        assert "a@b" in r["scrubbed"]  # decoy survives
        assert "@example.com" not in r["scrubbed"]
        assert "555-0" not in r["scrubbed"].replace("<PHONE>", "")


# -------------------------------------------------------------- tf-idf

def reference_tfidf(docs):
    from prec_spark.text.quality import IDF_SCALE, QUERY_TERMS, TOP_K

    n = len(docs)
    tf = {}
    for doc_id, text in docs:
        for w in text.split(" "):
            if w in QUERY_TERMS:
                tf[(doc_id, w)] = tf.get((doc_id, w), 0) + 1
    df = {}
    for (_d, w), _c in tf.items():
        df[w] = df.get(w, 0) + 1
    idf = {w: (IDF_SCALE * n) // c for w, c in df.items()}
    score = {}
    for (d, w), c in tf.items():
        score[d] = score.get(d, 0) + c * idf[w]
    ranked = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP_K]
    return ranked


def test_tfidf_matches_reference(spark, sf_dir):
    from prec_spark.session import load_table
    from prec_spark.text.quality import tfidf_rank

    docs = [
        (r["doc_id"], r["text"])
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    ]
    got = [(r["doc_id"], r["score"]) for r in tfidf_rank(spark, sf_dir).collect()]
    assert got == reference_tfidf(docs)


def test_tfidf_plan_shape(spark, sf_dir):
    """Top-K must be TakeOrderedAndProject (no global sort) and the idf
    dimension must broadcast (no SortMergeJoin)."""
    from prec_spark.text.quality import tfidf_rank

    plan = tfidf_rank(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_quality_repetition_matches_python_reference(spark, sf_dir):
    """Every signal of the Gopher repetition battery, recomputed in
    plain Python per document, must match the Spark output exactly
    (including the packed-key count-tie resolution and the verdict)."""
    from collections import Counter

    from prec_spark.session import load_table
    from prec_spark.text.quality import (
        REP_DUP,
        REP_TOP,
        _REP_KEY,
        quality_repetition,
    )

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    got = {r.doc_id: r for r in quality_repetition(spark, sf_dir).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        w = text.split(" ")
        tchars = len(text) - (len(w) - 1)
        row = got[doc_id]
        assert row.tchars == tchars
        conds = []
        for n in sorted(REP_TOP) + sorted(REP_DUP):
            grams = (
                [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
                if len(w) >= n
                else []
            )
            c = Counter(grams)
            mk = max(
                (
                    cnt * _REP_KEY + cnt * (len(g) - (n - 1))
                    for g, cnt in c.items()
                ),
                default=0,
            )
            dc = sum(
                cnt * (len(g) - (n - 1)) for g, cnt in c.items() if cnt >= 2
            )
            if n in REP_TOP:
                assert row[f"top{n}_cnt"] == mk // _REP_KEY, (doc_id, n)
                assert row[f"top{n}_cov"] == mk % _REP_KEY, (doc_id, n)
                conds.append((mk % _REP_KEY) * 100 <= REP_TOP[n] * tchars)
            else:
                assert row[f"dup{n}_cov"] == dc, (doc_id, n)
                conds.append(dc * 100 <= REP_DUP[n] * tchars)
        assert row.keep == all(conds), doc_id
    # the battery must discriminate on this corpus
    keeps = {r.keep for r in got.values()}
    assert keeps == {True, False}, keeps


def test_quality_repetition_oracle(spark, sf_dir):
    from prec_spark.text.quality import (
        quality_repetition,
        quality_repetition_oracle_sql,
    )

    from .oracle_util import compare

    compare(quality_repetition(spark, sf_dir), quality_repetition_oracle_sql(), sf_dir)
