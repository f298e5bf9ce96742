"""Gopher-style quality filtering, PII scrubbing, and integer TF-IDF
retrieval over `documents`.

Training-data-pipeline operators (no reference counterpart; required
first-class components per the build brief), both hash-gated:

* ``quality_gopher`` — the composite document-quality verdict a
  pretraining pipeline applies before tokenization: word-count bounds,
  mean-word-length bounds, minimum stop-word evidence, and the
  REPETITION rule (fraction of all word-bigrams taken by the most
  frequent one).  Every statistic is exact integer arithmetic (the
  mean word length is a x100 fixed-point div, the repetition share an
  integer percentage), so the whole verdict row hash-matches DuckDB.

* ``pii_scrub`` — regex redaction of emails/phones.  The synthetic
  corpus contains no PII, so the operator follows the media-codec gate
  pattern: a deterministic injector appends per-doc PII spans (plus a
  negative-control decoy that must NOT match), the scrubber redacts
  with plain character-class regexes that mean the same thing to
  Java's engine and DuckDB's RE2, and the oracle predicts the SCRUBBED
  text closed-form without ever running a regex — so the gate checks
  the redaction hits exactly the injected spans and nothing else.

Scale notes: both are embarrassingly parallel single-pass scans (the
repetition rule adds one per-doc-keyed aggregation whose fan-in is the
per-document bigram multiset — no global shuffle beyond the doc key).
No Python rows anywhere; everything is JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .analysis import STOPWORDS

#: Gopher-ish rule thresholds (integer/fixed-point so the verdict is
#: exactly portable): 50 <= words <= 100k, 3.00 <= mean word len <=
#: 10.00, >= 2 stop-word hits, top bigram <= 20% of all bigrams.
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MWL_X100, MAX_MWL_X100 = 300, 1000
MIN_STOP_HITS = 2
MAX_DUP_BIGRAM_PCT = 20


def quality_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, mean_word_len_x100, n_stop, max_bigram_count,
    n_bigrams, dup_bigram_pct, keep) — integer-exact composite quality
    verdict."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.split("text", " ")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    base = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_words"),
        # single-space tokenized: total token chars = n_chars - (n-1)
        F.expr(
            "(100 * (length(text) - size(split(text, ' ')) + 1))"
            " div size(split(text, ' '))"
        ).alias("mean_word_len_x100"),
        F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
        .cast("long")
        .alias("n_stop"),
        toks.alias("t"),
    )
    # bigram strings (tokens never contain spaces, so the join is
    # injective); sequence() descends when stop < start, hence the
    # explicit empty-array guard for sub-2-token docs
    bigrams = base.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(t) < 2 THEN array()"
                " ELSE transform(sequence(1, size(t) - 1),"
                " i -> concat(element_at(t, i), ' ', element_at(t, i + 1))) END"
            )
        ).alias("bg"),
    )
    counts = bigrams.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("c"))
    rep = counts.groupBy("doc_id").agg(
        F.max("c").alias("max_bigram_count"), F.sum("c").alias("n_bigrams")
    )
    out = base.drop("t").join(rep, "doc_id", "left").select(
        "doc_id",
        "n_words",
        "mean_word_len_x100",
        "n_stop",
        F.coalesce("max_bigram_count", F.lit(0)).alias("max_bigram_count"),
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
    )
    dup_pct = F.when(F.col("n_bigrams") == 0, F.lit(0)).otherwise(
        F.expr("(100 * max_bigram_count) div n_bigrams")
    )
    return (
        out.withColumn("dup_bigram_pct", dup_pct)
        .withColumn(
            "keep",
            (F.col("n_words") >= MIN_WORDS)
            & (F.col("n_words") <= MAX_WORDS)
            & (F.col("mean_word_len_x100") >= MIN_MWL_X100)
            & (F.col("mean_word_len_x100") <= MAX_MWL_X100)
            & (F.col("n_stop") >= MIN_STOP_HITS)
            & (F.col("dup_bigram_pct") <= MAX_DUP_BIGRAM_PCT),
        )
        # the oracle's sum()/`//` emit HUGEINT, which reaches the
        # driver's comparison as float64 — emit double so the typed
        # hash agrees (the round-5 quality_gopher red row)
        .withColumn("n_bigrams", F.col("n_bigrams").cast("double"))
        .withColumn("dup_bigram_pct", F.col("dup_bigram_pct").cast("double"))
    )


def quality_gopher_oracle_sql() -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS)
    return f"""
WITH toks AS (
  SELECT doc_id, text, string_split(text, ' ') AS t FROM documents
),
base AS (
  SELECT doc_id,
         len(t) AS n_words,
         (100 * (length(text) - len(t) + 1)) // len(t) AS mean_word_len_x100,
         len(list_filter(t, x -> list_contains([{stop}], x))) AS n_stop,
         t
  FROM toks
),
bg AS (
  SELECT doc_id, unnest(list_zip(t, t[2:])) AS pr FROM base
),
cnt AS (
  SELECT doc_id, pr[1] AS w1, pr[2] AS w2, count(*) AS c
  FROM bg WHERE pr[2] IS NOT NULL
  GROUP BY 1, 2, 3
),
rep AS (
  SELECT doc_id, max(c) AS max_bigram_count, sum(c) AS n_bigrams
  FROM cnt GROUP BY doc_id
),
j AS (
  SELECT b.doc_id, b.n_words, b.mean_word_len_x100, b.n_stop,
         COALESCE(r.max_bigram_count, 0) AS max_bigram_count,
         COALESCE(r.n_bigrams, 0) AS n_bigrams
  FROM base b LEFT JOIN rep r ON b.doc_id = r.doc_id
)
SELECT doc_id, n_words, mean_word_len_x100, n_stop,
       max_bigram_count, n_bigrams,
       CASE WHEN n_bigrams = 0 THEN 0
            ELSE (100 * max_bigram_count) // n_bigrams END AS dup_bigram_pct,
       (n_words >= {MIN_WORDS} AND n_words <= {MAX_WORDS}
        AND mean_word_len_x100 >= {MIN_MWL_X100}
        AND mean_word_len_x100 <= {MAX_MWL_X100}
        AND n_stop >= {MIN_STOP_HITS}
        AND CASE WHEN n_bigrams = 0 THEN 0
                 ELSE (100 * max_bigram_count) // n_bigrams END
            <= {MAX_DUP_BIGRAM_PCT}) AS keep
FROM j
"""


# ---------------------------------------------------------------- tf-idf

#: fixed retrieval query for the gated ranking demo (terms present in
#: the synthetic vocabulary with distinct document frequencies)
QUERY_TERMS = ["hash", "merge", "vector"]
IDF_SCALE = 1_000_000
TOP_K = 20


def tfidf_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score) — top-K documents for QUERY_TERMS under an
    INTEGER TF-IDF: score = sum over query terms of
    tf(doc, term) * (IDF_SCALE * N) div df(term).

    The integer idf is a monotone transform of N/df, so the ranking is
    the classic tf-idf ranking — but every score is exact integer
    arithmetic, which makes the whole top-K hash-gateable (float idf
    would be engine-ordering-dependent).  Ties break by doc_id, so the
    cut at K is a total order.

    Scale notes: tokens explode once, the query-term filter prunes
    before any shuffle, df is a tiny per-term aggregate joined back by
    broadcast, and the top-K is TakeOrderedAndProject (no global sort,
    no partition-less Window)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = d.count()
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term")
    ).filter(F.col("term").isin(*QUERY_TERMS))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = df_.select(
        "term", F.expr(f"({IDF_SCALE} * {n_docs}L) div df").alias("idf")
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf")).alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id"))
        .limit(TOP_K)
    )


def tfidf_rank_oracle_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in QUERY_TERMS)
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
idf AS (
  SELECT term,
         ({IDF_SCALE} * (SELECT count(*) FROM documents)) // count(*) AS idf
  FROM tf GROUP BY term
)
SELECT t.doc_id, CAST(sum(t.tf * i.idf) AS BIGINT) AS score
FROM tf t JOIN idf i ON t.term = i.term
GROUP BY t.doc_id
ORDER BY score DESC, t.doc_id
LIMIT {TOP_K}
"""


def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(term, doc_id, pos) — the flattened postings-with-positions
    index a retrieval system builds once and range-partitions by term.
    Flattened rather than array-valued so every row is a scalar tuple
    the driver can hash; positions are 0-based token offsets.

    Scale notes: a single posexplode scan, no shuffle at all — the
    write side would `repartitionByRange("term")` + sort within
    partitions to lay out postings contiguously; the index itself is
    embarrassingly parallel to build."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
    ).select("term", "doc_id", "pos")


def inverted_index_oracle_sql() -> str:
    return """
SELECT unnest(string_split(text, ' ')) AS term,
       doc_id,
       CAST(generate_subscripts(string_split(text, ' '), 1) - 1 AS INT) AS pos
FROM documents
"""


def hybrid_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, score, cosine) — the standard two-stage retrieval
    shape: the integer TF-IDF top-K supplies the LEXICAL candidate set,
    then each candidate is scored against the query embedding (vector
    of vec_id 0 — documents and embeddings share the id space) by
    cosine.  The lexical stage prunes the corpus to K rows before any
    vector math, so the expensive stage touches K vectors regardless
    of corpus size — the same candidate-then-verify structure as the
    dedup families.

    Float discipline: the dot product is the same sequential left fold
    the ANN queries use (dedup/embedding.dot_col ≡ DuckDB
    list_inner_product), rounded to 4 dp on both sides."""
    from ..dedup.embedding import cached_vectors, dot_col

    cands = tfidf_rank(spark, sf_dir)
    vecs = cached_vectors(spark, sf_dir)
    qv = vecs.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qnrm")
    )
    return (
        cands.join(vecs, cands["doc_id"] == vecs["vec_id"])
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "score",
            F.round(
                dot_col(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qnrm")),
                4,
            ).alias("cosine"),
        )
    )


def hybrid_rerank_oracle_sql() -> str:
    from ..ann.search import _V_CTE

    return f"""
WITH t AS ({tfidf_rank_oracle_sql()}),
{_V_CTE.lstrip()},
q AS (SELECT emb AS qemb, nrm AS qnrm FROM v WHERE vec_id = 0)
SELECT t.doc_id, t.score,
       round(list_inner_product(v.emb, q.qemb) / (v.nrm * q.qnrm), 4) AS cosine
FROM t JOIN v ON t.doc_id = v.vec_id CROSS JOIN q
"""


#: plain character-class regexes — identical semantics under Java's
#: backtracking engine (Spark) and RE2 (DuckDB): no lookaround, no
#: backreferences, greedy quantifiers over disjoint classes
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"


def _injected(doc_id_col, text_col):
    """text || injected email + decoy + phone, all derived from doc_id.
    The decoy 'a@b' has no TLD and must survive scrubbing untouched."""
    return F.concat(
        text_col,
        F.lit(" email user"),
        doc_id_col.cast("string"),
        F.lit("@example.com not-pii a@b call 555-"),
        F.lpad((doc_id_col % 10000).cast("string"), 4, "0"),
    )


def pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_emails, n_phones, scrubbed) — inject deterministic
    PII spans, then redact them by regex (see module doc)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    aug = _injected(F.col("doc_id"), F.col("text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(aug, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(aug, F.lit(PHONE_RE)).alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )


def pii_scrub_oracle_sql() -> str:
    """Predicts the scrubbed text CLOSED-FORM (string concatenation
    only — no regex on the oracle side), so the gate fails if the
    Spark regexes match anything beyond the injected spans (e.g. the
    decoy) or miss them."""
    return """
SELECT doc_id,
       1 AS n_emails,
       1 AS n_phones,
       text || ' email <EMAIL> not-pii a@b call <PHONE>' AS scrubbed
FROM documents
"""


# --------------------------------------------------------------------------
# Gopher repetition battery (§A1.1 of the Gopher paper): top n-gram and
# duplicated n-gram character coverage
# --------------------------------------------------------------------------

#: max % of token chars the most frequent n-gram may cover (n: pct)
REP_TOP = {2: 20, 3: 18, 4: 16}
#: max % of token chars duplicated n-grams may cover (n: pct)
REP_DUP = {5: 15, 6: 14, 7: 13, 8: 12, 9: 11, 10: 10}
#: (count, coverage) packed into one BIGINT so the per-doc argmax is a
#: plain MAX in both engines: key = cnt * _REP_KEY + cnt*gram_chars.
#: Valid while cnt*gram_chars < _REP_KEY (coverage is bounded by
#: cnt * doc length; raise the radix for multi-MB documents).
_REP_KEY = 1_000_000


def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, tchars, top{2,3,4}_cnt/_cov, dup{5..10}_cov, keep):
    the Gopher repetition signals, integer-exact so the whole row
    hash-matches DuckDB.

    * ``top{n}_cov`` — characters covered by all occurrences of the
      MOST FREQUENT word n-gram (count ties resolved toward larger
      coverage, deterministically, via the packed-key max).
    * ``dup{n}_cov`` — characters covered by every occurrence of every
      n-gram that occurs more than once (overlaps double-counted — the
      standard cheap variant used by public curation pipelines).
    * ``keep`` — all nine signals under the Gopher thresholds,
      compared in integers (100*cov <= pct*tchars; no floats).

    Scale shape: one explode per n over the tokenized corpus, ONE
    shuffle to count (doc, n, gram) and ONE to fold per (doc, n) —
    the pivot to columns is a no-shuffle projection of the same
    aggregate. Gram strings never leave the count aggregation."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.split("text", " ").alias("w"),
        (F.length("text") - (F.size(F.split("text", " ")) - F.lit(1)))
        .cast("long")
        .alias("tchars"),
    )
    base = d.localCheckpoint()  # read by 9 explode branches + final join

    branches = []
    for n in sorted(REP_TOP) + sorted(REP_DUP):
        grams = F.expr(
            f"CASE WHEN size(w) >= {n} THEN "
            f"transform(sequence(0, size(w) - {n}), "
            f"i -> array_join(slice(w, i + 1, {n}), ' ')) "
            "ELSE slice(w, 1, 0) END"
        )
        branches.append(
            base.select(
                "doc_id", F.lit(n).alias("n"), F.explode(grams).alias("gram")
            )
        )
    g = branches[0]
    for b in branches[1:]:
        g = g.unionAll(b)

    cnt = F.col("cnt")
    cov = cnt * (F.length("gram") - (F.col("n") - F.lit(1)))
    pern = (
        g.groupBy("doc_id", "n", "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .groupBy("doc_id", "n")
        .agg(
            F.max(cnt * _REP_KEY + cov).alias("mk"),
            F.sum(F.when(cnt >= 2, cov)).alias("dc"),
        )
    )
    piv = pern.groupBy("doc_id").pivot(
        "n", sorted(REP_TOP) + sorted(REP_DUP)
    ).agg(F.max("mk").alias("mk"), F.max("dc").alias("dc"))

    out = base.select("doc_id", "tchars").join(piv, "doc_id", "left")
    cols = [F.col("doc_id"), F.col("tchars")]
    conds = []
    for n, pct in sorted(REP_TOP.items()):
        mk = F.coalesce(F.col(f"{n}_mk"), F.lit(0))
        cols.append((mk / _REP_KEY).cast("long").alias(f"top{n}_cnt"))
        cov_c = (mk % _REP_KEY).cast("long")
        cols.append(cov_c.alias(f"top{n}_cov"))
        conds.append(cov_c * 100 <= F.lit(pct) * F.col("tchars"))
    for n, pct in sorted(REP_DUP.items()):
        dc = F.coalesce(F.col(f"{n}_dc"), F.lit(0)).cast("long")
        cols.append(dc.alias(f"dup{n}_cov"))
        conds.append(dc * 100 <= F.lit(pct) * F.col("tchars"))
    keep = conds[0]
    for c in conds[1:]:
        keep = keep & c
    cols.append(keep.alias("keep"))
    return out.select(*cols)


def quality_repetition_oracle_sql() -> str:
    ns = sorted(REP_TOP) + sorted(REP_DUP)
    ns_sql = ", ".join(str(n) for n in ns)
    sel = ["d.doc_id", "d.tchars"]
    conds = []
    for n, pct in sorted(REP_TOP.items()):
        mk = f"COALESCE(MAX(CASE WHEN n = {n} THEN mk END), 0)"
        sel.append(f"CAST({mk} // {_REP_KEY} AS BIGINT) AS top{n}_cnt")
        sel.append(f"CAST({mk} % {_REP_KEY} AS BIGINT) AS top{n}_cov")
        conds.append(f"({mk} % {_REP_KEY}) * 100 <= {pct} * d.tchars")
    for n, pct in sorted(REP_DUP.items()):
        dc = f"COALESCE(MAX(CASE WHEN n = {n} THEN dc END), 0)"
        sel.append(f"CAST({dc} AS BIGINT) AS dup{n}_cov")
        conds.append(f"{dc} * 100 <= {pct} * d.tchars")
    keep = " AND ".join(conds)
    sel_sql = ",\n       ".join(sel)
    return f"""
WITH d AS (
  SELECT doc_id, string_split(text, ' ') AS w,
         CAST(length(text) - (len(string_split(text, ' ')) - 1) AS BIGINT)
           AS tchars
  FROM documents
),
g AS (
  SELECT doc_id, n,
         array_to_string(list_slice(w, i, i + n - 1), ' ') AS gram
  FROM (
    SELECT doc_id, w, n, unnest(range(1, len(w) - n + 2)) AS i
    FROM d, (SELECT unnest([{ns_sql}]) AS n) ns
    WHERE len(w) >= n
  ) q
),
c AS (
  SELECT doc_id, n, gram, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM g GROUP BY doc_id, n, gram
),
p AS (
  SELECT doc_id, n,
         MAX(cnt * {_REP_KEY} + cnt * (length(gram) - (n - 1))) AS mk,
         SUM(CASE WHEN cnt >= 2
                  THEN cnt * (length(gram) - (n - 1)) END) AS dc
  FROM c GROUP BY doc_id, n
)
SELECT {sel_sql},
       ({keep}) AS keep
FROM d LEFT JOIN p ON d.doc_id = p.doc_id
GROUP BY d.doc_id, d.tchars
"""
