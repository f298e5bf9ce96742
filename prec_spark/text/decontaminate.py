"""Benchmark decontamination: verbatim-span overlap detection.

The standard pretraining hygiene step: find training documents that
contain spans of the evaluation/benchmark set (word n-gram overlap, the
GPT-3/PaLM-style decontamination rule). Here the probe set is built
deterministically from the corpus itself — the first 12 tokens of every
doc_id % 97 == 0 document — so contamination provably exists at every
scale and the gate has ground truth.

Pipeline shape (the part that matters at 100 TB):
* corpus docs explode once into DISTINCT word 5-grams (JVM
  split/sequence/slice/array_join — no Python),
* a document-frequency cap drops grams appearing in more than
  max(20, N/50) documents BEFORE the join — boilerplate/stop-span
  grams are exactly the hot keys that would skew the shuffle, and they
  carry no contamination signal,
* the probe-gram join is then bounded: each surviving gram matches at
  most the df cap, so the join output is O(probe_grams * cap), never
  quadratic in the corpus.

A pair is contaminated when it shares >= SHARED_MIN distinct grams
(5 of the probe's 8 — a strong verbatim-span signal, robust to a
couple of token edits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

NGRAM = 5
SPAN = 12  # probe = first SPAN tokens of selected docs
PROBE_MOD = 97
SHARED_MIN = 5
MIN_DF_CAP = 20
DF_CAP_FRACTION = 50  # cap = max(MIN_DF_CAP, n_docs // DF_CAP_FRACTION)


def _gram_col(arr):
    idx = F.sequence(F.lit(0), F.size(arr) - NGRAM)
    return F.explode(
        F.transform(idx, lambda i: F.array_join(F.slice(arr, i + 1, NGRAM), " "))
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, probe_id, shared) — contaminated doc/probe pairs."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("arr")
    )
    n_docs = d.count()
    cap = max(MIN_DF_CAP, n_docs // DF_CAP_FRACTION)

    grams = (
        d.filter(F.size("arr") >= NGRAM)
        .select("doc_id", _gram_col(F.col("arr")).alias("gram"))
        .distinct()
    )
    probe_grams = (
        d.filter((F.col("doc_id") % PROBE_MOD == 0) & (F.size("arr") >= SPAN))
        .select(
            F.col("doc_id").alias("probe_id"),
            F.slice("arr", 1, SPAN).alias("parr"),
        )
        .select("probe_id", _gram_col(F.col("parr")).alias("gram"))
        .distinct()
    )
    df_counts = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    kept = (
        grams.join(df_counts, "gram")
        .filter(F.col("df") <= cap)
        .select("doc_id", "gram")
    )
    return (
        kept.join(F.broadcast(probe_grams), "gram")
        .groupBy("doc_id", "probe_id")
        .agg(F.count(F.lit(1)).alias("shared"))
        .filter(F.col("shared") >= SHARED_MIN)
    )


def decontaminate_oracle_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         array_to_string(list_slice(arr, i, i + {NGRAM - 1}), ' ') AS gram
  FROM (SELECT doc_id, arr, unnest(range(1, len(arr) - {NGRAM - 2})) AS i
        FROM toks WHERE len(arr) >= {NGRAM})
),
probe_src AS (
  SELECT doc_id AS probe_id, list_slice(arr, 1, {SPAN}) AS parr FROM toks
  WHERE doc_id % {PROBE_MOD} = 0 AND len(arr) >= {SPAN}
),
probe_grams AS (
  SELECT DISTINCT probe_id,
         array_to_string(list_slice(parr, i, i + {NGRAM - 1}), ' ') AS gram
  FROM (SELECT probe_id, parr, unnest(range(1, len(parr) - {NGRAM - 2})) AS i
        FROM probe_src)
),
df AS (SELECT gram, count(*) AS df FROM grams GROUP BY gram),
kept AS (
  SELECT g.doc_id, g.gram FROM grams g JOIN df USING (gram)
  WHERE df.df <= greatest({MIN_DF_CAP},
                          (SELECT count(*) FROM documents) // {DF_CAP_FRACTION})
)
SELECT k.doc_id, p.probe_id, CAST(count(*) AS BIGINT) AS shared
FROM kept k JOIN probe_grams p USING (gram)
GROUP BY k.doc_id, p.probe_id
HAVING count(*) >= {SHARED_MIN}
"""
