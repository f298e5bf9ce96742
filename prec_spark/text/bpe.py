"""Distributed BPE tokenizer training over the document corpus.

Byte-pair encoding (Sennrich et al. 2016) is the tokenizer-training
step of every LLM data pipeline: repeatedly find the most frequent
adjacent symbol pair and merge it. The classic scaling trick — and the
one that makes this a Spark job rather than a driver loop — is that
merges operate on the WORD-FREQUENCY DICTIONARY, not the corpus: one
distributed pass folds the 100 TB corpus into (word, freq), and every
training round then aggregates pair counts over that (small) dictionary
while the corpus is never re-read.

Round structure (R rounds, all engine-portable semantics):

  1. pair counts: explode adjacent symbol pairs per word, weighted by
     word frequency — overlapping occurrences all count ('aaa' has
     (a,a) twice), matching the reference implementation's get_stats.
  2. best pair: max count, ties broken toward the lexicographically
     smallest (lhs, rhs) — a total order both engines sort identically
     (byte-wise on ASCII symbols).
  3. apply: greedy LEFT-TO-RIGHT NON-OVERLAPPING rewrite of each
     word's symbol sequence ('aaa' + merge(a,a) -> ['aa','a']), as a
     whole-stage JVM aggregate over the symbol array (no Python rows).

The gate output is the merge table itself — (round, lhs, rhs, freq) —
the artifact a tokenizer ships. The DuckDB oracle replays the same R
rounds: pair counting via unnest, the argmax via ORDER BY cnt DESC,
l, r LIMIT 1, and the greedy rewrite as a recursive CTE walking each
word's symbol list (i -> i+2 on a merge, i+1 otherwise). Every CTE is
MATERIALIZED — DuckDB inlines plain CTEs and a 16-round chain would
otherwise expand exponentially.

Scale notes: each round is one shuffle over the dictionary (pair
count) plus a driver fetch of a single row; the rewrite is map-only.
The per-round frame is localCheckpoint'ed so 16 rounds of lineage
never pile up into one giant plan. No reference counterpart; built
per the brief's training-data-pipeline mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table

#: merge rounds trained (the synthetic corpus' 31-word vocabulary
#: supports 30+ before pairs exhaust; raise freely on richer corpora)
ROUNDS = 16


def word_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, freq, syms): the corpus folded to its word-frequency
    dictionary, each word exploded into single-character symbols."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
        .withColumn(
            "syms",
            F.expr(
                "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
            ),
        )
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(l, r, cnt): adjacent-pair counts weighted by word frequency,
    overlapping occurrences included."""
    return (
        words.filter(F.size("syms") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(syms) - 2), "
                    "i -> struct(syms[i] AS l, syms[i + 1] AS r))"
                )
            ).alias("p"),
        )
        .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(syms: Column, l: str, r: str) -> Column:
    """Greedy left-to-right non-overlapping merge of (l, r) -> l+r."""
    hit = lambda i: (  # noqa: E731 — pair starts at 0-based index i
        (i < F.size(syms) - 1)
        & (F.element_at(syms, i + 1) == F.lit(l))
        & (F.element_at(syms, i + 2) == F.lit(r))
    )
    step = lambda acc, i: F.when(  # noqa: E731
        acc.getField("skip"),
        F.struct(
            acc.getField("out").alias("out"), F.lit(False).alias("skip")
        ),
    ).otherwise(
        F.when(
            hit(i),
            F.struct(
                F.concat(acc.getField("out"), F.array(F.lit(l + r))).alias("out"),
                F.lit(True).alias("skip"),
            ),
        ).otherwise(
            F.struct(
                F.concat(
                    acc.getField("out"), F.array(F.element_at(syms, i + 1))
                ).alias("out"),
                F.lit(False).alias("skip"),
            )
        )
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.size(syms) - 1),
        F.struct(
            F.array().cast("array<string>").alias("out"),
            F.lit(False).alias("skip"),
        ),
        step,
        lambda acc: acc.getField("out"),
    )


#: per-session training memo: (applicationId, sf_dir) -> (merges,
#: final word->syms dictionary). bpe_train and bpe_encode share one
#: training run; the words frame is localCheckpoint-backed, so it
#: survives catalog clearCache between gate queries.
_TRAINED: dict[tuple[str, str], tuple[list, DataFrame]] = {}


def trained(spark: SparkSession, sf_dir: str) -> tuple[list, DataFrame]:
    """Run (once per session) the R-round training loop; returns the
    merge list and the final word->symbols dictionary."""
    key = (spark.sparkContext.applicationId, sf_dir)
    hit = _TRAINED.get(key)
    if hit is not None:
        return hit
    merges, words = _train_loop(spark, sf_dir)
    _TRAINED[key] = (merges, words)
    return merges, words


def bpe_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(round, lhs, rhs, freq): the trained merge table, one row per
    round in training order."""
    merges, _words = trained(spark, sf_dir)
    # freq double: the oracle's SUM(freq) is a DuckDB HUGEINT, which
    # reaches the driver's comparison as float64 (the quality_gopher
    # round-5 lesson applied before the driver checks this query)
    return spark.createDataFrame(
        merges, "round int, lhs string, rhs string, freq long"
    ).withColumn("freq", F.col("freq").cast("double"))


def bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, n_tokens, n_chars, chars_per_token_x100):
    tokenize the corpus under the trained merges.

    Encoding never re-runs merges per document: the training loop's
    final word->symbols dictionary IS the tokenization of every corpus
    word (BPE is deterministic per word), so encoding is one explode +
    one BROADCAST join + one per-doc aggregate — the only corpus-wide
    pass. chars_per_token_x100 is the integer fixed-point compression
    ratio a tokenizer report quotes (higher = better compression)."""
    _merges, words = trained(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("word")
    )
    dic = words.select("word", F.size("syms").alias("n_syms"))
    return (
        docs.join(F.broadcast(dic), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("n_syms").cast("long").alias("n_tokens"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
        .withColumn(
            "chars_per_token_x100",
            # double: the oracle expression is HUGEINT (see bpe_train)
            F.expr("(100 * n_chars) div n_tokens").cast("double"),
        )
    )


def _train_loop(
    spark: SparkSession, sf_dir: str
) -> tuple[list, DataFrame]:
    words = word_dictionary(spark, sf_dir).localCheckpoint()
    merges: list[tuple[int, str, str, int]] = []
    for k in range(1, ROUNDS + 1):
        top = (
            _pair_counts(words)
            .orderBy(F.desc("cnt"), "l", "r")
            .limit(1)
            .collect()
        )
        if not top:
            raise RuntimeError(
                f"pair space exhausted after {k - 1} merges; "
                f"lower ROUNDS (= {ROUNDS}) for this corpus"
            )
        l, r, cnt = top[0].l, top[0].r, top[0].cnt
        merges.append((k, l, r, cnt))
        has_pair = F.when(
            F.size("syms") >= 2,
            F.exists(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: (F.element_at(F.col("syms"), i + 1) == F.lit(l))
                & (F.element_at(F.col("syms"), i + 2) == F.lit(r)),
            ),
        ).otherwise(F.lit(False))
        words = words.withColumn(
            "syms",
            F.when(has_pair, _apply_merge(F.col("syms"), l, r)).otherwise(
                F.col("syms")
            ),
        ).localCheckpoint()  # truncate lineage every round
    return merges, words


def _bpe_ctes(rounds: int) -> str:
    """The shared R-round training CTE chain (see module doc)."""
    ctes = [
        """words0 AS MATERIALIZED (
  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq,
         [substr(word, i, 1) for i in range(1, len(word) + 1)] AS syms
  FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
  GROUP BY word
)"""
    ]
    for k in range(1, rounds + 1):
        ctes.append(
            f"""pairs{k} AS MATERIALIZED (
  SELECT l, r, SUM(freq) AS cnt FROM (
    SELECT freq, syms[i] AS l, syms[i + 1] AS r
    FROM (SELECT freq, syms, unnest(range(1, len(syms))) AS i
          FROM words{k - 1} WHERE len(syms) >= 2) q
  ) p GROUP BY l, r
),
best{k} AS MATERIALIZED (
  SELECT l, r, cnt FROM pairs{k} ORDER BY cnt DESC, l, r LIMIT 1
),
words{k} AS MATERIALIZED (
  WITH RECURSIVE walk AS (
    SELECT w.word, w.freq, w.syms, b.l, b.r, 1 AS i,
           CAST([] AS VARCHAR[]) AS out
    FROM words{k - 1} w CROSS JOIN best{k} b
    UNION ALL
    SELECT word, freq, syms, l, r,
           CASE WHEN i < len(syms) AND syms[i] = l AND syms[i + 1] = r
                THEN i + 2 ELSE i + 1 END,
           list_append(out,
             CASE WHEN i < len(syms) AND syms[i] = l AND syms[i + 1] = r
                  THEN syms[i] || syms[i + 1] ELSE syms[i] END)
    FROM walk WHERE i <= len(syms)
  )
  SELECT word, freq, out AS syms FROM walk WHERE i = len(syms) + 1
)"""
        )
    return ",\n".join(ctes)


def bpe_train_oracle_sql(rounds: int = ROUNDS) -> str:
    """The identical R-round training replayed in DuckDB: recursive-CTE
    greedy rewrites, MATERIALIZED everywhere (see module doc)."""
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS INTEGER) AS round, l AS lhs, r AS rhs, "
        f"cnt AS freq FROM best{k}"
        for k in range(1, rounds + 1)
    )
    return f"WITH {_bpe_ctes(rounds)}\n{finals}"


def bpe_encode_oracle_sql(rounds: int = ROUNDS) -> str:
    """Corpus tokenization via the round-R dictionary of the same
    training replay."""
    return f"""
WITH {_bpe_ctes(rounds)},
docw AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents
)
SELECT d.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(len(w.syms)) AS BIGINT) AS n_tokens,
       CAST(SUM(length(d.word)) AS BIGINT) AS n_chars,
       (100 * SUM(length(d.word))) // SUM(len(w.syms))
         AS chars_per_token_x100
FROM docw d JOIN words{rounds} w USING (word)
GROUP BY d.doc_id
"""
