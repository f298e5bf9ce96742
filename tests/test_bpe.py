"""BPE training: greedy-merge semantics, Python-reference parity,
and the oracle replica."""

from collections import Counter

from pyspark.sql import functions as F

from prec_spark.session import load_table
from prec_spark.text.bpe import (
    ROUNDS,
    _apply_merge,
    bpe_train,
    bpe_train_oracle_sql,
    word_dictionary,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _merge_py(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def test_apply_merge_greedy_nonoverlapping(spark):
    """'aaa' + merge(a,a) -> ['aa','a']; runs, boundaries, no-ops."""
    cases = [
        (["a", "a", "a"], "a", "a"),
        (["a", "a", "a", "a"], "a", "a"),
        (["x", "a", "b", "a", "b"], "a", "b"),
        (["a", "b"], "a", "b"),
        (["b", "a"], "a", "b"),
        (["z"], "a", "b"),
        (["ab", "ab", "ab"], "ab", "ab"),
    ]
    df = spark.createDataFrame(
        [(i, syms) for i, (syms, _, _) in enumerate(cases)],
        "i int, syms array<string>",
    )
    for i, (syms, l, r) in enumerate(cases):
        got = (
            df.filter(F.col("i") == i)
            .select(_apply_merge(F.col("syms"), l, r).alias("m"))
            .collect()[0]
            .m
        )
        assert got == _merge_py(syms, l, r), (syms, l, r, got)


def test_bpe_matches_python_reference(spark):
    """The full R-round training loop replayed in plain Python over the
    same word dictionary must produce the identical merge table."""
    vocab = {
        r.word: [list(r.word), r.freq]
        for r in word_dictionary(spark, SF_DIR).collect()
    }
    expect = []
    for k in range(1, ROUNDS + 1):
        cnt = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        m = max(cnt.values())
        l, r = min(p for p, c in cnt.items() if c == m)
        expect.append((k, l, r, m))
        for w in vocab:
            vocab[w][0] = _merge_py(vocab[w][0], l, r)
    got = [
        (x.round, x.lhs, x.rhs, x.freq)
        for x in bpe_train(spark, SF_DIR).orderBy("round").collect()
    ]
    assert got == expect


def test_bpe_oracle(spark):
    compare(bpe_train(spark, SF_DIR), bpe_train_oracle_sql(), SF_DIR)


def test_bpe_encode_matches_python_reference(spark):
    """Tokenizing the corpus with the trained dictionary must match a
    per-document Python replay (train once, encode by word lookup)."""
    vocab = {
        r.word: [list(r.word), r.freq]
        for r in word_dictionary(spark, SF_DIR).collect()
    }
    for _ in range(ROUNDS):
        cnt = Counter()
        for syms, f in vocab.values():
            for i in range(len(syms) - 1):
                cnt[(syms[i], syms[i + 1])] += f
        m = max(cnt.values())
        l, r = min(p for p, c in cnt.items() if c == m)
        for w in vocab:
            vocab[w][0] = _merge_py(vocab[w][0], l, r)

    from prec_spark.text.bpe import bpe_encode

    texts = {
        r.doc_id: r.text
        for r in load_table(spark, SF_DIR, "documents").collect()
    }
    got = {r.doc_id: r for r in bpe_encode(spark, SF_DIR).collect()}
    assert set(got) == set(texts)
    for doc_id, text in texts.items():
        ws = text.split(" ")
        n_tokens = sum(len(vocab[w][0]) for w in ws)
        n_chars = sum(len(w) for w in ws)
        row = got[doc_id]
        assert (row.n_words, row.n_tokens, row.n_chars) == (
            len(ws), n_tokens, n_chars,
        ), doc_id
        assert row.chars_per_token_x100 == (100 * n_chars) // n_tokens
    # compression must be non-trivial somewhere (some word merged fully)
    assert any(len(s[0]) < len(w) for w, s in vocab.items())


def test_bpe_encode_oracle(spark):
    from prec_spark.text.bpe import bpe_encode, bpe_encode_oracle_sql

    compare(bpe_encode(spark, SF_DIR), bpe_encode_oracle_sql(), SF_DIR)
