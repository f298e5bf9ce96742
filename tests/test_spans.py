"""Cross-document repeated-span detection (dedup/spans.py)."""

from prec_spark.dedup.spans import (
    dedup_spans,
    dedup_spans_oracle_sql,
    repeated_spans,
)

from .conftest import SF_DIR
from .oracle_util import compare


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_cross_doc_spans_flagged(spark):
    """Two docs sharing a verbatim 8-token prefix: only the spans
    fully inside the shared prefix are duplicates; a doc repeating a
    span WITHIN itself only is not flagged (that is within-doc
    repetition, a different signal)."""
    shared = "a b c d e f g h"          # 8 shared tokens -> 1 shared span
    rows = [
        (1, shared + " x y"),            # 3 spans, 1 shared
        (2, shared + " p q r"),          # 4 spans, 1 shared
        (3, "u v w x y z q r u v w x y z q r"),  # full 8-gram self-repeat
        (4, "too short"),                # < 8 tokens -> zeros
    ]
    got = {r.doc_id: r for r in repeated_spans(_docs(spark, rows)).collect()}
    assert (got[1].n_spans, got[1].n_dup_spans) == (3, 1)
    assert (got[2].n_spans, got[2].n_dup_spans) == (4, 1)
    assert got[1].dup_ratio_micro == 1_000_000 // 3
    assert got[3].n_spans == 9 and got[3].n_dup_spans == 0
    assert (got[4].n_spans, got[4].n_dup_spans, got[4].dup_ratio_micro) == (0, 0, 0)


def test_dedup_spans_oracle(spark):
    compare(dedup_spans(spark, SF_DIR), dedup_spans_oracle_sql(), SF_DIR)
