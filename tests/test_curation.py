"""Composed curation verdict: reason precedence, totality, gate."""

from prec_spark.session import load_table
from prec_spark.text.curation import pretrain_filter, pretrain_filter_oracle_sql

from .conftest import SF_DIR
from .oracle_util import compare


def test_verdict_is_total_and_reasons_partition(spark):
    got = pretrain_filter(spark, SF_DIR).collect()
    n_docs = load_table(spark, SF_DIR, "documents").count()
    assert len(got) == n_docs
    assert {r.reason for r in got} <= {"lang", "quality", "duplicate", "ok"}
    assert all(r.keep == (r.reason == "ok") for r in got)
    assert all((r.split == "rejected") == (not r.keep) for r in got)
    # the corpus must exercise at least reject and keep paths
    assert any(r.keep for r in got) and any(not r.keep for r in got)


def test_pretrain_filter_gate_matches_oracle(spark):
    compare(pretrain_filter(spark, SF_DIR), pretrain_filter_oracle_sql(), SF_DIR)
