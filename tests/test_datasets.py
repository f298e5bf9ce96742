"""Deterministic leakage-safe splits: stability, proportions, gate."""

from prec_spark.datasets import dataset_split, dataset_split_oracle_sql

from .conftest import SF_DIR
from .oracle_util import compare


def test_split_is_deterministic_and_total(spark):
    a = {r.conv_id: r.split for r in dataset_split(spark, SF_DIR).collect()}
    b = {r.conv_id: r.split for r in dataset_split(spark, SF_DIR).collect()}
    assert a == b and len(a) > 0
    assert set(a.values()) <= {"train", "val", "test"}


def test_split_proportions_are_roughly_90_5_5(spark):
    rows = dataset_split(spark, SF_DIR).collect()
    n = len(rows)
    tr = sum(1 for r in rows if r.split == "train") / n
    assert 0.78 <= tr <= 0.98  # wide band: sf0.001 has few conversations


def test_growing_the_corpus_never_reassigns(spark):
    # assignment is a pure function of conv_id: the split computed over
    # a PREFIX of conversations matches the full corpus assignment
    full = dataset_split(spark, SF_DIR)
    some = {r.conv_id for r in full.limit(20).collect()}
    sub = {r.conv_id: r.split for r in full.filter(full.conv_id.isin(*some)).collect()}
    whole = {r.conv_id: r.split for r in full.collect()}
    assert all(whole[c] == s for c, s in sub.items())


def test_dataset_split_gate_matches_oracle(spark):
    compare(dataset_split(spark, SF_DIR), dataset_split_oracle_sql(), SF_DIR)
