"""Count-min sketch: over-estimate property, collision behavior, gate."""

import pytest
from pyspark.sql import functions as F

from prec_spark.sketches import (
    cms_heavy_hitters,
    cms_heavy_hitters_oracle_sql,
    cms_sketch_df,
)
from prec_spark.sketches.cms import DEPTH, WIDTH, _tokens

from .conftest import SF_DIR
from .oracle_util import compare


def test_sketch_shape_and_mass(spark):
    toks = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 3 + [("c",)] * 2, "term string"
    )
    sk = cms_sketch_df(toks).collect()
    assert all(0 <= r.j < DEPTH and 0 <= r.bucket < WIDTH for r in sk)
    # every row of the sketch holds the full token mass
    per_row = {}
    for r in sk:
        per_row[r.j] = per_row.get(r.j, 0) + r.cnt
    assert per_row == {j: 10 for j in range(DEPTH)}


def test_estimates_never_underestimate(spark):
    got = cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(got) > 0
    assert all(r.cms_est >= r.true_cnt for r in got)
    # top terms over a modest vocabulary vs WIDTH=1024: most estimates
    # should be exact; all must be within the CMS epsilon guarantee
    n_tokens = _tokens(spark, SF_DIR).count()
    eps_bound = 2 * n_tokens / WIDTH  # 2e/width would be the formal bound
    assert all(r.cms_est - r.true_cnt <= eps_bound for r in got)


def test_cms_gate_matches_oracle(spark):
    compare(cms_heavy_hitters(spark, SF_DIR), cms_heavy_hitters_oracle_sql(), SF_DIR)


def test_hll_rank_matches_python_reference(spark):
    import hashlib

    from prec_spark.sketches.hll import hll_registers

    # independent python replay of bucket/rank over the real vocabulary
    terms = set()
    for r in _tokens(spark, SF_DIR).distinct().collect():
        terms.add(r.term)
    expect = {}
    for t in terms:
        h = hashlib.md5(t.encode()).hexdigest()
        bucket = int(h[:2], 16)
        w = int(h[2:8], 16)
        rank = 25 if w == 0 else 24 - w.bit_length() + 1
        expect[bucket] = max(expect.get(bucket, 0), rank)
    got = {r.bucket: r.register for r in hll_registers(spark, SF_DIR).collect()}
    assert got == expect


def test_hll_estimate_within_error_bound(spark):
    from prec_spark.sketches.hll import hll_estimate, hll_registers

    regs = {r.bucket: r.register for r in hll_registers(spark, SF_DIR).collect()}
    true = _tokens(spark, SF_DIR).distinct().count()
    est = hll_estimate(regs)
    # 1.04/sqrt(256) = 6.5% standard error; allow 3 sigma
    assert abs(est - true) / true < 0.20, (est, true)


def test_hll_gate_matches_oracle(spark):
    from prec_spark.sketches.hll import hll_registers, hll_registers_oracle_sql

    compare(hll_registers(spark, SF_DIR), hll_registers_oracle_sql(), SF_DIR)


def test_hll_merge_is_exact_and_nontrivial(spark, sf_dir):
    """Element-wise max of per-shard sketches == the direct global
    sketch, and at least one shard sketch differs from the merge (the
    merge actually does work)."""
    from prec_spark.sketches import hll_merge, hll_registers

    direct = {r.bucket: r.register for r in hll_registers(spark, sf_dir).collect()}
    merged = {r.bucket: r.register for r in hll_merge(spark, sf_dir).collect()}
    assert merged == direct
    # on the tiny 31-word vocabulary every shard sees every term, so
    # prove "the merge does work" on a synthetic corpus of DISJOINT
    # shards: each shard sketch must be strictly weaker than the
    # max-merge of all of them, and the merge must equal the direct
    # sketch of the union
    from prec_spark.sketches.hll import WORD_HEX, _nibble_case_sql
    import pyspark.sql.functions as F

    terms = spark.range(1000).select(
        (F.col("id") % 4).alias("shard"),
        F.concat(F.lit("term_"), F.col("id")).alias("term"),
    )
    h = terms.select("shard", F.md5("term").alias("h")).select(
        "shard",
        F.conv(F.substring("h", 1, 2), 16, 10).cast("int").alias("bucket"),
        F.expr(f"ltrim('0', substring(h, 3, {WORD_HEX}))").alias("w"),
    )
    rank = F.when(F.col("w") == "", F.lit(4 * WORD_HEX + 1)).otherwise(
        (4 * WORD_HEX - 4 * F.length("w"))
        + F.expr(_nibble_case_sql("substring(w, 1, 1)"))
        + 1
    )
    ranked = h.select("shard", "bucket", rank.cast("int").alias("rank"))
    per_shard = ranked.groupBy("shard", "bucket").agg(
        F.max("rank").alias("register")
    )
    merged_syn = {
        (r.bucket): r.register
        for r in per_shard.groupBy("bucket")
        .agg(F.max("register").alias("register")).collect()
    }
    direct_syn = {
        r.bucket: r.register
        for r in ranked.groupBy("bucket")
        .agg(F.max("rank").alias("register")).collect()
    }
    assert merged_syn == direct_syn
    for s in range(4):
        one = {
            r.bucket: r.register
            for r in per_shard.filter(F.col("shard") == s).collect()
        }
        assert one != merged_syn  # each shard alone is strictly weaker


def test_hll_merge_oracle(spark, sf_dir):
    from prec_spark.sketches import hll_merge, hll_merge_oracle_sql

    compare(hll_merge(spark, sf_dir), hll_merge_oracle_sql(), sf_dir)
