"""The session-shared frame memos: checkpoint-held frames must memoize
per (session, key), and release_shared() must let a gate-style harness
drop them for rebuild-on-demand (the 4 GiB mirror session relies on
this — see OPTIMIZATION_r06.md §15)."""

from prec_spark.cached import (
    _REG_CK,
    release_shared,
    shared_cached_df,
    shared_checkpointed_df,
)


def test_checkpointed_memo_builds_once(spark):
    release_shared()
    calls = []

    def build():
        calls.append(1)
        return spark.range(10).toDF("x")

    a = shared_checkpointed_df(spark, "test:ckpt-memo", build)
    b = shared_checkpointed_df(spark, "test:ckpt-memo", build)
    assert a is b
    assert len(calls) == 1
    assert a.count() == 10
    # materialized as a checkpoint: the plan is a leaf RDD scan, not
    # the original Range
    assert "ExistingRDD" in a._jdf.queryExecution().executedPlan().toString()


def test_release_shared_drops_both_registries(spark):
    release_shared()
    calls = []

    def build():
        calls.append(1)
        return spark.range(5).toDF("x")

    a = shared_checkpointed_df(spark, "test:ckpt-rel", build)
    c = shared_cached_df(spark, "test:cache-rel", build)
    assert a.count() == 5 and c.count() == 5
    assert len(calls) == 2
    release_shared()
    assert not _REG_CK
    a2 = shared_checkpointed_df(spark, "test:ckpt-rel", build)
    c2 = shared_cached_df(spark, "test:cache-rel", build)
    assert a2 is not a and c2 is not c
    assert len(calls) == 4
    # the rebuilt frames are fully usable (fresh checkpoint blocks)
    assert a2.count() == 5 and c2.count() == 5
    release_shared()
