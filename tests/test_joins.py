"""As-of and range joins: semantics, plan shape (no nested loops), gates."""

import datetime

import pytest
from pyspark.sql import Row

from prec_spark.joins import (
    asof_join,
    events_asof_join,
    events_asof_join_oracle_sql,
    events_range_join,
    events_range_join_oracle_sql,
)
from prec_spark.session import load_table

from .conftest import SF_DIR
from .oracle_util import compare


def _ts(m):
    return datetime.datetime(2024, 1, 1, 0, m)


def test_asof_semantics_at_or_before(spark):
    refs = spark.createDataFrame(
        [Row(k="u", ts=_ts(10), v="a"), Row(k="u", ts=_ts(20), v="b"),
         Row(k="w", ts=_ts(50), v="z")],
    )
    probes = spark.createDataFrame(
        [Row(k="u", ts=_ts(5), pid=1),   # before any ref -> null
         Row(k="u", ts=_ts(10), pid=2),  # EQUAL ts -> matches 'a' (>=)
         Row(k="u", ts=_ts(15), pid=3),  # between -> 'a'
         Row(k="u", ts=_ts(25), pid=4),  # after both -> 'b'
         Row(k="w", ts=_ts(55), pid=5),  # other key -> 'z'
         Row(k="x", ts=_ts(55), pid=6)], # key with no refs -> null
    )
    got = {r.pid: r.ref_v for r in
           asof_join(probes, refs, key="k", ts="ts", ref_cols=["v"]).collect()}
    assert got == {1: None, 2: "a", 3: "a", 4: "b", 5: "z", 6: None}


def test_asof_and_range_plans_have_no_nested_loop(spark):
    for q in (events_asof_join, events_range_join):
        plan = q(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan, q.__name__
        assert "CartesianProduct" not in plan, q.__name__


def test_range_join_is_total_over_events(spark):
    ev = load_table(spark, SF_DIR, "events")
    joined = events_range_join(spark, SF_DIR)
    assert joined.count() == ev.count()
    # and injective: one session per event
    assert joined.select("event_id").distinct().count() == ev.count()


def test_temporal_join_gates_match_oracle(spark):
    compare(events_asof_join(spark, SF_DIR), events_asof_join_oracle_sql(), SF_DIR)
    compare(events_range_join(spark, SF_DIR), events_range_join_oracle_sql(), SF_DIR)
