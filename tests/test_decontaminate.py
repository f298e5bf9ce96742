"""Decontamination: planted spans are found, df cap bounds the join, gate."""

from pyspark.sql import functions as F

from prec_spark.text.decontaminate import (
    SHARED_MIN,
    decontaminate,
    decontaminate_oracle_sql,
)

from .conftest import SF_DIR
from .oracle_util import compare


def test_probe_sources_are_detected(spark):
    # every probe is a verbatim span of its source doc, so (source,
    # probe=source) pairs MUST appear unless the df cap ate the span
    got = decontaminate(spark, SF_DIR).collect()
    assert got, "no contamination found for planted spans"
    self_pairs = [r for r in got if r.doc_id == r.probe_id]
    assert self_pairs, "planted span sources not detected"
    assert all(r.shared >= SHARED_MIN for r in got)


def test_probe_join_is_broadcast_not_shuffle(spark):
    plan = decontaminate(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan  # all JVM expressions


def test_decontaminate_gate_matches_oracle(spark):
    compare(decontaminate(spark, SF_DIR), decontaminate_oracle_sql(), SF_DIR)
