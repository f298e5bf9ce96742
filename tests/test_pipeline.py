"""Checkpoint-resume + lineage metrics tests for the staged pipeline."""

import json
import os

from prec_spark.pipeline import run_pipeline


def test_pipeline_runs_and_resumes(spark, sf_dir, tmp_path):
    workdir = str(tmp_path / "pipe")
    triples, pipe = run_pipeline(spark, sf_dir, workdir)
    n1 = triples.count()
    assert n1 > 0
    assert all(not m.resumed for m in pipe.metrics)
    assert all(m.rows >= 0 for m in pipe.metrics)
    # per-partition lineage recorded
    metrics_file = os.path.join(workdir, "metrics.jsonl")
    lines = [json.loads(l) for l in open(metrics_file)]
    assert {m["stage"] for m in lines} >= {"transcripts", "pg_nodes", "kg_triples"}
    assert all("per_partition" in m for m in lines)

    # resume: all stages must be skipped, same output
    triples2, pipe2 = run_pipeline(spark, sf_dir, workdir)
    assert all(m.resumed for m in pipe2.metrics)
    assert triples2.count() == n1


def test_pipeline_partial_resume(spark, sf_dir, tmp_path):
    """Deleting a late checkpoint recomputes only that stage."""
    import shutil

    workdir = str(tmp_path / "pipe2")
    _, _ = run_pipeline(spark, sf_dir, workdir)
    shutil.rmtree(os.path.join(workdir, "kg_triples"))
    triples, pipe = run_pipeline(spark, sf_dir, workdir)
    by_stage = {m.stage: m for m in pipe.metrics}
    assert by_stage["transcripts"].resumed
    assert not by_stage["kg_triples"].resumed
    assert triples.count() > 0


def test_small_heap_guards_survive_gateway_reuse(spark):
    """spark.driver.memory binds at JVM launch: a later build_session
    requesting 8g on a gateway launched at 4g must still apply the
    small-heap guards (round-3 ADVICE, conftest isolation gap)."""
    from prec_spark.session import _running_jvm_max_heap, build_session

    actual = _running_jvm_max_heap()
    assert actual is not None  # `spark` fixture launched the gateway
    if actual > 4 * 1024**3:
        import pytest

        pytest.skip("gateway launched with a big heap; guard not applicable")
    spark.stop()
    s2 = build_session(
        app_name="heap-reuse-probe",
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "8g"},
    )
    try:
        assert s2.conf.get("spark.buffer.pageSize") == "1m"
    finally:
        s2.stop()
