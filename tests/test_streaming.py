"""Stream/batch equivalence for the windowed events rollup."""

from prec_spark.streaming.events import (
    run_windowed_counts_stream,
    windowed_counts_batch,
)


def test_stream_matches_batch(spark, sf_dir):
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in windowed_counts_batch(spark, sf_dir).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in run_windowed_counts_stream(spark, sf_dir).collect()
    }
    assert batch and stream == batch
