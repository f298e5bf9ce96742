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


def test_stateful_sessionization_matches_batch(spark, sf_dir):
    from prec_spark.streaming.sessions import sessionize_batch, sessionize_stream

    batch = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_batch(spark, sf_dir).collect()
    }
    stream = {
        (r.user_id, r.session_start, r.session_end, r.n_events)
        for r in sessionize_stream(spark, sf_dir).collect()
    }
    assert batch and stream == batch
