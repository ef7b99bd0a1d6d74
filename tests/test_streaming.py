"""Batch/stream parity: the streaming twins must produce the batch answers
when the source is drained with availableNow (no late data in a replayed
file source, so watermarking drops nothing)."""

from __future__ import annotations

from dodo_spark.operators.events import events_tumbling
from dodo_spark.streaming.events_stream import (
    read_events_stream,
    run_available_now,
    tumbling_stream,
)


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, sf_dir):
    stream = tumbling_stream(read_events_stream(spark, sf_dir))
    got = run_available_now(stream, "tumbling_test")
    want = events_tumbling(spark, sf_dir).select("ws", "we", "event_type", "cnt", "value_sum")
    assert _norm(got) == _norm(want)
