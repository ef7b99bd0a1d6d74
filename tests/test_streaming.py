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


def test_session_stream_matches_batch(spark, sf_dir):
    from dodo_spark.operators.events import events_session
    from dodo_spark.streaming.events_stream import run_available_now, session_stream

    got = run_available_now(
        session_stream(read_events_stream(spark, sf_dir)), "session_test"
    )
    want = events_session(spark, sf_dir).select(
        "user_id", "session_start", "session_end", "cnt"
    )
    assert _norm(got) == _norm(want)


def test_stateful_totals_cross_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState must carry state across micro-batches: feed
    the events in two files with maxFilesPerTrigger=1 and check the final
    cumulative totals equal the batch aggregation."""
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.streaming.events_stream import (
        EVENTS_SCHEMA,
        running_user_totals_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    # two parquet files -> two micro-batches
    ev.withColumn("ts", F.unix_micros("ts") * 1000).repartition(2).write.parquet(src)

    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    out = running_user_totals_stream(raw)
    q = (
        out.writeStream.format("memory")
        .queryName("totals_test")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1, (
        "expected >= 2 micro-batches"
    )

    got = (
        spark.sql("SELECT * FROM totals_test")
        .groupBy("user_id")
        .agg(F.max("cum_cnt").alias("cnt"), F.max("cum_value").alias("vsum"))
        .collect()
    )
    want = {
        r.user_id: (r.cnt, r.vsum)
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("cnt"), F.sum("value").alias("vsum"))
        .collect()
    }
    assert len(got) == len(want)
    for r in got:
        wc, wv = want[r.user_id]
        assert r.cnt == wc
        assert abs(r.vsum - (wv or 0.0)) < 1e-6 * max(1.0, abs(wv or 0.0))
