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

    from pyspark.sql import types as T

    from dodo_spark.catalog import load_table
    from dodo_spark.streaming.events_stream import (
        _events_schema,
        running_user_totals_stream,
    )

    ev = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "ev_src")
    # two parquet files -> two micro-batches; ts written as nanos long
    ev.withColumn(
        "ts", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
    ).repartition(2).write.parquet(src)

    raw = (
        spark.readStream.schema(_events_schema(T.LongType()))
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


def test_interval_join_attributes_across_micro_batches(spark, tmp_path):
    """Stream-stream interval join state must span micro-batches: a click
    arriving in batch 1 must still join a purchase arriving in batch 2
    (within the 30-minute window), and an out-of-window purchase must not
    attribute."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from dodo_spark.streaming.events_stream import _events_schema

    base = "2024-06-01 10:00:00"
    rows_b1 = [
        (1, base, 7, "click", 0.0, "{}"),                      # click @10:00
        (2, "2024-06-01 10:05:00", 7, "purchase", 12.5, "{}"), # in-window (same batch)
    ]
    rows_b2 = [
        (3, "2024-06-01 10:20:00", 7, "purchase", 5.25, "{}"),  # in-window, later batch
        (4, "2024-06-01 11:30:00", 7, "purchase", 99.0, "{}"),  # out of window
        (5, "2024-06-01 11:00:00", 8, "purchase", 1.0, "{}"),   # user with no click
    ]
    src = str(tmp_path / "ev_src")
    for i, rows in enumerate((rows_b1, rows_b2)):
        spark.createDataFrame(
            rows, "event_id BIGINT, ts STRING, user_id BIGINT, event_type STRING, "
            "value DOUBLE, props STRING"
        ).withColumn("ts", F.col("ts").cast("timestamp")).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    ev = (
        spark.readStream.schema(_events_schema(T.TimestampType()))
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"))
        .withWatermark("click_ts", "30 minutes")
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"), "value")
        .withWatermark("purchase_ts", "30 minutes")
    )
    joined = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("purchase_ts") >= F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("interval_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    assert q.lastProgress is not None and q.lastProgress["batchId"] >= 1

    got = {
        (r.click_id, r.purchase_id)
        for r in spark.sql("SELECT * FROM interval_test").collect()
    }
    # purchase 2 (same batch) AND purchase 3 (later batch) attribute to
    # click 1; purchase 4 (out of window) and purchase 5 (no click) do not
    assert got == {(1, 2), (1, 3)}


def test_watermark_drops_late_rows(spark, tmp_path):
    """D3: an event older than (max event time - watermark delay) arriving
    after the watermark has been committed must be dropped from the
    windowed aggregate; the batch twin would count it.

    Structure: two availableNow runs over one checkpoint (the realistic
    restart scenario — within a single availableNow run Spark finalizes
    the late-events watermark only at commit, so the drop shows up on the
    next run against the restored watermark)."""
    import datetime as dt

    from pyspark.sql import functions as F

    def ts(h, m):
        return dt.datetime(2025, 1, 1, h, m)

    schema = "ts timestamp, user_id bigint, value double"
    src = str(tmp_path / "late_src")
    ckpt = str(tmp_path / "ckpt")
    emitted: list = []

    def drain():
        stream = (
            spark.readStream.schema(schema)
            .parquet(src + "/f*")
            .withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("ws"), "cnt")
        )
        q = (
            stream.writeStream.foreachBatch(
                lambda df, bid: emitted.extend(df.collect())
            )
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        return q

    # run 1: two rows in the 10:00 window + one at 13:00; commit advances
    # the watermark to 12:50 and finalizes the 10:00 window with cnt=2
    spark.createDataFrame(
        [(ts(10, 0), 1, 1.0), (ts(10, 5), 2, 1.0), (ts(13, 0), 3, 1.0)], schema
    ).coalesce(1).write.parquet(src + "/f1")
    drain()
    assert {(r.ws, r.cnt) for r in emitted} == {(ts(10, 0), 2)}

    # run 2: a LATE row back in the (already finalized) 10:00 window
    spark.createDataFrame(
        [(ts(10, 10), 4, 1.0), (ts(14, 0), 5, 1.0)], schema
    ).coalesce(1).write.parquet(src + "/f2")
    q2 = drain()
    # nothing re-emitted, and the state operator reports the drop
    assert {(r.ws, r.cnt) for r in emitted} == {(ts(10, 0), 2)}
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q2.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1

    # the batch twin (no watermark) counts all three rows in the window
    batch = (
        spark.read.parquet(src + "/f*")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    assert {r.ws: r.cnt for r in batch.collect()}[ts(10, 0)] == 3


def test_sliding_stream_matches_batch(spark, sf_dir):
    from dodo_spark.operators.events import events_sliding
    from dodo_spark.streaming.events_stream import run_available_now, sliding_stream

    got = run_available_now(
        sliding_stream(read_events_stream(spark, sf_dir)), "sliding_test"
    )
    want = events_sliding(spark, sf_dir)
    assert _norm(got) == _norm(want)


def test_dedup_stream_drops_cross_batch_duplicates(spark, tmp_path):
    """dropDuplicatesWithinWatermark must drop a duplicate event_id that
    arrives in a LATER micro-batch (state carries across batches)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from dodo_spark.streaming.events_stream import dedup_stream

    def ts(m):
        return dt.datetime(2025, 1, 1, 10, m)

    schema = "event_id bigint, ts timestamp, value double"
    src = str(tmp_path / "dup_src")
    spark.createDataFrame(
        [(1, ts(0), 1.0), (2, ts(1), 1.0)], schema
    ).coalesce(1).write.parquet(src + "/f1")
    import time

    time.sleep(1.1)  # distinct mtimes -> deterministic file order
    spark.createDataFrame(
        [(2, ts(2), 9.0), (3, ts(3), 1.0)], schema  # event_id 2 repeats
    ).coalesce(1).write.parquet(src + "/f2")

    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/f*")
    )
    q = (
        dedup_stream(raw)
        .writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    rows = spark.sql("SELECT * FROM dedup_stream_test").collect()
    ids = sorted(r.event_id for r in rows)
    assert ids == [1, 2, 3]  # the batch-2 duplicate of id 2 is gone
    vals = {r.event_id: r.value for r in rows}
    assert vals[2] == 1.0  # first occurrence won


def test_exactly_once_parquet_sink(spark, tmp_path):
    """The foreachBatch parquet sink must be idempotent: draining the same
    source twice over one checkpoint yields no duplicate rows."""
    from dodo_spark.streaming.events_stream import write_stream_parquet

    schema = "event_id bigint, value double"
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame([(i, 1.0) for i in range(100)], schema).coalesce(
        1
    ).write.parquet(src)

    def drain():
        q = write_stream_parquet(
            spark.readStream.schema(schema).parquet(src), out, ckpt
        )
        q.awaitTermination(300)

    drain()
    assert spark.read.parquet(out).count() == 100
    drain()  # nothing new to process; a replay must not duplicate
    assert spark.read.parquet(out).count() == 100


def test_left_outer_drain_pins_nodata_batch_on(spark, sf_dir):
    """Outer-null rows are emitted by the trailing no-data micro-batch; the
    drain must force-enable it even when the session globally disabled
    noDataMicroBatches (otherwise unconverted clicks silently vanish)."""
    from dodo_spark import registry

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    spark.conf.set(key, "false")
    try:
        out = registry.queries()["streaming_left_outer_drain"](spark, sf_dir)
        rows = out.collect()
    finally:
        spark.conf.set(key, "true")
    assert any(r["unconverted_clicks"] > 0 for r in rows), (
        "no outer-null (unconverted) clicks emitted — the drain lost the "
        "watermark-finalizing no-data batch"
    )


def test_interval_join_skip_nodata_restores_session_conf(spark, sf_dir):
    """The inner-join drain disables the no-data batch for its own run only
    and must restore the session value afterwards."""
    from dodo_spark import registry

    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    spark.conf.set(key, "true")
    registry.queries()["streaming_interval_join_drain"](spark, sf_dir).count()
    assert spark.conf.get(key) == "true"


def test_versioned_sink_exactly_once_replay(spark, sf_dir, tmp_path):
    """foreachBatch + batch-id-as-version: a drained stream's content
    equals the batch source; replaying an already-committed batch (the
    at-least-once crash window) changes neither versions nor files; a
    FRESH batch id still appends."""
    from pyspark.sql import functions as F

    from dodo_spark.sources.versioned import list_versions, live_files, read_version
    from dodo_spark.streaming.events_stream import read_events_stream
    from dodo_spark.streaming.versioned_sink import (
        stream_to_versioned_table,
        versioned_batch_writer,
    )

    table = str(tmp_path / "sink")
    ev = read_events_stream(spark, sf_dir).select("event_id", "event_type")
    stream_to_versioned_table(ev, table)

    versions = list_versions(table)
    assert versions  # at least one micro-batch committed
    got = read_version(spark, table).count()
    from dodo_spark.catalog import load_table

    assert got == load_table(spark, sf_dir, "events").count()

    # replay of batch 0: exactly-once no-op
    before = live_files(table, max(versions))
    versioned_batch_writer(table)(read_version(spark, table, versions[0]), versions[0])
    assert list_versions(table) == versions
    assert live_files(table, max(versions)) == before

    # a genuinely new batch id still commits
    extra = spark.createDataFrame([(999999999, "probe")], "event_id BIGINT, event_type STRING")
    versioned_batch_writer(table)(extra, max(versions) + 1)
    assert read_version(spark, table).filter(F.col("event_type") == "probe").count() == 1


def test_versioned_sink_checkpoint_resumes_incrementally(spark, sf_dir, tmp_path):
    """With a stream checkpoint, a SECOND drain over a grown source
    commits only the NEW files as later batch ids — incremental ingest
    across restarts, no re-commit of batch 0."""
    import os
    import shutil

    from pyspark.sql import types as T

    from dodo_spark.sources.versioned import list_versions, read_version
    from dodo_spark.streaming.versioned_sink import stream_to_versioned_table

    src = tmp_path / "src"
    os.makedirs(src)
    spark.createDataFrame([(1, "a")], "id BIGINT, v STRING").coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f1"))
    # flatten: the file source watches a dir of parquet files
    for f in (src / "f1").glob("*.parquet"):
        shutil.move(str(f), str(src / "p1.parquet"))
    shutil.rmtree(src / "f1")

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.StringType())])
    table = str(tmp_path / "tab")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(schema).parquet(str(src))
    stream_to_versioned_table(stream, table, checkpoint_dir=ckpt)
    v_first = list_versions(table)
    assert read_version(spark, table).count() == 1

    # grow the source; resume from the SAME checkpoint
    spark.createDataFrame([(2, "b")], "id BIGINT, v STRING").coalesce(1) \
        .write.mode("overwrite").parquet(str(src / "f2"))
    for f in (src / "f2").glob("*.parquet"):
        shutil.move(str(f), str(src / "p2.parquet"))
    shutil.rmtree(src / "f2")
    stream = spark.readStream.schema(schema).parquet(str(src))
    stream_to_versioned_table(stream, table, checkpoint_dir=ckpt)

    versions = list_versions(table)
    assert len(versions) == len(v_first) + 1  # only the new batch committed
    assert {r["id"] for r in read_version(spark, table).collect()} == {1, 2}


def test_versioned_sink_expectations_fail_closed(spark, sf_dir, tmp_path):
    """A micro-batch violating an ingest expectation fails the stream and
    commits NOTHING; a passing expectation set drains normally."""
    from py4j.protocol import Py4JJavaError
    from pyspark.sql.utils import StreamingQueryException

    from dodo_spark.sources.versioned import list_versions
    from dodo_spark.streaming.events_stream import read_events_stream
    from dodo_spark.streaming.versioned_sink import stream_to_versioned_table

    ev = read_events_stream(spark, sf_dir).select("event_id", "value")
    bad_table = str(tmp_path / "bad")
    try:
        stream_to_versioned_table(
            ev, bad_table, expectations={"impossible": "event_id < 0"}
        )
        raise AssertionError("violating batch must fail the stream")
    except (StreamingQueryException, Py4JJavaError) as e:
        assert "impossible" in str(e)
    assert list_versions(bad_table) == []  # nothing committed

    good_table = str(tmp_path / "good")
    stream_to_versioned_table(
        ev, good_table, expectations={"ids_ok": "event_id IS NOT NULL"}
    )
    assert list_versions(good_table)  # drained
