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


def _one_file_source(spark, src, name, rows, schema_str):
    """Land rows as ONE parquet file named ``name`` under ``src`` (plain
    move, no Spark append-committer overhead)."""
    import os
    import shutil

    os.makedirs(src, exist_ok=True)
    tmp = os.path.join(src, f"_{name}.stage")
    spark.createDataFrame(rows, schema_str).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), os.path.join(src, name))
    shutil.rmtree(tmp)


def test_crash_after_data_write_before_publish_is_exactly_once(
    spark, tmp_path, monkeypatch
):
    """The round-7 verdict's complementary crash test: kill foreachBatch
    in the exact window AFTER the batch's data files are staged but
    BEFORE the manifest publish (fault-injected at _commit). The restart
    from the same checkpoint must re-emit the batch exactly once, and
    the crashed attempt's staging files are orphans that vacuum sweeps."""
    import os

    from py4j.protocol import Py4JJavaError
    from pyspark.sql import types as T
    from pyspark.sql.utils import StreamingQueryException

    import dodo_spark.sources.versioned as V
    from dodo_spark.sources.versioned import (
        list_versions,
        live_files,
        read_version,
        vacuum,
    )
    from dodo_spark.streaming.versioned_sink import stream_to_versioned_table

    src = str(tmp_path / "src")
    for i in range(3):
        _one_file_source(
            spark,
            src,
            f"p{i}.parquet",
            [(10 * i + j, float(i)) for j in range(4)],
            "id BIGINT, v DOUBLE",
        )
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.DoubleType())]
    )
    table = str(tmp_path / "tab")
    ckpt = str(tmp_path / "ckpt")

    real_commit = V._commit
    state = {"crashed": False}

    def crash_once(table_path, version, **kw):
        if version == 1 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash: data written, no manifest")
        return real_commit(table_path, version, **kw)

    monkeypatch.setattr(V, "_commit", crash_once)

    def stream():
        return (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )

    # run 1: batch 0 commits, batch 1 crashes in the window -> stream dies
    try:
        stream_to_versioned_table(stream(), table, checkpoint_dir=ckpt)
        raise AssertionError("injected crash must fail the stream")
    except (StreamingQueryException, Py4JJavaError) as e:
        assert "injected crash" in str(e)
    assert state["crashed"]
    assert list_versions(table) == [0]
    # the crash window left REAL orphan staging files for v=1
    v1_dir = os.path.join(table, "v=1")
    orphans_before = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(v1_dir)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert orphans_before, "crash window must leave staged data files"

    # run 2 (restart, same checkpoint): batch 1 replays and commits, the
    # remaining batch follows — exactly-once content, no duplicate rows
    stream_to_versioned_table(stream(), table, checkpoint_dir=ckpt)
    assert list_versions(table) == [0, 1, 2]
    got = sorted(r["id"] for r in read_version(spark, table).collect())
    assert got == sorted(10 * i + j for i in range(3) for j in range(4))

    # the replayed attempt staged its OWN dir; the zombie's files are
    # unreferenced and vacuum sweeps them without touching live files
    live = set(live_files(table, 2))
    stats = vacuum(table, keep_versions=3)
    assert stats["orphan_files_deleted"] >= len(orphans_before)
    for p in orphans_before:
        assert not os.path.exists(p), p
    assert set(live_files(table, 2)) == live
    got2 = sorted(r["id"] for r in read_version(spark, table).collect())
    assert got2 == got


def test_cdc_crash_mid_batch_resumes_exactly_once(spark, tmp_path, monkeypatch):
    """Same crash window for the CDC drain (streaming_cdc_apply's
    topology): the killed batch's rewrite staging is orphaned, the
    restart re-applies the batch once, and the final state equals the
    global latest-wins argmax — including the tombstone rule."""
    import os

    from py4j.protocol import Py4JJavaError
    from pyspark.sql import types as T
    from pyspark.sql.utils import StreamingQueryException

    import dodo_spark.sources.cdc_apply as C
    from dodo_spark.sources.cdc_apply import cdc_batch_writer, read_cdc_state
    from dodo_spark.sources.versioned import list_versions, vacuum

    src = str(tmp_path / "src")
    # batch 0: initial upserts; batch 1 (the crash victim): delete user 1
    # + upsert user 2; batch 2: stale upsert of user 1 (must NOT resurrect)
    _one_file_source(
        spark, src, "b0.parquet",
        [(1, 1.0, 10, False), (2, 2.0, 11, False)],
        "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN",
    )
    _one_file_source(
        spark, src, "b1.parquet",
        [(1, 0.0, 30, True), (2, 9.0, 31, False)],
        "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN",
    )
    _one_file_source(
        spark, src, "b2.parquet",
        [(1, 5.0, 20, False)],
        "user_id BIGINT, value DOUBLE, seq BIGINT, deleted BOOLEAN",
    )
    schema = T.StructType([
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("seq", T.LongType()),
        T.StructField("deleted", T.BooleanType()),
    ])
    table = str(tmp_path / "tab")
    ckpt = str(tmp_path / "ckpt")

    real_commit = C._commit
    state = {"crashed": False}

    def crash_once(table_path, version, **kw):
        if version == 1 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash: data written, no manifest")
        return real_commit(table_path, version, **kw)

    monkeypatch.setattr(C, "_commit", crash_once)

    def drain():
        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .writeStream.foreachBatch(cdc_batch_writer(table, "user_id", "seq"))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "drain timed out"

    try:
        drain()
        raise AssertionError("injected crash must fail the stream")
    except (StreamingQueryException, Py4JJavaError) as e:
        assert "injected crash" in str(e)
    assert list_versions(table) == [0]

    drain()  # restart: batch 1 replays once, batch 2 follows
    assert list_versions(table) == [0, 1, 2]
    got = {
        r["user_id"]: (r["value"], r["seq"])
        for r in read_cdc_state(spark, table).collect()
    }
    # user 1's stale seq-20 upsert lost to the seq-30 tombstone; user 2
    # carries the batch-1 update exactly once
    assert got == {2: (9.0, 31)}
    stats = vacuum(table, keep_versions=3)
    assert stats["orphan_files_deleted"] >= 1  # the zombie attempt's files
    assert {
        r["user_id"] for r in read_cdc_state(spark, table).collect()
    } == {2}


def test_agg_drain_crash_after_write_before_checkpoint_commit(
    spark, tmp_path, monkeypatch
):
    """The AGG-drain crash window: a watermarked tumbling aggregation
    drains through the partition-overwrite parquet sink; the killed
    batch's partition is already WRITTEN when the crash hits (after
    data write, before the streaming checkpoint commit). The restart
    replays the batch, OVERWRITES its partition (no duplication), and
    the final content equals a crash-free drain of identical input."""
    import datetime
    import os

    from py4j.protocol import Py4JJavaError
    from pyspark.sql import types as T
    from pyspark.sql.utils import StreamingQueryException

    from dodo_spark.streaming.events_stream import (
        parquet_batch_writer,
        tumbling_stream,
    )

    src = str(tmp_path / "src")
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    for i in range(3):
        _one_file_source(
            spark,
            src,
            f"p{i}.parquet",
            [
                (
                    100 * i + j,
                    # files two hours apart: batch i+1's watermark
                    # (prev batch max ts - 10 min) passes batch i's
                    # hour-window end, so EVERY file batch from #2 on
                    # finalizes and emits the previous file's windows
                    base + datetime.timedelta(hours=2 * i, minutes=j),
                    "click" if j % 2 == 0 else "view",
                    float(j),
                )
                for j in range(8)
            ],
            "event_id BIGINT, ts TIMESTAMP, event_type STRING, value DOUBLE",
        )
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ])

    def agg_stream():
        ev = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        return tumbling_stream(ev)

    def drain(out, ckpt, writer):
        q = (
            agg_stream()
            .writeStream.foreachBatch(writer)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        assert q.awaitTermination(300), "drain timed out"

    # crash-free reference drain
    ref = str(tmp_path / "ref")
    drain(ref, str(tmp_path / "ckpt_ref"), parquet_batch_writer(ref))

    # faulted drain: batch 1's partition is fully written, THEN the
    # foreachBatch raises -> the checkpoint never commits the batch
    out = str(tmp_path / "out")
    inner = parquet_batch_writer(out)
    state = {"crashed": False}

    def crashing(df, batch_id):
        inner(df, batch_id)
        # batch 2 is the first that EMITS (finalizes batch 0's windows)
        if int(batch_id) == 2 and not state["crashed"]:
            state["crashed"] = True
            raise RuntimeError("injected crash: partition written, no commit")

    ckpt = str(tmp_path / "ckpt_out")
    try:
        drain(out, ckpt, crashing)
        raise AssertionError("injected crash must fail the stream")
    except (StreamingQueryException, Py4JJavaError) as e:
        assert "injected crash" in str(e)
    assert state["crashed"]
    # the crash window is real: the killed batch's partition is on disk
    # with rows, yet the checkpoint never committed it
    crashed_part = os.path.join(out, "__batch_id=2")
    assert os.path.isdir(crashed_part)
    assert spark.read.parquet(crashed_part).count() > 0

    drain(out, ckpt, parquet_batch_writer(out))  # restart, same checkpoint

    cols = ["ws", "we", "event_type", "cnt", "value_sum"]
    got = sorted(
        tuple(r) for r in spark.read.parquet(out).select(*cols).collect()
    )
    want = sorted(
        tuple(r) for r in spark.read.parquet(ref).select(*cols).collect()
    )
    assert got == want and len(got) > 0
