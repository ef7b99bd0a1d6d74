"""Structured Streaming forms of the event operators (SURVEY.md §2.D).

The reference has no streaming surface (its replay scheduler is the
closest analogue); these are the ``readStream`` twins of the batch
operators in ``dodo_spark.operators.events`` — same expressions, plus
watermarks for state eviction. Batch/stream parity is tested by running
the stream with ``availableNow`` over the same parquet and comparing
against the batch result.

At scale: watermark bounds state; the tumbling/session aggregations are
the standard shuffle-on-window-and-key shape; ``foreachBatch`` is the sink
escape hatch for exactly-once writes to non-streaming sinks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events parquet.

    The stream schema must match the file's physical type, and testdata
    vintages differ: TIMESTAMP(NANOS) scans as raw long (via nanosAsLong,
    converted to timestamp here) while TIMESTAMP(MICROS) scans natively
    (as TIMESTAMP_NTZ). A batch-schema probe picks the right one — a
    hardcoded long schema silently misparses a micros file (timestamps
    collapse ~1000x and every window aggregate is wrong)."""
    import os

    from dodo_spark.catalog import table_path

    # events.parquet is a single FILE in the driver testdata but a
    # DIRECTORY of part files in generated corpora. The streaming file
    # source requires a directory basePath, so: directory layout streams
    # the table path itself; file layout streams the parent dir with a
    # pathGlobFilter (which matches files only — useless for the dir
    # layout, hence the branch). The batch probe reads the exact path.
    path = table_path(sf_dir, "events")
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        probed = spark.read.parquet(path).schema["ts"].dataType
        if os.path.isdir(path):
            raw = spark.readStream.schema(_events_schema(probed)).parquet(path)
        else:
            raw = (
                spark.readStream.schema(_events_schema(probed))
                .option("pathGlobFilter", "events.parquet")
                .parquet(sf_dir)
            )
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    if isinstance(probed, T.LongType):  # nanos vintage: long -> timestamp
        return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if isinstance(probed, T.TimestampNTZType):
        # watermarks require TIMESTAMP (LTZ); under a UTC session the cast
        # is a faithful reinterpretation of the same micros value
        return raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def tumbling_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """D1 streaming twin: watermarked tumbling-window counts."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "event_type", "cnt", "value_sum")
    )


def session_stream(events: DataFrame, gap: str = "30 minutes", watermark: str = "30 minutes") -> DataFrame:
    """D2 streaming twin: watermarked session windows per user."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
        )
    )


import contextlib


# Stateful streaming cost scales with the number of state partitions (one
# state store + one Arrow/Python round-trip per partition per micro-batch —
# a stream-stream join carries FOUR stores per partition), and the partition
# count is frozen into the checkpoint at first start. A vanilla session's
# 200 default partitions cost ~10x wall-clock at test SFs for zero benefit;
# cap the drains at min(session value, 32, core count) — for a one-shot
# availableNow drain there is no reason to run more state stores than cores.
# When the INPUT SIZE is known, bound further to one state partition per
# 64 MB of input (floor 4) — the same sizing rule file-split planning uses:
# r5's left-outer drain spent 4.8 of its 6.5 s spinning 32 stores x 4
# stream-join state stores per micro-batch over a 200 KB input (measured:
# cap 8 -> 1.9 s, cap 4 -> 1.6 s; RocksDB was WORSE at this state size —
# per-instance overhead dominates tiny state). A long-lived production
# stream would instead FIX a higher partition count up front (it cannot
# change after the first checkpoint) sized to peak key cardinality, not to
# one machine's cores. (Values don't change — only parallelism does.)
_MAX_STREAM_STATE_PARTITIONS = 32
_STATE_PARTITION_BYTES = 64 * 1024 * 1024


def _events_nbytes(sf_dir: str) -> int | None:
    """Size of the events input (file or part-file directory); None when
    not statable (non-local paths)."""
    import os

    from dodo_spark.catalog import table_path

    try:
        p = table_path(sf_dir, "events")
        if os.path.isdir(p):
            return sum(
                os.path.getsize(os.path.join(p, f))
                for f in os.listdir(p)
                if not f.startswith((".", "_"))
            )
        return os.path.getsize(p)
    except OSError:
        return None


@contextlib.contextmanager
def _bounded_state_partitions(spark: SparkSession, sf_dir: str | None = None):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key, None)
    try:
        cur = int(prev) if prev is not None else 200
    except ValueError:
        cur = 200
    cores = max(1, spark.sparkContext.defaultParallelism)
    target = min(cur, _MAX_STREAM_STATE_PARTITIONS, cores)
    nbytes = _events_nbytes(sf_dir) if sf_dir else None
    if nbytes:
        per_input = max(4, -(-nbytes // _STATE_PARTITION_BYTES))
        target = min(target, per_input)
    spark.conf.set(key, str(target))
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


@contextlib.contextmanager
def _set_nodata_finalize(spark: SparkSession, enabled: bool):
    """Pin spark.sql.streaming.noDataMicroBatches.enabled for one drain,
    restoring the session value after. See the two named wrappers below for
    which drains may skip the trailing no-data batch and which REQUIRE it."""
    key = "spark.sql.streaming.noDataMicroBatches.enabled"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, str(enabled).lower())
    try:
        yield
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)


def _skip_nodata_finalize(spark: SparkSession):
    """Disable the trailing no-data micro-batch for drains whose output is
    emit-on-match (stream-stream INNER join; dropDuplicates append). Those
    operators never hold output back for the watermark, so the extra batch
    only evicts state — pure cost in a one-shot availableNow drain (~30-40%
    of its wall-clock). NEVER use for outer joins or append-mode windowed
    aggregates: their results are emitted BY the watermark-advancing no-data
    batch (left-outer null rows vanish without it — covered by a test)."""
    return _set_nodata_finalize(spark, False)


def _require_nodata_finalize(spark: SparkSession):
    """Force-ENABLE the trailing no-data micro-batch: outer-join null rows
    (and any watermark-held append output) are emitted by it, so a user
    session that globally disabled noDataMicroBatches would silently drop
    them. Correctness pin, not a tuning."""
    return _set_nodata_finalize(spark, True)


def run_available_now(stream_df: DataFrame, query_name: str) -> DataFrame:
    """Drain the stream with availableNow into a memory sink; returns the
    materialized result (test/verification harness)."""
    spark = stream_df.sparkSession
    with _bounded_state_partitions(spark):
        q = (
            stream_df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {query_name}")


def running_user_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    cumulative event count + value total maintained across micro-batches.

    This is the escape hatch for operators Structured Streaming's built-in
    aggregations can't express (the reference's closest analogue is the
    per-client replay bookkeeping, ``src/replay.go:249-290`` — running
    counters per group, updated in arrival order). State is one tiny tuple
    per user; Arrow-batched, partitioned by user_id, so state shards
    across executors and no executor holds more than its users.
    """
    import pandas as pd  # local: only the stateful path needs pandas
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def update(key: tuple, pdfs, state: GroupState):
        cnt, vsum = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            cnt += len(pdf)
            vsum += float(pdf["value"].fillna(0.0).sum())
        state.update((cnt, vsum))
        yield pd.DataFrame(
            {"user_id": [key[0]], "cum_cnt": [cnt], "cum_value": [vsum]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType="user_id bigint, cum_cnt bigint, cum_value double",
        stateStructType="cnt bigint, vsum double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sliding_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """D1 streaming twin: watermarked sliding-window aggregate (1h window,
    30m slide) — same expressions as the batch events_sliding."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "cnt", "value_sum")
    )


def dedup_stream(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact-dedup twin of D5: drop repeated event_ids arriving
    within the watermark window (``dropDuplicatesWithinWatermark`` bounds
    the dedup state by event time — the unbounded-state
    ``dropDuplicates`` is not deployable on an infinite stream)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def parquet_batch_writer(path: str):
    """The ``foreachBatch`` function behind ``write_stream_parquet``,
    exposed so the crash-window tests can wrap it with fault injection:
    each micro-batch writes its own ``__batch_id`` partition with dynamic
    partition overwrite, so a replayed batch (failure between write and
    checkpoint commit) overwrites its partition instead of duplicating
    rows."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                df.withColumn("__batch_id", F.lit(batch_id))
                .write.mode("overwrite")
                .partitionBy("__batch_id")
                .parquet(path)
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write_batch


def write_stream_parquet(stream_df: DataFrame, path: str, checkpoint: str):
    """Exactly-once parquet sink via foreachBatch (see
    ``parquet_batch_writer`` for the replay-idempotence argument).
    Returns the started query."""
    return (
        stream_df.writeStream.foreachBatch(parquet_batch_writer(path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def _register_key() -> None:
    from dodo_spark.operators.relational import sql_dsum
    from dodo_spark.registry import register

    @register(
        "streaming_tumbling_drain",
        oracle=f"""
        SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
               time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               {sql_dsum("value", "value_sum")}
        FROM events GROUP BY 1, 2, 3
        """,
        doc="Structured Streaming end-to-end through the driver gate: "
        "readStream over the events parquet -> watermarked tumbling "
        "aggregation -> availableNow drain into a memory sink. One batch "
        "drain of a static source must equal the batch query exactly, so "
        "the batch tumbling SQL is the oracle.",
    )
    def streaming_tumbling_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        return run_available_now(tumbling_stream(ev), "vk_stream_tumbling")


_register_key()


def _register_enrich_key() -> None:
    from dodo_spark.operators.relational import sql_dsum
    from dodo_spark.registry import register

    @register(
        "streaming_enrich_drain",
        oracle=f"""
        SELECT c.c_mktsegment AS segment,
               time_bucket(INTERVAL '1 hour', e.ts) AS ws,
               CAST(COUNT(*) AS BIGINT) AS cnt,
               {sql_dsum("e.value", "value_sum")}
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        GROUP BY 1, 2
        """,
        doc="Stream-static enrichment end-to-end (the standard streaming "
        "feature-pipeline shape): readStream events JOIN a static customer "
        "dimension on user_id, then a watermarked tumbling aggregate per "
        "market segment. The dim side is a broadcast hash join against "
        "each micro-batch — the stream is never shuffled for the join, "
        "only for the windowed aggregate; at 100 TB/day the dim refresh "
        "is a re-broadcast, not a repartition. One availableNow drain of "
        "a static source equals the batch join+window SQL, the oracle.",
    )
    def streaming_enrich_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.catalog import load_table

        ev = read_events_stream(spark, sf_dir)
        dim = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
        )
        enriched = ev.join(F.broadcast(dim), "user_id")
        agg = (
            enriched.withWatermark("ts", "10 minutes")
            .groupBy("segment", F.window("ts", "1 hour").alias("w"))
            .agg(
                F.count("*").alias("cnt"),
                F.sum(F.col("value").cast("decimal(18,4)")).cast("double").alias("value_sum"),
            )
            .select("segment", F.col("w.start").alias("ws"), "cnt", "value_sum")
        )
        return run_available_now(agg, "vk_stream_enrich")


_register_enrich_key()


def _register_session_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_session_drain",
        oracle="""
        WITH flagged AS (
          SELECT user_id, ts,
                 CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                           > INTERVAL '30 minutes'
                      OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
        ), numbered AS (
          SELECT user_id, ts,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                        ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged
        )
        SELECT user_id,
               MIN(ts) AS session_start,
               MAX(ts) + INTERVAL '30 minutes' AS session_end,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM numbered
        GROUP BY user_id, session_id
        """,
        doc="Structured Streaming sessionization end-to-end: readStream -> "
        "watermarked session_window (Spark-managed state merges) -> "
        "availableNow drain. A one-batch drain of a static source equals "
        "the batch session query, so the gaps-and-islands SQL is the "
        "oracle.",
    )
    def streaming_session_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        return run_available_now(session_stream(ev), "vk_stream_session")


_register_session_key()


def _register_interval_join_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_interval_join_drain",
        oracle="""
        WITH clicks AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, value
          FROM events WHERE event_type = 'purchase'
        ), attributed AS (
          SELECT c.user_id, c.click_id, p.purchase_id, p.value,
                 ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                    ORDER BY c.click_ts DESC, c.click_id DESC) AS rn
          FROM clicks c JOIN purchases p
            ON p.user_id = c.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS attributed_purchases,
               CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT)
                 AS attributed_value_e4
        FROM attributed WHERE rn = 1
        GROUP BY user_id
        """,
        doc="Stream-stream INTERVAL JOIN end-to-end (the canonical hard "
        "streaming op — click->purchase attribution): two watermarked "
        "readStream branches of the events source join per user with a "
        "[click_ts, click_ts+30m] time-range condition; Spark keeps both "
        "sides' state bounded by watermark + range (the join condition "
        "itself defines state eviction). Each purchase then attributes to "
        "its LATEST qualifying click (max_by over the drained join) and "
        "rolls up per user; value accumulates in exact 1e-4 integer units "
        "so the hash checks exactly. A one-batch availableNow drain of the "
        "static source equals the batch range join, the oracle.",
    )
    def streaming_interval_join_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "30 minutes")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                "value",
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = clicks.join(
            purchases,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
        )
        with _bounded_state_partitions(spark, sf_dir), _skip_nodata_finalize(spark):
            # INNER join emits on match — the trailing no-data batch would
            # only evict state, so skip it (see _skip_nodata_finalize)
            q = (
                joined.writeStream.format("memory")
                .queryName("vk_stream_interval")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        # latest qualifying click wins per purchase (deterministic tiebreak
        # on click_id), then per-user rollup in exact 1e-4 units
        return spark.sql(
            """
            WITH attributed AS (
              SELECT p_user AS user_id, purchase_id, value,
                     ROW_NUMBER() OVER (PARTITION BY purchase_id
                                        ORDER BY click_ts DESC, click_id DESC) AS rn
              FROM vk_stream_interval
            )
            SELECT user_id,
                   COUNT(*) AS attributed_purchases,
                   CAST(SUM(CAST(FLOOR(value * 10000) AS BIGINT)) AS BIGINT)
                     AS attributed_value_e4
            FROM attributed WHERE rn = 1
            GROUP BY user_id
            """
        )


_register_interval_join_key()


def _register_stateful_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_stateful_totals",
        oracle="""
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS cum_cnt,
               CAST(SUM(CAST(floor(value * 10000) AS BIGINT)) AS BIGINT) AS cum_value_e4
        FROM events GROUP BY user_id
        """,
        doc="Custom stateful streaming operator through the driver gate: "
        "applyInPandasWithState keeps one (count, scaled-value-sum) tuple "
        "per user across micro-batches; the value accumulates in exact "
        "integer 1e-4 units (floor(value*1e4) — floor is IEEE-identical in "
        "numpy and DuckDB, so the total hash-checks exactly). A one-batch "
        "availableNow drain equals the batch GROUP BY.",
    )
    def streaming_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pandas as pd
        from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

        def update(key: tuple, pdfs, state: GroupState):
            import numpy as np

            cnt, vsum = state.get if state.exists else (0, 0)
            for pdf in pdfs:
                cnt += len(pdf)
                vals = pdf["value"].fillna(0.0).to_numpy()
                vsum += int(np.floor(vals * 10000).sum())
            state.update((cnt, vsum))
            yield pd.DataFrame(
                {"user_id": [key[0]], "cum_cnt": [cnt], "cum_value_e4": [vsum]}
            )

        ev = read_events_stream(spark, sf_dir)
        out = ev.groupBy("user_id").applyInPandasWithState(
            update,
            outputStructType="user_id bigint, cum_cnt bigint, cum_value_e4 bigint",
            stateStructType="cnt bigint, vsum bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
        with _bounded_state_partitions(spark, sf_dir):
            q = (
                out.writeStream.format("memory")
                .queryName("vk_stateful_totals")
                .outputMode("update")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        # update mode appends one row per user per batch: keep the final row
        # (max_by on the monotone count — a bare MAX of the value would be
        # wrong when negative values make the running sum non-monotone)
        agg = spark.sql(
            "SELECT user_id, MAX(cum_cnt) AS cum_cnt, "
            "MAX_BY(cum_value_e4, cum_cnt) AS cum_value_e4 "
            "FROM vk_stateful_totals GROUP BY user_id"
        )
        return agg


_register_stateful_key()


def _register_dedup_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_dedup_drain",
        oracle="""
        SELECT event_id, ts, user_id, event_type, value, props FROM events
        """,
        doc="Streaming exact-dedup (D5's stream twin) through the driver "
        "gate: the source is unioned with itself — every event arrives "
        "exactly twice, the at-least-once delivery a deployed pipeline "
        "must survive — and dropDuplicatesWithinWatermark(event_id) "
        "restores exactly-once while the watermark bounds the dedup "
        "state by event time (unbounded dropDuplicates is not deployable "
        "on an infinite stream). Duplicates are bit-identical rows, so "
        "the kept row is well-defined and the availableNow append drain "
        "must equal the raw events table row-for-row (the oracle).",
    )
    def streaming_dedup_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        doubled = read_events_stream(spark, sf_dir).union(
            read_events_stream(spark, sf_dir)
        )
        dd = dedup_stream(doubled)
        with _bounded_state_partitions(spark, sf_dir):
            q = (
                dd.writeStream.format("memory")
                .queryName("vk_stream_dedup")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return spark.sql(
            "SELECT event_id, ts, user_id, event_type, value, props "
            "FROM vk_stream_dedup"
        )


_register_dedup_key()


def _register_left_outer_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_left_outer_drain",
        oracle="""
        WITH clicks AS (
          SELECT event_id AS click_id, user_id, ts AS click_ts
          FROM events WHERE event_type = 'click'
        ), purchases AS (
          SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
          FROM events WHERE event_type = 'purchase'
        ), wm AS (
          -- the stream's final global watermark: min of both sides' event-
          -- time maxima minus the 30-minute delay. Spark tracks event-time
          -- maxima in MILLISECONDS (EventTimeStats), so the maxima are
          -- floored to ms before subtracting — sub-ms event times would
          -- otherwise put boundary clicks on the wrong side (4/330k at the
          -- gen1 rehearsal scale)
          SELECT least((SELECT date_trunc('milliseconds', max(click_ts))
                        FROM clicks),
                       (SELECT date_trunc('milliseconds', max(purchase_ts))
                        FROM purchases))
                 - INTERVAL '30 minutes' AS w
        ), matched AS (
          SELECT c.user_id, c.click_id, p.purchase_id
          FROM clicks c JOIN purchases p
            ON p.user_id = c.user_id
           AND p.purchase_ts >= c.click_ts
           AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes'
        ), unmatched_closed AS (
          -- a miss is only decidable once the watermark passes the end of
          -- the click's match window; still-open windows stay in state.
          -- STRICT <: at window_end == wm a purchase stamped exactly wm is
          -- not yet late and could still match, and Spark's state-eviction
          -- predicate (click_ts < wm - delay) is likewise strict
          SELECT c.user_id, c.click_id, NULL AS purchase_id
          FROM clicks c, wm
          WHERE c.click_ts + INTERVAL '30 minutes' < wm.w
            AND NOT EXISTS (
              SELECT 1 FROM purchases p
              WHERE p.user_id = c.user_id
                AND p.purchase_ts >= c.click_ts
                AND p.purchase_ts <= c.click_ts + INTERVAL '30 minutes')
        ), j AS (
          SELECT * FROM matched UNION ALL SELECT * FROM unmatched_closed
        )
        SELECT user_id,
               CAST(COUNT(DISTINCT click_id) AS BIGINT) AS clicks_total,
               CAST(COUNT(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                        THEN click_id END) AS BIGINT)
                 AS converted_clicks,
               CAST(COUNT(DISTINCT click_id)
                    - COUNT(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                          THEN click_id END) AS BIGINT)
                 AS unconverted_clicks
        FROM j GROUP BY user_id
        """,
        doc="Stream-stream LEFT OUTER interval join — the semantically "
        "hardest streaming drain here: matched (click, purchase) pairs "
        "emit as they join, but an UNMATCHED click may only emit its "
        "null-extended row once the watermark proves no purchase can "
        "still arrive inside its 30-minute window (state-store eviction "
        "drives the outer semantics; an inner join never has to decide "
        "'no match ever'). The oracle models the REAL emission contract: "
        "matched pairs always emit, but a miss only emits once the final "
        "watermark (min of both sides' event-time maxima - delay) passes "
        "the end of the click's match window — clicks whose window is "
        "still open at end-of-stream remain in state and are absent from "
        "BOTH sides. The hash proves the drain emits exactly the decidable "
        "set, no more (no premature nulls) and no less (terminal no-data "
        "batch flushed every closed window).",
    )
    def streaming_left_outer_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        clicks = (
            ev.filter(F.col("event_type") == "click")
            .select(
                F.col("event_id").alias("click_id"),
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
            )
            .withWatermark("click_ts", "30 minutes")
        )
        purchases = (
            ev.filter(F.col("event_type") == "purchase")
            .select(
                F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
            )
            .withWatermark("purchase_ts", "30 minutes")
        )
        joined = clicks.join(
            purchases,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("purchase_ts") >= F.col("click_ts"))
            & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
            "left_outer",
        )
        with _bounded_state_partitions(spark, sf_dir), _require_nodata_finalize(spark):
            # outer-null rows are emitted BY the trailing no-data batch —
            # pin it on even if the session globally disabled it
            q = (
                joined.writeStream.format("memory")
                .queryName("vk_stream_left_outer")
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return spark.sql(
            """
            SELECT c_user AS user_id,
                   COUNT(DISTINCT click_id) AS clicks_total,
                   COUNT(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                       THEN click_id END) AS converted_clicks,
                   COUNT(DISTINCT click_id)
                     - COUNT(DISTINCT CASE WHEN purchase_id IS NOT NULL
                                           THEN click_id END) AS unconverted_clicks
            FROM vk_stream_left_outer GROUP BY c_user
            """
        )


_register_left_outer_key()


def _register_ohlc_key() -> None:
    from dodo_spark.registry import register

    @register(
        "streaming_ohlc_drain",
        oracle="""
        SELECT event_type,
               time_bucket(INTERVAL '1 day', ts) AS bar_day,
               ARG_MIN(value, printf('%018d-%012d', epoch_us(ts), event_id))
                 AS open,
               MAX(value) AS high,
               MIN(value) AS low,
               ARG_MAX(value, printf('%018d-%012d', epoch_us(ts), event_id))
                 AS close,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events
        GROUP BY event_type, bar_day
        """,
        doc="Streaming OHLC bars: readStream events -> watermarked 1-day "
        "tumbling window per series with min_by/max_by positional "
        "open/close selection -> availableNow drain. The selection key is "
        "the unique fixed-width (epoch_micros, event_id) string, so ties "
        "at equal timestamps break deterministically (see events_ohlc). "
        "min_by/max_by are declarative aggregates, so the state store "
        "holds ONE candidate row per open (bar, series) — not the ticks — "
        "and partial values merge across micro-batches exactly like the "
        "batch two-phase plan; the watermark evicts closed bars. The "
        "streaming twin of events_ohlc; one drain over a static source "
        "equals the batch bar SQL, the oracle.",
    )
    def streaming_ohlc_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        ts = F.col("ts").cast("timestamp")
        agg = (
            ev.withColumn("ts", ts)
            .withColumn(
                "pos",
                F.format_string("%018d-%012d", F.unix_micros(F.col("ts")), F.col("event_id")),
            )
            .withWatermark("ts", "10 minutes")
            .groupBy("event_type", F.window("ts", "1 day").alias("w"))
            .agg(
                F.min_by("value", F.col("pos")).alias("open"),
                F.max("value").alias("high"),
                F.min("value").alias("low"),
                F.max_by("value", F.col("pos")).alias("close"),
                F.count("*").alias("n_events"),
            )
            .select(
                "event_type",
                F.col("w.start").alias("bar_day"),
                "open",
                "high",
                "low",
                "close",
                "n_events",
            )
        )
        return run_available_now(agg, "vk_stream_ohlc")


_register_ohlc_key()


def _register_trending_key() -> None:
    from pyspark.sql.window import Window

    from dodo_spark.registry import register

    @register(
        "streaming_trending_drain",
        oracle="""
        WITH counts AS (
          SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1, 2
        ), ranked AS (
          SELECT ws, event_type, cnt,
                 CAST(ROW_NUMBER() OVER (PARTITION BY ws
                      ORDER BY cnt DESC, event_type) AS BIGINT) AS rnk
          FROM counts
        )
        SELECT ws, event_type, cnt, rnk FROM ranked
        WHERE rnk <= 2 ORDER BY ws, rnk
        """,
        doc="Trending top-k drain (drain #9 — the leaderboard topology): "
        "the STREAM side is a watermarked tumbling count per (window, "
        "type) — bounded state, same as the tumbling drain — and the "
        "top-k rank runs POST-DRAIN on the materialized counts, which is "
        "how a real trending serving layer works: ranking is not a "
        "streaming-stateful operation, so it belongs on the serving "
        "query over the continuously-maintained aggregate, not inside "
        "the stream (where Spark would reject a rank over an unbounded "
        "stream in update mode anyway). The rank window partitions by "
        "window-start — never global. Oracle: the batch count+rank.",
    )
    def streaming_trending_drain(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = read_events_stream(spark, sf_dir)
        counts = (
            ev.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            .agg(F.count("*").alias("cnt"))
            .select(F.col("w.start").alias("ws"), "event_type", "cnt")
        )
        drained = run_available_now(counts, "vk_stream_trending")
        rnk = F.row_number().over(
            Window.partitionBy("ws").orderBy(F.desc("cnt"), "event_type")
        )
        return (
            drained.withColumn("rnk", rnk.cast("bigint"))
            .filter(F.col("rnk") <= 2)
            .orderBy("ws", "rnk")
        )


_register_trending_key()
