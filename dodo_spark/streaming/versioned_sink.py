"""Exactly-once streaming ingestion into a versioned table — the bridge
between the Structured Streaming surface (SURVEY §2.D) and the A25
lakehouse layer: ``writeStream.foreachBatch`` committing each micro-batch
as ``append_version(df, table, batch_id)``.

This is the Delta streaming-sink idempotence pattern re-expressed over
this repo's manifest commits: the BATCH ID IS THE VERSION NUMBER, so a
retried micro-batch (Structured Streaming replays the last batch after a
crash — at-least-once delivery into foreachBatch) finds its version
already committed and SKIPS, turning at-least-once delivery into
exactly-once table content. The two crash windows both resolve
correctly:

- crash BEFORE the manifest publish: the attempt's staging files under
  ``v=<batch_id>/w-<uuid>/`` are orphans (invisible to readers, swept by
  vacuum); the replayed batch writes its OWN staging dir and commits —
  no duplicate, no loss;
- crash AFTER the manifest publish: the replayed batch sees "already
  committed" (or loses the put-if-absent race to a zombie of itself,
  CommitConflict) and skips — no duplicate. Because every attempt
  stages to a unique directory, a zombie that has already passed the
  committed-check and is mid-write can never delete or overwrite the
  winner's committed files — its whole output is unreferenced garbage.

At scale this is one file-level append per micro-batch (no prior file
read or rewritten), and downstream readers get snapshot isolation per
version plus `FOR VERSION/TIME AS OF` over the ingestion history for
free. Streaming sources hand foreachBatch a batch whose recomputation is
deterministic for replay of the SAME epoch, which is exactly the window
the idempotence covers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dodo_spark.sources.versioned import CommitConflict, append_version


def versioned_batch_writer(
    table_path: str, expectations: dict[str, str] | None = None
):
    """A ``foreachBatch`` function committing each micro-batch as version
    ``batch_id`` of ``table_path``, idempotent under batch replay.
    ``expectations`` ({name: sql_predicate}) gates every micro-batch with
    the same fail-closed CHECK semantics as batch ingest — a violating
    batch raises, the STREAM fails, and nothing is committed (re-running
    after fixing the source resumes cleanly from the checkpoint because
    the failed batch never published its manifest)."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        try:
            append_version(
                df, table_path, int(batch_id), expectations=expectations
            )
        except CommitConflict:
            pass  # a concurrent attempt of THIS batch won — content is in
        except ValueError as e:
            if "already committed" not in str(e):
                raise
            # replayed batch after a successful commit -> exactly-once skip

    return write_batch


def stream_to_versioned_table(
    stream_df: DataFrame,
    table_path: str,
    timeout_s: int = 300,
    checkpoint_dir: str | None = None,
    expectations: dict[str, str] | None = None,
) -> None:
    """Drain ``stream_df`` (availableNow) into ``table_path``, one
    committed version per micro-batch. Pass ``checkpoint_dir`` for any
    run that may be RESTARTED or resumed incrementally: the stream
    checkpoint is what keeps batch ids monotone across runs (without it
    a second invocation restarts at batch 0, whose version already
    exists, and its — possibly different — content is skipped)."""
    w = stream_df.writeStream.foreachBatch(
        versioned_batch_writer(table_path, expectations=expectations)
    )
    if checkpoint_dir:
        w = w.option("checkpointLocation", checkpoint_dir)
    q = w.trigger(availableNow=True).start()
    if not q.awaitTermination(timeout_s):
        # still running: a silent return here would let callers read a
        # half-ingested table while the query keeps committing behind them
        q.stop()
        raise TimeoutError(
            f"stream into {table_path} did not drain within {timeout_s}s "
            f"(stopped; committed versions so far remain valid — rerun "
            f"with the same checkpoint to resume)"
        )


# --------------------------------------------------------------------------
# verify key
# --------------------------------------------------------------------------
def _register_streaming_versioned_sink() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from dodo_spark.registry import register

    @register(
        "streaming_versioned_sink",
        oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum,
               TRUE AS replay_is_noop
        FROM events
        GROUP BY event_type ORDER BY event_type
        """,
        doc="Exactly-once STREAMING INGESTION into the versioned lakehouse "
        "layer (foreachBatch + batch-id-as-version, the Delta streaming-"
        "sink idempotence pattern): the events stream drains into a "
        "versioned table, one manifest commit per micro-batch; the final "
        "table is read back via read_version and aggregated per event "
        "type. replay_is_noop re-invokes the batch writer with an "
        "ALREADY-COMMITTED batch id (the at-least-once crash-replay "
        "window) and asserts the version count and live file set are "
        "unchanged — the exactly-once contract. The oracle recomputes "
        "the aggregate straight from the source table, so dropped "
        "batches, duplicated batches, or a replay that double-commits "
        "all hash-mismatch.",
    )
    def streaming_versioned_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir
        from dodo_spark.sources.versioned import (
            list_versions,
            live_files,
            read_version,
        )
        from dodo_spark.streaming.events_stream import (
            _bounded_state_partitions,
            read_events_stream,
        )

        ev = read_events_stream(spark, sf_dir).select(
            "event_id", "user_id", "event_type", "value"
        )
        table = scratch_dir("versioned_sink")
        with _bounded_state_partitions(spark, sf_dir):
            stream_to_versioned_table(ev, table)

        versions = list_versions(table)
        files_before = live_files(table, max(versions))
        # crash-replay window: re-run the writer with the FIRST batch's id
        # and the same content — must be a no-op, not a duplicate commit
        first_batch = read_version(spark, table, versions[0])
        versioned_batch_writer(table)(first_batch, versions[0])
        replay_noop = (
            list_versions(table) == versions
            and live_files(table, max(versions)) == files_before
        )

        return (
            read_version(spark, table)
            .groupBy("event_type")
            .agg(
                F.count("*").alias("n_events"),
                F.countDistinct("user_id").alias("users"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double")
                .alias("value_sum"),
                F.lit(replay_noop).alias("replay_is_noop"),
            )
            .orderBy("event_type")
        )


_register_streaming_versioned_sink()
