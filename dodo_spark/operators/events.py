"""Event-time operators over the ``events`` table (SURVEY.md §2.D, D1-D4).

The reference has no streaming surface; its closest analogue is the timed
replay scheduler (reference ``src/replay.go:217-241``) whose per-client
gap arithmetic D4 reproduces. D1-D3 are the batch-computable forms of
Structured Streaming windows — the same expressions run under
``readStream`` (see ``dodo_spark.streaming``).

All bucketing uses ``window()``/``session_window()``, which operate on
absolute epoch micros and are session-timezone independent — important
because the driver's session may not be UTC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from dodo_spark.catalog import load_table
from dodo_spark.operators.relational import dsum, sql_dsum
from dodo_spark.registry import register


@register(
    "events_tumbling",
    oracle=f"""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws,
           time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS we,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("value", "value_sum")},
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="D1: event-time tumbling window aggregation; identical expression "
    "works under Structured Streaming with a watermark.",
)
def events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("cnt"),
            dsum("value", "value_sum"),
            F.countDistinct("user_id").alias("users"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "cnt",
            "value_sum",
            "users",
        )
    )


@register(
    "events_sliding",
    oracle=f"""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' AS ws, value
      FROM events
    )
    SELECT ws, ws + INTERVAL '1 hour' AS we,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("value", "value_sum")}
    FROM assigned
    GROUP BY ws
    """,
    doc="D1: sliding window (1h size, 30m slide) — each event lands in two "
    "windows; the oracle materializes the window assignment explicitly.",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("cnt"), dsum("value", "value_sum"))
        .select(F.col("w.start").alias("ws"), F.col("w.end").alias("we"), "cnt", "value_sum")
    )


@register(
    "events_session",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '30 minutes'
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ), numbered AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("value", "value_sum")}
    FROM numbered
    GROUP BY user_id, session_id
    """,
    doc="D2: session windows, 30-minute gap (session_window); oracle is the "
    "classic gaps-and-islands rewrite. session_window end = last event + gap.",
)
def events_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("cnt"), dsum("value", "value_sum"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "cnt",
            "value_sum",
        )
    )


@register(
    "events_late_filter",
    oracle=f"""
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS cnt, {sql_dsum("value", "value_sum")}
    FROM events
    WHERE ts >= (SELECT MAX(ts) - INTERVAL '10 minutes' FROM events)
    GROUP BY event_type
    """,
    doc="D3: watermark late-data semantics in batch form — keep only rows "
    "within the 10-minute watermark of max event time. The streaming twin "
    "is withWatermark('ts','10 minutes') (dodo_spark.streaming).",
)
def events_late_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("events")
    return spark.sql(
        f"""
        SELECT event_type, COUNT(*) AS cnt, {sql_dsum("value", "value_sum")}
        FROM events
        WHERE ts >= (SELECT MAX(ts) - INTERVAL '10 minutes' FROM events)
        GROUP BY event_type
        """
    )


@register(
    "replay_gaps",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - epoch_us(LAG(ts) OVER (PARTITION BY user_id
                                                   ORDER BY ts, event_id)) AS gap_us
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(gap_us) AS BIGINT) AS gap_cnt,
           CAST(SUM(gap_us) AS BIGINT) AS gap_sum_us,
           CAST(MAX(gap_us) AS BIGINT) AS gap_max_us
    FROM gaps
    GROUP BY user_id
    """,
    doc="D4: replay inter-statement gap semantics (reference "
    "src/replay.go:227 — interval = ts2 - ts1 - dur1, here without the "
    "duration term): per-client ordered lag over event time. This is the "
    "DataFrame form of the reference's per-client goroutine scheduler.",
)
def replay_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # cast("timestamp") is a no-op for TIMESTAMP and makes TIMESTAMP_NTZ
    # parquet work (unix_micros requires LTZ); the lag-subtraction cancels
    # any session-timezone offset so the gap is type-invariant
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap = ts_us - F.unix_micros(F.lag(F.col("ts").cast("timestamp")).over(w))
    return (
        ev.select("user_id", gap.alias("gap_us"))
        .groupBy("user_id")
        .agg(
            F.count("gap_us").alias("gap_cnt"),
            F.sum("gap_us").alias("gap_sum_us"),
            F.max("gap_us").alias("gap_max_us"),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    ts: str = "ts",
    payload: list[str] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
) -> DataFrame:
    """Generic as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` in the same ``on`` key group (DuckDB/kdb ASOF
    JOIN semantics, >= tie included). ``direction="forward"`` flips the
    match to the EARLIEST right row with ``right.ts >= left.ts`` (the
    same window over a descending timestamp order — ties at the exact
    instant still match, mirroring DuckDB ``ASOF ... ON l.ts <= r.ts``).

    Plan shape: tag-union both sides, ONE shuffle on the key, and a
    running ``last(..., ignorenulls=True)`` window carries the most recent
    right payload forward onto each left row — never a range join, never a
    per-row UDF, and the window is always key-partitioned. Right rows tied
    on (key, ts) must be pre-deduplicated (one row per key+ts) for a
    deterministic match — same contract as DuckDB ASOF.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof direction must be backward|forward, got {direction!r}")
    payload = payload or [c for c in right.columns if c not in (*on, ts)]
    l_cols = [c for c in left.columns if c not in (*on, ts)]
    # the whole matched right row travels as ONE struct so a single
    # last(ignorenulls=True) carries it atomically: a NULL inside the latest
    # right row's payload stays NULL (it is NOT back-filled from an older
    # right row, which per-column carry-forward would wrongly do)
    r_struct = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload]
        + [T.StructField("__ts", right.schema[ts].dataType)]
    )
    lt = left.select(
        *on, ts, F.lit(1).alias("__side"),
        *l_cols,
        F.lit(None).cast(r_struct).alias("__r"),
    )
    rt = right.select(
        *on, ts, F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(
            *[F.col(c) for c in payload], F.col(ts).alias("__ts")
        ).cast(r_struct).alias("__r"),
    )
    # right rows sort BEFORE left rows at equal ts (__side 0 < 1), so a
    # same-instant right row matches — the ASOF '>=' tie rule; forward
    # direction reverses only the timestamp order, keeping the tie rule
    ts_order = F.col(ts).desc() if direction == "forward" else F.col(ts).asc()
    w = (
        Window.partitionBy(*on)
        .orderBy(ts_order, "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = lt.unionByName(rt).withColumn("__r", F.last("__r", ignorenulls=True).over(w))
    return (
        merged.filter(F.col("__side") == 1)
        .select(
            *on, ts, *l_cols,
            *[F.col(f"__r.{c}").alias(c + suffix) for c in payload],
            F.col("__r.__ts").alias(ts + suffix),
        )
    )


@register(
    "events_asof_join",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), r AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts,
           r.pval AS pval_r, r.ts AS ts_r
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    """,
    doc="As-of join (beyond-reference, the timeseries primitive Spark "
    "lacks natively): every view event matched to the user's most recent "
    "at-or-before purchase. Union-merge + key-partitioned running "
    "last(ignorenulls) — one shuffle on user_id, no range join. Oracle is "
    "DuckDB's native ASOF LEFT JOIN.",
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    return asof_join(views, purchases, on=["user_id"], ts="ts").select(
        "event_id", "user_id", "ts", "pval_r", "ts_r"
    )


def _asof_sides(spark: SparkSession, sf_dir: str):
    ev = load_table(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pval"))
    )
    return views, purchases


@register(
    "events_asof_forward",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), r AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    )
    SELECT l.event_id, l.user_id, l.ts,
           r.pval AS pval_r, r.ts AS ts_r
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    """,
    doc="Forward as-of join (the D9 kernel's direction=forward form): "
    "every view matched to the user's EARLIEST at-or-after purchase — "
    "the 'next event' primitive (time-to-conversion, next-maintenance "
    "lookups). Same union-merge plan as the backward form with only the "
    "window's timestamp order reversed: one shuffle on user_id, "
    "key-partitioned running last(), no range join. Oracle is DuckDB's "
    "native forward ASOF (l.ts <= r.ts).",
)
def events_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    views, purchases = _asof_sides(spark, sf_dir)
    return asof_join(
        views, purchases, on=["user_id"], ts="ts", direction="forward"
    ).select("event_id", "user_id", "ts", "pval_r", "ts_r")


@register(
    "events_asof_nearest",
    oracle="""
    WITH l AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), r AS (
      SELECT user_id, ts, MAX(value) AS pval
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
    ), b AS (
      SELECT l.event_id, l.user_id, l.ts, r.pval AS pb, r.ts AS tsb
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts
    ), f AS (
      SELECT l.event_id, r.pval AS pf, r.ts AS tsf
      FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
    )
    SELECT b.event_id, b.user_id, b.ts,
           CASE WHEN tsf IS NULL THEN pb WHEN tsb IS NULL THEN pf
                WHEN (b.ts - tsb) <= (tsf - b.ts) THEN pb ELSE pf
           END AS pval_n,
           CASE WHEN tsf IS NULL THEN tsb WHEN tsb IS NULL THEN tsf
                WHEN (b.ts - tsb) <= (tsf - b.ts) THEN tsb ELSE tsf
           END AS ts_n
    FROM b JOIN f ON f.event_id = b.event_id
    """,
    doc="Nearest as-of join: each view matched to the user's CLOSEST "
    "purchase in either direction, ties resolved backward (the pandas "
    "merge_asof direction='nearest' semantics). Composed from the two "
    "directional kernels joined on the left row id — two key-partitioned "
    "merges plus an id equi-join, still no range join; the distance "
    "compare is exact integer microseconds on both engines.",
)
def events_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    views, purchases = _asof_sides(spark, sf_dir)
    back = asof_join(views, purchases, on=["user_id"], ts="ts").select(
        "event_id",
        "user_id",
        "ts",
        F.col("pval_r").alias("pb"),
        F.col("ts_r").alias("tsb"),
    )
    fwd = asof_join(
        views, purchases, on=["user_id"], ts="ts", direction="forward"
    ).select("event_id", F.col("pval_r").alias("pf"), F.col("ts_r").alias("tsf"))
    j = back.join(fwd, "event_id")
    us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    back_wins = (
        F.col("tsf").isNull()
        | (~F.col("tsb").isNull())
        & ((us("ts") - us("tsb")) <= (us("tsf") - us("ts")))
    )
    return j.select(
        "event_id",
        "user_id",
        "ts",
        F.when(back_wins, F.col("pb")).otherwise(F.col("pf")).alias("pval_n"),
        F.when(back_wins, F.col("tsb")).otherwise(F.col("tsf")).alias("ts_n"),
    )


def range_join_buckets(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Point-in-interval join via time-bucket equi-join — the scale shape
    for range joins Spark would otherwise plan as a nested loop.

    Each interval explodes into the coarse buckets it overlaps (sequence of
    bucket starts); each point maps to its bucket; the join is an EQUI-join
    on the bucket plus a residual BETWEEN filter. Shuffle volume:
    |points| + |intervals| x avg_buckets_per_interval — never |points| x
    |intervals|. Interval end is inclusive (BETWEEN semantics).
    """
    secs = {"1 hour": 3600, "1 day": 86400}[bucket]
    b = F.lit(secs)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / b).cast("bigint"),
                (F.unix_timestamp(end_col) / b).cast("bigint"),
            )
        ),
    )
    pt = points.withColumn("__bucket", (F.unix_timestamp(point_col) / b).cast("bigint"))
    return (
        pt.join(iv, "__bucket")
        .filter(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__bucket")
    )


@register(
    "events_range_join",
    oracle="""
    WITH iv AS (
      SELECT o_orderkey AS iv_id, o_orderdate AS iv_start,
             o_orderdate + INTERVAL '2 days' AS iv_end
      FROM orders WHERE o_orderkey < 100
    )
    SELECT iv.iv_id,
           CAST(COUNT(e.event_id) AS BIGINT) AS events_in_window,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users_in_window
    FROM iv JOIN events e ON e.ts BETWEEN iv.iv_start AND iv.iv_end
    GROUP BY iv.iv_id
    """,
    doc="Range (point-in-interval) join (beyond-reference): events counted "
    "inside 2-day order windows. Implemented as a day-bucket equi-join + "
    "residual BETWEEN filter (range_join_buckets) — shuffle is linear in "
    "inputs, never the |points| x |intervals| nested loop Spark would "
    "otherwise plan. Oracle is the plain BETWEEN join.",
)
def events_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    iv = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 100)
        .select(
            F.col("o_orderkey").alias("iv_id"),
            F.col("o_orderdate").alias("iv_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 2 DAYS")).alias("iv_end"),
        )
    )
    joined = range_join_buckets(ev, iv, "ts", "iv_start", "iv_end", bucket="1 day")
    return joined.groupBy("iv_id").agg(
        F.count("event_id").alias("events_in_window"),
        F.countDistinct("user_id").alias("users_in_window"),
    )


@register(
    "events_gap_fill",
    oracle="""
    WITH bounds AS (
      SELECT time_bucket(INTERVAL '1 hour', MIN(ts)) AS lo,
             time_bucket(INTERVAL '1 hour', MAX(ts)) AS hi
      FROM events WHERE event_type = 'purchase'
    ), spine AS (
      SELECT unnest(generate_series(lo, hi, INTERVAL '1 hour')) AS ws FROM bounds
    ), agg AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    )
    SELECT spine.ws, COALESCE(agg.cnt, 0) AS cnt,
           CAST(agg.ws IS NULL AS BOOLEAN) AS filled
    FROM spine LEFT JOIN agg ON agg.ws = spine.ws
    """,
    doc="Time-series gap fill (beyond-reference): dense hourly spine from "
    "min to max bucket, left-joined onto the windowed aggregate, missing "
    "hours filled with zero. The spine derives from a 1-row min/max "
    "aggregate exploded via sequence() — broadcast side — so the only "
    "real shuffle is the aggregation itself.",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    agg = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("cnt"))
        .select(F.col("w.start").alias("ws"), "cnt")
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("ws")
    )
    return (
        spine.join(agg.withColumnRenamed("ws", "aws"), spine.ws == F.col("aws"), "left")
        .select(
            "ws",
            F.coalesce("cnt", F.lit(0)).alias("cnt"),
            F.col("aws").isNull().alias("filled"),
        )
    )


MAD_K = 3  # anomaly threshold: |x - median| > MAD_K * MAD


@register(
    "events_robust_anomaly",
    oracle=f"""
    WITH bins AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS bin,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, cnt,
             SUM(cnt) OVER (PARTITION BY event_type) AS n,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cumc
      FROM bins
    ), med AS (
      SELECT event_type, CAST(MIN(n) AS BIGINT) AS n_rows,
             MIN(CASE WHEN cumc >= (n + 1) // 2 THEN bin END) AS median_cents
      FROM cum GROUP BY event_type
    ), devs AS (
      SELECT b.event_type, abs(b.bin - m.median_cents) AS dev, b.cnt, m.n_rows
      FROM bins b JOIN med m ON m.event_type = b.event_type
    ), dcum AS (
      SELECT event_type, dev, cnt, n_rows,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev) AS cumd
      FROM (SELECT event_type, dev, CAST(SUM(cnt) AS BIGINT) AS cnt,
                   MIN(n_rows) AS n_rows
            FROM devs GROUP BY event_type, dev)
    ), mad AS (
      SELECT event_type,
             MIN(CASE WHEN cumd >= (n_rows + 1) // 2 THEN dev END) AS mad_cents
      FROM dcum GROUP BY event_type
    )
    SELECT m.event_type, m.n_rows, m.median_cents, x.mad_cents,
           CAST(COALESCE(SUM(CASE WHEN d.dev > {MAD_K} * x.mad_cents
                                  THEN d.cnt END), 0) AS BIGINT) AS n_anomalies
    FROM med m
    JOIN mad x ON x.event_type = m.event_type
    LEFT JOIN devs d ON d.event_type = m.event_type
    GROUP BY m.event_type, m.n_rows, m.median_cents, x.mad_cents
    """,
    doc="Robust anomaly detection (median + MAD outlier flags) in its "
    "scale-honest GRID form: values quantize to exact integer cents, raw "
    "events shuffle ONCE onto (type, bin) counts, and every order "
    "statistic — the median and the median absolute deviation — is then "
    "read off cumulative sums over the BIN table, whose size is bounded "
    "by the value grid (<=49k bins here), not by the data. The usual "
    "sort-based median funnels each type's raw rows into one sorted "
    "partition (billions per type at 100 TB); this plan's windows only "
    "ever see bin rows. Anomaly count = mass at deviation > "
    f"{MAD_K}*MAD, read from the same bin table. All arithmetic is exact "
    "integers — medians are grid order statistics, engine-identical.",
)
def events_robust_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    bins = (
        ev.select("event_type", F.round(F.col("value") * 100).cast("bigint").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count("*").alias("cnt"))
        # the bin table feeds THREE consumers (median cumsum, deviation
        # build, anomaly rollup); without truncation Catalyst re-derives it
        # from the raw scan each time (5 fact scans observed). Checkpoint
        # the bounded table so the raw data is scanned and shuffled ONCE.
        .localCheckpoint(eager=False)
    )
    wt = Window.partitionBy("event_type")
    wb = (
        Window.partitionBy("event_type")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("n", F.sum("cnt").over(wt)).withColumn(
        "cumc", F.sum("cnt").over(wb)
    )
    half = F.floor((F.col("n") + 1) / 2)
    med = (
        cum.groupBy("event_type")
        .agg(
            F.min("n").cast("bigint").alias("n_rows"),
            F.min(F.when(F.col("cumc") >= half, F.col("bin"))).alias("median_cents"),
        )
    )
    devs = bins.join(F.broadcast(med), "event_type").select(
        "event_type",
        F.abs(F.col("bin") - F.col("median_cents")).alias("dev"),
        "cnt",
        "n_rows",
    )
    dgrp = devs.groupBy("event_type", "dev").agg(
        F.sum("cnt").cast("bigint").alias("cnt"), F.min("n_rows").alias("n_rows")
    )
    wd = (
        Window.partitionBy("event_type")
        .orderBy("dev")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    dcum = dgrp.withColumn("cumd", F.sum("cnt").over(wd))
    half_d = F.floor((F.col("n_rows") + 1) / 2)
    mad = dcum.groupBy("event_type").agg(
        F.min(F.when(F.col("cumd") >= half_d, F.col("dev"))).alias("mad_cents")
    )
    return (
        med.join(F.broadcast(mad), "event_type")
        .join(devs.select("event_type", "dev", "cnt"), "event_type", "left")
        .groupBy("event_type", "n_rows", "median_cents", "mad_cents")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("dev") > MAD_K * F.col("mad_cents"), F.col("cnt"))),
                F.lit(0),
            )
            .cast("bigint")
            .alias("n_anomalies")
        )
    )


@register(
    "events_ohlc",
    oracle="""
    SELECT event_type,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS bar_day,
           ARG_MIN(value, printf('%018d-%012d', epoch_us(ts), event_id))
             AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           ARG_MAX(value, printf('%018d-%012d', epoch_us(ts), event_id))
             AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY event_type, bar_day
    ORDER BY event_type, bar_day
    """,
    doc="OHLC bar resampling (the hypertable/financial downsample idiom: "
    "TimescaleDB time_bucket + first/last, Doris MIN_BY/MAX_BY): one bar "
    "per (series, day) with open/close selected by earliest/latest event "
    "via min_by/max_by — exact positional selection, no sort of raw "
    "rows, no window function. The selection key is the fixed-width "
    "string (epoch_micros, event_id): zero-padded so lexicographic == "
    "numeric order, and UNIQUE per event, so ties at equal timestamps "
    "(second-granularity feeds) break deterministically in BOTH engines "
    "— a bare ts key is nondeterministic under collisions. ONE shuffle "
    "on the bar key; partial min_by/max_by combine map-side, so at "
    "100 TB each executor emits one candidate row per bar regardless of "
    "tick volume.",
)
def events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    pos = F.format_string("%018d-%012d", F.unix_micros(ts), F.col("event_id"))
    return (
        ev.groupBy(
            "event_type", F.date_trunc("day", ts).alias("bar_day")
        )
        .agg(
            F.min_by("value", pos).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", pos).alias("close"),
            F.count("*").alias("n_events"),
        )
        .orderBy("event_type", "bar_day")
    )


def _register_events_attribution() -> None:
    @register(
        "events_attribution",
        oracle="""
        WITH purch AS (
          SELECT event_id, user_id, ts, value
          FROM events WHERE event_type = 'purchase'
        ), touch AS (
          -- unique per (user, ts): two touches at the same instant would
          -- make the as-of pick engine-dependent; MAX(channel) is the
          -- deterministic tiebreak on both sides
          SELECT user_id, ts, MAX(event_type) AS event_type
          FROM events WHERE event_type IN ('view', 'click')
          GROUP BY user_id, ts
        ), attributed AS (
          SELECT p.event_id, p.value, t.event_type AS channel
          FROM purch p
          ASOF LEFT JOIN touch t
            ON p.user_id = t.user_id AND p.ts >= t.ts
        )
        SELECT COALESCE(channel, 'organic') AS channel,
               CAST(COUNT(*) AS BIGINT) AS purchases,
               CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                 AS attributed_value
        FROM attributed
        GROUP BY COALESCE(channel, 'organic')
        ORDER BY channel
        """,
        doc="LAST-TOUCH attribution (the marketing-analytics shape the "
        "events surface was missing): each purchase is attributed to the "
        "user's most recent view/click at-or-before it via the same "
        "union-merge as-of join as events_asof_join (one shuffle on "
        "user_id, running last() over the merged stream — never a range "
        "join), purchases with no prior touch fall to 'organic', and "
        "revenue sums per channel in exact decimal. Ties inside the "
        "as-of resolution are settled by the asof_join kernel's "
        "deterministic ordering; the oracle is DuckDB's native ASOF "
        "LEFT JOIN over the same touch set. At 100 TB this is the "
        "co-partitioned-by-user shape, same as every per-user window "
        "here.",
    )
    def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        purch = ev.filter(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts", "value"
        )
        touch = (
            ev.filter(F.col("event_type").isin("view", "click"))
            .groupBy("user_id", "ts")
            .agg(F.max("event_type").alias("channel"))
        )
        joined = asof_join(purch, touch, on=["user_id"], ts="ts")
        return (
            joined.select(
                F.coalesce(F.col("channel_r"), F.lit("organic")).alias("channel"),
                "value",
            )
            .groupBy("channel")
            .agg(
                F.count("*").alias("purchases"),
                F.sum(F.col("value").cast("decimal(18,4)"))
                .cast("double")
                .alias("attributed_value"),
            )
            .orderBy("channel")
        )


_register_events_attribution()


@register(
    "events_cohort_revenue",
    oracle=f"""
    WITH first AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id
    ), p AS (
      SELECT user_id, CAST(ts AS DATE) AS d, value
      FROM events WHERE event_type = 'purchase'
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, p.d) // 7 AS BIGINT)
             AS week_offset,
           CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS buyers,
           CAST(COUNT(*) AS BIGINT) AS purchases,
           {sql_dsum("p.value", "revenue")}
    FROM p JOIN first f ON f.user_id = p.user_id
    GROUP BY f.cohort_day, week_offset
    ORDER BY f.cohort_day, week_offset
    """,
    doc="Cohort lifetime-revenue matrix (the LTV shape beside "
    "events_retention's activity matrix): users cohort by FIRST-SEEN "
    "day, every later purchase lands in a (cohort, week-offset) cell "
    "with buyer counts and exact-decimal revenue. Two shuffles on "
    "user_id (first-seen aggregate + cohort join, the same key both "
    "times so AQE can co-locate) and one on the bounded cell key; the "
    "matrix is cohorts x offsets rows regardless of event volume — the "
    "standard growth-analytics rollup, scale-bounded by calendar not "
    "data.",
)
def events_cohort_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("cohort_day")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.to_date("ts").alias("d"), "value"
    )
    return (
        p.join(first, "user_id")
        .groupBy(
            "cohort_day",
            F.expr("datediff(d, cohort_day) DIV 7").alias("week_offset"),
        )
        .agg(
            F.countDistinct("user_id").alias("buyers"),
            F.count("*").alias("purchases"),
            dsum("value", "revenue"),
        )
        .orderBy("cohort_day", "week_offset")
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events
    ), pairs AS (
      SELECT prev_type AS from_type, event_type AS to_type,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, event_type
    ), totals AS (
      SELECT from_type, CAST(SUM(cnt) AS BIGINT) AS from_total
      FROM pairs GROUP BY from_type
    )
    SELECT p.from_type, p.to_type, p.cnt,
           CAST(p.cnt * 1000 // t.from_total AS BIGINT) AS prob_pm
    FROM pairs p JOIN totals t ON t.from_type = p.from_type
    ORDER BY p.from_type, p.to_type
    """,
    doc="First-order Markov transition matrix of user behavior (the "
    "model behind next-event prediction, funnel leak analysis, and bot "
    "detection — a uniform matrix like this synthetic one IS the bot "
    "signature): consecutive event pairs per user via one partitioned "
    "lag, a |types|^2-bounded pair count, and per-source transition "
    "probabilities in exact integer per-mille. One shuffle on user_id "
    "for the sequence, then vocabulary-sized aggregates — event volume "
    "only affects the first shuffle, the matrix is 25 rows at any "
    "scale.",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count("*").alias("cnt"))
    )
    totals = pairs.groupBy("from_type").agg(
        F.sum("cnt").cast("bigint").alias("from_total")
    )
    return (
        pairs.join(F.broadcast(totals), "from_type")
        .selectExpr(
            "from_type",
            "to_type",
            "CAST(cnt AS BIGINT) AS cnt",
            "CAST(cnt * 1000 DIV from_total AS BIGINT) AS prob_pm",
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "window_range_time",
    oracle=f"""
    SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_10m,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE)
             AS sum_10m
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL '10 minutes' PRECEDING
                       AND CURRENT ROW)
    ORDER BY user_id, ts, event_id
    LIMIT 200
    """,
    doc="A14's missing half: time-RANGE window frames (RANGE BETWEEN "
    "INTERVAL ... PRECEDING), the rolling-window shape rows-frames "
    "cannot express when events are irregularly spaced. Spark's "
    "rangeBetween needs a numeric order column, so the frame orders by "
    "epoch microseconds with literal micro bounds — semantically "
    "identical to the oracle's native INTERVAL RANGE frame, and rows "
    "tied on ts all receive the full tied-peer aggregate on both "
    "engines (RANGE frames include peers BY DEFINITION, which is why "
    "the implementation must NOT add a tiebreak to the frame ordering). "
    "Sum accumulates in exact DECIMAL. The window partitions by "
    "user_id; output is a bounded ordered sample.",
)
def window_range_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ts_us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = (
        Window.partitionBy("user_id")
        .orderBy(ts_us)
        .rangeBetween(-10 * 60 * 1_000_000, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            "ts",
            F.count("*").over(w).cast("bigint").alias("n_10m"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .over(w)
            .cast("double")
            .alias("sum_10m"),
        )
        .orderBy("user_id", "ts", "event_id")
        .limit(200)
    )
