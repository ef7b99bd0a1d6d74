"""Doris behavior-analytics aggregates: window_funnel + retention
(Doris builtin aggregate functions exercised by replayed workloads; the
grammar accepts any function name, DorisParser.g4:1588-1599 — these two
have no Spark builtin, so they're composed from joins/conditional aggs).

- ``events_funnel``: window_funnel(W)('view','click','purchase') — per
  user, the deepest step reached where each step follows the previous one
  and the whole chain fits in W from step 1.
- ``events_retention``: retention('signup', 'purchase') — per user, did
  the anchor event happen, and did the follow event happen at-or-after it.

Scale shape: both are per-user aggregations — conditional min/max inside
ONE groupBy(user_id) (no self-joins, no windows over raw events); the
funnel chains via step-k-after-step-(k-1) min-timestamps computed with
iterative conditional aggregation, which stays a single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

FUNNEL_STEPS = ("view", "click", "purchase")
FUNNEL_WINDOW_MIN = 120  # funnel window W, minutes


@register(
    "events_funnel",
    oracle=f"""
    WITH u AS (SELECT DISTINCT user_id FROM events),
    s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON s1.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[1]}' AND e.ts > s1.t1
        AND e.ts <= s1.t1 + INTERVAL '{FUNNEL_WINDOW_MIN} minutes'
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s1 ON s1.user_id = e.user_id
                    JOIN s2 ON s2.user_id = e.user_id
      WHERE e.event_type = '{FUNNEL_STEPS[2]}' AND e.ts > s2.t2
        AND e.ts <= s1.t1 + INTERVAL '{FUNNEL_WINDOW_MIN} minutes'
      GROUP BY e.user_id
    ),
    lv AS (
      SELECT u.user_id,
             CASE WHEN s3.t3 IS NOT NULL THEN 3
                  WHEN s2.t2 IS NOT NULL THEN 2
                  WHEN s1.t1 IS NOT NULL THEN 1
                  ELSE 0 END AS funnel_level
      FROM u LEFT JOIN s1 ON s1.user_id = u.user_id
             LEFT JOIN s2 ON s2.user_id = u.user_id
             LEFT JOIN s3 ON s3.user_id = u.user_id
    )
    SELECT funnel_level, CAST(COUNT(*) AS BIGINT) AS users
    FROM lv GROUP BY funnel_level
    """,
    doc="Doris window_funnel equivalent: ordered 3-step funnel "
    f"({' -> '.join(FUNNEL_STEPS)}) within {FUNNEL_WINDOW_MIN} minutes of "
    "step 1, histogram of deepest level per user. ONE shuffle: per-user "
    "event arrays collected in a single groupBy(user_id); the step chain "
    "(t2 after t1, t3 after t2, all within W of t1) evaluates as array "
    "filter/min expressions — exactly how Doris's window_funnel holds "
    "per-group state, with no step-wise join cascade.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = F.expr(f"INTERVAL {FUNNEL_WINDOW_MIN} MINUTES")

    per_user = ev.groupBy("user_id").agg(
        F.collect_list(F.struct("ts", "event_type")).alias("evs")
    )

    def step_min(step: str, lo=None, hi=None):
        def keep(x):
            c = x["event_type"] == step
            if lo is not None:
                c = c & (x["ts"] > lo) & (x["ts"] <= hi)
            return c

        return F.array_min(F.transform(F.filter("evs", keep), lambda x: x["ts"]))

    lv = (
        per_user.withColumn("t1", step_min(FUNNEL_STEPS[0]))
        .withColumn("t2", step_min(FUNNEL_STEPS[1], F.col("t1"), F.col("t1") + w))
        .withColumn("t3", step_min(FUNNEL_STEPS[2], F.col("t2"), F.col("t1") + w))
        .select(
            F.when(F.col("t3").isNotNull(), 3)
            .when(F.col("t2").isNotNull(), 2)
            .when(F.col("t1").isNotNull(), 1)
            .otherwise(0)
            .alias("funnel_level"),
        )
    )
    return lv.groupBy("funnel_level").agg(F.count("*").alias("users"))


@register(
    "events_retention",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS anchor_ts,
             MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS users,
           CAST(SUM(CASE WHEN anchor_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS did_anchor,
           CAST(SUM(CASE WHEN anchor_ts IS NOT NULL
                          AND last_purchase >= anchor_ts THEN 1 ELSE 0 END) AS BIGINT)
             AS retained
    FROM per_user
    """,
    doc="Doris retention equivalent: anchor event ('signup') then follow "
    "event ('purchase') at-or-after it; one conditional aggregation per "
    "user, then global counts — a single shuffle.",
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("anchor_ts"),
        F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("last_purchase"),
    )
    return per_user.agg(
        F.count("*").alias("users"),
        F.sum(F.col("anchor_ts").isNotNull().cast("bigint")).alias("did_anchor"),
        F.sum(
            (F.col("anchor_ts").isNotNull() & (F.col("last_purchase") >= F.col("anchor_ts")))
            .cast("bigint")
        ).alias("retained"),
    )


@register(
    "events_sequence_match",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             string_agg(substring(event_type, 1, 1), '' ORDER BY ts, event_id)
               AS path
      FROM events GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS users,
           CAST(SUM(CASE WHEN regexp_matches(path, 'v.*c.*p') THEN 1 ELSE 0 END)
                AS BIGINT) AS matched_vcp,
           CAST(SUM(CASE WHEN regexp_matches(path, 'se') THEN 1 ELSE 0 END)
                AS BIGINT) AS matched_signup_then_error_adjacent
    FROM seq
    """,
    doc="Doris sequence_match equivalent: per-user time-ordered event-type "
    "path (first letters, ties broken by event_id) matched against "
    "patterns — '(?1).*(?2).*(?3)' = view->click->purchase in order, and "
    "an adjacency pattern. Ordered string_agg == sorted collect_list + "
    "concat; one shuffle on user_id.",
)
def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    step = F.struct("ts", "event_id", F.substring("event_type", 1, 1).alias("c"))
    seq = ev.groupBy("user_id").agg(
        F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list(step)), lambda s: s.getField("c"))
        ).alias("path")
    )
    return seq.agg(
        F.count("*").alias("users"),
        F.sum(F.col("path").rlike("v.*c.*p").cast("bigint")).alias("matched_vcp"),
        F.sum(F.col("path").rlike("se").cast("bigint")).alias(
            "matched_signup_then_error_adjacent"
        ),
    )


@register(
    "events_intersect_count",
    oracle="""
    WITH n AS (SELECT COUNT(DISTINCT event_type) AS n FROM events),
    pu AS (
      SELECT user_id, COUNT(DISTINCT event_type) AS nt
      FROM events GROUP BY user_id
    )
    SELECT CAST((SELECT n FROM n) AS BIGINT) AS n_types,
           CAST(COUNT(*) AS BIGINT) AS users_any,
           CAST(SUM(CASE WHEN nt = (SELECT n FROM n) THEN 1 ELSE 0 END) AS BIGINT)
             AS users_all
    FROM pu
    """,
    doc="Doris orthogonal_bitmap_intersect_count idiom: how many users "
    "performed EVERY event type (multi-dimensional audience intersection). "
    "Doris materializes per-dimension bitmaps and intersects them; the "
    "Spark-first shape is ONE groupBy(user_id) with countDistinct "
    "(per-user type fan-in) compared against the global type count via a "
    "1-row broadcast cross join — a single shuffle of |users| rows, no "
    "bitmap structures, no per-dimension scans.",
)
def events_intersect_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.countDistinct("event_type").alias("nt")
    )
    n_types = ev.agg(F.countDistinct("event_type").alias("n"))
    return (
        per_user.crossJoin(F.broadcast(n_types))
        .agg(
            F.first("n").alias("n_types"),
            F.count("*").alias("users_any"),
            F.sum((F.col("nt") == F.col("n")).cast("bigint")).alias("users_all"),
        )
    )


COHORT_MAX_OFFSET = 7


@register(
    "analytics_cohort_retention",
    oracle=f"""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
    ), first AS (
      SELECT user_id, MIN(day) AS cohort_day FROM days GROUP BY user_id
    ), sizes AS (
      SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS cohort_size
      FROM first GROUP BY cohort_day
    ), joined AS (
      SELECT f.cohort_day, date_diff('day', f.cohort_day, d.day) AS day_offset,
             d.user_id
      FROM days d JOIN first f ON f.user_id = d.user_id
      WHERE date_diff('day', f.cohort_day, d.day) <= {COHORT_MAX_OFFSET}
    )
    SELECT j.cohort_day, CAST(j.day_offset AS BIGINT) AS day_offset,
           s.cohort_size,
           CAST(COUNT(DISTINCT j.user_id) AS BIGINT) AS retained_users
    FROM joined j JOIN sizes s ON s.cohort_day = j.cohort_day
    GROUP BY j.cohort_day, j.day_offset, s.cohort_size
    """,
    doc="Cohort retention matrix (classic product analytics, the table "
    "behind every retention curve; composes the same per-user anchoring "
    "idiom as Doris retention(), src/../funnel family): cohort = each "
    "user's first active day, retained = active again at day-offset "
    f"0..{COHORT_MAX_OFFSET}. Plan shape for 100 TB: ONE distinct over "
    "(user, day) — the only shuffle of raw-event cardinality — then "
    "min-day and the offset join both reuse the user_id partitioning "
    "(ReusedExchange), and the output is |cohorts| x |offsets| rows. "
    "cohort_day is DateType (to_date) matching DuckDB's "
    "date_trunc('day', ts) which yields DATE for day-or-coarser units.",
)
def analytics_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date(F.col("ts").cast("timestamp")).alias("day")
    ).distinct()
    first = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sizes = first.groupBy("cohort_day").agg(F.count("*").alias("cohort_size"))
    joined = (
        days.join(first, "user_id")
        .withColumn("day_offset", F.datediff("day", "cohort_day").cast("bigint"))
        .filter(F.col("day_offset") <= COHORT_MAX_OFFSET)
    )
    return (
        joined.groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("retained_users"))
        .join(sizes, "cohort_day")
        .select("cohort_day", "day_offset", "cohort_size", "retained_users")
    )


PATH_LEN = 3
PATH_TOP_K = 15


@register(
    "events_top_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             lead(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT event_type || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY path
    ORDER BY n_occurrences DESC, path
    LIMIT {PATH_TOP_K}
    """,
    doc=f"Top event paths (user-journey mining, the aggregate behind sankey "
    "/ flow charts in product analytics; same replayed-workload family as "
    "window_funnel, Doris fn grammar DorisParser.g4:1588-1599): each "
    f"user's event stream becomes sliding {PATH_LEN}-grams via lead() "
    "twice over ONE (user_id, ts) window — no self-joins, no explode of "
    "the stream — then paths aggregate globally with occurrence and "
    "distinct-user counts. Plan: one shuffle on user_id (sort reused by "
    "both leads), one shrinking shuffle on the path string; top-k is "
    "TakeOrderedAndProject. The tail beyond the lead horizon is dropped "
    "scan-side (e3 IS NOT NULL) before the aggregate.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    path = F.concat_ws(">", "event_type", "e2", "e3").alias("path")
    return (
        seq.select("user_id", path)
        .groupBy("path")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.col("n_occurrences").desc(), "path")
        .limit(PATH_TOP_K)
    )
