"""Data-profiling operators: sketch-based heavy hitters and functional-
dependency checking — the warehouse-hygiene surface next to
``operators.stats`` (reference analogue: the per-column stats dump
``src/save.go:162`` and the genconf inference that consumes it; FD checks
are the table-rule form of the same profiling pass).

Both are exact-answer keys with a sketch/scan design that survives 100 TB:

- ``agg_heavy_hitters``: a per-partition mergeable Misra-Gries summary
  (Agarwal et al., "Mergeable Summaries", PODS'12) bounds the candidate
  set to ``partitions × k`` rows regardless of corpus size; the pigeonhole
  guarantee (a token with global freq > n/k exceeds its partition quota
  n_p/k somewhere) makes the union of partition candidates a provable
  superset of every true heavy hitter, and an exact recount of only the
  candidates reproduces the exact answer the SQL oracle computes.
- ``stats_fd_check``: one grouped countDistinct per candidate dependency,
  emitting (groups, violations, holds) per rule — no row expansion.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

# Misra-Gries bucket count; threshold for "heavy" is total_tokens / MG_K.
MG_K = 64


def _mg_partition_candidates(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Mergeable Misra-Gries over one partition's token batches.

    Summary update is vectorized: add the batch's value_counts, then if
    more than MG_K counters survive, subtract the (K+1)-largest weight and
    drop non-positive counters — the mergeable-summary decrement step,
    which preserves est >= true - n_p/MG_K for every token."""
    summary = pd.Series(dtype="int64")
    for pdf in it:
        batch = pdf["tok"].value_counts()
        summary = summary.add(batch, fill_value=0)
        if len(summary) > MG_K:
            cut = summary.nlargest(MG_K + 1).iloc[-1]
            summary = summary - cut
            summary = summary[summary > 0]
    yield pd.DataFrame({"tok": summary.index.astype(str)})


@register(
    "agg_heavy_hitters",
    oracle=f"""
    WITH toks AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents),
    cnt AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS freq
      FROM toks WHERE tok <> '' GROUP BY tok)
    SELECT tok, freq
    FROM cnt
    WHERE freq > (SELECT SUM(freq) FROM cnt) / {MG_K}.0
    ORDER BY freq DESC, tok
    """,
    doc="Vocabulary heavy hitters over the document corpus, exact answer "
    "through a Misra-Gries candidate sketch: per-partition mergeable MG "
    "summaries (Arrow-batched mapInPandas, vectorized value_counts + "
    "decrement) emit <= k candidates per partition; their union is a "
    "pigeonhole-provable superset of every token with freq > n/k; an "
    "exact recount restricted to broadcast candidates + the global token "
    "count reproduces the oracle's exact HAVING answer. At 100 TB the "
    "full token multiset is never shuffled — only partitions*k candidate "
    "rows plus the recount of a handful of tokens move.",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).filter(F.col("tok") != "")
    candidates = (
        toks.mapInPandas(_mg_partition_candidates, "tok string").distinct()
    )
    total = toks.agg(F.count("*").alias("n_total"))
    return (
        toks.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .join(F.broadcast(total))
        .filter(F.col("freq") > F.col("n_total") / F.lit(float(MG_K)))
        .select("tok", "freq")
        .orderBy(F.col("freq").desc(), "tok")
    )


# Candidate dependencies checked over `part` — a mix of true FDs (the key
# determines everything) and expected violations (brand does not determine
# type in this corpus).
FD_RULES = [
    ("p_partkey", "p_name"),
    ("p_brand", "p_type"),
    ("p_type", "p_brand"),
    ("p_size", "p_type"),
]


def _fd_rule_sql(det: str, dep: str) -> str:
    return f"""
    SELECT '{det}' AS det, '{dep}' AS dep,
           CAST(COUNT(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating,
           (SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) = 0) AS holds
    FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd
          FROM part GROUP BY {det})"""


@register(
    "stats_fd_check",
    oracle=" UNION ALL ".join(_fd_rule_sql(d, p) for d, p in FD_RULES)
    + " ORDER BY det, dep",
    doc="Functional-dependency profiling: for each candidate rule X -> Y, "
    "group by X, count determinant groups and groups with more than one "
    "distinct Y (violations), emit holds = no violation. One grouped "
    "two-phase countDistinct per rule — no joins, no row expansion; each "
    "rule is an independent single-shuffle aggregate, so a 100 TB profile "
    "pass runs rules in parallel against one cached scan. The profiling "
    "twin of stats_column (reference per-column stats dump src/save.go).",
)
def stats_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    frames = []
    for det, dep in FD_RULES:
        grp = part.groupBy(det).agg(F.countDistinct(dep).alias("nd"))
        frames.append(
            grp.agg(
                F.lit(det).alias("det"),
                F.lit(dep).alias("dep"),
                F.count("*").alias("n_groups"),
                F.sum((F.col("nd") > 1).cast("bigint")).alias("n_violating"),
                (F.sum((F.col("nd") > 1).cast("bigint")) == 0).alias("holds"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionAll(f_)
    return out.orderBy("det", "dep")


@register(
    "agg_rollup_ndv",
    oracle="""
    SELECT event_type,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           CAST(GROUPING(event_type) AS INTEGER) AS g_type,
           CAST(GROUPING(DATE_TRUNC('day', ts)) AS INTEGER) AS g_day,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS ndv_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY ROLLUP (event_type, DATE_TRUNC('day', ts))
    ORDER BY g_type, g_day, event_type, day
    """,
    doc="Hierarchical distinct-user rollup: exact COUNT(DISTINCT user_id) "
    "at every level of the (event_type, day) hierarchy in one pass — the "
    "Doris bitmap_union rollup idiom (BITMAP_UNION_COUNT at each "
    "materialized-view level) computed via ROLLUP + distinct aggregation. "
    "Spark plans this as Expand (one replica per grouping set) + "
    "two-phase distinct aggregate: the distinct key set is partially "
    "deduplicated map-side BEFORE the shuffle, so at 100 TB the exchange "
    "carries (level x distinct-user) rows, not raw events — the exact "
    "analogue of shipping per-segment bitmaps to a merge node.",
)
def agg_rollup_ndv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts").cast("timestamp"))
    return (
        ev.select("event_type", day.alias("day"), "user_id")
        .rollup("event_type", "day")
        .agg(
            F.grouping("event_type").cast("int").alias("g_type"),
            F.grouping("day").cast("int").alias("g_day"),
            F.countDistinct("user_id").alias("ndv_users"),
            F.count("*").alias("n_events"),
        )
        .orderBy("g_type", "g_day", "event_type", "day")
    )


@register(
    "stats_ttest",
    oracle="""
    WITH moments AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(19,0))
                      * CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                           AS DECIMAL(19,0))) AS DOUBLE) AS s2
      FROM lineitem
      WHERE l_returnflag IN ('R', 'N')
      GROUP BY l_returnflag),
    stats AS (
      SELECT l_returnflag, n,
             (s1 / n) / 100 AS mean,
             ((s2 - (s1 / n) * s1) / (n - 1)) / 10000 AS var
      FROM moments)
    SELECT a.n AS n_r, b.n AS n_n,
           a.mean AS mean_r, b.mean AS mean_n,
           a.var AS var_r, b.var AS var_n,
           (a.mean - b.mean)
             / SQRT(a.var / a.n + b.var / b.n) AS t_stat
    FROM (SELECT * FROM stats WHERE l_returnflag = 'R') a,
         (SELECT * FROM stats WHERE l_returnflag = 'N') b
    """,
    doc="Welch two-sample t statistic (returned vs normal lineitems, "
    "extended price): prices quantize to integer cents, count / sum / "
    "sum-of-squares accumulate as EXACT integers in DECIMAL(38,0) "
    "(order-independent; the scale-0 decimal->double cast is a plain "
    "integer conversion, correctly rounded in both engines — fractional-"
    "scale decimal casts are NOT, the stats_correlation lesson), and "
    "every subsequent step — mean, Welch variance, the t statistic — is "
    "the same fixed double expression tree whose +,-,*,/,sqrt are IEEE "
    "correctly-rounded, so the final statistic hashes bit-identical with "
    "NO tolerance. One scan, one 2-group aggregate, two 1-row broadcast "
    "sides; the inferential-statistics twin of stats_correlation.",
)
def stats_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("R", "N")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    moments = li.select(F.col("l_returnflag"), cents.alias("p")).groupBy(
        "l_returnflag"
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("p").cast("decimal(38,0)")).cast("double").alias("s1"),
        F.sum(
            F.col("p").cast("decimal(19,0)") * F.col("p").cast("decimal(19,0)")
        )
        .cast("double")
        .alias("s2"),
    )
    stats = moments.select(
        "l_returnflag",
        "n",
        ((F.col("s1") / F.col("n")) / 100).alias("mean"),
        (
            ((F.col("s2") - (F.col("s1") / F.col("n")) * F.col("s1")) / (F.col("n") - 1))
            / 10000
        ).alias("var"),
    )
    a = stats.filter(F.col("l_returnflag") == "R").select(
        F.col("n").alias("n_r"), F.col("mean").alias("mean_r"), F.col("var").alias("var_r")
    )
    b = stats.filter(F.col("l_returnflag") == "N").select(
        F.col("n").alias("n_n"), F.col("mean").alias("mean_n"), F.col("var").alias("var_n")
    )
    return a.join(F.broadcast(b)).select(
        "n_r",
        "n_n",
        "mean_r",
        "mean_n",
        "var_r",
        "var_n",
        (
            (F.col("mean_r") - F.col("mean_n"))
            / F.sqrt(F.col("var_r") / F.col("n_r") + F.col("var_n") / F.col("n_n"))
        ).alias("t_stat"),
    )


# Referential-integrity edges of the star schema: child table/column ->
# parent table/key, in dependency order.
FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
]


def _fk_edge_sql(child: str, ckey: str, parent: str, pkey: str) -> str:
    return f"""
    SELECT '{child}.{ckey}' AS fk,
           '{parent}.{pkey}' AS refs,
           CAST(COUNT(*) AS BIGINT) AS n_child_rows,
           CAST(SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_orphans,
           (SUM(CASE WHEN p.{pkey} IS NULL THEN 1 ELSE 0 END) = 0) AS intact
    FROM {child} c LEFT JOIN {parent} p ON p.{pkey} = c.{ckey}"""


@register(
    "stats_fk_orphans",
    oracle=" UNION ALL ".join(_fk_edge_sql(*e) for e in FK_EDGES)
    + " ORDER BY fk, refs",
    doc="Referential-integrity audit over every FK edge of the star "
    "schema: per edge, child row count, orphan count (child keys with no "
    "parent), and an intact flag. Each edge is a LEFT join counting "
    "misses — dimension parents broadcast, and the one fact-fact edge "
    "(lineitem->orders) is a single shuffle on orderkey that bucketing "
    "removes. The cross-table completion of stats_fd_check's in-table "
    "rules; together they are the dbt-style test pack a warehouse runs "
    "after every load (reference analogue: the FE meta consistency the "
    "audit-log pipeline assumes, src/save.go).",
)
def stats_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    frames = []
    for child, ckey, parent, pkey in FK_EDGES:
        c = load_table(spark, sf_dir, child).select(ckey)
        p = load_table(spark, sf_dir, parent).select(pkey)
        if parent != "orders":
            p = F.broadcast(p)
        joined = c.join(p, p[pkey] == c[ckey], "left")
        frames.append(
            joined.agg(
                F.lit(f"{child}.{ckey}").alias("fk"),
                F.lit(f"{parent}.{pkey}").alias("refs"),
                F.count("*").alias("n_child_rows"),
                F.sum(F.col(pkey).isNull().cast("bigint")).alias("n_orphans"),
                (F.sum(F.col(pkey).isNull().cast("bigint")) == 0).alias("intact"),
            )
        )
    out = frames[0]
    for f_ in frames[1:]:
        out = out.unionAll(f_)
    return out.orderBy("fk", "refs")


@register(
    "stats_chi_square",
    oracle="""
    WITH obs AS (
      SELECT label, CAST(COUNT(*) AS BIGINT) AS o
      FROM embeddings GROUP BY label),
    tot AS (
      SELECT CAST(SUM(o) AS BIGINT) AS n,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM obs)
    SELECT t.k AS n_classes, t.n AS n_rows,
           CAST(t.k - 1 AS BIGINT) AS dof,
           CAST(SUM(CAST(o * t.k - t.n AS DECIMAL(19,0))
                    * CAST(o * t.k - t.n AS DECIMAL(19,0))) AS DOUBLE)
                / (t.n * t.k) AS chi2
    FROM obs CROSS JOIN tot t
    GROUP BY t.k, t.n
    """,
    doc="Chi-square goodness-of-fit of the embedding label distribution "
    "against uniform — the class-balance check before training on a "
    "labeled corpus. Algebraically restated to stay in EXACT integers "
    "until one final division: sum((o - n/k)^2 / (n/k)) == "
    "sum((o*k - n)^2) / (n*k), where o, k, n are integers. The square is "
    "taken in DECIMAL(19,0) so the product is an exact DECIMAL(38,0) in "
    "both engines at ANY corpus size (int64 dev*dev would wrap past "
    "dev^2 > 2^63); the only double op is the last division, "
    "bit-identical in both engines with no accumulation-order exposure. "
    "One scan, one k-row aggregate, one 1-row broadcast.",
)
def stats_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    obs = emb.groupBy("label").agg(F.count("*").alias("o"))
    tot = obs.agg(
        F.sum("o").cast("bigint").alias("n"), F.count("*").cast("bigint").alias("k")
    )
    # |dev| < n*k <= int64 max (19 digits), so DECIMAL(19,0) holds it and
    # the square lands in DECIMAL(38,0) — exact in Spark AND DuckDB (a
    # 38x38 multiply is illegal in DuckDB; int64 dev*dev silently wraps in
    # Spark once dev^2 > 2^63). Only the final division is a double op.
    dev = (F.col("o") * F.col("k") - F.col("n")).cast("decimal(19,0)")
    return (
        obs.join(F.broadcast(tot))
        .groupBy("k", "n")
        .agg(F.sum(dev * dev).alias("ss"))
        .select(
            F.col("k").alias("n_classes"),
            F.col("n").alias("n_rows"),
            (F.col("k") - 1).cast("bigint").alias("dof"),
            (F.col("ss").cast("double") / (F.col("n") * F.col("k"))).alias("chi2"),
        )
    )


# --------------------------------------------------------------------------
# k-anonymity audit — privacy hygiene over quasi-identifier combinations
# --------------------------------------------------------------------------
K_ANON_THRESHOLDS = [2, 5, 10, 25]
K_ANON_QI = ["c_nationkey", "c_mktsegment"]


@register(
    "profile_k_anonymity",
    oracle=f"""
    WITH classes AS (
      SELECT {", ".join(K_ANON_QI)}, CAST(COUNT(*) AS BIGINT) AS class_size
      FROM customer GROUP BY {", ".join(K_ANON_QI)}
    )
    SELECT CAST(k.k AS BIGINT) AS k,
           CAST(COUNT(*) FILTER (WHERE class_size < k.k) AS BIGINT)
             AS classes_below,
           CAST(COALESCE(SUM(class_size) FILTER (WHERE class_size < k.k), 0)
                AS BIGINT) AS records_at_risk,
           CAST((SELECT COUNT(*) FROM classes) AS BIGINT) AS total_classes,
           CAST((SELECT MIN(class_size) FROM classes) AS BIGINT)
             AS min_class_size
    FROM classes, (VALUES {", ".join(f"({k})" for k in K_ANON_THRESHOLDS)}) k(k)
    GROUP BY k.k ORDER BY k.k
    """,
    doc="k-ANONYMITY audit over quasi-identifier combinations "
    f"({', '.join(K_ANON_QI)} on customer) — the privacy-hygiene check a "
    "training-data release runs before shipping: an equivalence class "
    "smaller than k means those records are re-identifiable from the "
    "quasi-identifiers alone. For each threshold k the report counts "
    "classes below k and the records at risk inside them, plus the "
    "global class count and the worst (minimum) class size. Plan shape: "
    "ONE groupBy over the quasi-identifier tuple (map-side combined; "
    "the shuffle carries |classes| rows), then all thresholds evaluate "
    "on the tiny class table with a values-literal cross join — adding "
    "thresholds or quasi-identifier columns never rescans the base "
    "table. Suppression/generalization decisions consume exactly this "
    "report.",
)
def profile_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(*K_ANON_QI).agg(
        F.count("*").cast("bigint").alias("class_size")
    )
    classes = classes.localCheckpoint(eager=True)  # tiny; 2 consumers
    totals = classes.agg(
        F.count("*").cast("bigint").alias("total_classes"),
        F.min("class_size").cast("bigint").alias("min_class_size"),
    )
    ks = spark.createDataFrame([(k,) for k in K_ANON_THRESHOLDS], "k BIGINT")
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.sum((F.col("class_size") < F.col("k")).cast("bigint")).alias(
                "classes_below"
            ),
            F.coalesce(
                F.sum(
                    F.when(F.col("class_size") < F.col("k"), F.col("class_size"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("records_at_risk"),
        )
        .crossJoin(F.broadcast(totals))
        .orderBy("k")
    )


# sensitive attribute: account-balance band (FLOOR((x+1000)/1000) — floor
# of an identical IEEE division on both engines; the +1000 shift keeps the
# band non-negative so no trunc-vs-floor divergence on negative balances)
L_DIV_SENSITIVE_SQL = "CAST(FLOOR((c_acctbal + 1000) / 1000) AS BIGINT)"
L_DIV_QI = ["c_mktsegment", "c_nationkey"]
L_DIV_THRESHOLDS = [3, 5, 8, 11]


@register(
    "profile_l_diversity",
    oracle=f"""
    WITH classes AS (
      SELECT {", ".join(L_DIV_QI)},
             CAST(COUNT(*) AS BIGINT) AS class_size,
             CAST(COUNT(DISTINCT {L_DIV_SENSITIVE_SQL}) AS BIGINT) AS l
      FROM customer GROUP BY {", ".join(L_DIV_QI)}
    )
    SELECT CAST(t.l_req AS BIGINT) AS l_req,
           CAST(COUNT(*) FILTER (WHERE l < t.l_req) AS BIGINT)
             AS classes_below,
           CAST(COALESCE(SUM(class_size) FILTER (WHERE l < t.l_req), 0)
                AS BIGINT) AS records_at_risk,
           CAST((SELECT MIN(l) FROM classes) AS BIGINT) AS min_l,
           CAST((SELECT COUNT(*) FROM classes) AS BIGINT) AS total_classes
    FROM classes, (VALUES {", ".join(f"({k})" for k in L_DIV_THRESHOLDS)}) t(l_req)
    GROUP BY t.l_req ORDER BY t.l_req
    """,
    doc="l-DIVERSITY audit — the companion to profile_k_anonymity: "
    "k-anonymity alone cannot stop attribute disclosure (a class of 50 "
    "records all sharing ONE sensitive value leaks it to anyone who can "
    "place a person in the class), so this counts DISTINCT sensitive "
    "values (account-balance bands) per quasi-identifier class "
    f"({', '.join(L_DIV_QI)} on customer) and reports, per required l, "
    "the classes below it and the records exposed in them, plus the "
    "worst (minimum) diversity. Same plan shape as the k-audit: one "
    "groupBy over the QI tuple carrying a distinct-count, then every "
    "threshold evaluates on the |classes|-row table — auditing more "
    "l values never rescans the base table. The band expression floors "
    "an identical IEEE division on both engines (a raw integer CAST "
    "would round in DuckDB but truncate in Spark).",
)
def profile_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(*L_DIV_QI).agg(
        F.count("*").cast("bigint").alias("class_size"),
        F.countDistinct(F.expr(L_DIV_SENSITIVE_SQL)).cast("bigint").alias("l"),
    )
    classes = classes.localCheckpoint(eager=True)  # tiny; 2 consumers
    totals = classes.agg(
        F.min("l").cast("bigint").alias("min_l"),
        F.count("*").cast("bigint").alias("total_classes"),
    )
    ks = spark.createDataFrame(
        [(k,) for k in L_DIV_THRESHOLDS], "l_req BIGINT"
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("l_req")
        .agg(
            F.sum((F.col("l") < F.col("l_req")).cast("bigint")).alias(
                "classes_below"
            ),
            F.coalesce(
                F.sum(
                    F.when(F.col("l") < F.col("l_req"), F.col("class_size"))
                ),
                F.lit(0),
            )
            .cast("bigint")
            .alias("records_at_risk"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "l_req", "classes_below", "records_at_risk", "min_l",
            "total_classes",
        )
        .orderBy("l_req")
    )


_SKEW_AUDIT = (
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_partkey"),
    ("events", "user_id"),
)


def _skew_oracle() -> str:
    parts = []
    for table, col in _SKEW_AUDIT:
        parts.append(f"""
    SELECT '{table}.{col}' AS key_name, rows, nd, mx,
           (CAST(rows AS DOUBLE) / nd) AS avg_group,
           ((CAST(mx AS DOUBLE) * nd) / rows) AS skew_factor,
           (CAST(mx AS DOUBLE) / rows) AS top_share
    FROM (
      SELECT CAST(SUM(n) AS BIGINT) AS rows, CAST(COUNT(*) AS BIGINT) AS nd,
             CAST(MAX(n) AS BIGINT) AS mx
      FROM (SELECT {col}, COUNT(*) AS n FROM {table} GROUP BY {col})
    )""")
    return (
        "\n    UNION ALL\n".join(parts) + "\n    ORDER BY key_name"
    )


@register(
    "profile_key_skew",
    oracle=_skew_oracle(),
    doc="Join/shuffle-key skew audit over the warehouse's hot keys: for "
    "each audited (table, key) pair, the row count, distinct-key count, "
    "max group size, mean group size, skew factor (max/mean — the "
    "number AQE's skew-join splitting and the salting helper act on) "
    "and the largest key's share of all rows. This is the planning "
    "input for every shuffle decision in SCALE.md: a skew factor near 1 "
    "means hash partitioning balances; >10 means one task drags the "
    "stage and the key needs salting or AQE splitting. Each audit is a "
    "two-phase groupBy collapsed to a 1-row aggregate (the shuffle "
    "carries |keys| rows, never the table); floats are single divisions "
    "of exact integers in a fixed order, engine-identical.",
)
def profile_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = None
    for table, col in _SKEW_AUDIT:
        t = load_table(spark, sf_dir, table)
        g = t.groupBy(col).agg(F.count("*").alias("n"))
        one = g.agg(
            F.sum("n").cast("bigint").alias("rows"),
            F.count("*").cast("bigint").alias("nd"),
            F.max("n").cast("bigint").alias("mx"),
        ).selectExpr(
            f"'{table}.{col}' AS key_name",
            "rows",
            "nd",
            "mx",
            "(CAST(rows AS DOUBLE) / nd) AS avg_group",
            "((CAST(mx AS DOUBLE) * nd) / rows) AS skew_factor",
            "(CAST(mx AS DOUBLE) / rows) AS top_share",
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("key_name")


_CARD_RATES = (16, 4)  # sample 1/16 and 1/4 of join-key space
_CARD_MOD = 2147483647


def _card_oracle() -> str:
    from dodo_spark.operators.text import _resample_hash_sql

    parts = []
    for denom in _CARD_RATES:
        cut = _CARD_MOD // denom
        parts.append(f"""
    SELECT CAST({denom} AS BIGINT) AS rate_denom,
           CAST(COUNT(*) AS BIGINT) AS sampled_pairs,
           CAST(COUNT(*) * {_CARD_MOD} // {cut} AS BIGINT) AS est,
           (SELECT a FROM actual) AS actual,
           CAST(COUNT(*) * {_CARD_MOD} // {cut} * 1000
                // (SELECT a FROM actual) - 1000 AS BIGINT) AS err_pm
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE {_resample_hash_sql("o.o_orderkey")} < {cut}""")
    return (
        """
    WITH actual AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS a
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    )"""
        + "\n    UNION ALL\n".join(parts)
        + "\n    ORDER BY rate_denom"
    )


@register(
    "profile_join_cardinality",
    oracle=_card_oracle(),
    doc="Sampled join-cardinality estimation (the optimizer-statistics "
    "primitive behind join reordering): gate BOTH sides of the "
    "orders ⋈ lineitem join on the SAME seedless hash of the JOIN KEY — "
    "key-correlated sampling keeps each key group whole, so the sampled "
    "join mass is an unbiased 1/f of the true mass (independent per-row "
    "sampling would square the rate and estimate garbage). Estimates at "
    "two rates land within ~±5% of the true count here; est and error "
    "are exact integer arithmetic (products bounded under 2^63 through "
    "sf100). At 100 TB the gated scan reads a fraction of both tables — "
    "pushdown-friendly since the gate is a scan-side predicate — which "
    "is how a planner prices a petabyte join without running it.",
)
def profile_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.operators.text import _resample_hash_sql

    o = load_table(spark, sf_dir, "orders").select("o_orderkey")
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    joined = o.join(l, o["o_orderkey"] == l["l_orderkey"])
    actual = joined.agg(F.count("*").cast("bigint").alias("a"))

    out = None
    gate = _resample_hash_sql("o_orderkey")
    for denom in _CARD_RATES:
        cut = _CARD_MOD // denom
        one = (
            joined.filter(F.expr(f"{gate} < {cut}"))
            .agg(F.count("*").alias("sampled_pairs"))
            .crossJoin(F.broadcast(actual))  # 1-row audit total
            .selectExpr(
                f"CAST({denom} AS BIGINT) AS rate_denom",
                "CAST(sampled_pairs AS BIGINT) AS sampled_pairs",
                f"CAST(sampled_pairs * {_CARD_MOD} DIV {cut} AS BIGINT) AS est",
                "a AS actual",
                f"CAST(sampled_pairs * {_CARD_MOD} DIV {cut} * 1000"
                " DIV a - 1000 AS BIGINT) AS err_pm",
            )
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("rate_denom")


_CMS_DEPTH_KS = (2654435761, 40503, 2246822519, 3266489917)  # odd mix constants
_CMS_W = 256
_CMS_MOD = 2147483647
_CMS_PROBE_KEYS = tuple(range(10))


def _cms_hash(col: str, k: int) -> str:
    """Seedless row hash into [0, _CMS_W): the split-hash pre-reduce rule
    keeps the product exact on both engines."""
    return f"((({col} % 2147483648) * {k}) % {_CMS_MOD}) % {_CMS_W}"


def _cms_oracle() -> str:
    probes = ", ".join(str(k) for k in _CMS_PROBE_KEYS)
    est_cols = []
    for j, k in enumerate(_CMS_DEPTH_KS):
        # COALESCE to 0: an empty cell means the sketch's estimate for
        # that row is exactly 0 (CMS never undercounts) — the probe row
        # must survive with e{j}=0, not vanish.
        est_cols.append(
            f"COALESCE((SELECT cnt FROM cms WHERE row_j = {j}"
            f" AND col = {_cms_hash('p.key', k)}), 0) AS e{j}"
        )
    rows = "\n      UNION ALL\n      ".join(
        f"SELECT {j} AS row_j, {_cms_hash('o_custkey', k)} AS col"
        f" FROM orders"
        for j, k in enumerate(_CMS_DEPTH_KS)
    )
    least = "LEAST(" + ", ".join(f"e{j}" for j in range(len(_CMS_DEPTH_KS))) + ")"
    return f"""
    WITH cells AS (
      {rows}
    ), cms AS (
      SELECT row_j, col, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY row_j, col
    ), probes AS (
      SELECT unnest([{probes}]) AS key
    ), exact AS (
      SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM orders GROUP BY o_custkey
    ), est AS (
      SELECT p.key, {", ".join(est_cols)}
      FROM probes p
    )
    SELECT e.key AS probe_key,
           COALESCE(x.exact_n, 0) AS exact_n,
           CAST({least} AS BIGINT) AS cms_est,
           CAST({least} - COALESCE(x.exact_n, 0) AS BIGINT) AS overcount
    FROM est e LEFT JOIN exact x ON x.key = e.key
    ORDER BY probe_key
    """


@register(
    "agg_count_min",
    oracle=_cms_oracle(),
    doc="Count-Min sketch (d=4 x w=256) over the order-customer stream — "
    "the mergeable point-frequency sketch beside the registry's "
    "Misra-Gries heavy hitters, HLL NDV, and quantile sketches: each "
    "counter row is an independent seedless hash (split-hash pre-reduce, "
    "engine-exact), the sketch build is ONE groupBy over d x w bounded "
    "cells (map-side combinable, trivially mergeable across partitions "
    "and across days — counters just add), and a point query takes the "
    "MIN across rows. Output: ten probe keys' exact counts vs sketch "
    "estimates with the (always >= 0) overcount — the CMS one-sided "
    "error guarantee, visible: estimates never undercount. At 100 TB "
    "the sketch is a d*w-integer broadcast state, the stream is never "
    "re-scanned per query.",
)
def agg_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cells = None
    for j, k in enumerate(_CMS_DEPTH_KS):
        one = orders.selectExpr(
            f"CAST({j} AS BIGINT) AS row_j",
            f"{_cms_hash('o_custkey', k)} AS col",
        )
        cells = one if cells is None else cells.unionByName(one)
    cms = cells.groupBy("row_j", "col").agg(F.count("*").alias("cnt"))

    probes = spark.createDataFrame(
        [(k,) for k in _CMS_PROBE_KEYS], "key BIGINT"
    )
    est = probes
    for j, k in enumerate(_CMS_DEPTH_KS):
        row_j = cms.filter(F.col("row_j") == j).select(
            F.col("col").alias(f"col{j}"), F.col("cnt").alias(f"e{j}")
        )
        # LEFT join + COALESCE 0: an empty CMS cell is the one case the
        # sketch answers exactly (estimate 0); an inner join would drop
        # the probe row entirely while the oracle still emits it.
        est = (
            est.withColumn(f"h{j}", F.expr(_cms_hash("key", k)))
            .join(
                F.broadcast(row_j),
                F.col(f"h{j}") == F.col(f"col{j}"),
                "left",
            )
            .withColumn(f"e{j}", F.coalesce(F.col(f"e{j}"), F.lit(0)))
        )
    exact = orders.groupBy(F.col("o_custkey").alias("key")).agg(
        F.count("*").cast("bigint").alias("exact_n")
    )
    least = "LEAST(" + ", ".join(f"e{j}" for j in range(len(_CMS_DEPTH_KS))) + ")"
    return (
        est.join(exact, "key", "left")
        .selectExpr(
            "key AS probe_key",
            "COALESCE(exact_n, 0) AS exact_n",
            f"CAST({least} AS BIGINT) AS cms_est",
            f"CAST({least} - COALESCE(exact_n, 0) AS BIGINT) AS overcount",
        )
        .orderBy("probe_key")
    )
