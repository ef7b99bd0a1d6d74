"""Column-statistics dump (SURVEY.md §2.B, B2).

Reproduces the reference's per-table stats model ``TableStats{Name,
RowCount, Columns}`` / ``ColumnStats{Name, Count, Ndv, NullCount, DataSize,
AvgSizeByte, Min, Max}`` (reference ``src/db.go:78-94``; output shape
``example/ddl/company.stats.yaml``). Where dodo issues ``SHOW COLUMN STATS``
against Doris, we compute the same numbers with one aggregation pass per
table and unpivot to one row per column.

Scale: a single full scan with all per-column aggregates fused into one
hash-agg — the same cost profile as ``ANALYZE TABLE ... COMPUTE STATISTICS
FOR ALL COLUMNS`` and shuffle-free except the final single-row exchange.
"""

from __future__ import annotations

import yaml
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, StringType

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

__all__ = ["column_stats", "stats_yaml"]


def _min_max_str(c: str, dt) -> tuple:
    """min/max rendered as strings, like the stats.yaml shape.

    Doubles are cast through DECIMAL(18,2) first: decimal->string is
    bit-identical across engines while double->string shortest-repr is not.
    """
    col = F.col(c)
    if isinstance(dt, NumericType) and dt.simpleString() == "double":
        col = col.cast("decimal(18,2)")
    return (
        F.min(col).cast("string").alias(f"{c}__min"),
        F.max(col).cast("string").alias(f"{c}__max"),
    )


def column_stats(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """One row per column: count, ndv, null_count, data_size, avg_size_byte,
    min, max — the ColumnStats record (ref src/db.go:78-94)."""
    df = load_table(spark, sf_dir, table)
    aggs: list = []
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.count(F.col(c)).alias(f"{c}__count"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"{c}__ndv"))
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        if isinstance(f.dataType, StringType):
            aggs.append(F.sum(F.length(c).cast("bigint")).alias(f"{c}__size"))
        else:
            aggs.append(F.lit(None).cast("bigint").alias(f"{c}__size"))
        aggs.extend(_min_max_str(c, f.dataType))
    wide = df.agg(*aggs)

    # unpivot the single wide row into one row per column
    per_col = [
        F.struct(
            F.lit(f.name).alias("column_name"),
            F.col(f"{f.name}__count").alias("count"),
            F.col(f"{f.name}__ndv").alias("ndv"),
            F.col(f"{f.name}__nulls").alias("null_count"),
            F.col(f"{f.name}__size").alias("data_size"),
            (F.col(f"{f.name}__size").cast("double") / F.col(f"{f.name}__count")).alias(
                "avg_size_byte"
            ),
            F.col(f"{f.name}__min").alias("min"),
            F.col(f"{f.name}__max").alias("max"),
        )
        for f in df.schema.fields
    ]
    return wide.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def stats_yaml(spark: SparkSession, sf_dir: str, table: str) -> str:
    """Serialize to the <db>.stats.yaml shape (ref example/ddl/company.stats.yaml)."""
    rows = column_stats(spark, sf_dir, table).collect()
    row_count = max((r["count"] + r["null_count"] for r in rows), default=0)
    doc = {
        "name": table,
        "row_count": int(row_count),
        "columns": [
            {
                "name": r["column_name"],
                "count": int(r["count"]),
                "ndv": int(r["ndv"]),
                "null_count": int(r["null_count"]),
                "data_size": None if r["data_size"] is None else int(r["data_size"]),
                "avg_size_byte": r["avg_size_byte"],
                "min": r["min"],
                "max": r["max"],
                "method": "FULL",
            }
            for r in rows
        ],
    }
    return yaml.safe_dump(doc, sort_keys=False)


def _oracle_for(table: str, cols: list[tuple[str, str]]) -> str:
    """Build the per-column UNION ALL oracle for a table."""
    parts = []
    for c, kind in cols:
        mm = f"CAST(CAST(MIN({c}) AS DECIMAL(18,2)) AS VARCHAR)" if kind == "double" else f"CAST(MIN({c}) AS VARCHAR)"
        mx = f"CAST(CAST(MAX({c}) AS DECIMAL(18,2)) AS VARCHAR)" if kind == "double" else f"CAST(MAX({c}) AS VARCHAR)"
        size = f"CAST(SUM(length({c})) AS BIGINT)" if kind == "string" else "CAST(NULL AS BIGINT)"
        avg = (
            f"CAST(SUM(length({c})) AS DOUBLE) / COUNT({c})" if kind == "string" else "CAST(NULL AS DOUBLE)"
        )
        parts.append(
            f"""SELECT '{c}' AS column_name,
                 CAST(COUNT({c}) AS BIGINT) AS count,
                 CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv,
                 CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
                 {size} AS data_size,
                 {avg} AS avg_size_byte,
                 {mm} AS min,
                 {mx} AS max
               FROM {table}"""
        )
    return "\nUNION ALL\n".join(parts)


_CUSTOMER_COLS = [
    ("c_custkey", "bigint"),
    ("c_name", "string"),
    ("c_nationkey", "int"),
    ("c_acctbal", "double"),
    ("c_mktsegment", "string"),
]


@register(
    "stats_column",
    oracle=_oracle_for("customer", _CUSTOMER_COLS),
    doc="B2: column stats dump over `customer` — count/ndv/null_count/"
    "data_size/avg_size_byte/min/max per column, the SHOW COLUMN STATS "
    "record (ref src/db.go:356-445, example/ddl/company.stats.yaml).",
)
def stats_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    return column_stats(spark, sf_dir, "customer")


N_BUCKETS = 10


@register(
    "stats_histogram",
    oracle=f"""
    WITH mm AS (
      SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi FROM orders
    )
    SELECT CAST(LEAST(FLOOR((o_totalprice - mm.lo) / ((mm.hi - mm.lo) / {N_BUCKETS})),
                      {N_BUCKETS - 1}) AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders, mm
    GROUP BY 1
    """,
    doc="Equi-width histogram over a numeric column — the data-profiling "
    "companion of the stats dump (Doris exposes column histograms via its "
    "stats subsystem). Two passes: global min/max (tiny broadcast), then "
    "one groupBy on the bucket id; identical double arithmetic on both "
    "engines keeps bucket edges bit-equal.",
)
def stats_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    mm = orders.agg(
        F.min("o_totalprice").alias("lo_g"), F.max("o_totalprice").alias("hi_g")
    )
    width = (F.col("hi_g") - F.col("lo_g")) / N_BUCKETS
    bucket = F.least(
        F.floor((F.col("o_totalprice") - F.col("lo_g")) / width),
        F.lit(N_BUCKETS - 1),
    ).cast("bigint")
    return (
        orders.crossJoin(F.broadcast(mm))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("cnt"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


@register(
    "stats_correlation",
    oracle="""
    WITH scaled AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d
      FROM lineitem
    ), sums AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE) AS sq,
             CAST(SUM(CAST(p AS DECIMAL(38,0))) AS DOUBLE) AS sp,
             CAST(SUM(CAST(d AS DECIMAL(38,0))) AS DOUBLE) AS sd,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(p AS DECIMAL(19,0))) AS DOUBLE) AS sqp,
             CAST(SUM(CAST(p AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS DOUBLE) AS spd,
             CAST(SUM(CAST(q AS DECIMAL(19,0)) * CAST(q AS DECIMAL(19,0))) AS DOUBLE) AS sqq,
             CAST(SUM(CAST(p AS DECIMAL(19,0)) * CAST(p AS DECIMAL(19,0))) AS DOUBLE) AS spp,
             CAST(SUM(CAST(d AS DECIMAL(19,0)) * CAST(d AS DECIMAL(19,0))) AS DOUBLE) AS sdd
      FROM scaled GROUP BY l_returnflag
    )
    SELECT l_returnflag, n_rows,
           ((n_rows * sqp) - (sq * sp))
             / (sqrt((n_rows * sqq) - (sq * sq)) * sqrt((n_rows * spp) - (sp * sp)))
             AS corr_qty_price,
           ((n_rows * spd) - (sp * sd))
             / (sqrt((n_rows * spp) - (sp * sp)) * sqrt((n_rows * sdd) - (sd * sd)))
             AS corr_price_disc
    FROM sums
    """,
    doc="B2 extension — column-pair statistics (correlation matrix entries, "
    "the numbers behind an optimizer's column-group stats / a data-quality "
    "drift monitor). Engine-exact by construction: inputs quantize to "
    "integer units (qty, cents, discount-percent) so every sum and "
    "sum-of-products is an EXACT integer accumulated in DECIMAL(38,0) "
    "(order-independent, overflow-free through sf1k); the Pearson formula "
    "then runs as a fixed sequence of IEEE double ops on identical inputs "
    "in both engines. Never uses the engines' own corr() (their float "
    "accumulation orders differ). Plan: one fused hash-agg pass over the "
    "scan — 8 sums + count in a single shuffle on the group key, same "
    "cost profile as stats_column.",
)
def stats_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # bround (half-even) matches DuckDB's double->BIGINT cast; a plain
    # Spark cast TRUNCATES, which diverges on fractional quantities
    # (latent on integral testdata; caught by the sf1 generated corpus)
    q = F.bround(F.col("l_quantity")).cast("bigint")
    p = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    d = F.round(F.col("l_discount") * 100).cast("bigint")
    # spread: the 9-way exact-decimal sum-of-products partial aggregate
    # is the heavy per-row work — parallelize it past the source's split
    # count (ONE task on single-row-group local inputs; no-op at scale).
    # Order-safe: every accumulator is integer/decimal by design.
    from dodo_spark.operators.text import spread_scan

    li = spread_scan(li)
    scaled = li.select(F.col("l_returnflag"), q.alias("q"), p.alias("p"), d.alias("d"))

    def dsum38(c):
        return F.sum(c.cast("decimal(38,0)")).cast("double")

    def dprod(a, b):
        # multiply in DECIMAL(19,0) so the product is exact DECIMAL(38,0)
        # at ANY scale — int64 a*b would silently wrap past 2^63 in Spark
        # while DuckDB errors (the chi-square/split-hash divergence class)
        return F.sum(a.cast("decimal(19,0)") * b.cast("decimal(19,0)")).cast("double")

    sums = scaled.groupBy("l_returnflag").agg(
        F.count("*").alias("n_rows"),
        dsum38(F.col("q")).alias("sq"),
        dsum38(F.col("p")).alias("sp"),
        dsum38(F.col("d")).alias("sd"),
        dprod(F.col("q"), F.col("p")).alias("sqp"),
        dprod(F.col("p"), F.col("d")).alias("spd"),
        dprod(F.col("q"), F.col("q")).alias("sqq"),
        dprod(F.col("p"), F.col("p")).alias("spp"),
        dprod(F.col("d"), F.col("d")).alias("sdd"),
    )
    n = F.col("n_rows")

    def corr(sxy, sx, sy, sxx, syy):
        num = (n * sxy) - (sx * sy)
        den = F.sqrt((n * sxx) - (sx * sx)) * F.sqrt((n * syy) - (sy * sy))
        return num / den

    return sums.select(
        "l_returnflag",
        "n_rows",
        corr(F.col("sqp"), F.col("sq"), F.col("sp"), F.col("sqq"), F.col("spp")).alias(
            "corr_qty_price"
        ),
        corr(F.col("spd"), F.col("sp"), F.col("sd"), F.col("spp"), F.col("sdd")).alias(
            "corr_price_disc"
        ),
    )


EQD_BUCKETS = 10
EQD_COARSE = 1000  # dollars per coarse block of the two-phase prefix sum


@register(
    "stats_equidepth",
    oracle=f"""
    WITH bins AS (
      SELECT CAST(floor(o_totalprice) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM orders GROUP BY 1
    ), c AS (
      SELECT d, cnt,
             SUM(cnt) OVER (ORDER BY d) AS cum,
             SUM(cnt) OVER () AS n
      FROM bins
    ), x AS (
      SELECT d, cum, n,
             (cum * {EQD_BUCKETS}) // n AS qsat,
             ((cum - cnt) * {EQD_BUCKETS}) // n AS prevq
      FROM c
    )
    SELECT CAST(unnest(generate_series(CAST(prevq + 1 AS BIGINT),
                CAST(least(qsat, {EQD_BUCKETS}) AS BIGINT))) AS BIGINT) AS bucket,
           d AS upper_dollar,
           CAST(cum AS BIGINT) AS cum_rows
    FROM x WHERE qsat > prevq
    """,
    doc="EQUI-DEPTH histogram boundaries (the optimizer-stats companion of "
    "the equi-width stats_histogram — Doris's stats subsystem collects "
    "depth histograms for selectivity estimation): the q-th boundary is "
    "the smallest value whose cumulative count covers q/N of the rows. "
    "Built scale-honest: values quantize to an integer dollar GRID (one "
    "data-sized shuffle onto bin counts), and the cumulative sum is the "
    "classic DISTRIBUTED TWO-PHASE prefix sum — within-block cumsum "
    "windows partitioned by a coarse block key, plus per-block offsets "
    "from a triangular join of the tiny block-total table — so no window "
    "ever sees more than EQD_COARSE grid rows and nothing funnels into "
    "one partition. Boundary extraction is pure integer arithmetic "
    "(cum*K vs q*n, no division), engine-identical.",
)
def stats_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    bins = (
        orders.select(F.floor("o_totalprice").cast("bigint").alias("d"))
        .groupBy("d")
        .agg(F.count("*").alias("cnt"))
        .withColumn("coarse", (F.col("d") / EQD_COARSE).cast("bigint"))
        # three consumers (within-cumsum, block totals, final join)
        .localCheckpoint(eager=False)
    )
    w_in = (
        Window.partitionBy("coarse")
        .orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bins.withColumn("cum_in", F.sum("cnt").over(w_in))
    totals = bins.groupBy("coarse").agg(F.sum("cnt").alias("tot"))
    t1 = totals.alias("t1")
    t2 = totals.alias("t2")
    offsets = (
        t1.join(F.broadcast(t2), F.col("t2.coarse") < F.col("t1.coarse"), "left")
        .groupBy(F.col("t1.coarse").alias("coarse"))
        .agg(F.coalesce(F.sum("t2.tot"), F.lit(0)).alias("offset"))
    )
    n_rows = bins.agg(F.sum("cnt").alias("n"))
    c = (
        within.join(F.broadcast(offsets), "coarse")
        .withColumn("cum", F.col("offset") + F.col("cum_in"))
        .crossJoin(F.broadcast(n_rows))
    )
    qsat = F.least((F.col("cum") * EQD_BUCKETS) / F.col("n"), F.lit(float(EQD_BUCKETS)))
    prevq = ((F.col("cum") - F.col("cnt")) * EQD_BUCKETS) / F.col("n")
    x = c.select(
        "d",
        "cum",
        F.floor(qsat).cast("bigint").alias("qsat"),
        F.floor(prevq).cast("bigint").alias("prevq"),
    ).filter(F.col("qsat") > F.col("prevq"))
    return x.select(
        F.explode(F.sequence(F.col("prevq") + 1, F.col("qsat"))).alias("bucket"),
        F.col("d").alias("upper_dollar"),
        F.col("cum").cast("bigint").alias("cum_rows"),
    )


def suggest_expectations(
    spark: SparkSession, sf_dir: str, table: str, range_slack: float = 0.5
) -> dict[str, str]:
    """Derive ingest CHECK-constraint SUGGESTIONS from a table's observed
    invariants (the dbt-style `tests:` authoring step, feeding
    ``sources.versioned.check_expectations`` / ``snapshot --expect``):

    - a column with zero observed NULLs -> ``c IS NOT NULL``;
    - a numeric column -> a BETWEEN envelope, the observed range widened
      by ``range_slack`` x its span on each side (an exact-range check
      would reject legitimate drift on the first new batch);
    - never suggests on all-NULL columns.

    One stats pass (column_stats); output is a plain {name: predicate}
    dict, JSON-printable and directly usable as expectations."""
    from pyspark.sql import types as T

    df = load_table(spark, sf_dir, table)
    stats = {r["column_name"]: r.asDict() for r in column_stats(spark, sf_dir, table).collect()}
    out: dict[str, str] = {}
    for f in df.schema.fields:
        st = stats[f.name]
        if st["count"] == 0:
            continue
        checks = []
        if st["null_count"] == 0:
            checks.append(f"{f.name} IS NOT NULL")
        if isinstance(
            f.dataType,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType),
        ) and st["min"] is not None:
            lo, hi = float(st["min"]), float(st["max"])
            slack = (hi - lo) * range_slack
            # render bounds as integers when exact, else plain floats
            b_lo, b_hi = lo - slack, hi + slack
            fmt = (
                (str(int(b_lo)), str(int(b_hi)))
                if b_lo == int(b_lo) and b_hi == int(b_hi)
                else (repr(b_lo), repr(b_hi))
            )
            rng = f"{f.name} BETWEEN {fmt[0]} AND {fmt[1]}"
            # SQL CHECK semantics pass NULLs, so the envelope composes
            # with or without the IS NOT NULL suggestion
            checks.append(rng)
        if checks:
            out[f"{f.name}_invariants"] = " AND ".join(checks)
    return out


def _register_stats_drift() -> None:
    from dodo_spark.registry import register

    @register(
        "stats_drift_tv",
        oracle="""
        WITH ref AS (SELECT * FROM documents WHERE doc_id % 2 = 0),
        cur AS (SELECT * FROM documents WHERE doc_id % 2 = 1),
        lang_r AS (SELECT lang AS bucket, CAST(COUNT(*) AS BIGINT) AS n_ref
                   FROM ref GROUP BY lang),
        lang_c AS (SELECT lang AS bucket, CAST(COUNT(*) AS BIGINT) AS n_cur
                   FROM cur GROUP BY lang),
        len_r AS (SELECT CAST(COALESCE(n_chars, -100) // 100 AS VARCHAR) AS bucket,
                         CAST(COUNT(*) AS BIGINT) AS n_ref
                  FROM ref GROUP BY 1),
        len_c AS (SELECT CAST(COALESCE(n_chars, -100) // 100 AS VARCHAR) AS bucket,
                         CAST(COUNT(*) AS BIGINT) AS n_cur
                  FROM cur GROUP BY 1),
        joined AS (
          SELECT 'lang' AS dim, COALESCE(lang_r.bucket, lang_c.bucket) AS bucket,
                 COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
          FROM lang_r FULL OUTER JOIN lang_c ON lang_r.bucket = lang_c.bucket
          UNION ALL
          SELECT 'len100', COALESCE(len_r.bucket, len_c.bucket),
                 COALESCE(n_ref, 0), COALESCE(n_cur, 0)
          FROM len_r FULL OUTER JOIN len_c ON len_r.bucket = len_c.bucket
        )
        SELECT dim, bucket, n_ref, n_cur,
               CAST(abs(n_ref * SUM(n_cur) OVER (PARTITION BY dim)
                        - n_cur * SUM(n_ref) OVER (PARTITION BY dim))
                    AS BIGINT) AS tv_term
        FROM joined ORDER BY dim, bucket
        """,
        doc="Distribution DRIFT between two corpus slices in EXACT integer "
        "arithmetic (the train/serve drift monitor an ML-data pipeline "
        "runs between dataset versions — pairs with the versioned-table "
        "layer's snapshots): even/odd doc_id halves stand in for "
        "reference vs current, compared on two dimensions (lang "
        "categorical; n_chars in fixed 100-char buckets). Per bucket the "
        "key emits the cross-multiplied total-variation term "
        "|n_ref*M - n_cur*N| (N, M = per-dimension totals) — the total "
        "variation distance is sum(tv_term)/(2*N*M), but the HASHED "
        "output stays in integers so no engine's ln/float rounding can "
        "drift (why TVD here, not PSI/KL: those need logarithms, whose "
        "libm rounding differs across engines). Shape: two groupBys + "
        "one full-outer join on bucket + a per-dimension window sum over "
        "O(buckets) rows. int64 bound: counts x totals must stay under "
        "2^63 (~3e9 rows per slice); beyond that, pre-normalize counts "
        "to per-million integer shares — same algebra.",
    )
    def stats_drift_tv(spark: SparkSession, sf_dir: str) -> DataFrame:
        from pyspark.sql import Window

        docs = load_table(spark, sf_dir, "documents")
        ref = docs.filter(F.col("doc_id") % 2 == 0)
        cur = docs.filter(F.col("doc_id") % 2 == 1)

        def dim(col, name):
            r = ref.groupBy(col.alias("bucket")).agg(F.count("*").alias("n_ref"))
            c = cur.groupBy(col.alias("bucket")).agg(F.count("*").alias("n_cur"))
            return (
                r.join(c, "bucket", "full_outer")
                .select(
                    F.lit(name).alias("dim"),
                    "bucket",
                    F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
                    F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
                )
            )

        lang = dim(F.col("lang"), "lang")
        # NULL sentinel is -100, not -1: Spark DIV truncates toward zero
        # while DuckDB // floors, so -1 buckets to '0' vs '-1' across the
        # engines — -100/100 is exact, where truncation == floor.
        length = dim(
            F.expr("CAST(COALESCE(n_chars, -100) DIV 100 AS STRING)"), "len100"
        )
        w = Window.partitionBy("dim")
        return (
            lang.unionByName(length)
            .withColumn(
                "tv_term",
                F.abs(
                    F.col("n_ref") * F.sum("n_cur").over(w)
                    - F.col("n_cur") * F.sum("n_ref").over(w)
                ).cast("bigint"),
            )
            .orderBy("dim", "bucket")
        )


_register_stats_drift()


# Benford first-digit expectation, integer per-mille (log10(1+1/d) * 1000,
# rounded): hardcoded so no libm log enters either engine's plan
_BENFORD_PM = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}


@register(
    "stats_benford",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS d
      FROM orders WHERE o_totalprice >= 1
    ), counts AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS obs FROM digits GROUP BY d
    ), n AS (SELECT CAST(SUM(obs) AS BIGINT) AS n FROM counts),
    exp_pm(d, benford_pm) AS (
      VALUES {", ".join(f"({d}, CAST({pm} AS BIGINT))" for d, pm in _BENFORD_PM.items())}
    )
    SELECT e.d, COALESCE(c.obs, 0) AS obs,
           CAST(COALESCE(c.obs, 0) * 1000 // (SELECT n FROM n) AS BIGINT)
             AS obs_pm,
           e.benford_pm,
           CAST(COALESCE(c.obs, 0) * 1000 // (SELECT n FROM n)
                - e.benford_pm AS BIGINT) AS delta_pm
    FROM exp_pm e LEFT JOIN counts c ON c.d = e.d
    ORDER BY e.d
    """,
    doc="Benford first-digit audit of a money column (the classic "
    "fabricated-data / unit-mixing screen in data hygiene): observed "
    "leading-digit distribution of o_totalprice vs the Benford "
    "expectation, both in integer per-mille — the digit extracts via "
    "integer-cast + substring (no log10, no libm) and the shares divide "
    "exactly, so the audit is engine-identical. One groupBy on a 9-value "
    "key; the expectation is a 9-row inline VALUES broadcast. A uniform "
    "synthetic price column shows large deltas — which is the point: "
    "the audit DETECTS non-Benford generators, including this one.",
)
def stats_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    counts = (
        orders.filter(F.col("o_totalprice") >= 1)
        .select(
            # explicit FLOOR: Spark's double->bigint cast truncates while
            # DuckDB's ROUNDS, so a bare cast flips digits at x999.5+
            F.substring(
                F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
            )
            .cast("bigint")
            .alias("d")
        )
        .groupBy("d")
        .agg(F.count("*").alias("obs"))
    )
    n = counts.agg(F.sum("obs").cast("bigint").alias("n"))
    exp_pm = spark.createDataFrame(
        [(d, pm) for d, pm in _BENFORD_PM.items()], "d BIGINT, benford_pm BIGINT"
    )
    return (
        exp_pm.join(counts, "d", "left")
        .crossJoin(F.broadcast(n))  # 1-row total broadcast (audit idiom)
        .selectExpr(
            "d",
            "COALESCE(obs, 0) AS obs",
            "CAST(COALESCE(obs, 0) * 1000 DIV n AS BIGINT) AS obs_pm",
            "benford_pm",
            "CAST(COALESCE(obs, 0) * 1000 DIV n - benford_pm AS BIGINT)"
            " AS delta_pm",
        )
        .orderBy("d")
    )
