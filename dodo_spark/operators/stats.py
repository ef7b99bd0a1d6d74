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
