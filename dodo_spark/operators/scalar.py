"""Scalar expression surface (SURVEY.md §2.A, A28-A35).

The Doris grammar's expression language (ref ``src/parser/DorisParser.g4``
1510-1678) maps 1:1 onto ``pyspark.sql.functions`` — everything here stays
inside whole-stage codegen; no Python UDFs. Each verify key exercises one
expression family per-row over a test table, with an exact DuckDB twin.

Cross-engine gotchas handled here:
- integer division: Spark ``div`` == DuckDB ``//``
- EXTRACT returns int in Spark, bigint in DuckDB -> cast both to INTEGER
- float-typed array elements are cast to double on both sides
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register


@register(
    "scalar_case",
    oracle="""
    SELECT price_band, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM (
      SELECT CASE WHEN o_totalprice < 50000 THEN 'low'
                  WHEN o_totalprice < 150000 THEN 'mid'
                  ELSE 'high' END AS price_band,
             CASE o_orderstatus WHEN 'F' THEN 'F' ELSE o_orderstatus END AS o_orderstatus
      FROM orders
    ) t GROUP BY price_band, o_orderstatus
    """,
    doc="A28: searched + simple CASE WHEN (ref DorisParser.g4:1540-1541).",
)
def scalar_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    band = (
        F.when(F.col("o_totalprice") < 50000, "low")
        .when(F.col("o_totalprice") < 150000, "mid")
        .otherwise("high")
    )
    return (
        orders.select(band.alias("price_band"), "o_orderstatus")
        .groupBy("price_band", "o_orderstatus")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "scalar_math",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(l_orderkey % 7 AS BIGINT) AS mod7,
           CAST(l_orderkey // 100 AS BIGINT) AS div100,
           CAST(l_orderkey & 255 AS BIGINT) AS band,
           CAST(l_orderkey | 16 AS BIGINT) AS bor,
           CAST(xor(l_orderkey, 255) AS BIGINT) AS bxor,
           CAST(-l_linenumber AS INTEGER) AS neg,
           CAST(abs(l_orderkey - 3000) AS BIGINT) AS absdiff,
           CAST(greatest(l_orderkey, CAST(l_partkey AS BIGINT)) AS BIGINT) AS gkey
    FROM lineitem WHERE l_orderkey < 500
    """,
    doc="A30: arithmetic with DIV/MOD/bitwise/unary (ref valueExpression "
    "DorisParser.g4:1520-1530). Integer-only to stay bit-exact.",
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    k = F.col("l_orderkey")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (k % 7).alias("mod7"),
        F.expr("l_orderkey div 100").alias("div100"),
        k.bitwiseAND(F.lit(255)).alias("band"),
        k.bitwiseOR(F.lit(16)).alias("bor"),
        k.bitwiseXOR(F.lit(255)).alias("bxor"),
        (-F.col("l_linenumber")).alias("neg"),
        F.abs(k - 3000).alias("absdiff"),
        F.greatest(k, F.col("l_partkey")).alias("gkey"),
    )


@register(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS uname,
           lower(c_mktsegment) AS lseg,
           substring(c_name, 10, 9) AS idpart,
           CAST(length(c_name) AS INTEGER) AS name_len,
           concat(c_mktsegment, ':', c_name) AS tagged,
           replace(c_name, 'Customer', 'C') AS short_name,
           trim(concat(' ', c_mktsegment, ' ')) AS trimmed,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           reverse(c_mktsegment) AS rseg,
           CAST(strpos(c_name, '#') AS INTEGER) AS hash_pos
    FROM customer WHERE c_custkey < 200
    """,
    doc="A31: string function family (ref DorisParser.g4:1579-1599; live "
    "usage CONCAT/SUBSTRING/LENGTH in reference fixture/q0.sql).",
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") < 200)
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("uname"),
        F.lower("c_mktsegment").alias("lseg"),
        F.substring("c_name", 10, 9).alias("idpart"),
        F.length("c_name").alias("name_len"),
        F.concat(F.col("c_mktsegment"), F.lit(":"), F.col("c_name")).alias("tagged"),
        F.regexp_replace("c_name", "Customer", "C").alias("short_name"),
        F.trim(F.concat(F.lit(" "), F.col("c_mktsegment"), F.lit(" "))).alias("trimmed"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.reverse(F.col("c_mktsegment")).alias("rseg"),
        F.instr(F.col("c_name"), "#").alias("hash_pos"),
    )


@register(
    "scalar_date",
    oracle="""
    SELECT o_orderkey,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS yr,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS mon,
           CAST(EXTRACT(DAY FROM o_orderdate) AS INTEGER) AS dom,
           CAST(EXTRACT(QUARTER FROM o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-31') AS INTEGER)
             AS days_to_eoy,
           CAST(o_orderdate + INTERVAL 90 DAY AS TIMESTAMP) AS plus_90d,
           strftime(o_orderdate, '%Y-%m') AS ym
    FROM orders WHERE o_orderkey < 300
    """,
    doc="A32: date/time functions, EXTRACT, INTERVAL arithmetic "
    "(ref extract DorisParser.g4:1564-1565, interval :1671-1678).",
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("yr"),
        F.month(d).alias("mon"),
        F.dayofmonth(d).alias("dom"),
        F.quarter(d).alias("qtr"),
        # DATE-typed outputs are avoided engine-wide: DuckDB hands dates to
        # pandas as midnight datetimes, Spark as date objects -> hash skew.
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("timestamp").alias("due_date"),
        F.datediff(F.lit("1998-12-31").cast("date"), d.cast("date")).alias("days_to_eoy"),
        (d + F.expr("INTERVAL 90 DAY")).alias("plus_90d"),
        F.date_format(d, "yyyy-MM").alias("ym"),
    )


@register(
    "scalar_null",
    oracle="""
    SELECT o_orderkey,
           coalesce(nullif(o_orderstatus, 'O'), 'OPEN') AS status_or_open,
           CAST(coalesce(NULL, NULL, o_totalprice) AS DOUBLE) AS first_price,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_orderstatus END AS maybe_null,
           CAST(o_totalprice IS NOT NULL AS BOOLEAN) AS has_price,
           ifnull(nullif(o_orderstatus, o_orderstatus), 'same') AS ifnull_demo
    FROM orders WHERE o_orderkey < 300
    """,
    doc="A33: IF/IFNULL/NVL/COALESCE/NULLIF (ref functionNameIdentifier "
    "DorisParser.g4:1594; nvl/if usage example/usercase/sql/q0.sql).",
)
def scalar_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 300)
    return o.select(
        "o_orderkey",
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("O")), F.lit("OPEN")).alias(
            "status_or_open"
        ),
        F.coalesce(F.lit(None), F.lit(None), F.col("o_totalprice")).alias("first_price"),
        F.when(F.col("o_orderstatus") == "P", None)
        .otherwise(F.col("o_orderstatus"))
        .alias("maybe_null"),
        F.col("o_totalprice").isNotNull().alias("has_price"),
        F.ifnull(F.nullif(F.col("o_orderstatus"), F.col("o_orderstatus")), F.lit("same")).alias(
            "ifnull_demo"
        ),
    )


@register(
    "scalar_json",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
    FROM events
    GROUP BY event_type
    """,
    doc="A34: JSON extraction (ref usage example/usercase/sql/q0.sql, "
    "custom_test.go:72; JSON type SURVEY §1.2) — get_json_object on the "
    "events.props payload.",
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.sum(k).alias("k_sum"),
        F.min(k).alias("k_min"),
        F.max(k).alias("k_max"),
    )


@register(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_val,
           CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
           CAST(list_sort(embedding)[1] AS DOUBLE) AS min_val,
           CAST(list_sort(embedding)[len(embedding)] AS DOUBLE) AS max_val,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS positives
    FROM embeddings WHERE vec_id < 100
    """,
    doc="A35: array element access / slice / higher-order functions "
    "(ref elementAt/arraySlice DorisParser.g4:1554-1556).",
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).alias("dim"),
        F.element_at(e, 1).cast("double").alias("first_val"),
        F.element_at(e, -1).cast("double").alias("last_val"),
        F.array_min(e).cast("double").alias("min_val"),
        F.array_max(e).cast("double").alias("max_val"),
        F.size(F.filter(e, lambda x: x > 0)).alias("positives"),
    )


@register(
    "scalar_cast",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(o_totalprice AS DECIMAL(18,0)) AS BIGINT) AS price_long,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(substring(CAST(o_orderdate AS VARCHAR), 1, 10) AS VARCHAR) AS date_str,
           CAST(CAST(o_orderkey % 2 AS BOOLEAN) AS INTEGER) AS odd_int,
           CAST('42' AS BIGINT) + o_orderkey AS parsed_plus
    FROM orders WHERE o_orderkey < 500
    """,
    doc="A29: CAST/CONVERT across the numeric/string/temporal/boolean "
    "lattice (ref castExpression DorisParser.g4:1528-1532). "
    "double->bigint truncates toward zero in Spark but ROUNDS in DuckDB, "
    "so the lattice pins double->decimal(18,2)->bigint where both engines "
    "round half-up; date->string goes through an explicit substring so "
    "midnight-timestamp rendering differences can't leak in.",
)
def scalar_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.col("o_totalprice").cast("decimal(18,0)").cast("bigint").alias("price_long"),
        F.col("o_totalprice").cast("decimal(18,2)").cast("string").alias("price_str"),
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.substring(F.col("o_orderdate").cast("string"), 1, 10).alias("date_str"),
        (F.col("o_orderkey") % 2).cast("boolean").cast("int").alias("odd_int"),
        (F.lit("42").cast("bigint") + F.col("o_orderkey")).alias("parsed_plus"),
    )


@register(
    "scalar_map",
    oracle="""
    SELECT o_orderkey,
           CAST(cardinality(m) AS INTEGER) AS n_entries,
           CAST(len(m['status']) > 0 AS BOOLEAN) AS has_status,
           m['priority'][1] AS priority,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_sorted
    FROM (
      SELECT o_orderkey,
             MAP(['status', 'priority'], [o_orderstatus, o_orderpriority]) AS m
      FROM orders WHERE o_orderkey < 400
    )
    """,
    doc="A35 map family: map construction, cardinality, key membership, "
    "value lookup, sorted key list — all codegen'd expressions "
    "(ref complex-type functions, DorisParser.g4:1579-1599).",
)
def scalar_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"), F.lit("priority"), F.col("o_orderpriority")
    )
    d = o.select("o_orderkey", m.alias("m"))
    return d.select(
        "o_orderkey",
        F.size("m").alias("n_entries"),
        F.array_contains(F.map_keys("m"), "status").alias("has_status"),
        F.col("m")["priority"].alias("priority"),
        F.concat_ws(",", F.array_sort(F.map_keys("m"))).alias("keys_sorted"),
    )
