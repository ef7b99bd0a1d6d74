"""Composite multi-join analytic queries — the workload a dodo user actually
replays (reference ``example/usercase/sql/q0.sql`` is a CTE + window + join
query of exactly this shape; the grammar is Spark-derived,
``src/parser/DorisParser.g4:19``).

Where ``operators.relational`` verifies each §2.A operator in isolation,
these compose them the way real dumped workloads do: fact-dimension join
trees, selective filters, aggregation + top-k, CTE reuse with window max.

Scale shape: each query joins one large fact (lineitem/orders) against
broadcastable dimensions; AQE picks broadcast-hash for every dim side, so
the fact table is scanned once, never shuffled on a dim key; the only
shuffles are the final aggregations on low-cardinality keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.operators.relational import dsum, hinted_join, sql_dsum
from dodo_spark.registry import register


@register(
    "analytics_shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey, o.o_orderdate,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem, "
    "revenue per unshipped order, top-10. customer/orders filters push to "
    "their scans; both dim sides broadcast under AQE.",
)
def analytics_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(revenue, "revenue", 6))
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "analytics_revenue_by_nation",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
    doc="TPC-H Q5 shape: 6-table join tree (local-supplier revenue by "
    "nation). region filter prunes nation prunes supplier via successive "
    "broadcast joins — the fact scan is the only large input. dim_hint "
    "exposes the A7 distributeType surface on every dimension join.",
)
def analytics_revenue_by_nation(
    spark: SparkSession, sf_dir: str, dim_hint: str | None = None
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = hinted_join(
        c.join(o, c.c_custkey == o.o_custkey).join(li, li.l_orderkey == o.o_orderkey),
        s,
        (s.s_suppkey == li.l_suppkey) & (s.s_nationkey == c.c_nationkey),
        distribute=dim_hint,
    )
    joined = hinted_join(joined, n, n.n_nationkey == s.s_nationkey, distribute=dim_hint)
    joined = hinted_join(joined, r, r.r_regionkey == n.n_regionkey, distribute=dim_hint)
    return (
        joined.groupBy("n_name")
        .agg(dsum(revenue, "revenue", 6))
        .orderBy(F.col("revenue").desc(), "n_name")
    )


@register(
    "analytics_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)", "total_revenue", 6)}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01'
        AND l_shipdate < TIMESTAMP '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
    doc="TPC-H Q15 shape: CTE computed once, reused by the join AND the "
    "scalar-subquery max (ref cte DorisParser.g4:1176-1186 + usercase "
    "q0.sql). Exact decimal revenue makes the max comparison safe.",
)
def analytics_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter((F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1998-04-01"))
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue", 6))
    )
    # Global max as a 1-row aggregate broadcast back onto revenue — never a
    # Window with empty partitionBy (that would funnel every per-supplier row
    # into a single task at scale).
    max_rev = revenue.agg(F.max("total_revenue").alias("max_rev"))
    top = revenue.crossJoin(F.broadcast(max_rev)).filter(
        F.col("total_revenue") == F.col("max_rev")
    )
    return (
        s.join(top, s.s_suppkey == top.supplier_no)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "analytics_order_funnel",
    oracle=f"""
    SELECT o.o_orderstatus,
           CAST(COUNT(DISTINCT o.o_orderkey) AS BIGINT) AS orders_cnt,
           CAST(COUNT(*) AS BIGINT) AS lineitems_cnt,
           {sql_dsum("l.l_extendedprice", "gross", 4)},
           {sql_dsum("l.l_extendedprice * l.l_discount", "discount_given", 6)},
           CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
             AS returned_items
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    ORDER BY o_orderstatus
    """,
    doc="Order-lifecycle rollup: fact-fact equi-join (orders ⋈ lineitem on "
    "orderkey) + mixed count-distinct / conditional aggregation. Plan "
    "shape: lineitem pre-aggregates on l_orderkey (its natural key) BEFORE "
    "the join, so the join carries |orders| rows instead of |lineitem| and "
    "the count-distinct becomes a plain count (o_orderkey is unique) — no "
    "expand, one shuffle on orderkey that bucketing removes entirely.",
)
def analytics_order_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    per_order = li.groupBy("l_orderkey").agg(
        F.count("*").alias("li_cnt"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("gross_p"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_discount")).cast("decimal(18,6)")
        ).alias("disc_p"),
        F.sum((F.col("l_returnflag") == "R").cast("bigint")).alias("ret_p"),
    )
    return (
        o.join(per_order, per_order.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("orders_cnt"),
            F.sum("li_cnt").alias("lineitems_cnt"),
            F.sum("gross_p").cast("double").alias("gross"),
            F.sum("disc_p").cast("double").alias("discount_given"),
            F.sum("ret_p").alias("returned_items"),
        )
        .orderBy("o_orderstatus")
    )
