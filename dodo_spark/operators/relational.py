"""Relational operators of the query surface (SURVEY.md §2.A).

The reference's grammar is Spark-derived (reference
``src/parser/DorisParser.g4:19`` — "Copied from Apache Spark"), so every
operator here is a Spark built-in; the work is expressing each verify key as
an idiomatic Catalyst plan plus a DuckDB oracle twin.

Determinism conventions (see ``dodo_spark.registry`` docstring): decimal
accumulation for float aggregates, explicit BIGINT casts for DuckDB integer
sums, unique ORDER BY tiebreakers under every window/limit.

Scale notes are attached per operator: each plan is shaped so that at 100 TB
the scan prunes columns, filters push to parquet, small dimensions broadcast
and only genuinely key-partitioned shuffles remain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dodo_spark.catalog import load_table
from dodo_spark.registry import register


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def dsum(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double").alias(alias)


def davg(col: Column | str, alias: str, scale: int = 4) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(f"decimal(18,{scale})")).cast("double") / F.count(c)).alias(alias)


def sql_dsum(expr: str, alias: str, scale: int = 4) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str, scale: int = 4) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,{scale}))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )


# ---------------------------------------------------------------------------
# A1 scan + projection + filter
# ---------------------------------------------------------------------------
@register(
    "scan_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity,
           l_extendedprice * (1 - l_discount) AS net_price
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_quantity < 10
      AND l_returnflag = 'N'
    """,
    doc="A1: parquet scan with pushed filter + pruned projection "
    "(ref DorisParser.g4:1143-1198). Filters land in PushedFilters; "
    "ReadSchema carries only 7 of 11 lineitem columns.",
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_quantity") < 10)
            & (F.col("l_returnflag") == "N")
        ).select(
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        )
    )


# ---------------------------------------------------------------------------
# A2/A3/A4/A5/A6 joins
# ---------------------------------------------------------------------------
@register(
    "join_inner",
    oracle=f"""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS order_cnt,
           {sql_dsum("o_totalprice", "total_sales")}
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
    doc="A2: inner equi-joins (ref DorisParser.g4:1224-1337). nation is "
    "broadcast; orders⋈customer shuffles on the key — the only shuffle "
    "that must exist at 100 TB.",
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("order_cnt"), dsum("o_totalprice", "total_sales"))
    )


@register(
    "join_left",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(CASE WHEN order_cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS inactive,
           CAST(SUM(order_cnt) AS BIGINT) AS orders_total
    FROM (
      SELECT c_custkey, c_mktsegment, COUNT(o_orderkey) AS order_cnt
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_mktsegment
    ) t
    GROUP BY c_mktsegment
    """,
    doc="A3: left outer join preserving customers without orders "
    "(ref DorisParser.g4:1310-1320).",
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("order_cnt"))
    )
    return per_cust.groupBy("c_mktsegment").agg(
        F.count("*").alias("customers"),
        F.sum(F.when(F.col("order_cnt") == 0, 1).otherwise(0)).alias("inactive"),
        F.sum("order_cnt").alias("orders_total"),
    )


@register(
    "join_full",
    oracle="""
    WITH c AS (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS customers
               FROM customer WHERE c_acctbal > 0 GROUP BY c_nationkey),
         s AS (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS suppliers
               FROM supplier WHERE s_acctbal > 0 GROUP BY s_nationkey)
    SELECT COALESCE(c.nk, s.nk) AS nationkey,
           COALESCE(customers, 0) AS customers,
           COALESCE(suppliers, 0) AS suppliers
    FROM c FULL OUTER JOIN s ON c.nk = s.nk
    """,
    doc="A3: full outer join of two aggregates (ref DorisParser.g4:1313).",
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    c = (
        customer.filter(F.col("c_acctbal") > 0)
        .groupBy(F.col("c_nationkey").alias("nk"))
        .agg(F.count("*").alias("customers"))
    )
    s = (
        supplier.filter(F.col("s_acctbal") > 0)
        .groupBy(F.col("s_nationkey").alias("nk"))
        .agg(F.count("*").alias("suppliers"))
    )
    return (
        c.join(s, "nk", "full")
        .select(
            F.coalesce(c.nk, s.nk).alias("nationkey"),
            F.coalesce("customers", F.lit(0)).alias("customers"),
            F.coalesce("suppliers", F.lit(0)).alias("suppliers"),
        )
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, o_orderstatus, CAST(cnt AS BIGINT) AS cnt
    FROM region
    CROSS JOIN (SELECT o_orderstatus, COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus) s
    """,
    doc="A4: cross join of two tiny relations (ref DorisParser.g4:1312); "
    "Spark plans a BroadcastNestedLoopJoin — correct for bounded sides only.",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    orders = load_table(spark, sf_dir, "orders")
    status = orders.groupBy("o_orderstatus").agg(F.count("*").alias("cnt"))
    return region.select("r_name").crossJoin(status)


@register(
    "join_semi",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS active_customers
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders)
    GROUP BY c_mktsegment
    """,
    doc="A5: left semi join = customers with >=1 order "
    "(ref DorisParser.g4:1316-1319). Semi join avoids the fanout a plain "
    "join+distinct would shuffle.",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("active_customers"))
    )


@register(
    "join_anti",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS inactive_customers
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
    doc="A5: left anti join = customers with no orders (ref DorisParser.g4:1316-1319).",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("inactive_customers"))
    )


@register(
    "join_theta",
    oracle=f"""
    SELECT s_nationkey,
           CAST(COUNT(*) AS BIGINT) AS richer_pairs,
           {sql_dsum("s_acctbal - c_acctbal", "gap_sum")}
    FROM supplier JOIN customer
      ON s_nationkey IS NOT DISTINCT FROM c_nationkey
     AND s_acctbal > c_acctbal
    GROUP BY s_nationkey
    """,
    doc="A6: equi + theta join with null-safe equality <=> "
    "(ref DorisParser.g4:1322-1324, NSEQ :1663; example "
    "src/parser/custom_test.go:70). The null-safe key keeps it a hash join; "
    "the range predicate is a post-join filter.",
)
def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    cond = supplier.s_nationkey.eqNullSafe(customer.c_nationkey) & (
        supplier.s_acctbal > customer.c_acctbal
    )
    return (
        supplier.join(customer, cond)
        .groupBy("s_nationkey")
        .agg(
            F.count("*").alias("richer_pairs"),
            dsum(F.col("s_acctbal") - F.col("c_acctbal"), "gap_sum"),
        )
    )


def hinted_join(
    left: DataFrame,
    right: DataFrame,
    on,
    how: str = "inner",
    distribute: str | None = None,
) -> DataFrame:
    """A7 join distribution hints — the caller-facing twin of the reference's
    ``[broadcast]`` / ``[shuffle]`` distributeType (DorisParser.g4:1229-1238):

    - ``"broadcast"`` pins a broadcast of the right side regardless of the
      autoBroadcastJoinThreshold,
    - ``"shuffle"`` forces a shuffled hash join (both sides repartition on
      the join key) even when the right side would auto-broadcast,
    - ``None`` leaves the choice to Catalyst/AQE (the default everywhere).
    """
    if distribute == "broadcast":
        right = F.broadcast(right)
    elif distribute == "shuffle":
        right = right.hint("shuffle_hash")
    elif distribute is not None:
        raise ValueError(
            f"unknown join distribution hint '{distribute}' (broadcast|shuffle)"
        )
    return left.join(right, on, how)


# ---------------------------------------------------------------------------
# A8-A11 aggregation
# ---------------------------------------------------------------------------
@register(
    "agg_group",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum("l_quantity", "sum_qty")},
           {sql_dsum("l_extendedprice", "sum_base_price")},
           {sql_dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price", 6)},
           {sql_dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge", 6)},
           {sql_davg("l_quantity", "avg_qty")},
           {sql_davg("l_extendedprice", "avg_price")},
           {sql_davg("l_discount", "avg_disc")},
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="A8: hash aggregation, TPC-H Q1 shape (ref aggClause "
    "DorisParser.g4:1240-1242). Partial aggregation map-side; the shuffle "
    "carries only |groups| rows per partition.",
)
def agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.operators.text import spread_scan

    # spread: the 8-way decimal partial aggregate is the heavy per-row
    # work and would otherwise run on the source's split count (ONE task
    # on the single-row-group local inputs — r13 profile; the shipdate
    # predicate still pushes through the exchange into the scan).
    # Interleaved noop A/B at sf0.1: 1.61 -> 0.95 s median. No-op at
    # warehouse scale (spread_scan short-circuits on partition count).
    li = spread_scan(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(disc_price, "sum_disc_price", 6),
            dsum(charge, "sum_charge", 6),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_distinct",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS parts,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supps,
           CAST(COUNT(*) AS BIGINT) AS rows_cnt
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="A9: multi-column distinct aggregation (ref setQuantifier "
    "DorisParser.g4:1155-1158); Spark expands to per-distinct shuffles.",
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("parts"),
        F.countDistinct("l_suppkey").alias("supps"),
        F.count("*").alias("rows_cnt"),
    )


@register(
    "agg_rollup",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("o_totalprice", "total")}
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
    doc="A10: ROLLUP with GROUPING disambiguation (ref groupingElement "
    "DorisParser.g4:1244-1253).",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.rollup("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        F.count("*").alias("cnt"),
        dsum("o_totalprice", "total"),
    )


@register(
    "agg_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS INTEGER) AS g_flag,
           CAST(GROUPING(l_linestatus) AS INTEGER) AS g_status,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("l_quantity", "qty")}
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="A10: CUBE (ref DorisParser.g4:1247).",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.operators.text import spread_scan

    # spread: CUBE's 4x Expand + partial aggregate is the heavy per-row
    # work; parallelize it past the source's split count (see agg_group)
    li = spread_scan(load_table(spark, sf_dir, "lineitem"))
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.count("*").alias("cnt"),
        dsum("l_quantity", "qty"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_prio,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("o_totalprice", "total")}
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    doc="A10: GROUPING SETS (ref DorisParser.g4:1249-1252).",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS INT) AS g_prio,
               COUNT(*) AS cnt,
               {sql_dsum("o_totalprice", "total")}
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@register(
    "agg_having",
    oracle="""
    SELECT order_cnt, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT o_custkey, COUNT(*) AS order_cnt
      FROM orders
      GROUP BY o_custkey
      HAVING COUNT(*) >= 5
    ) t
    GROUP BY order_cnt
    """,
    doc="A11: HAVING as post-aggregation filter (ref DorisParser.g4:1255-1257).",
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("order_cnt"))
        .filter(F.col("order_cnt") >= 5)
    )
    return per_cust.groupBy("order_cnt").agg(F.count("*").alias("n_customers"))


# ---------------------------------------------------------------------------
# A12-A14, A17 windows
# ---------------------------------------------------------------------------
@register(
    "window_rank",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
           CAST(RANK() OVER w AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    doc="A12: ranking window family (ref OVER windowSpec "
    "DorisParser.g4:1585,1612-1621); single shuffle on the partition key.",
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return customer.select(
        "c_nationkey",
        "c_custkey",
        "c_acctbal",
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
        F.ntile(4).over(w).cast("bigint").alias("quartile"),
    )


@register(
    "window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_orderdate) OVER w AS next_date,
           FIRST_VALUE(o_orderkey) OVER w AS first_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    doc="A13: lag/lead/first_value (ref usage example/usercase/sql/q0.sql).",
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_orderdate").over(w).alias("next_date"),
        F.first("o_orderkey").over(w).alias("first_order"),
    )


@register(
    "window_frame",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_total,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS moving_3
    FROM orders
    QUALIFY o_orderkey % 100 = 0
    """,
    doc="A14: ROWS BETWEEN frames (ref windowFrame DorisParser.g4:1623-1637). "
    "Decimal accumulation — DuckDB computes sliding frames with a segment "
    "tree whose float addition order differs from Spark's running sum. "
    "Frames are computed over every row; the % 100 post-filter only bounds "
    "the emitted result (driver-transfer, not compute).",
)
def window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    order_w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    price_dec = F.col("o_totalprice").cast("decimal(18,4)")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_dec)
        .over(order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.sum(price_dec)
        .over(order_w.rowsBetween(-2, Window.currentRow))
        .cast("double")
        .alias("moving_3"),
    ).filter(F.col("o_orderkey") % 100 == 0)


@register(
    "window_qualify",
    oracle="""
    SELECT c_nationkey, c_custkey, c_name, c_acctbal
    FROM (
      SELECT c_nationkey, c_custkey, c_name, c_acctbal,
             ROW_NUMBER() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) t WHERE rn = 1
    """,
    doc="A11: QUALIFY = filter over a window column (ref DorisParser.g4:1259-1261): "
    "richest customer per nation.",
)
def window_qualify(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        customer.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice, CAST(rn AS BIGINT) AS rn
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders
    ) t WHERE rn <= 3
    """,
    doc="A17: top-K per group via ranking window + filter. Catalyst pushes "
    "the rn<=3 limit into the window (WindowGroupLimit) so each partition "
    "keeps a bounded heap — the scalable form of per-group top-k.",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# A15/A16 sort + limit + offset
# ---------------------------------------------------------------------------
@register(
    "sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
    LIMIT 20 OFFSET 10
    """,
    doc="A15/A16: global sort + limit/offset (ref sortClause/limitClause "
    "DorisParser.g4:1292-1304). Spark plans TakeOrderedAndProject — no full "
    "sort materialization at scale.",
)
def sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey"))
        .offset(10)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# A18/A19 set operations
# ---------------------------------------------------------------------------
@register(
    "set_union_all",
    oracle="""
    SELECT side, key, CAST(COUNT(*) AS BIGINT) AS cnt FROM (
      SELECT 'customer' AS side, c_nationkey AS key FROM customer
      UNION ALL
      SELECT 'supplier' AS side, s_nationkey AS key FROM supplier
    ) t GROUP BY side, key
    """,
    doc="A18: UNION ALL (ref setOperation DorisParser.g4:1147-1153).",
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    u = customer.select(
        F.lit("customer").alias("side"), F.col("c_nationkey").alias("key")
    ).unionAll(supplier.select(F.lit("supplier").alias("side"), F.col("s_nationkey").alias("key")))
    return u.groupBy("side", "key").agg(F.count("*").alias("cnt"))


@register(
    "set_union_distinct",
    oracle="""
    SELECT c_nationkey AS key FROM customer
    UNION
    SELECT s_nationkey AS key FROM supplier
    """,
    doc="A18: UNION DISTINCT = union + dedup.",
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return (
        customer.select(F.col("c_nationkey").alias("key"))
        .union(supplier.select(F.col("s_nationkey").alias("key")))
        .distinct()
    )


@register(
    "set_intersect",
    oracle="""
    SELECT c_nationkey AS key FROM customer
    INTERSECT
    SELECT s_nationkey AS key FROM supplier
    """,
    doc="A19: INTERSECT (distinct semantics).",
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("key")).intersect(
        supplier.select(F.col("s_nationkey").alias("key"))
    )


@register(
    "set_except",
    oracle="""
    SELECT c_nationkey AS key FROM customer
    EXCEPT
    SELECT s_nationkey AS key FROM supplier
    """,
    doc="A19: EXCEPT/MINUS (distinct semantics).",
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    return customer.select(F.col("c_nationkey").alias("key")).subtract(
        supplier.select(F.col("s_nationkey").alias("key"))
    )


# ---------------------------------------------------------------------------
# A20/A21 CTEs + subqueries
# ---------------------------------------------------------------------------
@register(
    "cte_reuse",
    oracle=f"""
    WITH cust_rev AS (
      SELECT o_custkey, {sql_dsum("o_totalprice", "revenue")}
      FROM orders GROUP BY o_custkey
    )
    SELECT a.o_custkey, a.revenue
    FROM cust_rev a
    WHERE a.revenue > (SELECT {sql_davg("revenue", "x")} FROM cust_rev)
    """,
    doc="A20: CTE referenced twice (ref cte DorisParser.g4:1176-1186; "
    "usage example/usercase/sql/q0.sql).",
)
def cte_reuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        WITH cust_rev AS (
          SELECT o_custkey, {sql_dsum("o_totalprice", "revenue")}
          FROM orders GROUP BY o_custkey
        )
        SELECT a.o_custkey, a.revenue
        FROM cust_rev a
        WHERE a.revenue > (SELECT {sql_davg("revenue", "x")} FROM cust_rev)
        """
    )


@register(
    "subquery_in",
    oracle=f"""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS cnt,
           {sql_dsum("o_totalprice", "total")}
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
    GROUP BY o_orderpriority
    """,
    doc="A21: IN subquery -> semi-join rewrite (ref predicate IN "
    "DorisParser.g4:1510-1518).",
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        f"""
        SELECT o_orderpriority, COUNT(*) AS cnt, {sql_dsum("o_totalprice", "total")}
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY o_orderpriority
        """
    )


@register(
    "subquery_exists",
    oracle="""
    SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_totalprice > 100000
    )
    GROUP BY c_mktsegment
    """,
    doc="A21: correlated EXISTS (ref DorisParser.g4:1487-1490).",
)
def subquery_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(
        """
        SELECT c_mktsegment, COUNT(*) AS cnt
        FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_totalprice > 100000
        )
        GROUP BY c_mktsegment
        """
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS big_orders
    FROM orders
    WHERE o_totalprice > (
      SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
      FROM orders
    )
    GROUP BY o_orderstatus
    """,
    doc="A21: uncorrelated scalar subquery (ref subqueryExpression "
    "DorisParser.g4:1557); threshold computed with the deterministic avg.",
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, COUNT(*) AS big_orders
        FROM orders
        WHERE o_totalprice > (
          SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          FROM orders
        )
        GROUP BY o_orderstatus
        """
    )


# ---------------------------------------------------------------------------
# A23 explode / lateral view
# ---------------------------------------------------------------------------
@register(
    "explode_array",
    oracle="""
    SELECT vec_id, CAST(t.i AS INTEGER) AS pos,
           CAST(embedding[t.i + 1] AS DOUBLE) AS val
    FROM embeddings, generate_series(0, 7) AS t(i)
    WHERE vec_id < 50
    """,
    doc="A23: LATERAL VIEW posexplode (ref lateralView DorisParser.g4:1283-1286): "
    "first 8 embedding dims, one row per (vector, position).",
)
def explode_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return (
        emb.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode(F.slice("embedding", 1, 8)).alias("pos", "val"))
        .select("vec_id", F.col("pos").cast("int").alias("pos"), F.col("val").cast("double").alias("val"))
    )


# ---------------------------------------------------------------------------
# A24 sample (rows-only: nondeterministic across engines by nature)
# ---------------------------------------------------------------------------
@register(
    "sample_rows",
    oracle="""
    SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS sampled_rows
    FROM lineitem
    WHERE (strpos('0123456789abcdef',
                  substring(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                CAST(l_linenumber AS VARCHAR) || ':42'), 1, 1)) - 1)
          * 16
          + (strpos('0123456789abcdef',
                    substring(md5(CAST(l_orderkey AS VARCHAR) || ':' ||
                                  CAST(l_linenumber AS VARCHAR) || ':42'), 2, 1)) - 1)
          < 26
    GROUP BY l_returnflag
    """,
    doc="A24: TABLESAMPLE with repeatable seed (ref sample "
    "DorisParser.g4:1745-1752) as a deterministic hash sample: keep rows "
    "where the seeded row-hash falls under ~10%% of the key space "
    "(26/256). Unlike RNG-backed Bernoulli sampling this is reproducible "
    "under retries, partitioning AND across engines — the form that "
    "belongs in a distributed pipeline — so it is fully oracle-checked.",
)
def sample_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    digest = F.md5(
        F.concat_ws(":", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"), F.lit("42"))
    )
    bucket = F.conv(F.substring(digest, 1, 2), 16, 10).cast("int")
    return (
        li.filter(bucket < 26)  # 26/256 ~ 10%, seeded by the literal 42
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("sampled_rows"))
    )


# ---------------------------------------------------------------------------
# A26/A27 predicates
# ---------------------------------------------------------------------------
@register(
    "pred_like_between",
    oracle="""
    SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS cnt
    FROM part
    WHERE p_name LIKE '%an%'
      AND p_size BETWEEN 10 AND 40
      AND p_type NOT LIKE 'MEDIUM%'
      AND p_brand IN ('Brand#11','Brand#22','Brand#33','Brand#44','Brand#55')
      AND p_retailprice IS NOT NULL
    GROUP BY p_brand
    """,
    doc="A26: BETWEEN / LIKE / NOT LIKE / IN-list / IS NOT NULL "
    "(ref predicate DorisParser.g4:1510-1518). All reach PushedFilters.",
)
def pred_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_name").like("%an%")
            & F.col("p_size").between(10, 40)
            & ~F.col("p_type").like("MEDIUM%")
            & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33", "Brand#44", "Brand#55")
            & F.col("p_retailprice").isNotNull()
        )
        .groupBy("p_brand")
        .agg(F.count("*").alias("cnt"))
    )


@register(
    "text_match",
    oracle="""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS matching_docs
    FROM documents
    WHERE strpos(' ' || lower(text) || ' ', ' data ') > 0
    GROUP BY lang
    """,
    doc="A27: MATCH_ANY approximation (ref DorisParser.g4:1513) — "
    "space-delimited token containment as a padded substring scan "
    "(equivalent to membership in the split-by-space token array, without "
    "allocating the array per row); no shuffle before the aggregate.",
)
def text_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower("text"), F.lit(" "))
    return (
        docs.filter(padded.contains(" data "))
        .groupBy("lang")
        .agg(F.count("*").alias("matching_docs"))
    )


# MATCH_ANY / MATCH_ALL term set for the posting-list key (A27)
MATCH_TERMS = ("data", "model", "query")


@register(
    "text_match_tokens",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang,
             unnest(list_distinct(string_split_regex(lower(text), '\\s+'))) AS token
      FROM documents
    ), hits AS (
      SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS nhit
      FROM toks
      WHERE token IN {MATCH_TERMS!r}
      GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS any_docs,
           CAST(SUM(CASE WHEN nhit = {len(MATCH_TERMS)} THEN 1 ELSE 0 END) AS BIGINT)
             AS all_docs
    FROM hits GROUP BY lang
    """,
    doc="A27 honest form: MATCH_ANY / MATCH_ALL as a tokenized posting list "
    "(ref DorisParser.g4:1513 — Doris MATCH_* runs on an inverted index, "
    "not a substring scan). Per-doc distinct tokens explode to (token, doc) "
    "postings; the term predicate filters the postings SCAN-SIDE (before "
    "any exchange — only matching postings ever shuffle, the inverted-"
    "index access pattern), then per-doc hit counts roll up to per-lang "
    "MATCH_ANY (>=1 term) and MATCH_ALL (every term) doc counts. At "
    "100 TB the posting list materializes bucketed by token and the term "
    "filter becomes bucket pruning; the in-plan shape is identical. "
    "text_match keeps the single-term substring approximation.",
)
def text_match_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.array_distinct(F.split(F.lower("text"), r"\s+"))).alias("token"),
    )
    hits = (
        toks.filter(F.col("token").isin(*MATCH_TERMS))
        .groupBy("doc_id", "lang")
        .agg(F.count("*").alias("nhit"))  # tokens are per-doc distinct already
    )
    return hits.groupBy("lang").agg(
        F.count("*").alias("any_docs"),
        F.sum(F.when(F.col("nhit") == len(MATCH_TERMS), 1).otherwise(0))
        .cast("bigint")
        .alias("all_docs"),
    )


# MATCH_PHRASE bigram: chosen for non-trivial corpus frequency (≈10% of
# docs at every SF — the generator's token distribution is SF-invariant)
PHRASE_TERMS = ("table", "hash")


@register(
    "text_match_phrase",
    oracle=f"""
    WITH l AS (
      SELECT doc_id, lang, string_split_regex(lower(text), '\\s+') AS toks
      FROM documents
    ), t AS (
      SELECT doc_id, lang, unnest(toks) AS token,
             generate_subscripts(toks, 1) AS pos
      FROM l
    ), hit AS (
      SELECT a.doc_id, a.lang, CAST(COUNT(*) AS BIGINT) AS occ
      FROM t a JOIN t b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
      WHERE a.token = '{PHRASE_TERMS[0]}' AND b.token = '{PHRASE_TERMS[1]}'
      GROUP BY a.doc_id, a.lang
    )
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS phrase_docs,
           CAST(SUM(occ) AS BIGINT) AS phrase_hits
    FROM hit GROUP BY lang
    """,
    doc="A27 completion: MATCH_PHRASE (ref DorisParser.g4:1513 "
    "MATCH_PHRASE) — the adjacent-position inverted-index semantic. "
    "Tokens posexplode to POSITIONAL postings (token, doc, pos); the "
    "phrase-term predicate filters the postings SCAN-SIDE (only the two "
    "terms' postings ever shuffle, exactly an inverted-index posting "
    "fetch), then ONE groupBy(doc) intersects the first term's "
    "shifted position set with the second's (array_intersect on "
    "collect_set — positions are unique, so the intersection size IS "
    "the exact adjacent-occurrence count; no positional self-join, no "
    "second exchange). The oracle checks position-adjacency exactly "
    "via a DuckDB positional self-join (0- vs 1-based positions cancel "
    "in the +1 shift). At 100 TB the postings materialize bucketed by "
    "token and the term filter becomes bucket pruning; per-doc position "
    "sets are bounded by document length, never corpus size.",
)
def text_match_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w1, w2 = PHRASE_TERMS
    toks = docs.select(
        "doc_id",
        "lang",
        F.posexplode(F.split(F.lower("text"), r"\s+")).alias("pos", "token"),
    )
    occ = F.size(
        F.array_intersect(
            F.transform(
                F.collect_set(F.when(F.col("token") == w1, F.col("pos"))),
                lambda x: x + 1,
            ),
            F.collect_set(F.when(F.col("token") == w2, F.col("pos"))),
        )
    ).alias("occ")
    per_doc = (
        toks.filter(F.col("token").isin(w1, w2))
        .groupBy("doc_id", "lang")
        .agg(occ)
        .filter(F.col("occ") > 0)
    )
    return per_doc.groupBy("lang").agg(
        F.count("*").alias("phrase_docs"),
        F.sum("occ").cast("bigint").alias("phrase_hits"),
    )


RANK_TOP_K = 20
_RANK_TERMS_SQL = ", ".join(f"'{t}'" for t in MATCH_TERMS)
# exact BIGINT product of the per-term dfs (absent term -> 1): PRODUCT()
# returns DOUBLE in DuckDB and would round past 2^53, violating the
# integer-exactness discipline the idf weights depend on
_DPROD_SQL = " * ".join(
    f"COALESCE((SELECT df FROM dfs WHERE token = '{t}'), 1)"
    for t in MATCH_TERMS
)


@register(
    "text_rank_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS token
      FROM documents
    ), hits AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ({_RANK_TERMS_SQL})
      GROUP BY doc_id, token
    ), dfs AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY token
    ), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    dprod AS (SELECT {_DPROD_SQL} AS d),
    scored AS (
      SELECT h.doc_id,
             CAST(COUNT(*) AS BIGINT) AS matched_terms,
             CAST(SUM(h.tf * (SELECT n FROM nd)
                      * ((SELECT d FROM dprod) // d.df)) AS BIGINT) AS score_num
      FROM hits h JOIN dfs d ON d.token = h.token
      GROUP BY h.doc_id
    )
    SELECT doc_id, matched_terms, score_num
    FROM scored ORDER BY score_num DESC, doc_id LIMIT {RANK_TOP_K}
    """,
    doc="Ranked retrieval over the posting list (the search engine on top "
    "of text_match_tokens): per-doc term frequency weighted by inverse "
    "document frequency, top-k by score. The tf-idf score is computed in "
    "EXACT integer arithmetic — contribution = tf * N * (D/df) where D = "
    "product of all query-term dfs, so D/df is an exact integer and no "
    "log/float ever enters the plan (engine-identical by construction; "
    "bound: tf*N*D < 2^63 holds through sf100 for a 3-term query). The "
    "term dfs and N are bounded driver-side literals (ref-pool idiom, "
    "|terms|+1 values). Top-k is orderBy+limit — TakeOrderedAndProject, "
    "per-partition heaps, NO global window. At 100 TB the posting list "
    "materializes bucketed by token and df comes from the index stats.",
)
def text_rank_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")
        ).alias("token"),
    ).filter(F.col("token").isin(*MATCH_TERMS))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))

    # bounded driver-side literals: one df per query term + the doc count
    dfs = {r["token"]: int(r["cnt"]) for r in
           tf.groupBy("token").agg(F.count("*").alias("cnt")).collect()}
    n_docs = docs.count()
    d_prod = 1
    for v in dfs.values():
        d_prod *= v
    weight = F.create_map(
        *[x for t in dfs for x in (F.lit(t), F.lit(n_docs * (d_prod // dfs[t])))]
    )
    scored = tf.groupBy("doc_id").agg(
        F.count("*").alias("matched_terms"),
        F.sum(F.col("tf") * F.element_at(weight, F.col("token"))).alias("score_num"),
    )
    return (
        scored.select("doc_id", "matched_terms", F.col("score_num").cast("bigint").alias("score_num"))
        .orderBy(F.col("score_num").desc(), "doc_id")
        .limit(RANK_TOP_K)
    )


# ---------------------------------------------------------------------------
# A36/A37 collect + NDV aggregates
# ---------------------------------------------------------------------------
@register(
    "agg_collect",
    oracle="""
    SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
    doc="A36: GROUP_CONCAT(... ORDER BY) (ref functionCallExpression "
    "DorisParser.g4:1579-1586) = collect_list + array_sort + concat_ws.",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations")
    )


@register(
    "agg_collect_distinct",
    oracle="""
    SELECT o_orderstatus,
           string_agg(DISTINCT o_orderpriority, '|' ORDER BY o_orderpriority)
             AS priorities,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="A36 variant: GROUP_CONCAT(DISTINCT ... ORDER BY) (Doris supports "
    "the DISTINCT qualifier inside GROUP_CONCAT) = collect_set + "
    "array_sort + concat_ws — the set dedupes pre-shuffle in the partial "
    "aggregate, so the exchange carries distinct values, not rows.",
)
def agg_collect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.concat_ws("|", F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
    )


@register(
    "agg_ndv_exact",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs,
           CAST(COUNT(DISTINCT CAST(o_orderdate AS DATE)) AS BIGINT) AS days
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="A37: exact NDV — the bitmap_union_count equivalent "
    "(ref types SURVEY §1.2; load mapping src/gendata.go:164-183).",
)
def agg_ndv_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("custs"),
        F.countDistinct(F.col("o_orderdate").cast("date")).alias("days"),
    )


@register(
    "agg_ndv_approx",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS within_bound
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="A37: approximate NDV — hll_union_agg equivalent via HyperLogLog++ "
    "(approx_count_distinct). Raw sketch values differ across engines, so "
    "the checkable output is (exact NDV, within_bound): within_bound "
    "asserts |approx-exact|/exact <= 5x the configured rsd (0.02), a bound "
    "HLL++ holds with overwhelming probability — the oracle expects TRUE, "
    "so a drifting sketch now FAILS the hash instead of passing rows-only.",
)
def agg_ndv_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rsd = 0.02
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col("exact_parts")
    return agg.select(
        "l_returnflag",
        "exact_parts",
        (err <= F.lit(5 * rsd)).alias("within_bound"),
    )


# ---------------------------------------------------------------------------
# A39 INSERT ... SELECT (rows-only: executed against a session-scoped table)
# ---------------------------------------------------------------------------
@register(
    "insert_select",
    oracle="""
    WITH target AS (
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 200000
      UNION ALL
      SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      WHERE o_totalprice > 150000 AND o_totalprice <= 200000
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS rows_after_insert,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
    FROM target
    """,
    doc="A39: INSERT INTO ... SELECT (ref supportedDmlStatement "
    "DorisParser.g4:127-160). Materializes a filtered projection into a "
    "session-scoped table and returns its aggregate; oracle models the "
    "insert as base UNION ALL source.",
)
def insert_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_totalprice") > 200000).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    inserted = orders.filter(
        (F.col("o_totalprice") > 150000) & (F.col("o_totalprice") <= 200000)
    ).select("o_orderkey", "o_custkey", "o_totalprice")
    # INSERT INTO target SELECT ... == target := target UNION ALL source
    target = base.unionAll(inserted)
    target.createOrReplaceTempView("insert_select_target")
    return spark.sql(
        """
        SELECT COUNT(*) AS rows_after_insert,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM insert_select_target
        """
    )


@register(
    "values_inline",
    oracle="""
    SELECT v.tier, CAST(COUNT(*) AS BIGINT) AS cnt,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price
    FROM orders o
    JOIN (VALUES ('F', 'closed'), ('O', 'open'), ('P', 'pending'))
         AS v(status, tier)
      ON o.o_orderstatus = v.status
    GROUP BY v.tier
    """,
    doc="A22: inline VALUES table (ref inlineTable via queryPrimary "
    "DorisParser.g4:1159-1163) joined against a fact — the literal side is "
    "a broadcast LocalRelation, zero scan cost.",
)
def values_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    v = spark.createDataFrame(
        [("F", "closed"), ("O", "open"), ("P", "pending")], "status string, tier string"
    )
    return (
        orders.join(F.broadcast(v), orders.o_orderstatus == v.status)
        .groupBy("tier")
        .agg(
            F.count("*").alias("cnt"),
            F.min("o_totalprice").cast("double").alias("min_price"),
        )
    )


@register(
    "star_except",
    oracle="""
    SELECT * EXCLUDE (n_comment_like, r_regionkey)
    FROM (
      SELECT n.*, 'x' AS n_comment_like, r.*
      FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    ORDER BY n_nationkey
    """,
    doc="A38: star with EXCEPT columns (ref exceptOrReplace "
    "DorisParser.g4:1570-1572) = df.drop — pure projection pruning, the "
    "dropped columns never leave the scan.",
)
def star_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = n.join(r, n.n_regionkey == r.r_regionkey).withColumn(
        "n_comment_like", F.lit("x")
    )
    return joined.drop("n_comment_like", "r_regionkey").orderBy("n_nationkey")


@register(
    "agg_percentile",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_orderkey, 0.5) AS p50,
           quantile_cont(o_orderkey, 0.9) AS p90,
           CAST(COUNT(*) AS BIGINT) AS cnt
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Doris percentile/percentile_approx family (Doris agg builtins used "
    "in replayed workloads) — Spark exact percentile(); both engines use "
    "the same linear-interpolation definition, so values hash-match. The "
    "approx form at 100 TB is percentile_approx (t-digest sketch, "
    "mergeable, constant memory).",
)
def agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.percentile("o_orderkey", 0.5).alias("p50"),
        F.percentile("o_orderkey", 0.9).alias("p90"),
        F.count("*").alias("cnt"),
    )


@register(
    "explode_outer_array",
    oracle="""
    SELECT doc_id,
           unnest(CASE WHEN long_toks IS NULL OR len(long_toks) = 0
                       THEN [NULL] ELSE long_toks END) AS tok
    FROM (
      SELECT doc_id,
             list_filter(string_split(text, ' '), x -> length(x) >= 7) AS long_toks
      FROM documents WHERE doc_id < 300
    ) t
    """,
    doc="A23: LATERAL VIEW OUTER explode (ref lateralView "
    "DorisParser.g4:1283-1286) — rows with empty/null arrays survive with "
    "a NULL element (explode_outer); the plain explode would drop them. "
    "Oracle pads empty lists with [NULL], the exact outer semantics.",
)
def explode_outer_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    long_toks = F.filter(F.split("text", " ", -1), lambda x: F.length(x) >= 7)
    return docs.select("doc_id", F.explode_outer(long_toks).alias("tok"))


@register(
    "scalar_bitmap_ops",
    oracle="""
    WITH b AS (
      SELECT l_partkey, list_sort(list_distinct(list(l_suppkey))) AS suppliers
      FROM lineitem WHERE l_partkey < 120 GROUP BY l_partkey
    )
    SELECT a.l_partkey AS part_a, c.l_partkey AS part_b,
           CAST(len(list_filter(a.suppliers, x -> list_contains(c.suppliers, x)))
                AS BIGINT) AS and_count,
           CAST(len(list_distinct(list_concat(a.suppliers, c.suppliers)))
                AS BIGINT) AS or_count,
           CAST(len(list_distinct(list_concat(a.suppliers, c.suppliers)))
                - len(list_filter(a.suppliers, x -> list_contains(c.suppliers, x)))
                AS BIGINT) AS xor_count
    FROM b a JOIN b c ON c.l_partkey = a.l_partkey + 1
    """,
    doc="Doris bitmap set algebra (bitmap_and/or/xor_count) over the "
    "BITMAP -> array<long> mapping (SURVEY §1.2): supplier sets per part "
    "(bitmap_union = collect_set), pairwise and/or/xor cardinalities via "
    "array_intersect/array_union — exact, codegen'd, no UDF.",
)
def scalar_bitmap_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_partkey") < 120)
    b = li.groupBy("l_partkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("suppliers")
    )
    a, c = b.alias("a"), b.alias("c")
    inter = F.size(F.array_intersect(F.col("a.suppliers"), F.col("c.suppliers")))
    union = F.size(F.array_union(F.col("a.suppliers"), F.col("c.suppliers")))
    return (
        a.join(c, F.col("c.l_partkey") == F.col("a.l_partkey") + 1)
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("c.l_partkey").alias("part_b"),
            inter.cast("bigint").alias("and_count"),
            union.cast("bigint").alias("or_count"),
            (union - inter).cast("bigint").alias("xor_count"),
        )
    )


@register(
    "set_intersect_all",
    oracle="""
    SELECT l_suppkey AS key FROM lineitem WHERE l_partkey < 50
    INTERSECT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
    """,
    doc="A19: INTERSECT ALL — bag semantics (each duplicate matched "
    "pairwise, ref setOperation DorisParser.g4:1147-1153); Spark "
    "intersectAll = count-bounded anti-duplication via a shared shuffle.",
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_partkey") < 50).select(F.col("l_suppkey").alias("key"))
    b = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("key"))
    return a.intersectAll(b)


@register(
    "set_except_all",
    oracle="""
    SELECT l_suppkey AS key FROM lineitem WHERE l_partkey < 50
    EXCEPT ALL
    SELECT l_suppkey FROM lineitem WHERE l_quantity > 45
    """,
    doc="A19: EXCEPT ALL (MINUS ALL) — bag difference preserving "
    "multiplicities (ref DorisParser.g4:1147-1153).",
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_partkey") < 50).select(F.col("l_suppkey").alias("key"))
    b = li.filter(F.col("l_quantity") > 45).select(F.col("l_suppkey").alias("key"))
    return a.exceptAll(b)


@register(
    "sample_stratified",
    oracle="""
    WITH rates AS (
      SELECT * FROM (VALUES ('view', 26), ('click', 64), ('purchase', 256),
                            ('signup', 256), ('error', 0)) r(event_type, keep_lt)
    )
    SELECT e.event_type, CAST(COUNT(*) AS BIGINT) AS sampled_rows,
           CAST(MIN(e.event_id) AS BIGINT) AS min_id
    FROM events e JOIN rates ON rates.event_type = e.event_type
    WHERE (strpos('0123456789abcdef',
                  substring(md5(CAST(e.event_id AS VARCHAR) || ':7'), 1, 1)) - 1) * 16
          + (strpos('0123456789abcdef',
                    substring(md5(CAST(e.event_id AS VARCHAR) || ':7'), 2, 1)) - 1)
          < rates.keep_lt
    GROUP BY e.event_type
    """,
    doc="Stratified sampling (sampleBy equivalent, the training-pipeline "
    "class-rebalancing primitive): per-stratum keep rates (~10% views, "
    "25% clicks, 100% purchases/signups, 0% errors) decided by a seeded "
    "deterministic row hash — reproducible under retries, partitioning and "
    "across engines, unlike RNG sampleBy. The rate table broadcasts; the "
    "filter is scan-side.",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rates = {"view": 26, "click": 64, "purchase": 256, "signup": 256, "error": 0}
    digest = F.md5(F.concat_ws(":", F.col("event_id").cast("string"), F.lit("7")))
    bucket = F.conv(F.substring(digest, 1, 2), 16, 10).cast("int")
    keep_lt = F.element_at(
        F.create_map(*[F.lit(x) for kv in rates.items() for x in kv]),
        F.col("event_type"),
    )
    return (
        ev.filter(bucket < keep_lt)
        .groupBy("event_type")
        .agg(F.count("*").alias("sampled_rows"), F.min("event_id").alias("min_id"))
    )


@register(
    "window_distribution",
    oracle="""
    SELECT c_custkey, c_nationkey,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    doc="A12 distribution family: ntile / percent_rank / cume_dist over a "
    "key-partitioned window with a unique (acctbal, custkey) ordering — "
    "rank-based doubles are deterministic when the sort is total.",
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT c_mktsegment,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o_cnt,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt
    FROM customer JOIN orders ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    doc="PIVOT: order-status columns per market segment via "
    "groupBy().pivot() with an explicit value list (explicit values keep "
    "the plan single-pass — an unlisted pivot needs a distinct-scan job "
    "first). Oracle is the conditional-aggregation desugaring, which is "
    "also exactly what Catalyst lowers pivot to.",
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    piv = (
        c.join(o, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
    )
    return piv.select(
        "c_mktsegment",
        F.coalesce("F", F.lit(0)).alias("f_cnt"),
        F.coalesce("O", F.lit(0)).alias("o_cnt"),
        F.coalesce("P", F.lit(0)).alias("p_cnt"),
    )


@register(
    "agg_unpivot",
    oracle="""
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
    FROM part WHERE p_partkey < 300
    UNION ALL
    SELECT p_partkey, 'p_retailprice', CAST(p_retailprice AS DOUBLE)
    FROM part WHERE p_partkey < 300
    """,
    doc="UNPIVOT/melt — the inverse of pivot: wide numeric columns to "
    "(key, metric, value) long form via DataFrame.unpivot (codegen'd "
    "Expand, one pass over the scan, no shuffle). Oracle is the "
    "dialect-free UNION ALL desugaring.",
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot("p_partkey", ["p_size", "p_retailprice"], "metric", "value")


@register(
    "explode_struct_inline",
    oracle="""
    SELECT o_orderkey, u.pos AS item_pos, u.tag AS tag, u.amt AS amt
    FROM (
      SELECT o_orderkey,
             [{'pos': 0, 'tag': o_orderstatus, 'amt': CAST(o_totalprice AS DOUBLE)},
              {'pos': 1, 'tag': o_orderpriority, 'amt': CAST(o_totalprice AS DOUBLE) / 2}]
               AS items
      FROM orders WHERE o_orderkey < 400
    ), LATERAL unnest(items) AS t(u)
    """,
    doc="A23 struct variant: inline() explodes an array<struct> into "
    "columns directly (one generator, no per-field extraction pass) — the "
    "LATERAL VIEW form for nested fact lines.",
)
def explode_struct_inline(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 400)
    items = F.array(
        F.struct(
            F.lit(0).alias("pos"),
            F.col("o_orderstatus").alias("tag"),
            F.col("o_totalprice").cast("double").alias("amt"),
        ),
        F.struct(
            F.lit(1).alias("pos"),
            F.col("o_orderpriority").alias("tag"),
            (F.col("o_totalprice").cast("double") / 2).alias("amt"),
        ),
    )
    return (
        o.select("o_orderkey", F.inline(items))
        .select("o_orderkey", F.col("pos").alias("item_pos"), "tag", "amt")
    )


@register(
    "agg_conditional",
    oracle="""
    SELECT c_nationkey,
           CAST(SUM(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS rich_cnt,
           bool_or(c_acctbal < 0) AS any_debt,
           bool_and(c_acctbal > -1000) AS all_above_floor,
           arg_max(c_name, c_custkey) AS latest_name
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="Conditional-aggregate family: count_if / bool_or (ANY) / bool_and "
    "(ALL) / max_by with a UNIQUE ordering key (custkey) so the picked "
    "value is deterministic — all map-side-combinable.",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_nationkey").agg(
        F.count_if(F.col("c_acctbal") > 5000).alias("rich_cnt"),
        F.bool_or(F.col("c_acctbal") < 0).alias("any_debt"),
        F.bool_and(F.col("c_acctbal") > -1000).alias("all_above_floor"),
        F.max_by("c_name", "c_custkey").alias("latest_name"),
    )


@register(
    "window_distinct",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(COUNT(DISTINCT o_orderstatus)
                OVER (PARTITION BY o_custkey) AS INTEGER) AS distinct_statuses
    FROM orders WHERE o_custkey < 300
    """,
    doc="Distinct aggregate over a window: Spark has no DISTINCT window "
    "aggregates, so the idiom is size(collect_set() OVER w) — same "
    "per-partition state a native distinct window keeps. Whole-partition "
    "frame, key-partitioned.",
)
def window_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 300)
    w = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.size(F.collect_set("o_orderstatus").over(w)).alias("distinct_statuses"),
    )


PPS_W_TARGET_CENTS = 2_000_000_000  # inclusion prob = price_cents / this
_PPS_U20 = 1 << 20  # 20-bit uniform from the row digest


@register(
    "sample_weighted",
    oracle=f"""
    WITH w AS (
      SELECT o_orderpriority,
             CAST(round(o_totalprice * 100) AS BIGINT) AS w_cents,
             CAST(concat('0x', substring(
               md5(CAST(o_orderkey AS VARCHAR) || ':pps:42'), 1, 5))
               AS BIGINT) AS u20
      FROM orders
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS sampled_rows,
           CAST(SUM(CAST(w_cents AS DECIMAL(38,0))) AS DOUBLE) / 100
             AS sampled_value,
           (CAST(COUNT(*) AS DOUBLE) * {PPS_W_TARGET_CENTS}) / 100
             AS ht_estimate
    FROM w
    WHERE u20 * CAST({PPS_W_TARGET_CENTS} AS BIGINT)
          < w_cents * CAST({_PPS_U20} AS BIGINT)
    GROUP BY o_orderpriority
    """,
    doc="Weighted (probability-proportional-to-size) sampling, the "
    "distributed-honest Poisson form: each row is kept iff a seeded "
    "20-bit row digest falls under weight/W_TARGET — a pure scan-side "
    "integer comparison (u20 * W < w * 2^20, overflow-safe), NO ordering, "
    "NO cumulative window, NO shuffle before the final rollup, and "
    "reproducible under retries/partitioning/engines exactly like "
    "sample_rows (A24). Sample size is random with mean sum(w)/W — the "
    "price of scan-side parallelism (fixed-size PPS needs a global "
    "cumulative order, which does not distribute); the Horvitz-Thompson "
    "estimate (each sampled row contributes w/p = W_TARGET) is emitted "
    "per group next to the sampled mass. The weight column is exact "
    "cents, sums are decimal-accumulated.",
)
def sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w_cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digest = F.md5(F.concat_ws(":", F.col("o_orderkey").cast("string"), F.lit("pps"), F.lit("42")))
    u20 = F.conv(F.substring(digest, 1, 5), 16, 10).cast("bigint")
    kept = o.select("o_orderpriority", w_cents.alias("w_cents"), u20.alias("u20")).filter(
        F.col("u20") * F.lit(PPS_W_TARGET_CENTS).cast("bigint")
        < F.col("w_cents") * F.lit(_PPS_U20).cast("bigint")
    )
    return kept.groupBy("o_orderpriority").agg(
        F.count("*").alias("sampled_rows"),
        (F.sum(F.col("w_cents").cast("decimal(38,0)")).cast("double") / 100).alias(
            "sampled_value"
        ),
        ((F.count("*").cast("double") * PPS_W_TARGET_CENTS) / 100).alias("ht_estimate"),
    )


SKETCH_ACC = 100  # percentile_approx accuracy: rank error <= n / SKETCH_ACC


@register(
    "agg_quantile_sketch",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_within_bound,
           TRUE AS p90_within_bound
    FROM orders GROUP BY o_orderstatus
    """,
    doc="The MERGEABLE-SKETCH percentile path (agg_percentile's 100 TB "
    "form): percentile_approx keeps a constant-memory quantile summary "
    "per group that merges associatively across partitions — the exact "
    "percentile() needs the group's values collected/sorted somewhere. "
    "Sketch estimates are partition-order dependent, so instead of "
    "hashing the estimate the key emits the published GUARANTEE as "
    "in-plan booleans a static oracle expects TRUE (agg_ndv_approx's "
    "within_bound idiom): the exact RANK of the sketch's p50/p90 answer "
    "(one integer count-below pass over exact cents) must sit within "
    "n/accuracy (+1 for ties) of the target rank. A sketch whose error "
    "exceeds its contract fails the hash.",
)
def agg_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    vals = o.select("o_orderstatus", cents.alias("cents"))
    approx = vals.groupBy("o_orderstatus").agg(
        F.percentile_approx("cents", 0.5, SKETCH_ACC).alias("a50"),
        F.percentile_approx("cents", 0.9, SKETCH_ACC).alias("a90"),
    )
    ranked = vals.join(F.broadcast(approx), "o_orderstatus").groupBy("o_orderstatus").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("cents") <= F.col("a50"), 1).otherwise(0)).alias("rank50"),
        F.sum(F.when(F.col("cents") <= F.col("a90"), 1).otherwise(0)).alias("rank90"),
        # ties at the answer value can legitimately push the <= rank past
        # the bound; count them so the check brackets the tie run
        F.sum(F.when(F.col("cents") == F.col("a50"), 1).otherwise(0)).alias("ties50"),
        F.sum(F.when(F.col("cents") == F.col("a90"), 1).otherwise(0)).alias("ties90"),
    )
    err = F.col("n_rows") / SKETCH_ACC

    def within(rank, ties, q):
        target = q * F.col("n_rows")
        lo = F.col(rank) - F.col(ties)  # rank of the first tied value - 1
        return (lo - err <= target) & (target <= F.col(rank) + err)

    return ranked.select(
        "o_orderstatus",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        within("rank50", "ties50", 0.5).alias("p50_within_bound"),
        within("rank90", "ties90", 0.9).alias("p90_within_bound"),
    )


# ---------------------------------------------------------------------------
# Bucketed fact-fact join (the Doris DISTRIBUTED BY HASH(col) BUCKETS n
# layout as a *queryable* surface; physical shape proved by
# tests/test_plans.py::test_bucketed_join_is_shuffle_free)
# ---------------------------------------------------------------------------
def bucketed_fact_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders ⋈ lineitem with BOTH sides pre-bucketed on the join key:
    the join itself needs no Exchange — each task zips co-located
    buckets. Tables are per-process (pid-suffixed) managed tables in the
    warehouse dir, overwritten on reuse, so concurrent sessions never
    clobber each other's layout. The ``merge`` hint pins SortMergeJoin so
    the plan exercises the bucket layout rather than broadcasting the
    smaller side — at 100 TB neither fact side broadcasts, which is
    exactly the case bucketing exists for."""
    import os as _os

    from dodo_spark.sources.writers import write_bucketed

    pid = _os.getpid()
    # reap other processes' leftovers (same liveness rule as scratch_dir:
    # a dead pid cannot be lazily reading its tables) so the warehouse
    # holds at most one layout copy per LIVE process, not one per run
    for t in spark.catalog.listTables():
        for prefix in ("orders_bkt_", "lineitem_bkt_"):
            if t.name.startswith(prefix):
                try:
                    owner = int(t.name[len(prefix):])
                except ValueError:
                    continue
                if owner != pid and not _os.path.exists(f"/proc/{owner}"):
                    from dodo_spark.sources.writers import drop_managed_table

                    drop_managed_table(spark, t.name)
    ot, lt = f"orders_bkt_{pid}", f"lineitem_bkt_{pid}"
    write_bucketed(
        load_table(spark, sf_dir, "orders"), ot, 8, ["o_orderkey"],
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        load_table(spark, sf_dir, "lineitem"), lt, 8, ["l_orderkey"],
        sort_cols=["l_orderkey"],
    )
    o, l = spark.table(ot), spark.table(lt)
    return o.hint("merge").join(l, o.o_orderkey == l.l_orderkey)


@register(
    "join_bucketed",
    oracle=f"""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS line_cnt,
           {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority ORDER BY o.o_orderpriority
    """,
    doc="The bucketed co-located fact-fact join as an oracle-checked "
    "query (reference layout clause: DISTRIBUTED BY HASH(col) BUCKETS n, "
    "DorisParser.g4 distribution desc): both facts are written "
    "bucketed+sorted on the order key, so the orders ⋈ lineitem join "
    "plan contains NO Exchange — the one shuffle in the whole query is "
    "the final per-priority aggregate. At 100 TB this turns the dominant "
    "fact-fact exchange (re-shuffling both tables per query) into a "
    "write-once layout cost amortized across every later join on the "
    "key. Results are proved identical to the plain unbucketed join.",
)
def join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = bucketed_fact_join(spark, sf_dir)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("line_cnt"),
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")),
                "revenue",
                6,
            ),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# BM25-style ranked retrieval (tf saturation + length normalization on the
# same posting list as text_rank_search)
# ---------------------------------------------------------------------------
def _bm25_sat(tf: str, dl: str, n: str, t: str) -> str:
    """The BM25 saturation/length-normalization factor as SQL text with
    k1=1.2, b=0.75 inlined: (tf*2.2) / (tf + 1.2*(0.25 + 0.75*dl*N/T)).
    EXACTLY this expression tree runs on both engines — every input is an
    exact integer, and +,-,*,/ on IEEE doubles are correctly rounded and
    engine-identical, so determinism needs only a fixed operation order
    (which a shared text guarantees). No log/exp ever enters the plan;
    libm differences are the one float hazard this family avoids by
    design (idf stays the exact-integer weight of text_rank_search)."""
    return (
        f"(({tf} * 2.2) / ({tf} + 1.2 * (0.25 + 0.75 * (({dl} * {n}) / {t}))))"
    )


BM25_TOP_K = 20


def _bm25_oracle() -> str:
    t1, t2, t3 = MATCH_TERMS
    terms_sql = ", ".join(f"'{x}'" for x in MATCH_TERMS)
    piv = ",\n             ".join(
        f"COALESCE(MAX(CASE WHEN token = '{x}' THEN tf END), 0) AS tf{i}"
        for i, x in enumerate(MATCH_TERMS, 1)
    )
    score = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN "
        f"((SELECT n FROM nd) * ((SELECT d FROM dprod) // "
        f"(SELECT df FROM dfs WHERE token = '{x}'))) * "
        + _bm25_sat(f"tf{i}", "d.dl", "(SELECT n FROM nd)", "(SELECT t FROM tt)")
        + " ELSE 0.0 END)"
        for i, x in enumerate(MATCH_TERMS, 1)
    )
    matched = " + ".join(
        f"CAST(tf{i} > 0 AS BIGINT)" for i in range(1, len(MATCH_TERMS) + 1)
    )
    return f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(
               regexp_split_to_array(lower(text), '\\s+'), x -> x != '')) AS token
      FROM documents
    ), dl AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM toks GROUP BY doc_id
    ), hits AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks WHERE token IN ({terms_sql})
      GROUP BY doc_id, token
    ), piv AS (
      SELECT doc_id,
             {piv}
      FROM hits GROUP BY doc_id
    ), dfs AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM hits GROUP BY token
    ), nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
    dprod AS (SELECT {_DPROD_SQL} AS d),
    tt AS (SELECT CAST(SUM(dl) AS BIGINT) AS t FROM dl)
    SELECT p.doc_id,
           CAST({matched} AS BIGINT) AS matched_terms,
           CAST({score} AS DOUBLE) AS score
    FROM piv p JOIN dl d ON d.doc_id = p.doc_id
    ORDER BY score DESC, p.doc_id LIMIT {BM25_TOP_K}
    """


@register(
    "text_bm25",
    oracle=_bm25_oracle(),
    doc="BM25-style ranked retrieval (k1=1.2, b=0.75) over the same "
    "posting list as text_rank_search: per-term contribution = "
    "exact-integer idf weight (N * D/df, the log-free scheme) times the "
    "BM25 tf-saturation / document-length normalization factor. All "
    "float work is +,-,*,/ on exact-integer inputs in ONE shared "
    "expression tree (fixed order, both engines), so scores are "
    "bit-identical without any decimal detour and no libm function is "
    "used. Corpus constants (per-term df, doc count N, total tokens T) "
    "are bounded driver literals — at 100 TB they come from index "
    "stats, the tf/dl tables materialize bucketed by token/doc, and "
    "top-k is TakeOrderedAndProject (per-partition heaps, no global "
    "sort).",
)
def text_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.operators.text import spread_scan

    docs = load_table(spark, sf_dir, "documents")
    toks = spread_scan(docs).select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+", -1), lambda x: x != "")
        ).alias("token"),
    )
    # ONE tokenize pass: per-doc length and per-term tfs in a single
    # aggregate, checkpointed because three consumers read it (the df/T
    # constants and the scored output) — without this the token explode
    # replays per consumer
    per_doc = (
        toks.groupBy("doc_id")
        .agg(
            F.count("*").alias("dl"),
            *[
                F.sum(F.when(F.col("token") == x, 1).otherwise(0)).alias(
                    f"tf{i}"
                )
                for i, x in enumerate(MATCH_TERMS, 1)
            ],
        )
        .localCheckpoint(eager=True)
    )

    # bounded driver-side corpus constants (ref-pool idiom): 3 dfs + N + T
    consts = per_doc.agg(
        F.sum("dl").alias("t"),
        *[
            F.sum((F.col(f"tf{i}") > 0).cast("long")).alias(f"df{i}")
            for i in range(1, len(MATCH_TERMS) + 1)
        ],
    ).collect()[0]
    dfs = {
        x: int(consts[f"df{i}"])
        for i, x in enumerate(MATCH_TERMS, 1)
        if consts[f"df{i}"]
    }
    n_docs = docs.count()
    total_tokens = int(consts["t"])
    d_prod = 1
    for v in dfs.values():
        d_prod *= v

    score = " + ".join(
        # a term absent from the corpus (df=0) is a dead branch: its tf
        # column is 0 for every doc, exactly as in the oracle's CASE
        "0.0"
        if x not in dfs
        else f"(CASE WHEN tf{i} > 0 THEN {n_docs * (d_prod // dfs[x])} * "
        + _bm25_sat(f"tf{i}", "dl", str(n_docs), str(total_tokens))
        + " ELSE 0.0 END)"
        for i, x in enumerate(MATCH_TERMS, 1)
    )
    matched = " + ".join(
        f"CAST(tf{i} > 0 AS BIGINT)" for i in range(1, len(MATCH_TERMS) + 1)
    )
    any_hit = " OR ".join(
        f"tf{i} > 0" for i in range(1, len(MATCH_TERMS) + 1)
    )
    return (
        per_doc.filter(any_hit)
        .selectExpr(
            "doc_id",
            f"CAST({matched} AS BIGINT) AS matched_terms",
            f"CAST({score} AS DOUBLE) AS score",
        )
        .orderBy(F.col("score").desc(), "doc_id")
        .limit(BM25_TOP_K)
    )


@register(
    "agg_mode",
    oracle="""
    WITH c AS (
      SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY o_orderpriority ORDER BY n DESC, o_orderstatus
      ) AS rk FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS mode_status, n AS mode_n
    FROM r WHERE rk = 1 ORDER BY o_orderpriority
    """,
    doc="MODE() / most-frequent-value per group (the statistical aggregate "
    "SQL engines expose as MODE; deterministic tie rule = lexicographic "
    "min, since an unordered MODE is engine-dependent): two-phase count "
    "groupBy collapsed by a partitioned rank — the shuffle carries "
    "|group x value| rows, the window state one group's value list. The "
    "same shape computes any 'argmax per group' (most common language "
    "per domain, dominant label per cluster) at any scale.",
)
def agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count("*").alias("n")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.desc("n"), "o_orderstatus"
    )
    return (
        c.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            F.col("n").alias("mode_n"),
        )
        .orderBy("o_orderpriority")
    )


def _recursive_chain_sql(div: str) -> str:
    """Shared recursive-CTE text (Spark ``DIV`` / DuckDB ``//`` divide):
    every customer below 500 walks its ancestor chain parent(k) = k/10
    until 0 — a synthetic but structurally real hierarchy (org charts,
    category trees, thread parents)."""
    return f"""
    WITH RECURSIVE chain AS (
      SELECT c_custkey AS node, c_custkey AS cur, 0 AS depth
      FROM customer WHERE c_custkey < 500
      UNION ALL
      SELECT node, cur {div} 10, depth + 1 FROM chain WHERE cur > 0
    )
    SELECT CAST(depth AS BIGINT) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT cur) AS BIGINT) AS distinct_ancestors,
           CAST(SUM(cur) AS BIGINT) AS sum_cur
    FROM chain GROUP BY depth ORDER BY depth
    """


@register(
    "cte_recursive",
    oracle=_recursive_chain_sql("//"),
    doc="WITH RECURSIVE transitive closure (the iterative SQL surface "
    "Spark gained in 4.0; ANSI recursive CTE semantics, same text on "
    "both engines modulo the integer-division spelling): each customer "
    "key walks its synthetic ancestor chain parent(k)=k/10 to the root "
    "and the closure aggregates per depth. The engine executes this as "
    "iterated UNION ALL steps — each iteration a distributed join-free "
    "projection of the previous frontier, the same execution shape as "
    "the hand-rolled pointer-doubling loop dedup_clusters uses where "
    "recursion depth would be O(log n) rather than bounded. Depth here "
    "is bounded by construction (< 4 divisions to zero), which is the "
    "contract a production recursive query must state to be admitted "
    "at 100 TB.",
)
def cte_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "customer")
    return spark.sql(_recursive_chain_sql("DIV"))
