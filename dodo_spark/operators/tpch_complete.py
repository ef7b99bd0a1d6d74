"""The 8 TPC-H query shapes not yet in ``operators.analytics`` — Q2, Q4,
Q6, Q9, Q11, Q19, Q20, Q21 — completing all 22 shapes over the reference's
replay workload surface (reference grammar ``src/parser/DorisParser.g4:19``
parses exactly this query class; ``example/usercase/sql/q0.sql`` is the
dumped-workload exemplar these model).

The synthetic star schema has no ``partsupp`` table and no
``l_commitdate``/``l_receiptdate``, so four shapes are adapted faithfully:

- supply-cost (Q2, Q9, Q11, Q20): the distinct ``(l_partkey, l_suppkey)``
  pairs observed in ``lineitem`` ARE the part-supplier catalog; per-pair
  cost/availability aggregates of lineitem stand in for
  ``ps_supplycost``/``ps_availqty``. Same join tree, same cardinalities.
- lateness (Q4, Q21): ``l_shipdate > o_orderdate + N days`` replaces
  ``l_commitdate < l_receiptdate`` — the one date pair the data carries.

Scale notes per query are on each key; the common design rule: derive the
partsupp surrogate with ONE shuffle on its natural key and pre-aggregate
facts on their join key before any fact-fact join, so every subsequent
dimension join broadcasts and bucketing on orderkey/partkey removes the
remaining exchanges at warehouse scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.operators.relational import dsum, sql_dsum
from dodo_spark.registry import register


@register(
    "analytics_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice * l_discount", "revenue", 6)}
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape (forecast revenue change): single fact scan, all "
    "three predicates pushed to the parquet reader, map-side partial sum "
    "to ONE row — zero joins, one exchange of a single row. The canonical "
    "scan-throughput probe: at 100 TB this is bounded by IO alone.",
)
def analytics_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue", 6))


@register(
    "analytics_priority_lateness",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
      AND EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey
              AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY)
    GROUP BY o.o_orderpriority
    ORDER BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order priority checking): EXISTS-correlated "
    "lineitem probe per order, counted by priority. The commit/receipt "
    "lateness test becomes shipped-a-year-after-order (the date pair this "
    "schema carries). Spark plan: LEFT SEMI join on orderkey with the "
    "date comparison as a join residual — one shuffle pair on orderkey "
    "(bucketing removes it), then a 5-group aggregate. The semi join "
    "short-circuits per order, never expanding the fact.",
)
def analytics_priority_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (li.l_orderkey == o.o_orderkey)
            # full-timestamp interval add — date_add() would truncate
            # o_orderdate to DATE and misclassify borderline rows when
            # order timestamps carry a time-of-day component
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 365 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "analytics_disjunctive_revenue",
    oracle=f"""
    SELECT {sql_dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue", 6)}
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#21' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "three OR'd brand/size/quantity conjunction blocks spanning BOTH join "
    "sides. Spark keeps the equi-key (partkey) as the hash condition and "
    "evaluates the OR as a post-join residual; part broadcasts, so the OR "
    "never forces a nested-loop. The per-side prunable parts (brand IN, "
    "quantity range union) are ALSO pre-filtered on each scan — "
    "derived-restriction pushdown Catalyst doesn't do for cross-side ORs.",
)
def analytics_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scan-side derived restrictions (union of each block's single-side range)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity").between(1, 30))
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin("Brand#1", "Brand#11", "Brand#21") & (F.col("p_size") <= 35)
    )
    blocks = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#11") & F.col("p_size").between(1, 25) & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#21") & F.col("p_size").between(1, 35) & F.col("l_quantity").between(20, 30))
    )
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .filter(blocks)
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue", 6))
    )


@register(
    "analytics_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(YEAR(o.o_orderdate) AS INT) AS o_year,
           {sql_dsum(
               "l.l_extendedprice * (1 - l.l_discount)"
               " - 0.6 * p.p_retailprice * l.l_quantity",
               "sum_profit", 6,
           )}
    FROM lineitem l
    JOIN part p     ON p.p_partkey  = l.l_partkey
    JOIN supplier s ON s.s_suppkey  = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%gear%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit): 5-table tree over the "
    "part-supplier axis, profit per supplier nation per order year. With "
    "no ps_supplycost, cost is proxied as 60% of the part's retail price "
    "per unit — same expression tree, same join graph. Plan: part (LIKE "
    "pre-filtered), supplier, nation broadcast; the only shuffle is "
    "lineitem⋈orders on orderkey (bucketing removes it) and the final "
    "25×years aggregate. The LIKE filter prunes the broadcast BEFORE the "
    "fact scan joins it, so ~12% of lineitem survives the first join.",
)
def analytics_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.6) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(p), p.p_partkey == li.l_partkey)
        .join(F.broadcast(s), F.col("s_suppkey") == li.l_suppkey)
        .join(o, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(dsum(profit, "sum_profit", 6))
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "analytics_important_stock",
    oracle=f"""
    WITH supply AS (
      SELECT l.l_partkey AS partkey,
             {sql_dsum("l.l_extendedprice", "value", 4)}
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name IN ('NATION_3', 'NATION_7')
      GROUP BY partkey)
    SELECT partkey, value
    FROM supply
    WHERE value > (SELECT CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE)
                          * 0.002 FROM supply)
    ORDER BY value DESC, partkey
    """,
    doc="TPC-H Q11 shape (important stock identification): per-part supply "
    "value restricted to two nations' suppliers, kept only where the part "
    "exceeds a fraction of the TOTAL — a scalar subquery over the same "
    "aggregate. Without partsupp, value = Σ l_extendedprice over the "
    "nation-filtered lineitems (the observed supply ledger). Spark: the "
    "grouped frame is computed ONCE, the global total reduces to one row "
    "and broadcast-joins back as the filter bound — no recompute, no "
    "driver round-trip, exactly the reference's single-pass plan under a "
    "CTE (relational.py cte_reuse is the isolated form).",
)
def analytics_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_3", "NATION_7")
    )
    supply = (
        li.join(F.broadcast(s), s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum("l_extendedprice", "value", 4))
    )
    # decimal accumulation => order-independent bound (value has scale 4,
    # so the cast is lossless); one double cast + multiply afterwards is
    # bit-identical in both engines
    total = supply.agg(
        (
            F.sum(F.col("value").cast("decimal(18,4)")).cast("double") * F.lit(0.002)
        ).alias("bound")
    )
    return (
        supply.join(F.broadcast(total))
        .filter(F.col("value") > F.col("bound"))
        .select("partkey", "value")
        .orderBy(F.col("value").desc(), "partkey")
    )


@register(
    "analytics_min_cost_supplier",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eligible AS (
      SELECT ps.l_partkey, ps.supplycost, s.s_name, s.s_acctbal, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE')
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_retailprice
    FROM part p
    JOIN eligible e ON e.l_partkey = p.p_partkey
    WHERE p.p_size = 15 AND p.p_type = 'SMALL'
      AND e.supplycost = (SELECT MIN(e2.supplycost) FROM eligible e2
                          WHERE e2.l_partkey = p.p_partkey)
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (minimum-cost supplier): for each qualifying part, "
    "the European supplier(s) offering the region-minimum cost — a "
    "correlated MIN subquery over the supply catalog. The catalog is the "
    "distinct (partkey, suppkey) pairs of lineitem with supplycost = "
    "MIN(l_extendedprice) (exact double, no division → bit-identical "
    "equality in both engines). Spark: one shuffle builds the catalog on "
    "its composite natural key; the correlated MIN is a window MIN over "
    "partkey on the already-partitioned frame (no second join); part, "
    "supplier, nation, region all broadcast. At 100 TB the catalog is the "
    "only large intermediate and it bucket-joins by partkey.",
)
def analytics_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min("l_extendedprice").alias("supplycost")
    )
    eligible = (
        ps.join(F.broadcast(s), s.s_suppkey == ps.l_suppkey)
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("l_partkey", "supplycost", "s_name", "s_acctbal", "n_name")
    )
    w = Window.partitionBy("l_partkey")
    best = eligible.withColumn("min_cost", F.min("supplycost").over(w)).filter(
        F.col("supplycost") == F.col("min_cost")
    )
    return (
        best.join(F.broadcast(p), p.p_partkey == best.l_partkey)
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_retailprice")
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "analytics_excess_suppliers",
    oracle=f"""
    WITH avail AS (
      SELECT l_partkey, l_suppkey,
             {sql_dsum("l_quantity", "avail_qty", 4)}
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
      GROUP BY l_partkey, l_suppkey),
    demand AS (
      SELECT l_partkey, {sql_dsum("l_quantity", "total_qty", 4)}
      FROM lineitem GROUP BY l_partkey)
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name IN ('NATION_1', 'NATION_2', 'NATION_4')
      AND s.s_suppkey IN (
        SELECT a.l_suppkey
        FROM avail a
        JOIN demand d ON d.l_partkey = a.l_partkey
        WHERE a.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE '%bolt%')
          AND a.avail_qty > 0.1 * d.total_qty)
    ORDER BY s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion): suppliers in given "
    "nations whose one-year availability of some 'bolt' part exceeds a "
    "fraction of that part's total demand — the nested IN(IN(...)) "
    "double-subquery query. Availability = year-window quantity per "
    "(part, supplier); demand = all-time quantity per part (the "
    "ps_availqty surrogate). Spark: both aggregates are one shuffle each "
    "on partkey(+suppkey); the part-name IN becomes a broadcast semi "
    "join BEFORE the heavier demand join (prune early); the supplier IN "
    "is a left-semi broadcast. No correlated re-execution anywhere.",
)
def analytics_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2", "NATION_4")
    )
    avail = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(F.broadcast(p.select("p_partkey")), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity", "avail_qty", 4))
    )
    demand = (
        li.join(
            F.broadcast(p.select("p_partkey")),
            F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(dsum("l_quantity", "total_qty", 4))
    )
    excess = (
        avail.join(demand, "l_partkey")
        .filter(F.col("avail_qty") > F.lit(0.1) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"), "left_semi")
        .join(F.broadcast(excess), excess.l_suppkey == s.s_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "analytics_waiting_suppliers",
    oracle="""
    WITH late AS (
      SELECT l.l_orderkey, l.l_suppkey
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
        AND l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
      GROUP BY l.l_orderkey, l.l_suppkey)
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): on finished "
    "orders, count per supplier the orders where it was the ONLY late "
    "shipper among several suppliers — EXISTS(other supplier) AND NOT "
    "EXISTS(other LATE supplier). Late = shipped a year after order date. "
    "Spark replaces the double correlated EXISTS with ONE per-order "
    "aggregate: n_suppliers = countDistinct(suppkey), n_late = "
    "countDistinct(suppkey WHEN late) — an order qualifies iff "
    "n_suppliers > 1 AND n_late = 1, and the waiter is its unique late "
    "supplier (MAX over the 1-element late set). One shuffle on orderkey "
    "instead of two correlated fact probes; provably equivalent because "
    "the EXISTS pair is a predicate on exactly those two distinct counts. "
    "At 100 TB this is the difference between one bucketed agg and two "
    "extra fact-fact joins.",
)
def analytics_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier")
    joined = li.join(o, o.o_orderkey == li.l_orderkey).withColumn(
        # full-timestamp interval add (not date_add — see priority_lateness)
        "is_late",
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"),
    )
    per_order = joined.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late"),
        F.max(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("late_suppkey"),
    )
    lone = per_order.filter((F.col("n_suppliers") > 1) & (F.col("n_late") == 1))
    return (
        lone.join(F.broadcast(s), s.s_suppkey == lone.late_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(100)
    )
