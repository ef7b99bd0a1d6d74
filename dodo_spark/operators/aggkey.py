"""Doris key-model semantics as DataFrame merge views (SURVEY.md §1.3).

Doris tables declare a key model (reference ``DorisParser.g4`` createTable;
example AGGREGATE-KEY DDL ``example/usercase/ddl/example.rb.table.sql``):

- DUPLICATE KEY — append-only; no merge (a plain DataFrame).
- UNIQUE KEY — upsert: the latest row per key wins.
- AGGREGATE KEY — per-value-column merge function (SUM / MAX / MIN /
  REPLACE / REPLACE_IF_NOT_NULL / BITMAP_UNION / HLL_UNION).

Doris resolves "latest" by load sequence; under distributed parallel
ingestion that order is meaningless, so both REPLACE and UNIQUE-KEY upsert
take an explicit ``order_col`` (a load-sequence / version column) — same
semantics, made deterministic. BITMAP_UNION over our BITMAP mapping
(``array<long>``, SURVEY §1.2) is an exact set union; HLL_UNION merges to
the same set-union (the HLL sketch itself has no Spark value type) and is
queried with ``approx_count_distinct``.

Scale shape: one shuffle on the key columns with map-side partial
aggregation — identical to what Doris's compaction computes incrementally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dodo_spark.ddl import TableDef
from dodo_spark.registry import register

__all__ = ["aggregate_key_view", "unique_key_upsert"]


def _merge_expr(name: str, agg_type: str, order_col: str | None) -> Column:
    if agg_type == "SUM":
        return F.sum(name).alias(name)
    if agg_type == "MAX":
        return F.max(name).alias(name)
    if agg_type == "MIN":
        return F.min(name).alias(name)
    if agg_type in ("REPLACE", "REPLACE_IF_NOT_NULL"):
        if order_col is None:
            raise ValueError(
                f"{agg_type} column '{name}' needs order_col: load order is "
                "not reproducible in a distributed load"
            )
        order: Column = F.col(order_col)
        if agg_type == "REPLACE_IF_NOT_NULL":
            # null values never win: null order keys are ignored by max_by
            order = F.when(F.col(name).isNotNull(), order)
        return F.max_by(name, order).alias(name)
    if agg_type in ("BITMAP_UNION", "HLL_UNION"):
        # collect_SET, not collect_list: the load path emits one-element
        # bitmaps (Doris to_bitmap per row), so the partial-aggregation
        # buffer under collect_list held every input row — O(rows) per
        # group shuffled with no map-side combine. collect_set dedups in
        # the partial, bounding the buffer by the DISTINCT element count;
        # flatten+array_distinct then computes the exact set union for
        # multi-element (already-merged) inputs, and array_sort pins a
        # deterministic element order (a bitmap is unordered — sorting
        # loses nothing and keeps results stable across shuffles).
        return F.array_sort(
            F.array_distinct(F.flatten(F.collect_set(name)))
        ).alias(name)
    raise ValueError(f"unsupported aggregate key type: {agg_type}")


def aggregate_key_view(
    df: DataFrame, table: TableDef, order_col: str | None = None
) -> DataFrame:
    """Merge a raw load DataFrame down to AGGREGATE-KEY table semantics."""
    if table.key_type != "AGGREGATE":
        raise ValueError(f"table {table.name} is not AGGREGATE KEY")
    keys = table.key_columns
    aggs = [
        _merge_expr(c.name, c.agg_type or "REPLACE", order_col)
        for c in table.columns
        if c.name not in keys
    ]
    return df.groupBy(*keys).agg(*aggs)


def unique_key_upsert(df: DataFrame, table: TableDef, order_col: str) -> DataFrame:
    """UNIQUE-KEY upsert: latest row per key by ``order_col`` wins.
    max_by on a struct of all value columns = one shuffle, no window sort."""
    if table.key_type != "UNIQUE":
        raise ValueError(f"table {table.name} is not UNIQUE KEY")
    keys = table.key_columns
    value_cols = [c.name for c in table.columns if c.name not in keys]
    packed = F.max_by(F.struct(*value_cols), F.col(order_col)).alias("__v")
    merged = df.groupBy(*keys).agg(packed)
    return merged.select(*keys, *[F.col(f"__v.{c}").alias(c) for c in value_cols])


# --------------------------------------------------------------------------
# verify key: AGGREGATE-KEY merge over lineitem-derived loads
# --------------------------------------------------------------------------
_AGG_DDL = """
CREATE TABLE `li_rollup` (
  `l_returnflag` varchar(1) NULL,
  `l_linestatus` varchar(1) NULL,
  `qty_sum` bigint SUM NULL,
  `qty_max` bigint MAX NULL,
  `qty_min` bigint MIN NULL,
  `latest_order` bigint REPLACE NULL,
  `order_set` bitmap BITMAP_UNION NULL
) ENGINE=OLAP AGGREGATE KEY(`l_returnflag`, `l_linestatus`)
DISTRIBUTED BY HASH(`l_returnflag`) BUCKETS 4
"""


@register(
    "agg_key_merge",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum,
           CAST(MAX(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_max,
           CAST(MIN(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_min,
           arg_max(l_orderkey, l_orderkey * 10 + l_linenumber) AS latest_order,
           CAST(COUNT(DISTINCT l_orderkey % 1000) AS BIGINT) AS order_set_card
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Doris AGGREGATE-KEY table merge (SURVEY §1.3; example DDL "
    "example/usercase/ddl/example.rb.table.sql): SUM/MAX/MIN/REPLACE/"
    "BITMAP_UNION value columns merged per key — REPLACE ordered by an "
    "explicit load-sequence column, BITMAP_UNION reported as its exact "
    "cardinality (bitmap_union_count).",
)
def agg_key_merge(spark, sf_dir):
    from dodo_spark.catalog import load_table
    from dodo_spark.ddl import parse_create_table

    table = parse_create_table(_AGG_DDL)
    # a spread_scan here was tried and REVERTED (r13 interleaved noop
    # A/B at sf0.1: 0.64 -> 0.91 s min): column pruning pushes the load
    # projection — including the per-row bitmap array construction —
    # below the round-robin exchange, so the shuffle carries the array
    # column and its serial write costs more than the serial partial
    # aggregate it replaced.
    li = load_table(spark, sf_dir, "lineitem")
    # bround (half-even) matches the oracle's CAST(l_quantity AS BIGINT)
    # — DuckDB's double->int cast rounds half-even while Spark's
    # truncates, which diverges on fractional quantities (latent on
    # integral testdata; caught by the sf1 generated corpus)
    qty = F.bround(F.col("l_quantity")).cast("bigint")
    load = li.select(
        "l_returnflag",
        "l_linestatus",
        qty.alias("qty_sum"),
        qty.alias("qty_max"),
        qty.alias("qty_min"),
        F.col("l_orderkey").alias("latest_order"),
        F.array(F.col("l_orderkey") % 1000).alias("order_set"),
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("__seq"),
    )
    merged = aggregate_key_view(load, table, order_col="__seq")
    return merged.select(
        "l_returnflag",
        "l_linestatus",
        "qty_sum",
        "qty_max",
        "qty_min",
        "latest_order",
        F.size("order_set").cast("bigint").alias("order_set_card"),
    )


_UNIQ_DDL = """
CREATE TABLE `cust_latest` (
  `c_custkey` bigint NULL,
  `acctbal` double NULL,
  `segment` varchar(16) NULL
) ENGINE=OLAP UNIQUE KEY(`c_custkey`)
DISTRIBUTED BY HASH(`c_custkey`) BUCKETS 4
"""


@register(
    "unique_key_upsert",
    oracle="""
    SELECT o_custkey AS c_custkey,
           arg_max(CAST(o_totalprice AS DOUBLE), o_orderkey) AS acctbal,
           arg_max(o_orderstatus, o_orderkey) AS segment
    FROM orders
    GROUP BY o_custkey
    """,
    doc="Doris UNIQUE-KEY upsert (SURVEY §1.3): repeated loads of the same "
    "key collapse to the row with the highest load sequence — max_by on a "
    "struct of the value columns, ONE shuffle, no window sort. The "
    "'loads' are orders rows keyed by customer with o_orderkey as the "
    "load sequence; oracle is arg_max per value column on the same "
    "sequence.",
)
def unique_key_upsert_key(spark, sf_dir):
    from dodo_spark.catalog import load_table
    from dodo_spark.ddl import parse_create_table

    table = parse_create_table(_UNIQ_DDL)
    o = load_table(spark, sf_dir, "orders")
    loads = o.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_totalprice").cast("double").alias("acctbal"),
        F.col("o_orderstatus").alias("segment"),
        F.col("o_orderkey").alias("__seq"),
    )
    return unique_key_upsert(loads, table, order_col="__seq")


@register(
    "scd2_history",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ), chg AS (
      SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    )
    SELECT o_custkey AS dim_key,
           o_orderpriority AS attr_value,
           o_orderdate AS valid_from,
           lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS valid_to,
           CAST(row_number() OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
             AS version_n,
           (lead(o_orderdate) OVER
             (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) IS NULL)
             AS is_current
    FROM chg
    """,
    doc="SCD type-2 dimension build — the warehouse-side twin of the "
    "UNIQUE-KEY upsert: instead of keeping only the latest row per key, "
    "compress the change stream into validity intervals. Orders act as "
    "the per-customer change feed of o_orderpriority: (1) change "
    "detection drops rows equal to their lag (consecutive duplicates "
    "never open a new version); (2) lead() closes each surviving "
    "version's interval, NULL valid_to = current. Both windows share one "
    "partitioning (custkey, ordered by date+key tiebreak), so the plan "
    "is a single shuffle on the dimension key with the sort reused — at "
    "100 TB an SCD build is exactly this shape, never a self-join.",
)
def scd2_history(spark, sf_dir):
    from pyspark.sql.window import Window

    from dodo_spark.catalog import load_table

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = (
        o.withColumn("prev", F.lag("o_orderpriority").over(w))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority")))
    )
    # same partitioning over the compressed stream; Spark reuses the exchange
    w2 = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    valid_to = F.lead("o_orderdate").over(w2)
    return chg.select(
        F.col("o_custkey").alias("dim_key"),
        F.col("o_orderpriority").alias("attr_value"),
        F.col("o_orderdate").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.row_number().over(w2).cast("bigint").alias("version_n"),
        valid_to.isNull().alias("is_current"),
    )


@register(
    "scd2_pit_join",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev
      FROM orders
    ), chg AS (
      SELECT * FROM ordered WHERE prev IS NULL OR prev <> o_orderpriority
    ), versions AS (
      SELECT o_custkey AS dim_key, o_orderpriority AS attr_value,
             o_orderdate AS valid_from,
             CAST(row_number() OVER
               (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
               AS BIGINT) AS version_n
      FROM chg
    ), dim AS (
      -- day-granular dim: the LAST change on a date wins (max version_n)
      SELECT dim_key, valid_from,
             arg_max(attr_value, version_n) AS attr_value
      FROM versions GROUP BY dim_key, valid_from
    ), pit AS (
      SELECT o.o_orderpriority, d.attr_value
      FROM orders o
      ASOF LEFT JOIN dim d
        ON o.o_custkey = d.dim_key AND o.o_orderdate >= d.valid_from
    )
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN attr_value = o_orderpriority THEN 1 ELSE 0 END)
                AS BIGINT) AS pit_hits,
           CAST(SUM(CASE WHEN attr_value = o_orderpriority THEN 1 ELSE 0 END)
                * 1000 // COUNT(*) AS BIGINT) AS match_pm
    FROM pit GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    doc="Point-in-time join against the SCD2 dimension (the feature-store "
    "training-data correctness primitive: every fact row must see the "
    "dimension version valid AT ITS OWN timestamp, never a later one — "
    "PIT joins are what keep feature leakage out of training sets): the "
    "scd2_history build, collapsed to day granularity (last change per "
    "day wins, arg_max by version), then every order as-of joins to its "
    "contemporaneous version via the D9 union-merge kernel — one shuffle "
    "on the dimension key, no range join. The match_pm column "
    "quantifies the self-consistency of the day-granular dim against "
    "each order's own attribute: sub-1000 values measure exactly the "
    "intra-day changes a day-grained dimension collapses, which is the "
    "trade a real PIT store documents.",
)
def scd2_pit_join(spark, sf_dir):
    from pyspark.sql.window import Window

    from dodo_spark.catalog import load_table
    from dodo_spark.operators.events import asof_join

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    chg = o.withColumn("prev", F.lag("o_orderpriority").over(w)).filter(
        F.col("prev").isNull() | (F.col("prev") != F.col("o_orderpriority"))
    )
    versions = chg.select(
        F.col("o_custkey").alias("dim_key"),
        F.col("o_orderpriority").alias("attr_value"),
        F.col("o_orderdate").alias("valid_from"),
        F.row_number().over(w).cast("bigint").alias("version_n"),
    )
    dim = versions.groupBy("dim_key", "valid_from").agg(
        F.max_by("attr_value", "version_n").alias("attr_value")
    )
    facts = o.select(
        F.col("o_custkey").alias("dim_key"),
        F.col("o_orderdate").alias("ts"),
        "o_orderpriority",
    )
    pit = asof_join(
        facts,
        dim.withColumnRenamed("valid_from", "ts"),
        on=["dim_key"],
        ts="ts",
    )
    hit = F.when(F.col("attr_value_r") == F.col("o_orderpriority"), 1).otherwise(0)
    return (
        pit.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(hit).cast("bigint").alias("pit_hits"),
        )
        .selectExpr(
            "o_orderpriority",
            "n_orders",
            "pit_hits",
            "CAST(pit_hits * 1000 DIV n_orders AS BIGINT) AS match_pm",
        )
        .orderBy("o_orderpriority")
    )
