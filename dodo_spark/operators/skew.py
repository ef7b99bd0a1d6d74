"""Skew-mitigation utilities (SCALE.md §2/§3).

AQE's skew-join splitting (on in ``session.py``) handles most runtime skew;
these are the explicit tools for the cases AQE can't fix:

- ``salted_agg``: two-stage aggregation for a groupBy whose key
  distribution is pathological (one key = 30% of 100 TB). Stage 1 groups
  on (key, salt) so the hot key spreads over ``salt_buckets`` reducers;
  stage 2 merges the per-salt partials. Only works for algebraic
  aggregates (sum/count/min/max — the decomposable ones).
- ``replicated_skew_join``: large ⋈ medium equi-join where the large side
  is skewed and the medium side is too big to broadcast whole: the large
  side gets a random salt in [0, n), the medium side is replicated n ways
  (explode), and the join key becomes (key, salt) — the hot key's rows
  land on n different reducers instead of one.

Both are deterministic-output (the salt only changes physical placement,
never the result), so they're verified against their unsalted twins in
tests/test_skew.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_agg", "replicated_skew_join"]


def _salt(df: DataFrame, buckets: int) -> Column:
    """Deterministic per-row salt: hash of all columns, NOT rand() — a task
    retry must land a row on the same reducer or results could double-count
    under speculative execution."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets))


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs``: out_col -> (fn, in_col) with fn in sum/count/min/max.
    count is re-aggregated with sum in stage 2 (count-of-counts bug
    avoided); min/max merge with themselves; sum with sum.
    """
    merge_fn = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    stage1 = df.withColumn("__salt", _salt(df, salt_buckets)).groupBy(
        *keys, "__salt"
    )
    partials = stage1.agg(
        *[getattr(F, fn)(col).alias(out) for out, (fn, col) in aggs.items()]
    )
    return partials.groupBy(*keys).agg(
        *[
            getattr(F, merge_fn[fn])(out).alias(out)
            for out, (fn, _col) in aggs.items()
        ]
    )


def replicated_skew_join(
    large: DataFrame,
    medium: DataFrame,
    on: list[str],
    salt_buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Salt-and-replicate equi-join for a skewed large side.

    Shuffle volume: large side unchanged (1 salt per row), medium side
    × salt_buckets — choose buckets ≈ (hot-key rows / healthy-partition
    rows). Result is exactly ``large.join(medium, on, how)``.
    """
    salted_large = large.withColumn("__salt", _salt(large, salt_buckets))
    replicated = medium.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    out = salted_large.join(replicated, [*on, "__salt"], how)
    return out.drop("__salt")


def _register_key() -> None:
    from pyspark.sql import SparkSession

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "agg_salted",
        oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty_sum,
               CAST(COUNT(l_orderkey) AS BIGINT) AS cnt,
               MIN(l_extendedprice) AS price_min,
               MAX(l_extendedprice) AS price_max
        FROM lineitem GROUP BY l_returnflag
        """,
        doc="Skew-safe two-stage aggregation (salted_agg): stage 1 groups on "
        "(key, salt) so a pathological hot key spreads over 16 reducers, "
        "stage 2 merges partials (count re-merged with sum). The salt is a "
        "deterministic row hash — retry-safe under speculative execution — "
        "and never changes the result, so the oracle is the plain GROUP BY.",
    )
    def agg_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag",
            "l_orderkey",
            "l_extendedprice",
            F.col("l_quantity").cast("decimal(18,2)").alias("qty_d"),
        )
        out = salted_agg(
            li,
            ["l_returnflag"],
            {
                "qty_sum": ("sum", "qty_d"),
                "cnt": ("count", "l_orderkey"),
                "price_min": ("min", "l_extendedprice"),
                "price_max": ("max", "l_extendedprice"),
            },
            salt_buckets=16,
        )
        return out.withColumn("qty_sum", F.col("qty_sum").cast("double"))


_register_key()


def _register_join_key() -> None:
    from pyspark.sql import SparkSession

    from dodo_spark.catalog import load_table
    from dodo_spark.operators.relational import sql_dsum
    from dodo_spark.registry import register

    @register(
        "join_skew_replicated",
        oracle=f"""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS orders_cnt,
               {sql_dsum("o_totalprice", "sales")}
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_nationkey
        """,
        doc="Skew-safe replicated join (salt-and-replicate): the large side "
        "gets a deterministic salt, the medium side replicates salt_buckets "
        "ways, and the join key becomes (key, salt) — a hot key's rows land "
        "on n reducers instead of one. Result is exactly the plain join, so "
        "the oracle is the unsalted SQL.",
    )
    def join_skew_replicated(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
        customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
        joined = replicated_skew_join(
            orders,
            customer.withColumnRenamed("c_custkey", "o_custkey"),
            on=["o_custkey"],
            salt_buckets=8,
        )
        return joined.groupBy("c_nationkey").agg(
            F.count("*").alias("orders_cnt"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).cast("double").alias("sales"),
        )


_register_join_key()
