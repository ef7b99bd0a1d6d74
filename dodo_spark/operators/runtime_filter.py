"""Runtime scan-pruning operators: bloom-filter semi-join pruning and
dynamic partition pruning (SCALE.md §2 — the "don't shuffle the fact"
family).

The reference's target engine ships runtime filters that push a join's
build-side key set down into the probe-side scan (Doris
``runtime_filter_type`` IN/Bloom session surface; the repo's A7 hint row
covers the *strategy* side of the same concern). On Spark the same idea
is expressed here as a composable pair:

- ``bloom_bitmap``: aggregate the (filtered) dim keys into a fixed-size
  bloom bitmap — an ``array<bigint>`` of ``m_bits/64`` words in ONE row.
  At 100 TB the dim side of a selective semi-join is thousands-to-
  millions of keys; the bitmap is a few KB-to-MB regardless, and
  broadcasting it costs nothing compared to shuffling the fact.
- ``with_bloom_flag``: cross-join the 1-row bitmap onto the fact (a
  bounded BroadcastNestedLoopJoin — the repo's audited 1-row-broadcast
  pattern) and test the key's k bit positions SCAN-SIDE, entirely inside
  whole-stage codegen (``md5``/``conv``/shift/mask — no UDF, no shuffle
  of the fact). Rows failing the bloom never reach the join.

Hashing is the Kirsch-Mitzenmacher double-hash construction over the
repo's shared cross-engine md5 kernel (``functions/hashing.py``):
``h1`` = first 12 hex chars, ``h2`` = next 12, position_i =
``(h1 + i*(2*h2+1)) % m_bits`` — every term is < 2^51 so the arithmetic
is exact int64 on both engines, and the DuckDB oracle recomputes the
IDENTICAL bit positions, so the false-positive set itself is part of the
verified contract (not just the exact join result).

A bloom filter may pass a non-matching key (false positive — audited and
counted) but must NEVER drop a matching one: the ``missed_matches``
column is the no-false-negative contract and the oracle pins it to the
same value (0) computed independently.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["bloom_bitmap", "with_bloom_flag", "BLOOM_M_BITS", "BLOOM_K"]

BLOOM_M_BITS = 1 << 17  # 131072 bits = 2048 longs = 16 KiB bitmap
BLOOM_K = 4  # hash probes per key


def _h1_h2(key: Column) -> tuple[Column, Column]:
    """The two 48-bit halves of the shared md5 kernel for ``key``'s
    canonical string rendering — exact and identical across engines."""
    h = F.md5(key.cast("string"))
    h1 = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(h, 13, 12), 16, 10).cast("bigint")
    return h1, h2


def _positions(h1: Column, h2: Column, m_bits: int, k: int) -> list[Column]:
    """k bloom bit positions via double hashing; the step is forced odd
    so the probe sequence never degenerates to a single position."""
    step = h2 * 2 + 1
    return [(h1 + F.lit(i) * step) % F.lit(m_bits) for i in range(k)]


def bloom_bitmap(
    keys: DataFrame,
    key_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
) -> DataFrame:
    """ONE row ``[__bloom: array<bigint>]`` of ``m_bits/64`` words with
    the k positions of every key set. The only shuffle is the tiny
    positions aggregate (≤ m_bits/64 groups); an empty ``keys`` input
    yields an all-zero bitmap (nothing passes)."""
    assert m_bits % 64 == 0, m_bits
    words = m_bits // 64
    h1, h2 = _h1_h2(F.col(key_col))
    # NULL keys never match a semi-join, so they contribute no bits —
    # and a NULL hash would otherwise reach map_from_entries as a NULL
    # map key (an error), so drop them before hashing
    pos = keys.filter(F.col(key_col).isNotNull()).select(
        F.explode(F.array(*_positions(h1, h2, m_bits, k))).alias("p")
    )
    word_rows = pos.select(
        F.expr("p DIV 64").alias("widx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
            "mask"
        ),
    ).groupBy("widx").agg(F.bit_or("mask").alias("word"))
    return word_rows.agg(
        F.map_from_entries(
            F.collect_list(
                F.struct(
                    F.col("widx").cast("int").alias("k"),
                    F.col("word").alias("v"),
                )
            )
        ).alias("__m")
    ).select(
        F.expr(
            f"transform(sequence(0, {words - 1}),"
            " w -> coalesce(__m[w], CAST(0 AS BIGINT)))"
        ).alias("__bloom")
    )


def with_bloom_flag(
    fact: DataFrame,
    key_col: str,
    bitmap: DataFrame,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    flag: str = "bloom_pass",
) -> DataFrame:
    """``fact`` + boolean ``flag``: all k bit probes of ``key_col`` are
    set in ``bitmap``. The bitmap rides a 1-row broadcast; the probes are
    pure codegen expressions over the scan — no shuffle, no UDF. Filter
    on the flag to prune, or keep both branches to audit selectivity."""
    h1, h2 = _h1_h2(F.col(key_col))
    flagged = (
        fact.crossJoin(F.broadcast(bitmap))
        .withColumn("__h1", h1)
        .withColumn("__step", h2 * 2 + 1)
    )
    checks = []
    for i in range(k):
        p = f"((__h1 + {i} * __step) % {m_bits})"
        checks.append(
            F.expr(
                f"(element_at(__bloom, CAST({p} DIV 64 AS INT) + 1)"
                f" & shiftleft(CAST(1 AS BIGINT), CAST({p} % 64 AS INT)))"
                " != 0"
            )
        )
    return flagged.withColumn(
        flag, reduce(lambda a, b: a & b, checks)
    ).drop("__bloom", "__h1", "__step")


# ---------------------------------------------------------------------------
# verify key
# ---------------------------------------------------------------------------
def _register_bloom_prune() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.functions.hashing import sql_hex_int
    from dodo_spark.registry import register

    m, k = BLOOM_M_BITS, BLOOM_K
    h1_sql = sql_hex_int("h")
    h2_sql = sql_hex_int("substring(h, 13, 12)")

    @register(
        "join_bloom_prune",
        oracle=f"""
        WITH dim AS (
          SELECT DISTINCT o_orderkey AS dk FROM orders
          WHERE o_orderpriority = '1-URGENT'
        ), dh AS (
          SELECT dk, md5(CAST(dk AS VARCHAR)) AS h FROM dim
        ), dhh AS (
          SELECT dk, {h1_sql} AS h1, {h2_sql} AS h2 FROM dh
        ), pos AS (
          SELECT DISTINCT (h1 + g.i * (2 * h2 + 1)) % {m} AS p
          FROM dhh, generate_series(0, {k - 1}) AS g(i)
        ), f AS (
          SELECT l_orderkey, l_extendedprice, l_discount,
                 md5(CAST(l_orderkey AS VARCHAR)) AS h
          FROM lineitem
        ), fh AS (
          SELECT l_orderkey, l_extendedprice, l_discount,
                 {h1_sql} AS h1, {h2_sql} AS h2
          FROM f
        ), fc AS (
          SELECT l_orderkey, l_extendedprice, l_discount,
                 ((SELECT COUNT(*) FROM generate_series(0, {k - 1}) g(i)
                   WHERE ((h1 + g.i * (2 * h2 + 1)) % {m})
                         IN (SELECT p FROM pos)) = {k}) AS bloom_pass,
                 (l_orderkey IN (SELECT dk FROM dim)) AS in_dim
          FROM fh
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS fact_rows,
               CAST(SUM(CAST(bloom_pass AS BIGINT)) AS BIGINT)
                 AS bloom_candidates,
               CAST(SUM(CAST(in_dim AS BIGINT)) AS BIGINT) AS true_matches,
               CAST(SUM(CAST((bloom_pass AND NOT in_dim) AS BIGINT))
                 AS BIGINT) AS false_positives,
               CAST(SUM(CAST((in_dim AND NOT bloom_pass) AS BIGINT))
                 AS BIGINT) AS missed_matches,
               CAST(COUNT(DISTINCT CASE WHEN in_dim THEN l_orderkey END)
                 AS BIGINT) AS matched_keys,
               CAST(SUM(CASE WHEN in_dim THEN
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))
                 END) AS DOUBLE) AS matched_revenue
        FROM fc
        """,
        doc="Bloom-filter semi-join pruning (the Doris runtime-filter "
        "idea, Spark-side): the URGENT orders' keys aggregate into a "
        "16 KiB bloom bitmap (one row, broadcast), and every lineitem "
        "row tests its k=4 bit probes scan-side in pure codegen — at "
        "100 TB the fact is pruned before any shuffle, and only bloom "
        "survivors reach the exact join. Both engines compute the "
        "IDENTICAL bit positions from the shared md5 kernel, so the "
        "audit columns pin the whole contract: bloom_candidates (what "
        "survived), false_positives (counted, bounded by design), and "
        "missed_matches — the no-false-negative guarantee, 0 on both "
        "engines — alongside the exact matched revenue.",
    )
    def join_bloom_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        lineitem = load_table(spark, sf_dir, "lineitem")
        dim = (
            orders.filter(F.col("o_orderpriority") == "1-URGENT")
            .select(F.col("o_orderkey").alias("dk"))
            .distinct()
        )
        bitmap = bloom_bitmap(dim, "dk", m, k)
        # spread: the k-probe bloom flag + 7-way exact aggregate is the
        # heavy per-row work and ran on the source's single local split
        # (one task — r13 profile); the broadcast join stays map-side
        # post-spread and every accumulator is exact, so the result is
        # partitioning-independent. No-op at warehouse scale.
        from dodo_spark.operators.text import spread_scan

        fact = spread_scan(lineitem).select(
            "l_orderkey", "l_extendedprice", "l_discount"
        )
        flagged = with_bloom_flag(fact, "l_orderkey", bitmap, m, k)
        j = flagged.join(
            F.broadcast(dim.withColumn("__in", F.lit(True))),
            flagged["l_orderkey"] == F.col("dk"),
            "left",
        )
        in_dim = F.col("__in").isNotNull()
        bp = F.col("bloom_pass")
        return j.agg(
            F.count("*").alias("fact_rows"),
            F.sum(bp.cast("bigint")).alias("bloom_candidates"),
            F.sum(in_dim.cast("bigint")).alias("true_matches"),
            F.sum((bp & ~in_dim).cast("bigint")).alias("false_positives"),
            F.sum((in_dim & ~bp).cast("bigint")).alias("missed_matches"),
            F.countDistinct(F.when(in_dim, F.col("l_orderkey"))).alias(
                "matched_keys"
            ),
            F.sum(
                F.when(
                    in_dim,
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)"),
                )
            )
            .cast("double")
            .alias("matched_revenue"),
        )


_register_bloom_prune()


def _register_partition_pruned() -> None:
    import os

    from dodo_spark.catalog import load_table
    from dodo_spark.operators.schema import scratch_dir
    from dodo_spark.plans.lint import plan_text
    from dodo_spark.registry import register

    @register(
        "join_partition_pruned",
        oracle="""
        WITH m AS (
          SELECT strftime(o_orderdate, '%Y-%m') AS month,
                 CAST(COUNT(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1
        ), dim AS (
          SELECT month, n_orders FROM m WHERE n_orders % 2 = 1
        )
        SELECT d.month, d.n_orders,
               CAST(COUNT(*) AS BIGINT) AS line_cnt,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
               TRUE AS dpp_in_plan
        FROM lineitem l
        JOIN dim d ON strftime(l.l_shipdate, '%Y-%m') = d.month
        GROUP BY d.month, d.n_orders
        ORDER BY d.month
        """,
        doc="Dynamic partition pruning over a ship-month-partitioned fact "
        "(the other half of the runtime-filter family): lineitem is laid "
        "out partitioned by month; the dim side keeps only months whose "
        "ORDER COUNT IS ODD — a predicate deliberately underivable from "
        "the join key, so Catalyst's static constraint propagation CANNOT "
        "pre-prune and the partition pruning must happen at RUNTIME via "
        "the broadcast-reuse DPP subquery. At 100 TB this is the "
        "difference between scanning every date partition and scanning "
        "only the qualifying ones. dpp_in_plan is computed from the "
        "actual physical plan (dynamicpruningexpression present in the "
        "scan's PartitionFilters) and the oracle pins it TRUE, so losing "
        "the runtime filter is a correctness failure, not a silent "
        "slowdown.",
    )
    def join_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
        fact_path = os.path.join(scratch_dir("dpp_fact"), "fact")
        # repartition on the partition column first: one task per month
        # writes one file, instead of every task spraying a sliver into
        # all ~84 month dirs (tasks x months small files — slower to
        # write AND to list/prune on read)
        load_table(spark, sf_dir, "lineitem").select(
            "l_shipdate", "l_extendedprice", "l_discount"
        ).withColumn(
            "ship_month", F.date_format("l_shipdate", "yyyy-MM")
        ).repartition("ship_month").write.partitionBy("ship_month").mode(
            "overwrite"
        ).parquet(fact_path)
        fact = spark.read.parquet(fact_path)

        dim = (
            load_table(spark, sf_dir, "orders")
            .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
            .agg(F.count("*").alias("n_orders"))
            .filter(F.col("n_orders") % 2 == 1)
        )
        out = (
            fact.join(
                F.broadcast(dim), fact["ship_month"] == dim["month"], "inner"
            )
            .groupBy("month", "n_orders")
            .agg(
                F.count("*").alias("line_cnt"),
                F.sum(
                    (
                        F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    ).cast("decimal(18,6)")
                )
                .cast("double")
                .alias("revenue"),
            )
        )
        dpp = "dynamicpruning" in plan_text(out).lower()
        return out.withColumn("dpp_in_plan", F.lit(dpp)).orderBy("month")


_register_partition_pruned()
