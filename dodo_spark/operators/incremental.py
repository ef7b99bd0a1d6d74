"""Incremental JOIN-view maintenance over the versioned commit log.

``materialized_agg_refresh`` (sources/versioned.py) maintains a
single-table aggregate from the CDC feed; this module extends the same
retraction algebra to a TWO-TABLE join view — the classic delta-join
rule of incremental view maintenance (DBSP/Differential-Dataflow
lineage, and the Delta Live Tables / Materialize use case):

    V = γ(O ⋈ C)          (fact orders ⋈ dim customers, aggregated)

Commits are consumed one at a time in commit order, so each delta joins
the OTHER table at its then-current version and the cross term ΔO ⋈ ΔC
never arises (it only appears when two simultaneous deltas are batched):

    ΔV(ΔO) = γ±(ΔO ⋈ C@current)    — fact delta, dim broadcast: cheap
    ΔV(ΔC) = γ±(O@current ⋈ ΔC)    — dim delta, fact probe

Removed rows enter with negated multiplicity (γ± = signed aggregate);
a rewriting commit's unchanged rows appear on both sides and net to
zero, so file-level CDC needs no row diffing. At 100 TB the fact-delta
path costs |ΔO| + a broadcast of the dim; the dim-delta path is the
expensive direction by nature — its probe of the fact is what the
fact's key-bucketed layout and footer-stats skipping bound (the same
machinery merge_upsert uses), and it still beats the full-view
recompute whenever |ΔC| ≪ |C|. State is exact DECIMAL, so the
maintained view is bit-identical to the from-scratch oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["signed_join_delta", "merge_view_state"]


def signed_join_delta(
    delta: DataFrame,
    other: DataFrame,
    on: str,
    group_key: str,
    value_col: str,
    sign: int,
) -> DataFrame:
    """γ±(delta ⋈ other): per ``group_key``, signed (count, DECIMAL-sum
    of ``value_col``) contribution of the joined delta rows."""
    j = delta.join(other, on, "inner")
    # the per-row values quantize at (18,4); the SUM must carry the full
    # widened precision — narrowing a sum back to (18,4) silently nulls
    # past 10^14 under non-ANSI overflow while the oracle stays exact
    return j.groupBy(group_key).agg(
        (F.lit(sign) * F.count("*")).cast("bigint").alias("cnt"),
        (F.lit(sign) * F.sum(F.col(value_col).cast("decimal(18,4)")))
        .cast("decimal(38,4)")
        .alias("total"),
    )


def merge_view_state(
    state: DataFrame | None, deltas: list[DataFrame], group_key: str
) -> DataFrame:
    """Fold signed deltas into the keyed view state; groups whose count
    reaches zero leave the view (exact retraction, no tombstones)."""
    parts = ([state] if state is not None else []) + deltas
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p)
    return (
        merged.groupBy(group_key)
        .agg(
            F.sum("cnt").cast("bigint").alias("cnt"),
            F.sum("total").cast("decimal(38,4)").alias("total"),
        )
        .filter(F.col("cnt") > 0)
    )


# ---------------------------------------------------------------------------
# verify key
# ---------------------------------------------------------------------------
def _register_materialized_join_refresh() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.operators.schema import scratch_dir
    from dodo_spark.registry import register
    from dodo_spark.sources.versioned import (
        _join,
        append_version,
        delete_where,
        merge_upsert,
        read_changes,
        read_version,
        write_version,
    )

    @register(
        "materialized_join_refresh",
        oracle="""
        WITH o_final AS (
          SELECT o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1800
            AND NOT (o_orderkey >= 1200 AND o_orderkey % 10 = 7)
        ), c_final AS (
          SELECT c_custkey,
                 CASE WHEN c_custkey % 13 = 3 THEN (c_nationkey + 1) % 25
                      ELSE c_nationkey END AS c_nationkey
          FROM customer
        )
        SELECT CAST(c.c_nationkey AS BIGINT) AS nation,
               CAST(COUNT(*) AS BIGINT) AS orders_cnt,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total,
               TRUE AS retraction_netted
        FROM o_final o JOIN c_final c ON o.o_custkey = c.c_custkey
        GROUP BY 1 ORDER BY 1
        """,
        doc="Incremental JOIN-view maintenance from the CDC feed (the "
        "delta-join rule of incremental view maintenance): a per-nation "
        "(count, DECIMAL-sum) view over orders ⋈ customers is built at "
        "v0 and then maintained through an orders APPEND, a customers "
        "MERGE that MOVES customers to another nation (the retraction "
        "path: old-nation rows leave with −1, new-nation rows enter "
        "with +1), and an orders row-level DELETE — each refresh reads "
        "only the commit's own files and joins them against the other "
        "table's then-current version, never recomputing the view. "
        "retraction_netted asserts the merge's CDC actually produced a "
        "remove side and the moved customers changed buckets. The "
        "oracle recomputes the final view from scratch, so a dropped "
        "retraction, a double-counted rewrite, or a stale-version join "
        "all hash-mismatch.",
    )
    def materialized_join_refresh(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        root = scratch_dir("materialized_join_refresh")
        o_tbl, c_tbl = _join(root, "o"), _join(root, "c")
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        cust = load_table(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        )
        k = F.col("o_orderkey")

        write_version(orders.filter(k < 1200), o_tbl, 0)
        write_version(cust, c_tbl, 0)

        # initial view state from v0 ⋈ v0
        nation = (F.col("c_nationkey")).cast("bigint").alias("nation")
        # per-refresh state is one row per nation (bounded, tiny): an
        # EAGER localCheckpoint materializes it once per step and
        # truncates lineage — the incremental-maintenance property (each
        # refresh reads materialized state + the commit's own delta,
        # never recomputing) is preserved, without the parquet
        # write + committer + read-back round-trip the old
        # state-as-scratch-parquet form paid per step (r13: ~0.3s/step
        # of pure commit overhead on a 25-row frame; the VERSIONED
        # commits, which are the demonstration, are untouched).
        # Fault-tolerance caveat (r13 advisor): localCheckpoint blocks
        # live in executor storage with truncated lineage, so on a real
        # cluster an executor loss makes mid-refresh state unrecoverable
        # (the old parquet form survived); local-mode safe — at
        # warehouse scale keep refresh state in a reliable checkpoint or
        # a table-backed state store.
        state = signed_join_delta(
            read_version(spark, o_tbl, 0).withColumnRenamed(
                "o_custkey", "c_custkey"
            ),
            read_version(spark, c_tbl, 0).select("c_custkey", nation),
            "c_custkey",
            "nation",
            "o_totalprice",
            1,
        ).localCheckpoint()

        def refresh(deltas: list[DataFrame], step: str) -> None:
            nonlocal state
            state = merge_view_state(state, deltas, "nation").localCheckpoint()

        # per refresh cycle the OTHER table's current version is read
        # once and shared by the +1/−1 deltas; measured at sf0.1, an
        # EAGER localCheckpoint of that read costs more than the lazy
        # double-scan it saves (the version slices are small), so the
        # shared frame stays lazy — the bench floor here is the commit
        # I/O of 4 versioned commits + state persistence, not the scans
        def o_delta(df: DataFrame, dim: DataFrame, sign: int) -> DataFrame:
            return signed_join_delta(
                df.withColumnRenamed("o_custkey", "c_custkey"),
                F.broadcast(dim),
                "c_custkey",
                "nation",
                "o_totalprice",
                sign,
            )

        def c_delta(df: DataFrame, fact: DataFrame, sign: int) -> DataFrame:
            return signed_join_delta(
                F.broadcast(df.select("c_custkey", nation)),
                fact,
                "c_custkey",
                "nation",
                "o_totalprice",
                sign,
            )

        # commit 1: orders append — fact delta ⋈ dim@v0 (broadcast dim)
        append_version(orders.filter((k >= 1200) & (k < 1800)), o_tbl, 1)
        added, removed = read_changes(spark, o_tbl, 1)
        dim_v0 = read_version(spark, c_tbl, 0).select("c_custkey", nation)
        deltas = [o_delta(added, dim_v0, 1)]
        if removed is not None:  # append commits remove nothing
            deltas.append(o_delta(removed, dim_v0, -1))
        refresh(deltas, "o1")

        # commit 2: customers merge moving c_custkey % 13 = 3 to the next
        # nation — dim delta ⋈ fact@v1, retraction on the old nation
        moved = cust.filter(F.col("c_custkey") % 13 == 3).withColumn(
            "c_nationkey", (F.col("c_nationkey") + 1) % 25
        )
        merge_upsert(spark, c_tbl, 1, moved, "c_custkey")
        c_added, c_removed = read_changes(spark, c_tbl, 1)
        retraction_netted = c_removed is not None and moved.count() > 0
        fact_v1 = read_version(spark, o_tbl, 1).withColumnRenamed(
            "o_custkey", "c_custkey"
        )
        deltas = []
        if c_added is not None:
            deltas.append(c_delta(c_added, fact_v1, 1))
        if c_removed is not None:  # a no-file-touched merge removes nothing
            deltas.append(c_delta(c_removed, fact_v1, -1))
        refresh(deltas, "c1")

        # commit 3: orders row-level delete — signed rewrite ⋈ dim@v1
        delete_where(
            spark, o_tbl, 2, "o_orderkey >= 1200 AND o_orderkey % 10 = 7"
        )
        d_added, d_removed = read_changes(spark, o_tbl, 2)
        dim_v1 = read_version(spark, c_tbl, 1).select("c_custkey", nation)
        deltas = []
        if d_added is not None:  # rewritten survivors re-enter with +1
            deltas.append(o_delta(d_added, dim_v1, 1))
        if d_removed is not None:  # no-match delete removes nothing
            deltas.append(o_delta(d_removed, dim_v1, -1))
        refresh(deltas, "o2")

        return (
            state
            .select(
                "nation",
                F.col("cnt").alias("orders_cnt"),
                F.col("total").cast("double").alias("total"),
                F.lit(retraction_netted).alias("retraction_netted"),
            )
            .orderBy("nation")
        )


_register_materialized_join_refresh()
