"""Mergeable distinct-count sketches with SET OPERATIONS: KMV / theta.

``agg_ndv_approx`` covers Spark's built-in HLL++; what HLL cannot do is
set algebra — a theta sketch (KMV, k minimum hash values) supports
UNION and INTERSECTION estimates across segment sketches, the
"distinct users in segment A ∩ segment B" question every audience /
reach system answers without re-scanning raw data (Apache DataSketches'
theta family; the reference's target engine exposes the same idea as
its HLL column type, ``dodo`` C12 from/HLL).

Sketch = the K smallest distinct 48-bit values of the shared md5 kernel
(``functions/hashing.py``) per segment. θ = Kth smallest (2^48 when the
segment is exhaustive, < K distinct). Estimates:

    NDV(seg)  = |{h < θ}| · 2^48 / θ          (= exact when exhaustive)
    UNION     = retained distinct sketch hashes < min(θ_i), same formula
    INTERSECT = |sketch_A ∩ sketch_B ∩ {h < θ}| · 2^48 / θ,
                θ = min(θ_A, θ_B)

Everything is exact int64 until ONE double multiply-divide at the end
(retained·2^48 is exactly representable; the division is correctly
rounded), so the DuckDB oracle reproduces the estimates bit-for-bit —
the error contract (rel err ≤ 25 %, ~4σ at K=256) is itself verified
cross-engine.

Scale: a segment sketch is ≤ K values regardless of input size, built
with one distinct + one per-segment top-K — partial aggregation does
the heavy lifting map-side, and merging sketches (union row) touches
only sketch rows, never the base table. 100 TB posture: sketch once,
answer set-algebra queries from K·|segments| longs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

K = 256
TWO48 = 1 << 48
SEG_A, SEG_B = "1-URGENT", "2-HIGH"
# difference estimates of SMALL true differences carry large RELATIVE
# error (σ ≈ √retained/θ against a small exact), so the error contract
# gets an absolute cushion on top of the 25% band — the estimate itself
# is still bit-identical cross-engine, the slack only keeps the
# contract TRUE at every scale
REL_ERR_SLACK = 64.0


def kmv_sketch(df: DataFrame, seg_col: str, elem_hash) -> DataFrame:
    """Per-segment KMV sketch rows ``(seg, h, rn)``: the K smallest
    distinct kernel hashes of the element, rank-stamped."""
    base = df.select(
        F.col(seg_col).alias("seg"), elem_hash.alias("h")
    ).distinct()
    w = Window.partitionBy("seg").orderBy("h")
    return base.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= K
    )


def sketch_stats(sk: DataFrame) -> DataFrame:
    """``(seg, n_in, theta)`` per segment; θ = 2^48 for exhaustive
    segments so one estimate formula covers both regimes."""
    return sk.groupBy("seg").agg(
        F.count("*").alias("n_in"),
        F.coalesce(
            F.max(F.when(F.col("rn") == K, F.col("h"))), F.lit(TWO48)
        ).alias("theta"),
    )


def _est(retained, theta):
    return (
        retained.cast("double") * F.lit(float(TWO48)) / theta.cast("double")
    )


def _register_kmv_theta() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.functions.hashing import row_hash_int, sql_row_md5, sql_hex_int
    from dodo_spark.registry import register

    hh = sql_row_md5(["o_custkey"])

    @register(
        "agg_kmv_theta",
        oracle=f"""
        WITH raw AS (
          SELECT o_orderpriority AS seg, {hh} AS hh FROM orders
        ), base AS (
          SELECT DISTINCT seg, {sql_hex_int('hh')} AS h FROM raw
        ), ranked AS (
          SELECT seg, h,
                 row_number() OVER (PARTITION BY seg ORDER BY h) AS rn
          FROM base
        ), sk AS (SELECT * FROM ranked WHERE rn <= {K}),
        segstats AS (
          SELECT seg, COUNT(*) AS n_in,
                 COALESCE(MAX(CASE WHEN rn = {K} THEN h END), {TWO48})
                   AS theta
          FROM sk GROUP BY seg
        ), seg_exact AS (
          SELECT o_orderpriority AS seg,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_ndv
          FROM orders GROUP BY 1
        ), seg_rows AS (
          SELECT s.seg AS part, 'segment' AS kind,
                 CAST(CASE WHEN n_in = {K} THEN {K - 1} ELSE n_in END
                   AS DOUBLE) * {TWO48}.0 / CAST(theta AS DOUBLE)
                   AS est_ndv,
                 e.exact_ndv
          FROM segstats s JOIN seg_exact e USING (seg)
        ), tu AS (SELECT MIN(theta) AS theta_u FROM segstats),
        u_ret AS (
          SELECT COUNT(*) AS ret
          FROM (SELECT DISTINCT h FROM sk) d, tu
          WHERE d.h < tu.theta_u
        ), u_exact AS (
          SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS exact_ndv
          FROM orders
        ), u_row AS (
          SELECT 'ALL' AS part, 'union' AS kind,
                 CAST(ret AS DOUBLE) * {TWO48}.0 / CAST(theta_u AS DOUBLE)
                   AS est_ndv,
                 exact_ndv
          FROM u_ret, tu, u_exact
        ), ti AS (
          SELECT MIN(theta) AS theta_i FROM segstats
          WHERE seg IN ('{SEG_A}', '{SEG_B}')
        ), i_ret AS (
          SELECT COUNT(*) AS ret
          FROM (SELECT h FROM sk WHERE seg = '{SEG_A}') a
          JOIN (SELECT h FROM sk WHERE seg = '{SEG_B}') b USING (h), ti
          WHERE h < ti.theta_i
        ), i_exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS exact_ndv FROM (
            SELECT o_custkey FROM orders
            WHERE o_orderpriority IN ('{SEG_A}', '{SEG_B}')
            GROUP BY 1 HAVING COUNT(DISTINCT o_orderpriority) = 2)
        ), i_row AS (
          SELECT 'URGENT&HIGH' AS part, 'intersect' AS kind,
                 CAST(ret AS DOUBLE) * {TWO48}.0 / CAST(theta_i AS DOUBLE)
                   AS est_ndv,
                 exact_ndv
          FROM i_ret, ti, i_exact
        ), d_ret AS (
          SELECT COUNT(*) AS ret
          FROM (SELECT h FROM sk WHERE seg = '{SEG_A}') a, ti
          WHERE a.h < ti.theta_i
            AND a.h NOT IN (SELECT h FROM sk WHERE seg = '{SEG_B}')
        ), d_exact AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS exact_ndv FROM (
            SELECT DISTINCT o_custkey FROM orders
            WHERE o_orderpriority = '{SEG_A}'
              AND o_custkey NOT IN (
                SELECT o_custkey FROM orders
                WHERE o_orderpriority = '{SEG_B}'))
        ), d_row AS (
          SELECT 'URGENT-HIGH' AS part, 'difference' AS kind,
                 CAST(ret AS DOUBLE) * {TWO48}.0 / CAST(theta_i AS DOUBLE)
                   AS est_ndv,
                 exact_ndv
          FROM d_ret, ti, d_exact
        )
        SELECT part, kind, est_ndv, exact_ndv,
               (ABS(est_ndv - exact_ndv)
                  <= 0.25 * exact_ndv + {REL_ERR_SLACK}) AS rel_err_ok
        FROM (SELECT * FROM seg_rows
              UNION ALL SELECT * FROM u_row
              UNION ALL SELECT * FROM i_row
              UNION ALL SELECT * FROM d_row)
        ORDER BY kind, part
        """,
        doc="KMV/theta distinct sketches with SET ALGEBRA (the Apache "
        "DataSketches theta family; complements C12 from/HLL): per "
        "order-priority sketches of the customer-key hash (K=256 "
        "smallest 48-bit kernel values), then UNION, INTERSECTION, and "
        "A-NOT-B DIFFERENCE estimates computed purely from sketch rows "
        "— the reach/overlap/churn questions HLL cannot answer. One double "
        "multiply-divide at the end of otherwise exact int64 math makes "
        "the estimates bit-identical on DuckDB, so the ≤25% error "
        "contract is itself cross-engine-verified, alongside exact NDVs "
        "per part.",
    )
    def agg_kmv_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        # sk feeds five consumers (union/intersect/difference retained
        # counts) — checkpoint once or the scan+window replays per use
        sk = kmv_sketch(
            orders, "o_orderpriority", row_hash_int("o_custkey")
        ).localCheckpoint(eager=True)
        stats = sketch_stats(sk).localCheckpoint(eager=True)
        # stats is one row PER SEGMENT (bounded by segment cardinality,
        # never by data volume — the whole point of a sketch report), so
        # the θ thresholds are driver-side mins over the checkpointed
        # rows instead of two scalar-aggregate subqueries that each cost
        # a job + a broadcast build + a crossJoin in the final plan
        # (r14: 28 jobs/run → see A/B in the commit). min() over the
        # same bigint values the old F.min computed — bit-identical; an
        # empty stats (hostile empty input) yields None, and a
        # NULL-literal θ flows through the < filter and the final
        # double division exactly as the old NULL-valued 1-row
        # broadcast did.
        stats_rows = stats.collect()
        _thetas = [r["theta"] for r in stats_rows]
        theta_u_val = min(_thetas) if _thetas else None
        _thetas_ab = [
            r["theta"] for r in stats_rows if r["seg"] in (SEG_A, SEG_B)
        ]
        theta_i_val = min(_thetas_ab) if _thetas_ab else None

        def _lit_theta(v):
            return F.lit(v).cast("bigint")

        # all four EXACT audit columns are set counts over the same
        # distinct (segment, custkey) pair set: materialize that pair
        # set once (one exchange) and derive the four aggregates from
        # the checkpoint, instead of four independent orders scans each
        # with its own distinct/groupBy machinery (identical sets ⇒
        # identical counts; the sketch side is untouched and still
        # dedups on the HASH exactly as the oracle does)
        pairs = (
            orders.select(
                F.col("o_orderpriority").alias("part"),
                F.col("o_custkey").alias("ck"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )

        retained = F.when(F.col("n_in") == K, F.lit(K - 1)).otherwise(
            F.col("n_in")
        )
        seg_rows = (
            stats.select(
                F.col("seg").alias("part"),
                F.lit("segment").alias("kind"),
                _est(retained, F.col("theta")).alias("est_ndv"),
            )
            .join(
                pairs.groupBy("part").agg(
                    F.count("*").alias("exact_ndv")
                ),
                "part",
            )
        )

        # retained counts use a GLOBAL aggregate (never groupBy(theta)):
        # a groupBy on empty input yields zero groups and the report row
        # vanishes, where the oracle's scalar COUNT(*) emits est=0
        u_ret = (
            sk.select("h")
            .distinct()
            .filter(F.col("h") < _lit_theta(theta_u_val))
            .agg(F.count("*").alias("ret"))
        )
        u_row = u_ret.crossJoin(
            F.broadcast(pairs.agg(F.countDistinct("ck").alias("exact_ndv")))
        ).select(
            F.lit("ALL").alias("part"),
            F.lit("union").alias("kind"),
            _est(F.col("ret"), _lit_theta(theta_u_val)).alias("est_ndv"),
            "exact_ndv",
        )

        i_ret = (
            sk.filter(F.col("seg") == SEG_A)
            .select("h")
            .join(sk.filter(F.col("seg") == SEG_B).select("h"), "h")
            .filter(F.col("h") < _lit_theta(theta_i_val))
            .agg(F.count("*").alias("ret"))
        )
        i_exact = (
            pairs.filter(F.col("part").isin(SEG_A, SEG_B))
            .groupBy("ck")
            .agg(F.count("*").alias("np"))
            .filter(F.col("np") == 2)
            .agg(F.count("*").alias("exact_ndv"))
        )
        i_row = i_ret.crossJoin(F.broadcast(i_exact)).select(
            F.lit("URGENT&HIGH").alias("part"),
            F.lit("intersect").alias("kind"),
            _est(F.col("ret"), _lit_theta(theta_i_val)).alias("est_ndv"),
            "exact_ndv",
        )

        # A NOT B: A's sketch hashes below θ that B's sketch lacks
        d_ret = (
            sk.filter(F.col("seg") == SEG_A)
            .select("h")
            .join(sk.filter(F.col("seg") == SEG_B).select("h"), "h", "anti")
            .filter(F.col("h") < _lit_theta(theta_i_val))
            .agg(F.count("*").alias("ret"))
        )
        d_exact = (
            pairs.filter(F.col("part") == SEG_A)
            .select("ck")
            .join(
                pairs.filter(F.col("part") == SEG_B).select("ck"),
                "ck",
                "anti",
            )
            .agg(F.count("*").alias("exact_ndv"))
        )
        d_row = d_ret.crossJoin(F.broadcast(d_exact)).select(
            F.lit("URGENT-HIGH").alias("part"),
            F.lit("difference").alias("kind"),
            _est(F.col("ret"), _lit_theta(theta_i_val)).alias("est_ndv"),
            "exact_ndv",
        )

        out = (
            seg_rows.unionByName(u_row)
            .unionByName(i_row)
            .unionByName(d_row)
        )
        return out.select(
            "part",
            "kind",
            "est_ndv",
            "exact_ndv",
            (
                F.abs(F.col("est_ndv") - F.col("exact_ndv"))
                <= 0.25 * F.col("exact_ndv") + REL_ERR_SLACK
            ).alias("rel_err_ok"),
        ).orderBy("kind", "part")


_register_kmv_theta()
