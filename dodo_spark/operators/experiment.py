"""Experiment analysis: CUPED variance-reduced A/B readout.

CUPED (Controlled-experiment Using Pre-Experiment Data, Deng et al.
WSDM'13) is the standard variance-reduction technique of every large
experimentation platform: adjust each unit's experiment-period metric Y
by its pre-period metric X,

    Y_adj = Y − θ·(X − mean(X)),   θ = cov(X, Y) / var(X),

which leaves the treatment-effect estimate unbiased (X predates the
assignment) while shrinking variance by the squared correlation ρ².

Execution shape: one scan → per-user conditional cents aggregate → one
tiny moments aggregate (n, Σx, Σy, Σx², Σy², Σxy in exact DECIMAL) →
1-row broadcasts assembling the 2-variant report. At 100 TB the only
data-sized stage is the per-user aggregate — everything after is
sketch-sized, and the moment sums are algebraic (map-side partials).

Cross-engine exactness follows the stats_ttest discipline: metrics
quantize to integer cents (round(x·100) per event), moments accumulate
as exact integers in DECIMAL(38,0), the scale-0 decimal→double cast is
correctly rounded in both engines, and θ / ρ² / adjusted means are then
ONE shared double expression tree (+,-,*,/ only — no libm), so the
statistics hash bit-identical with no tolerance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _register_cuped() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "events_cuped",
        oracle="""
        WITH per_user AS (
          SELECT user_id, CAST(user_id % 2 AS BIGINT) AS variant,
                 COALESCE(SUM(CASE WHEN event_id % 2 = 0 THEN
                   CAST(round(value * 100) AS BIGINT) END), 0) AS xc,
                 COALESCE(SUM(CASE WHEN event_id % 2 = 1 THEN
                   CAST(round(value * 100) AS BIGINT) END), 0) AS yc
          FROM events GROUP BY user_id
        ), g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(xc AS DECIMAL(19,0))
                        * CAST(xc AS DECIMAL(19,0))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(yc AS DECIMAL(19,0))
                        * CAST(yc AS DECIMAL(19,0))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(xc AS DECIMAL(19,0))
                        * CAST(yc AS DECIMAL(19,0))) AS DOUBLE) AS sxy
          FROM per_user
        ), v AS (
          SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CAST(xc AS DECIMAL(38,0))) AS DOUBLE) AS sxv,
                 CAST(SUM(CAST(yc AS DECIMAL(38,0))) AS DOUBLE) AS syv
          FROM per_user GROUP BY variant
        )
        SELECT variant, n_users,
               sxv / n_users / 100 AS mean_pre,
               syv / n_users / 100 AS mean_post,
               syv / n_users / 100
                 - ((n * sxy - sx * sy) / (n * sxx - sx * sx))
                   * (sxv / n_users / 100 - sx / n / 100)
                 AS adjusted_post,
               (n * sxy - sx * sy) / (n * sxx - sx * sx) AS theta,
               ((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS rho2
        FROM v, g ORDER BY variant
        """,
        doc="CUPED variance-reduced A/B readout (Deng et al. WSDM'13, "
        "the experimentation-platform standard): per-user pre/post "
        "metrics (even/odd event ids — pre-period behavior predicts "
        "post-period spend through the shared user), pooled "
        "theta = cov/var from exact DECIMAL moments, adjusted per-"
        "variant means, and the theoretical variance reduction rho^2. "
        "Integer-cents quantization + a shared double expression tree "
        "make every statistic bit-identical cross-engine (the "
        "stats_ttest discipline). One data-sized aggregate; the rest "
        "is 1-row broadcasts.",
    )
    def events_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ev = load_table(spark, sf_dir, "events")
        cents = F.round(F.col("value") * 100).cast("bigint")
        per_user = ev.groupBy("user_id").agg(
            F.coalesce(
                F.sum(F.when(F.col("event_id") % 2 == 0, cents)), F.lit(0)
            ).alias("xc"),
            F.coalesce(
                F.sum(F.when(F.col("event_id") % 2 == 1, cents)), F.lit(0)
            ).alias("yc"),
        ).withColumn("variant", (F.col("user_id") % 2).cast("bigint"))

        def d19(c):
            return F.col(c).cast("decimal(19,0)")

        g = per_user.agg(
            F.count("*").alias("n"),
            F.sum(F.col("xc").cast("decimal(38,0)")).cast("double").alias("sx"),
            F.sum(F.col("yc").cast("decimal(38,0)")).cast("double").alias("sy"),
            F.sum(d19("xc") * d19("xc")).cast("double").alias("sxx"),
            F.sum(d19("yc") * d19("yc")).cast("double").alias("syy"),
            F.sum(d19("xc") * d19("yc")).cast("double").alias("sxy"),
        )
        v = per_user.groupBy("variant").agg(
            F.count("*").alias("n_users"),
            F.sum(F.col("xc").cast("decimal(38,0)")).cast("double").alias("sxv"),
            F.sum(F.col("yc").cast("decimal(38,0)")).cast("double").alias("syv"),
        )
        covn = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
        varxn = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
        varyn = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
        theta = covn / varxn
        mean_pre = F.col("sxv") / F.col("n_users") / 100
        mean_post = F.col("syv") / F.col("n_users") / 100
        mean_x_all = F.col("sx") / F.col("n") / 100
        return (
            v.crossJoin(F.broadcast(g))
            .select(
                "variant",
                "n_users",
                mean_pre.alias("mean_pre"),
                mean_post.alias("mean_post"),
                (mean_post - theta * (mean_pre - mean_x_all)).alias(
                    "adjusted_post"
                ),
                theta.alias("theta"),
                ((covn * covn) / (varxn * varyn)).alias("rho2"),
            )
            .orderBy("variant")
        )


_register_cuped()
