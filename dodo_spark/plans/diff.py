"""Replay diff (SURVEY.md §2.B B13; reference ``cmd/diff.go:229-340``).

Aligns two replay-result sets by query_id with a full outer join and
classifies each pair: missing on either side, error mismatch, rowcount
mismatch, hash mismatch, duration regression beyond a threshold (default
100ms, reference ``cmd/diff.go:78``). The reference streams two sorted
files; the join form is the distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.functions.hashing import result_hash, sql_result_hash, sql_row_md5
from dodo_spark.registry import register

MIN_DURATION_DIFF_MS = 100  # reference cmd/diff.go:78


def diff_results(a: DataFrame, b: DataFrame, min_duration_diff_ms: int = MIN_DURATION_DIFF_MS) -> DataFrame:
    """Full-outer diff of two ReplayResult DataFrames on query_id."""
    an = a.select(
        F.col("query_id"),
        F.col("err").alias("err_a"),
        F.col("return_rows").alias("rows_a"),
        F.col("return_rows_hash").alias("hash_a"),
        F.col("duration_ms").alias("dur_a"),
    )
    bn = b.select(
        F.col("query_id"),
        F.col("err").alias("err_b"),
        F.col("return_rows").alias("rows_b"),
        F.col("return_rows_hash").alias("hash_b"),
        F.col("duration_ms").alias("dur_b"),
    )
    j = an.join(bn, "query_id", "full")
    status = (
        F.when(F.col("rows_a").isNull(), "missing_left")
        .when(F.col("rows_b").isNull(), "missing_right")
        .when(
            F.coalesce("err_a", F.lit("")) != F.coalesce("err_b", F.lit("")), "error_mismatch"
        )
        .when(F.col("rows_a") != F.col("rows_b"), "rowcount_mismatch")
        .when(
            F.coalesce("hash_a", F.lit(-1)) != F.coalesce("hash_b", F.lit(-1)), "hash_mismatch"
        )
        .when(
            (F.col("dur_b") - F.col("dur_a")) > min_duration_diff_ms, "duration_regression"
        )
        .otherwise("ok")
    )
    return j.select("query_id", status.alias("status"), "rows_a", "rows_b", "hash_a", "hash_b", "dur_a", "dur_b")


# --------------------------------------------------------------------------
# verify key: deterministic synthetic result sets with planted differences
# --------------------------------------------------------------------------
def _result_set(spark: SparkSession, sf_dir: str, side: str) -> DataFrame:
    """Per-orderkey-bucket 'replay results' derived from orders. Side 'b'
    plants differences: bucket 3 loses rows (rowcount), bucket 5 flips a
    hash input (hash), bucket 7 errors, bucket 9 runs 500ms slower."""
    o = load_table(spark, sf_dir, "orders")
    bucket = (F.col("o_orderkey") % 12).alias("bucket")
    base = o.select(bucket, "o_orderkey", "o_orderstatus", "o_totalprice")
    if side == "b":
        base = base.filter(~((F.col("bucket") == 3) & (F.col("o_orderkey") % 5 == 0)))
        base = base.withColumn(
            "o_orderstatus",
            F.when(F.col("bucket") == 5, F.lit("XX")).otherwise(F.col("o_orderstatus")),
        )
    hashed = base.groupBy("bucket").agg(
        F.count("*").alias("return_rows"),
        result_hash("o_orderkey", "o_orderstatus").alias("return_rows_hash"),
    )
    err = F.when((F.lit(side) == "b") & (F.col("bucket") == 7), F.lit("boom")).otherwise(
        F.lit(None).cast("string")
    )
    dur = F.when((F.lit(side) == "b") & (F.col("bucket") == 9), 800).otherwise(F.lit(100))
    return hashed.select(
        F.concat(F.lit("q"), F.col("bucket").cast("string")).alias("query_id"),
        err.alias("err"),
        "return_rows",
        "return_rows_hash",
        dur.cast("bigint").alias("duration_ms"),
    )


_ORACLE_SIDE = """
  SELECT 'q' || CAST(bucket AS VARCHAR) AS query_id,
         CASE WHEN {side_b} AND bucket = 7 THEN 'boom' END AS err,
         CAST(COUNT(*) AS BIGINT) AS return_rows,
         {rhash} AS return_rows_hash,
         CAST(CASE WHEN {side_b} AND bucket = 9 THEN 800 ELSE 100 END AS BIGINT) AS duration_ms
  FROM (
    SELECT o_orderkey % 12 AS bucket, o_orderkey,
           CASE WHEN {side_b} AND o_orderkey % 12 = 5 THEN 'XX' ELSE o_orderstatus END AS o_orderstatus
    FROM orders
    WHERE NOT ({side_b} AND o_orderkey % 12 = 3 AND o_orderkey % 5 = 0)
  ), LATERAL (SELECT {rowmd5} AS h) _l
  GROUP BY bucket
"""


def _oracle_side(side_b: str) -> str:
    return _ORACLE_SIDE.format(
        side_b=side_b,
        rowmd5=sql_row_md5(["o_orderkey", "o_orderstatus"]),
        rhash=sql_result_hash("h"),
    )


@register(
    "replay_diff",
    oracle=f"""
    WITH a AS ({_oracle_side("FALSE")}),
         b AS ({_oracle_side("TRUE")})
    SELECT coalesce(a.query_id, b.query_id) AS query_id,
           CASE WHEN a.return_rows IS NULL THEN 'missing_left'
                WHEN b.return_rows IS NULL THEN 'missing_right'
                WHEN coalesce(a.err,'') != coalesce(b.err,'') THEN 'error_mismatch'
                WHEN a.return_rows != b.return_rows THEN 'rowcount_mismatch'
                WHEN coalesce(a.return_rows_hash,-1) != coalesce(b.return_rows_hash,-1) THEN 'hash_mismatch'
                WHEN b.duration_ms - a.duration_ms > {MIN_DURATION_DIFF_MS} THEN 'duration_regression'
                ELSE 'ok' END AS status,
           a.return_rows AS rows_a, b.return_rows AS rows_b,
           a.return_rows_hash AS hash_a, b.return_rows_hash AS hash_b,
           a.duration_ms AS dur_a, b.duration_ms AS dur_b
    FROM a FULL OUTER JOIN b ON a.query_id = b.query_id
    """,
    doc="B13: replay diff — full-outer alignment on query_id, "
    "err/rowcount/hash/duration classification (reference cmd/diff.go:229-340) "
    "over two synthetic result sets with planted regressions.",
)
def replay_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = _result_set(spark, sf_dir, "a").withColumnRenamed("return_rows", "return_rows").selectExpr(
        "query_id", "err", "return_rows", "return_rows_hash", "duration_ms"
    )
    b = _result_set(spark, sf_dir, "b")
    return diff_results(
        a.withColumnRenamed("return_rows", "return_rows"),
        b,
    ).select("query_id", "status", "rows_a", "rows_b", "hash_a", "hash_b", "dur_a", "dur_b")
