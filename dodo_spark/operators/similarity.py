"""Similarity search over the ``embeddings`` table (SURVEY.md §2.D, D7).

Two paths:
- ``similarity_topk``: brute-force cosine top-k — the exact baseline,
  oracle-checked. Queries are a small broadcast side; candidates stream.
- ``similarity_lsh``: random-hyperplane LSH bucketing — the scale path.
  Buckets are md5-derived (deterministic, no RNG state), so the plan is
  reproducible; rows-only check because recall is by construction partial.

At 100 TB the brute-force form is still the right *kernel* (a broadcast
join + per-row fold, no shuffle of the big side); LSH/IVF only narrows the
candidate set per bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dodo_spark.catalog import load_table
from dodo_spark.functions.vectors import cosine, scaled_vec, sql_cosine, sql_scaled_vec
from dodo_spark.registry import register

TOP_K = 10
N_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "similarity_topk",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, {sql_scaled_vec("embedding")} AS sv FROM embeddings
    ), q AS (
      SELECT vec_id AS query_id, sv AS qv FROM v WHERE vec_id < {N_QUERIES}
    ), scored AS (
      SELECT q.query_id, v.vec_id AS neighbor_id,
             {sql_cosine("q.qv", "v.sv")} AS cos_sim
      FROM q JOIN v ON v.vec_id != q.query_id
    )
    SELECT query_id, neighbor_id, cos_sim, CAST(rnk AS BIGINT) AS rnk
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                                   ORDER BY cos_sim DESC, neighbor_id) AS rnk
      FROM scored
    ) WHERE rnk <= {TOP_K}
    """,
    doc="D7: brute-force cosine top-k (k=10, 5 query vectors). The query "
    "side broadcasts; scoring is a scan-side fold; WindowGroupLimit keeps "
    "a bounded per-partition heap for the top-k.",
)
def similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))
    q = (
        v.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("sv").alias("qv"))
    )
    scored = (
        F.broadcast(q)
        .join(v, v.vec_id != q.query_id)
        .select("query_id", F.col("vec_id").alias("neighbor_id"), cosine(F.col("qv"), F.col("sv")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
    )


N_PLANES = 8


@register(
    "similarity_lsh",
    oracle=None,
    doc="D7 scale path: random-hyperplane LSH. Hyperplane components are "
    "md5-derived pseudo-randoms (deterministic, seedless infrastructure), "
    "sign bits form an 8-bit bucket; top-k runs only within the query's "
    "bucket. Rows-only: recall is intentionally partial vs the exact oracle.",
)
def similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select("vec_id", scaled_vec("embedding").alias("sv"))

    # plane j, dim i component: md5-derived integer in [-1000, 1000]
    def plane(j: int):
        return F.transform(
            F.sequence(F.lit(0), F.size("sv") - 1),
            lambda i: (
                F.conv(F.substring(F.md5(F.concat(F.lit(f"{j}:"), i.cast("string"))), 1, 6), 16, 10)
                .cast("bigint")
                % 2001
                - 1000
            ),
        )

    def bucket_bit(j: int):
        dot = F.aggregate(
            F.zip_with(F.col("sv"), plane(j), lambda x, p: x * p),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        )
        return (dot > 0).cast("bigint") * (1 << j)

    bucket = sum([bucket_bit(j) for j in range(N_PLANES)], start=F.lit(0).cast("bigint"))
    bucketed = v.withColumn("bucket", bucket)
    q = bucketed.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sv").alias("qv"), F.col("bucket").alias("qb")
    )
    scored = (
        F.broadcast(q)
        .join(bucketed, (bucketed.bucket == F.col("qb")) & (bucketed.vec_id != F.col("query_id")))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cosine(F.col("qv"), F.col("sv")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
    )
