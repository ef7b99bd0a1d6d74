"""Export / import writers (SURVEY.md §2.B B9/B10).

The reference's EXPORT issues a server-side job and polls ``SHOW EXPORT``
every 5s (``src/export.go:22-80``); Spark writes are synchronous, so the
polling machinery disappears. What's kept:

- ``{db}/{table}`` URL templating (``cmd/export.go:80-98``)
- format + options passthrough
- the stream-load column-mapping hook (``src/gendata.go:164-183``): BITMAP
  columns load via ``bitmap_from_array(...)``, HLL via ``hll_hash(col)`` —
  here a set of expression transforms applied before the write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["render_url", "export_table", "import_mapping", "write_bucketed"]


def render_url(template: str, db: str, table: str) -> str:
    """'{db}'/'{table}' templating (reference cmd/export.go:80-98)."""
    return template.replace("{db}", db).replace("{table}", table)


def export_table(
    df: DataFrame,
    url: str,
    fmt: str = "parquet",
    db: str = "default",
    table: str = "t",
    options: dict | None = None,
    partition_by: list[str] | None = None,
) -> str:
    """Synchronous export; returns the rendered target path."""
    path = render_url(url, db, table)
    w = df.write.mode("overwrite")
    for k, v in (options or {}).items():
        w = w.option(k, v)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "csv":
        w = w.option("sep", options.get("sep", "☆") if options else "☆").option(
            "nullValue", "\\N"
        )
    w.format(fmt).save(path)
    return path


def import_mapping(df: DataFrame, mappings: dict[str, str]) -> DataFrame:
    """Stream-load column transforms (reference src/gendata.go:164-183):
    each mapping is 'col' -> SQL expression over the incoming columns,
    e.g. bitmap_col -> 'array_distinct(bitmap_src)', hll_col ->
    'xxhash64(user_col)'."""
    out = df
    for col, expr in mappings.items():
        out = out.withColumn(col, F.expr(expr))
    return out


def drop_managed_table(spark, table_name: str) -> None:
    """DROP TABLE IF EXISTS + remove any orphan managed-table location —
    with the in-memory catalog a previous session's directory survives and
    blocks re-creation."""
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    jvm = spark._jvm
    loc = jvm.org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir") + "/" + table_name.split(".")[-1]
    )
    loc.getFileSystem(spark._jsc.hadoopConfiguration()).delete(loc, True)


def write_bucketed(
    df: DataFrame,
    table_name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Bucketed ``saveAsTable`` — the Spark analogue of Doris
    ``DISTRIBUTED BY HASH(col) BUCKETS n`` (reference DDL layout clause,
    SURVEY.md §1.3 / DorisParser.g4 distribution).

    Two tables bucketed on the same key with the same bucket count join
    and aggregate WITHOUT a shuffle — at 100 TB this turns the
    orders ⋈ lineitem fact-fact join from the dominant exchange into a
    local zip of co-located buckets (proved by tests/test_plans.py::
    test_bucketed_join_is_shuffle_free).
    """
    spark = df.sparkSession
    drop_managed_table(spark, table_name)
    # repartition on the bucket key BEFORE the bucketed write (r13):
    # Spark's writer otherwise emits up to ``buckets`` files from EVERY
    # input task (input_partitions x buckets small files at warehouse
    # scale — guide §6), and on a single-split local input the whole
    # sort+write ran in ONE task (r13 trace: 1.9-2.5s serial for the
    # lineitem layout). repartition(buckets, key) uses the same
    # murmur3-pmod placement as the bucket-id function, so each task
    # holds exactly one bucket -> one file per bucket, written in
    # parallel.
    df = df.repartition(buckets, *[F.col(c) for c in bucket_cols])
    w = df.write.mode("overwrite").format(fmt).bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table_name)
