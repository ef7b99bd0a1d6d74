"""Test-table catalog: load the driver's parquet tables as DataFrames/views.

Tables (TESTDATA.md): region nation customer supplier part orders lineitem
events documents embeddings — one parquet per table under an ``sf`` dir.

``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark
cannot read natively ([PARQUET_TYPE_ILLEGAL]). We scan it as int64 via the
``nanosAsLong`` legacy conf and truncate to microseconds — byte-identical to
what DuckDB's implicit TIMESTAMP_NS -> TIMESTAMP coercion produces, so the
oracle comparison sees the same values. The conversion happens executor-side
in the scan projection (no driver materialization) and survives 100 TB: it
is a single codegen'd projection on top of the parquet scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["TABLES", "load_table", "register_views", "table_path"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

_NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one test table; normalizes the events nanos timestamp."""
    path = table_path(sf_dir, name)
    if name != "events":
        return spark.read.parquet(path)

    prev = spark.conf.get(_NANOS_CONF, None)
    spark.conf.set(_NANOS_CONF, "true")
    try:
        df = spark.read.parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(_NANOS_CONF)
        else:
            spark.conf.set(_NANOS_CONF, prev)
    if dict(df.dtypes).get("ts") == "bigint":
        # integer div (not /) — float division loses precision on epoch-nanos
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register temp views so queries can run through spark.sql."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
