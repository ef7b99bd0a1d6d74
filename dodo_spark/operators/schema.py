"""Schema dump + export round-trip verify keys (SURVEY.md §2.B B1/B10).

B1: the reference walks databases with SHOW TABLES / SHOW CREATE TABLE
(``src/db.go:124-208``); the Spark-native equivalent enumerates the
catalog and emits one row per column — the same information content as the
dumped DDL files, queryable as a DataFrame.

B10: EXPORT writes a table to files; round-trip = write + read-back +
content-hash equality, which is what the reference's replay/diff would
check after an export/import cycle.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import TABLES, load_table
from dodo_spark.functions.hashing import result_hash, sql_result_hash, sql_row_md5
from dodo_spark.registry import register
from dodo_spark.sources.writers import export_table

_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), ".scratch")

# stale per-invocation scratch dirs older than this are garbage-collected
# at the next allocation of the same prefix — but ONLY if their creating
# process is gone (pid marker), so a long bench/verify run can never lose a
# lazily-readable dir to a sibling session's reaper
_SCRATCH_TTL_S = 6 * 3600


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    except OSError:
        return False
    return True


def scratch_dir(name: str) -> str:
    """Unique per-invocation scratch directory ``{name}-{uuid}``.

    Fixed shared paths race when two sessions run the same key
    concurrently (bench + verify): one rmtree's the directory the other
    is lazily reading. A unique suffix isolates every invocation; the
    returned DataFrames stay lazily readable until the caller's action
    completes. Siblings of the same prefix are best-effort reaped here so
    the scratch area stays bounded — only past the TTL AND only when the
    ``.pid`` marker written at allocation names a process that no longer
    exists (a live marker means the dir may still be lazily read, however
    old it is)."""
    import time
    import uuid

    os.makedirs(_SCRATCH, exist_ok=True)
    now = time.time()
    for entry in os.listdir(_SCRATCH):
        if not entry.startswith(name + "-") or entry.endswith(".pid"):
            continue
        p = os.path.join(_SCRATCH, entry)
        try:
            if now - os.path.getmtime(p) <= _SCRATCH_TTL_S:
                continue
            pid = None
            try:
                with open(p + ".pid") as f:
                    pid = int(f.read().strip())
            except (OSError, ValueError):
                pid = None
            if pid is not None and _pid_alive(pid):
                continue
            shutil.rmtree(p, ignore_errors=True)
            try:
                os.unlink(p + ".pid")
            except OSError:
                pass
        except OSError:
            pass
    path = os.path.join(_SCRATCH, f"{name}-{uuid.uuid4().hex[:12]}")
    try:
        with open(path + ".pid", "w") as f:
            f.write(str(os.getpid()))
    except OSError:
        pass
    return path


_TABLE_LIST = ", ".join(f"'{t}'" for t in TABLES)


@register(
    "schema_dump",
    oracle=f"""
    SELECT table_name,
           CAST(ordinal_position - 1 AS INTEGER) AS ordinal,
           column_name,
           CASE data_type
             WHEN 'BIGINT' THEN 'bigint'
             WHEN 'INTEGER' THEN 'int'
             WHEN 'DOUBLE' THEN 'double'
             WHEN 'FLOAT' THEN 'float'
             WHEN 'VARCHAR' THEN 'string'
             WHEN 'TIMESTAMP' THEN 'timestamp'
             WHEN 'TIMESTAMP_NS' THEN 'timestamp'
             WHEN 'DATE' THEN 'date'
             WHEN 'FLOAT[]' THEN 'array<float>'
             ELSE lower(data_type)
           END AS data_type,
           CAST(is_nullable = 'YES' AS BOOLEAN) AS nullable
    FROM information_schema.columns
    WHERE table_name IN ({_TABLE_LIST})
    """,
    doc="B1: schema dump — one row per (table, ordinal, column, type, "
    "nullable) across the whole catalog (reference src/db.go:124-208, "
    "cmd/dump.go:236-346), oracle-checked against DuckDB's "
    "information_schema with a normalized type-spelling map "
    "(timestamp_ntz/timestamp collapse — DuckDB has no ntz distinction).",
)
def schema_dump(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = []
    for t in TABLES:
        df = load_table(spark, sf_dir, t)
        for i, f in enumerate(df.schema.fields):
            spelling = f.dataType.simpleString().replace("timestamp_ntz", "timestamp")
            rows.append((t, i, f.name, spelling, f.nullable))
    return spark.createDataFrame(
        rows, "table_name STRING, ordinal INT, column_name STRING, data_type STRING, nullable BOOLEAN"
    )


@register(
    "export_roundtrip",
    oracle=f"""
    WITH r AS (
      SELECT {sql_row_md5(["n_nationkey", "n_name", "n_regionkey"])} AS h
      FROM nation
    ), base AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS rows, {sql_result_hash("h")} AS content_hash
      FROM r
    )
    SELECT s.sink, base.rows, base.content_hash, TRUE AS matches_source
    FROM base, (VALUES ('source'), ('parquet'), ('csv')) AS s(sink)
    """,
    doc="B10: export to parquet and ☆-separated CSV, read back, compare "
    "row counts and order-insensitive content hashes (reference "
    "src/export.go:22-80; CSV dialect src/gendata.go:16-19). Oracle "
    "recomputes the source content hash independently and asserts all "
    "three sinks carry it — a failed roundtrip surfaces as matches_source "
    "= false and hash-mismatches.",
)
def export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation")
    cols = ["n_nationkey", "n_name", "n_regionkey"]
    base = scratch_dir("export_roundtrip")

    p_path = export_table(nat, base + "/{db}/{table}_parquet", db="test", table="nation")
    c_path = export_table(
        nat, base + "/{db}/{table}_csv", fmt="csv", db="test", table="nation",
        options={"header": "true"},
    )
    pq = spark.read.parquet(p_path)
    cs = spark.read.option("header", "true").option("sep", "☆").option("nullValue", "\\N").csv(c_path)

    def sig(df: DataFrame) -> DataFrame:
        casted = [F.col(c).cast("string").alias(c) for c in cols]
        return df.select(*casted).agg(
            F.count("*").alias("rows"), result_hash(*cols).alias("h")
        )

    a, b, c = sig(nat).first(), sig(pq).first(), sig(cs).first()
    out = spark.createDataFrame(
        [
            ("source", a["rows"], a["h"], True),
            ("parquet", b["rows"], b["h"], b["h"] == a["h"] and b["rows"] == a["rows"]),
            ("csv", c["rows"], c["h"], c["h"] == a["h"] and c["rows"] == a["rows"]),
        ],
        "sink STRING, rows BIGINT, content_hash BIGINT, matches_source BOOLEAN",
    )
    return out


@register(
    "import_mapping_roundtrip",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS customers,
           CAST(SUM(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT)
             AS acct_cents,
           MIN(upper(c_name)) AS first_name_upper
    FROM customer
    GROUP BY c_nationkey
    """,
    doc="B9: import path end-to-end — export customers to ☆-separated "
    "'\\\\N'-null CSV (the reference's stream-load dialect, "
    "src/gendata.go:16-19), read back through the import reader, apply "
    "import_mapping column transforms (the bitmap_from_array/hll_hash "
    "hook, src/gendata.go:164-183), aggregate. The oracle computes the "
    "same aggregates from the source table directly, so any loss in the "
    "CSV round-trip or the mapping surfaces as a hash mismatch.",
)
def import_mapping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dodo_spark.sources.writers import import_mapping

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_nationkey"
    )
    base = scratch_dir("import_roundtrip")
    path = export_table(
        cust, base + "/{db}/{table}", fmt="csv", db="test", table="customer",
        options={"header": "true"},
    )
    raw = (
        spark.read.option("header", "true").option("sep", "☆").option("nullValue", "\\N")
        .csv(path)
    )
    mapped = import_mapping(
        raw,
        {
            "c_nationkey": "CAST(c_nationkey AS BIGINT)",
            "acct_cents": "CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)",
            "name_upper": "upper(c_name)",
        },
    )
    return mapped.groupBy("c_nationkey").agg(
        F.count("*").alias("customers"),
        F.sum("acct_cents").alias("acct_cents"),
        F.min("name_upper").alias("first_name_upper"),
    )
