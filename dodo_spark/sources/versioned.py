"""Versioned parquet tables: `FOR VERSION AS OF` over plain parquet
(SURVEY.md §2.A A25; reference grammar ``tableSnapshot``
``DorisParser.g4:1754-1757``).

Delta/Iceberg are not available in this environment, so time travel is
built from the same primitive those formats use underneath: IMMUTABLE
snapshot directories plus a tiny commit manifest. Each version is a full
parquet snapshot under ``v=<n>/``; ``_versions.json`` is the commit log
(append-only, written last, so a torn write never exposes a half-visible
version — readers only see versions the manifest names). Reads are plain
``spark.read.parquet`` on one snapshot directory: every Catalyst
optimization (pushdown, pruning) applies unchanged, and no state is
shared between versions, so concurrent readers of different versions
never interfere.

At 100 TB you would use Delta/Iceberg proper (copy-on-write per file,
not per table); the API here is shaped so ``read_version`` swaps to
``spark.read.format("delta").option("versionAsOf", n)`` without touching
call sites.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_versions.json"


def write_version(df: DataFrame, table_path: str, version: int) -> str:
    """Commit ``df`` as snapshot ``version`` of the table at ``table_path``.

    Versions must be committed in increasing order; re-committing a version
    the MANIFEST names is an error (snapshots are immutable). A ``v=<n>/``
    directory that exists but is absent from the manifest is by definition
    an uncommitted torn write (crash between snapshot write and manifest
    commit) — it is overwritten, so a crashed commit never bricks its
    version number. The manifest itself is replaced atomically
    (tempfile + os.replace), so readers and a concurrent crash can never
    observe a half-written commit log."""
    import tempfile

    manifest_path = os.path.join(table_path, MANIFEST)
    versions: list[int] = []
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            versions = json.load(f)["versions"]
    if version in versions:
        raise ValueError(f"version {version} already committed at {table_path}")
    if versions and version < max(versions):
        raise ValueError(
            f"versions commit in increasing order: {version} < max {max(versions)}"
        )
    snap = os.path.join(table_path, f"v={version}")
    # overwrite: anything already at this path is an orphan of a torn commit
    # (the manifest — checked above — never named it)
    df.write.mode("overwrite").parquet(snap)
    # manifest written AFTER the snapshot: the commit point
    os.makedirs(table_path, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=table_path, prefix=MANIFEST, suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump({"versions": versions + [version]}, f)
        os.replace(tmp, manifest_path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return snap


def list_versions(table_path: str) -> list[int]:
    manifest_path = os.path.join(table_path, MANIFEST)
    if not os.path.exists(manifest_path):
        return []
    with open(manifest_path) as f:
        return list(json.load(f)["versions"])


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """``FOR VERSION AS OF version``; ``None`` reads the latest snapshot."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} at {table_path}")
    return spark.read.parquet(os.path.join(table_path, f"v={version}"))


# --------------------------------------------------------------------------
# verify key
# --------------------------------------------------------------------------
def _register_time_travel() -> None:
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "time_travel",
        oracle="""
        WITH v0 AS (
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders WHERE o_orderkey < 1000
        ), v1 AS (
          SELECT o_orderkey, o_custkey,
                 CASE WHEN o_orderkey < 500 THEN o_totalprice * 2
                      ELSE o_totalprice END AS o_totalprice
          FROM orders WHERE o_orderkey < 1000
          UNION ALL
          SELECT o_orderkey, o_custkey, o_totalprice
          FROM orders WHERE o_orderkey >= 1000 AND o_orderkey < 1200
        )
        SELECT CAST(0 AS BIGINT) AS version,
               CAST(COUNT(*) AS BIGINT) AS rows_at,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
        FROM v0
        UNION ALL
        SELECT CAST(1 AS BIGINT),
               CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
        FROM v1
        """,
        doc="A25: time travel FOR VERSION AS OF (reference tableSnapshot "
        "DorisParser.g4:1754-1757) over versioned parquet snapshots "
        "(sources/versioned.py — immutable v=<n>/ dirs + append-only "
        "manifest, the Delta/Iceberg primitive without the format "
        "dependency). v0 = bounded orders slice; v1 = v0 with an UPDATE "
        "(price doubled below key 500 — exact in binary FP) and an "
        "APPEND (keys 1000-1199). Both snapshots are read back via "
        "read_version and aggregated; the oracle recomputes each snapshot "
        "from the source table, so any version bleed (update visible in "
        "v0, append missing in v1) hash-mismatches.",
    )
    def time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        v0 = o.filter(k < 1000).select("o_orderkey", "o_custkey", "o_totalprice")
        updated = v0.withColumn(
            "o_totalprice",
            F.when(k < 500, F.col("o_totalprice") * 2).otherwise(F.col("o_totalprice")),
        )
        appended = o.filter((k >= 1000) & (k < 1200)).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        v1 = updated.unionByName(appended)

        table = scratch_dir("time_travel")
        write_version(v0, table, 0)
        write_version(v1, table, 1)

        def snap_agg(version: int) -> DataFrame:
            snap = read_version(spark, table, version)
            return snap.agg(
                F.lit(version).cast("bigint").alias("version"),
                F.count("*").alias("rows_at"),
                F.countDistinct("o_custkey").alias("custs"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total"),
            )

        return snap_agg(0).unionByName(snap_agg(1))


_register_time_travel()


def _register_time_travel_diff() -> None:
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "time_travel_diff",
        oracle="""
        WITH diff AS (
          SELECT o_orderkey,
                 CASE WHEN o_orderkey >= 1000 THEN 'insert'
                      WHEN o_orderkey < 500 THEN 'update'
                      ELSE 'unchanged' END AS change_type,
                 CASE WHEN o_orderkey >= 1000 OR o_orderkey < 500
                      THEN CAST(round(o_totalprice * 100) AS BIGINT)
                      ELSE 0 END AS delta_cents
          FROM orders WHERE o_orderkey < 1200
        )
        SELECT change_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(delta_cents) AS BIGINT) AS delta_cents
        FROM diff GROUP BY change_type ORDER BY change_type
        """,
        doc="Change-data-capture between table versions (the Delta CDF / "
        "Iceberg changelog primitive, built on the same snapshot store as "
        "A25 time travel): v0 and v1 of time_travel's orders slice are "
        "committed, read back, and FULL-OUTER joined on the table key — "
        "rows only in v1 are inserts, rows whose value changed are "
        "updates (exact cents delta), equal rows are unchanged; deletes "
        "would surface as v0-only rows. The oracle recomputes every class "
        "from the base table, so a snapshot bleeding between versions or "
        "a wrong join side flips a class and hash-mismatches. Keyed CDC "
        "is one SMJ on the table key — the incremental-view maintenance "
        "shape at any scale.",
    )
    def time_travel_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        v0 = o.filter(k < 1000).select("o_orderkey", "o_custkey", "o_totalprice")
        updated = v0.withColumn(
            "o_totalprice",
            F.when(k < 500, F.col("o_totalprice") * 2).otherwise(F.col("o_totalprice")),
        )
        appended = o.filter((k >= 1000) & (k < 1200)).select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        v1 = updated.unionByName(appended)

        table = scratch_dir("time_travel_diff")
        write_version(v0, table, 0)
        write_version(v1, table, 1)

        a = read_version(spark, table, 0).select(
            F.col("o_orderkey").alias("k0"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c0"),
        )
        b = read_version(spark, table, 1).select(
            F.col("o_orderkey").alias("k1"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c1"),
        )
        joined = a.join(b, a.k0 == b.k1, "full_outer")
        change = (
            F.when(F.col("k0").isNull(), "insert")
            .when(F.col("k1").isNull(), "delete")
            .when(F.col("c0") != F.col("c1"), "update")
            .otherwise("unchanged")
        )
        delta = F.coalesce(F.col("c1"), F.lit(0)) - F.coalesce(F.col("c0"), F.lit(0))
        return (
            joined.select(change.alias("change_type"), delta.alias("delta_cents"))
            .groupBy("change_type")
            .agg(
                F.count("*").alias("n_rows"),
                F.sum("delta_cents").cast("bigint").alias("delta_cents"),
            )
            .orderBy("change_type")
        )


_register_time_travel_diff()
