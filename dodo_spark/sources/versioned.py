"""Versioned parquet tables: `FOR VERSION AS OF` over plain parquet
(SURVEY.md §2.A A25; reference grammar ``tableSnapshot``
``DorisParser.g4:1754-1757``).

Delta/Iceberg are not available in this environment, so time travel is
built from the same primitive those formats use underneath: IMMUTABLE
data files plus per-version FILE MANIFESTS (add/remove lists — the Delta
commit-log / Iceberg snapshot-manifest structure). Each commit writes its
new parquet files under ``v=<n>/``, then a ``_manifest_<n>.json`` naming
the files it ADDS and the live files it REMOVES, then appends ``n`` to
``_versions.json`` (the commit point — written last and replaced
atomically, so a torn write never exposes a half-visible version; a
``v=<n>/`` dir or manifest without a commit-log entry is by definition an
orphan and is overwritten on retry). A version's live file set is the
add/remove algebra replayed over committed manifests; ``read_version``
hands that file list straight to ``spark.read.parquet`` so every Catalyst
optimization (pushdown, pruning, split planning) applies unchanged, and
no state is shared between versions — concurrent readers of different
versions never interfere.

Because commits are file-level, ``append_version`` commits new rows
WITHOUT rewriting (or even reading) the files of prior versions — the
100 TB posture: a 1 % daily append costs 1 % I/O, not a table copy.
``write_version`` keeps full-replace semantics (its manifest removes all
previously-live files), and the API is still shaped so ``read_version``
swaps to ``spark.read.format("delta").option("versionAsOf", n)`` without
touching call sites.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_versions.json"


def _atomic_write_json(path: str, payload: dict) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise


def _version_manifest_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"_manifest_{version}.json")


def _read_manifest(table_path: str, version: int) -> dict:
    with open(_version_manifest_path(table_path, version)) as f:
        return json.load(f)


def _checkpoint_path(table_path: str, version: int) -> str:
    return os.path.join(table_path, f"_checkpoint_{version}.json")


def checkpoint_manifest(table_path: str, version: int | None = None) -> str:
    """Write a CHECKPOINT of the live file set at ``version`` (default:
    latest) — the Delta checkpoint primitive: replaying a long commit
    chain costs one manifest read per version, so a checkpoint pins the
    resolved set and ``live_files`` replays only the commits AFTER it.
    Pure metadata; no data file is read or moved."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} at {table_path}")
    path = _checkpoint_path(table_path, version)
    _atomic_write_json(
        path, {"version": version, "live": _replay_live(table_path, version, -1, [])}
    )
    return path


def _latest_checkpoint(table_path: str, version: int) -> tuple[int, list[str]] | None:
    import glob as _glob

    best = None
    for p in _glob.glob(os.path.join(table_path, "_checkpoint_*.json")):
        try:
            v = int(os.path.basename(p)[len("_checkpoint_"):-len(".json")])
        except ValueError:
            continue
        if v <= version and (best is None or v > best):
            best = v
    if best is None:
        return None
    with open(_checkpoint_path(table_path, best)) as f:
        return best, list(json.load(f)["live"])


def _replay_live(
    table_path: str, version: int, after: int, base: list[str]
) -> list[str]:
    live = list(base)
    for v in [x for x in list_versions(table_path) if after < x <= version]:
        m = _read_manifest(table_path, v)
        removed = set(m.get("remove", []))
        live = [f for f in live if f not in removed] + list(m.get("add", []))
    return live


def live_files(table_path: str, version: int) -> list[str]:
    """The live file set AT ``version``: add/remove algebra replayed over
    the committed manifests <= version (relative paths, stable order),
    starting from the latest checkpoint <= version when one exists."""
    cp = _latest_checkpoint(table_path, version)
    if cp is not None:
        cp_version, base = cp
        return _replay_live(table_path, version, cp_version, base)
    return _replay_live(table_path, version, -1, [])


def _write_data_files(df: DataFrame, table_path: str, version: int) -> list[str]:
    """Write ``df``'s parquet files under ``v=<version>/`` (overwriting any
    orphan of a torn commit) and return their table-relative paths."""
    snap = os.path.join(table_path, f"v={version}")
    df.write.mode("overwrite").parquet(snap)
    return sorted(
        f"v={version}/{name}"
        for name in os.listdir(snap)
        if name.endswith(".parquet")
    )


def _footer_stats(abs_path: str) -> dict:
    """Per-column [min, max] from the parquet FOOTER (free — no data scan;
    the Delta/Iceberg per-file stats primitive). Only JSON-plain scalar
    columns are kept."""
    import pyarrow.parquet as pq

    f = pq.ParquetFile(abs_path)
    agg: dict[str, list] = {}
    for rg in range(f.metadata.num_row_groups):
        for ci in range(f.metadata.num_columns):
            col = f.metadata.row_group(rg).column(ci)
            st = col.statistics
            if st is None or not st.has_min_max:
                continue
            lo, hi = st.min, st.max
            if isinstance(lo, bytes) or not isinstance(lo, (int, float, str)):
                continue
            name = col.path_in_schema
            if name in agg:
                agg[name] = [min(agg[name][0], lo), max(agg[name][1], hi)]
            else:
                agg[name] = [lo, hi]
    return agg


def file_stats(table_path: str, version: int) -> dict:
    """{relative file -> {column -> [min, max]}} for the committed
    manifests <= version (files whose commit predates stats support, or
    whose columns have no footer stats, are simply absent)."""
    out: dict[str, dict] = {}
    for v in [x for x in list_versions(table_path) if x <= version]:
        out.update(_read_manifest(table_path, v).get("stats", {}))
    return out


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic concurrency)."""


def _put_if_absent_json(path: str, payload: dict) -> bool:
    """Atomically create ``path`` with ``payload`` ONLY if absent (write a
    complete temp file, then hard-link into place — link is atomic and
    fails if the target exists). Returns False on conflict."""
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=os.path.basename(path), suffix=".tmp")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(payload, f)
        try:
            os.link(tmp, path)
            return True
        except FileExistsError:
            return False
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass


def _commit(
    table_path: str, version: int, add: list[str], remove: list[str]
) -> None:
    """Commit ``version``: put-if-absent the per-version manifest
    (add/remove lists + per-added-file footer min/max stats), then append
    ``version`` to the commit log.

    Optimistic concurrency (the Delta put-if-absent commit protocol, via
    the filesystem's atomic hard-link): the MANIFEST FILE is the commit
    record — two writers racing the same version number cannot both link
    it into place, so the loser raises CommitConflict instead of silently
    overwriting the winner. If a prior writer crashed between its
    manifest link and the log append, the next committer ROLLS THAT
    COMMIT FORWARD (the manifest is complete by construction) before
    reporting the conflict — the table never sticks half-committed.
    Remaining caveat (documented in SCALE.md): writers proposing the SAME
    version number share the ``v=<n>/`` data directory before commit, so
    concurrent writers should propose distinct versions; the commit
    record itself is race-safe."""
    versions = list_versions(table_path)
    stats = {
        f: s
        for f in add
        if (s := _footer_stats(os.path.join(table_path, f)))
    }
    manifest_path = os.path.join(table_path, MANIFEST)
    won = _put_if_absent_json(
        _version_manifest_path(table_path, version),
        {"version": version, "add": add, "remove": remove, "stats": stats},
    )
    if not won:
        if version not in list_versions(table_path):
            # crashed predecessor: complete ITS commit (roll forward)
            _atomic_write_json(
                manifest_path, {"versions": versions + [version]}
            )
        raise CommitConflict(
            f"version {version} at {table_path} was already committed by "
            f"another writer"
        )
    _atomic_write_json(manifest_path, {"versions": versions + [version]})


def _check_commit_order(table_path: str, version: int) -> list[int]:
    versions = list_versions(table_path)
    if version in versions:
        raise ValueError(f"version {version} already committed at {table_path}")
    if versions and version < max(versions):
        raise ValueError(
            f"versions commit in increasing order: {version} < max {max(versions)}"
        )
    return versions


def write_version(df: DataFrame, table_path: str, version: int) -> str:
    """Commit ``df`` as the FULL content of ``version`` (replace commit:
    the manifest adds the new files and removes every previously-live
    file). Versions commit in increasing order; committed versions are
    immutable."""
    versions = _check_commit_order(table_path, version)
    prev_live = live_files(table_path, versions[-1]) if versions else []
    add = _write_data_files(df, table_path, version)
    _commit(table_path, version, add=add, remove=prev_live)
    return os.path.join(table_path, f"v={version}")


def append_version(df: DataFrame, table_path: str, version: int) -> str:
    """Commit ``df`` as an APPEND: ``version`` sees all previously-live
    files PLUS ``df``'s new files — no prior file is read, rewritten, or
    copied (file-level commit, the Delta/Iceberg primitive)."""
    _check_commit_order(table_path, version)
    add = _write_data_files(df, table_path, version)
    _commit(table_path, version, add=add, remove=[])
    return os.path.join(table_path, f"v={version}")


def delete_where(
    spark: SparkSession, table_path: str, version: int, predicate: str
) -> dict:
    """Commit ``version`` as the previous live content MINUS rows matching
    ``predicate`` (a SQL boolean expression) — the file-level DELETE /
    MERGE primitive: only files that actually CONTAIN matching rows are
    rewritten (without the matches) and swapped in the manifest; untouched
    files stay live as-is. Returns {"files_rewritten", "files_kept",
    "rows_deleted"}. At warehouse scale the touched-file probe is one scan
    with per-file match counts (Delta narrows it further with file-level
    min/max stats before the scan — the same commit algebra applies)."""
    from pyspark.sql import functions as F

    versions = _check_commit_order(table_path, version)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    prev_live = live_files(table_path, versions[-1])
    paths = {f: os.path.join(table_path, f) for f in prev_live}
    # one scan: per-file count of matching rows (bounded collect: one row
    # per live file)
    counts: dict[str, int] = {}
    for r in (
        spark.read.parquet(*paths.values())
        .filter(predicate)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count("*").alias("n"))
        .collect()
    ):
        p = r["f"]
        if p.startswith("file:"):
            p = p[len("file:"):]
        counts[os.path.abspath(p)] = r["n"]
    touched = [f for f in prev_live if os.path.abspath(paths[f]) in counts]
    rows_deleted = sum(counts[os.path.abspath(paths[f])] for f in touched)
    add: list[str] = []
    if touched:
        survivors = spark.read.parquet(*[paths[f] for f in touched]).filter(
            f"NOT ({predicate})"
        )
        add = _write_data_files(survivors, table_path, version)
    _commit(table_path, version, add=add, remove=touched)
    return {
        "files_rewritten": len(touched),
        "files_kept": len(prev_live) - len(touched),
        "rows_deleted": int(rows_deleted),
    }


def merge_upsert(
    spark: SparkSession,
    table_path: str,
    version: int,
    updates: DataFrame,
    key: str,
) -> dict:
    """Commit ``version`` as the previous live content UPSERTED with
    ``updates`` (MERGE ... WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN
    INSERT, keyed on ``key``, assumed unique on both sides): live files
    containing a matched key are rewritten with those rows replaced;
    untouched files stay live as-is; unmatched update rows are appended.
    File algebra identical to delete_where — probe scan for touched
    files, rewrite touched + new rows, manifest remove/add. The update
    set broadcasts (it is the small side by construction; a billion-row
    reconciliation would instead shuffle-join on the key — same commit).
    Returns {"files_rewritten", "files_kept", "rows_updated",
    "rows_inserted"}."""
    from pyspark.sql import functions as F

    versions = _check_commit_order(table_path, version)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    prev_live = live_files(table_path, versions[-1])
    paths = {f: os.path.join(table_path, f) for f in prev_live}
    updates = updates.localCheckpoint(eager=True)  # one computation, 3 uses
    keys_df = F.broadcast(updates.select(key).distinct())

    # file skipping via footer min/max stats: a live file whose [min,max]
    # range on the merge key cannot overlap the update keys' range cannot
    # contain a match — the probe scan reads only overlapping files (the
    # Delta data-skipping primitive; files without stats stay candidates)
    bounds = updates.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    stats = file_stats(table_path, versions[-1])
    candidates = [
        f
        for f in prev_live
        if key not in stats.get(f, {})
        or bounds["lo"] is None
        or not (
            stats[f][key][0] > bounds["hi"] or stats[f][key][1] < bounds["lo"]
        )
    ]

    probe_df = (
        spark.read.parquet(*[paths[f] for f in candidates])
        if candidates
        else None
    )
    counts: dict[str, int] = {}
    for r in (() if probe_df is None else (
        probe_df.join(keys_df, key, "semi")
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.count("*").alias("n"))
        .collect()
    )):
        p = r["f"]
        if p.startswith("file:"):
            p = p[len("file:"):]
        counts[os.path.abspath(p)] = r["n"]
    touched = [f for f in prev_live if os.path.abspath(paths[f]) in counts]
    # rows_updated = live rows REPLACED (if live carries duplicate keys,
    # every duplicate is replaced by the single update row — MERGE also
    # dedups); rows_inserted counts update rows whose key has no live
    # match, computed directly so duplicate live keys can't skew it
    rows_updated = sum(counts[os.path.abspath(paths[f])] for f in touched)
    matched_update_rows = (
        0
        if probe_df is None
        else updates.join(probe_df.select(key).distinct(), key, "semi").count()
    )
    rows_inserted = updates.count() - matched_update_rows

    if touched:
        survivors = (
            spark.read.parquet(*[paths[f] for f in touched])
            .join(keys_df, key, "anti")
        )
        new_rows = survivors.unionByName(updates)
    else:
        new_rows = updates
    add = _write_data_files(new_rows, table_path, version)
    _commit(table_path, version, add=add, remove=touched)
    return {
        "files_rewritten": len(touched),
        "files_kept": len(prev_live) - len(touched),
        "rows_updated": int(rows_updated),
        "rows_inserted": int(rows_inserted),
    }


def compact_files(
    spark: SparkSession, table_path: str, version: int, target_files: int = 1
) -> dict:
    """Commit ``version`` as a bin-packed REWRITE of the live set into
    ``target_files`` files — logically identical content (the Delta
    OPTIMIZE primitive; small-file compaction after many incremental
    commits). Older versions still read their own file lists."""
    versions = _check_commit_order(table_path, version)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    prev_live = live_files(table_path, versions[-1])
    df = spark.read.parquet(
        *[os.path.join(table_path, f) for f in prev_live]
    ).coalesce(max(1, target_files))
    add = _write_data_files(df, table_path, version)
    _commit(table_path, version, add=add, remove=prev_live)
    return {"files_before": len(prev_live), "files_after": len(add)}


def vacuum(table_path: str, keep_versions: int = 2) -> dict:
    """Delete data files referenced ONLY by versions older than the newest
    ``keep_versions`` (Delta VACUUM): time travel keeps working for the
    retained versions; older versions become unreadable (their manifests
    remain as history metadata). Pure driver-side file arithmetic over the
    manifests — no Spark job."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    versions = list_versions(table_path)
    if not versions:
        return {"files_deleted": 0, "versions_retained": []}
    retained = versions[-keep_versions:]
    keep: set[str] = set()
    for v in retained:
        keep.update(live_files(table_path, v))
    all_files: set[str] = set()
    for v in versions:
        all_files.update(_read_manifest(table_path, v).get("add", []))
    doomed = sorted(all_files - keep)
    for f in doomed:
        try:
            os.unlink(os.path.join(table_path, f))
        except FileNotFoundError:
            pass
    return {"files_deleted": len(doomed), "versions_retained": retained}


def list_versions(table_path: str) -> list[int]:
    manifest_path = os.path.join(table_path, MANIFEST)
    if not os.path.exists(manifest_path):
        return []
    with open(manifest_path) as f:
        return list(json.load(f)["versions"])


def read_version(
    spark: SparkSession, table_path: str, version: int | None = None
) -> DataFrame:
    """``FOR VERSION AS OF version``; ``None`` reads the latest version.
    Reads exactly the version's live FILE LIST (never a directory), so
    appended-to versions share unchanged files with their ancestors."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    if version is None:
        version = max(versions)
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} at {table_path}")
    files = live_files(table_path, version)
    if not files:
        raise ValueError(f"version {version} at {table_path} has no live files")
    # mergeSchema: ADDITIVE schema evolution — an append_version that
    # introduced new columns unions by name with older files (absent
    # columns read as NULL), the Delta/Iceberg add-column semantics.
    # Renames/drops/retypes are rewrites, not evolution, here as there.
    return spark.read.option("mergeSchema", "true").parquet(
        *[os.path.join(table_path, f) for f in files]
    )


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


def _register_time_travel_incremental() -> None:
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "time_travel_incremental",
        oracle="""
        WITH v0 AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1000
        ), v1 AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1200
        ), v2 AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1400
        )
        SELECT CAST(0 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS rows_at,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS custs,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
               TRUE AS no_rewrite
        FROM v0
        UNION ALL
        SELECT CAST(1 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), TRUE
        FROM v1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), TRUE
        FROM v2
        ORDER BY version
        """,
        doc="Incremental time travel over file-level manifests (the Delta "
        "commit-log / Iceberg manifest primitive; closes the round-4 "
        "'whole-table snapshot CoW' caveat): v0 is a full commit, v1 and "
        "v2 are append_version commits that write ONLY their new files — "
        "no prior file is read or rewritten, so a 1% append costs 1% I/O "
        "at any table size. Each version is read back via its live FILE "
        "LIST and aggregated; the no_rewrite column is an in-plan "
        "contract asserting (a) every v0 data file is still live at v2 "
        "byte-identical (same path, mtime untouched by later commits) "
        "and (b) each append's manifest removes nothing — FALSE if any "
        "commit rewrote history. The oracle recomputes all three "
        "version states from the source table.",
    )
    def time_travel_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        table = scratch_dir("time_travel_incremental")
        write_version(o.filter(k < 1000).select(cols), table, 0)
        v0_live = set(live_files(table, 0))
        append_version(o.filter((k >= 1000) & (k < 1200)).select(cols), table, 1)
        append_version(o.filter((k >= 1200) & (k < 1400)).select(cols), table, 2)
        no_rewrite = v0_live <= set(live_files(table, 2)) and all(
            not _read_manifest(table, v).get("remove") for v in (1, 2)
        )

        def snap_agg(version: int) -> DataFrame:
            return read_version(spark, table, version).agg(
                F.lit(version).cast("bigint").alias("version"),
                F.count("*").alias("rows_at"),
                F.countDistinct("o_custkey").alias("custs"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total"),
                F.lit(no_rewrite).alias("no_rewrite"),
            )

        return (
            snap_agg(0)
            .unionByName(snap_agg(1))
            .unionByName(snap_agg(2))
            .orderBy("version")
        )


_register_time_travel_incremental()


def _register_time_travel_delete() -> None:
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "time_travel_delete",
        oracle="""
        WITH v1 AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1200
        ), v2 AS (
          SELECT * FROM v1
          WHERE NOT (o_orderkey >= 1000 AND o_orderkey % 10 = 3)
        )
        SELECT CAST(1 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS rows_at,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
               TRUE AS v0_files_untouched
        FROM v1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), TRUE
        FROM v2
        ORDER BY version
        """,
        doc="Row-level DELETE over file-level manifests (delete_where — the "
        "Delta DELETE/MERGE primitive on the same commit algebra as "
        "time_travel_incremental): v0 commits orders below key 1000, v1 "
        "appends 1000-1199 as its own file, v2 deletes keys ending in 3 "
        "FROM THE APPENDED RANGE ONLY — so the probe scan finds matches "
        "solely in v1's file, rewrites just that file without the "
        "matches, and leaves every v0 file live untouched. Output: "
        "pre/post-delete aggregates plus the v0_files_untouched contract "
        "(v0's live set is a subset of v2's — FALSE if the delete "
        "rewrote history it didn't need to touch). The oracle recomputes "
        "both states from the source table.",
    )
    def time_travel_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        table = scratch_dir("time_travel_delete")
        write_version(o.filter(k < 1000).select(cols), table, 0)
        v0_live = set(live_files(table, 0))
        append_version(
            o.filter((k >= 1000) & (k < 1200)).select(cols).coalesce(1), table, 1
        )
        delete_where(spark, table, 2, "o_orderkey >= 1000 AND o_orderkey % 10 = 3")
        untouched = v0_live <= set(live_files(table, 2))

        def snap_agg(version: int) -> DataFrame:
            return read_version(spark, table, version).agg(
                F.lit(version).cast("bigint").alias("version"),
                F.count("*").alias("rows_at"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total"),
                F.lit(untouched).alias("v0_files_untouched"),
            )

        return snap_agg(1).unionByName(snap_agg(2)).orderBy("version")


_register_time_travel_delete()


def _register_time_travel_merge() -> None:
    from pyspark.sql import functions as F

    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "time_travel_merge",
        oracle="""
        WITH v1 AS (
          SELECT o_orderkey, o_custkey, o_totalprice FROM orders
          WHERE o_orderkey < 1200
        ), upd AS (
          SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
          FROM orders WHERE o_orderkey >= 1100 AND o_orderkey < 1300
        ), v2 AS (
          SELECT v1.o_orderkey, v1.o_custkey,
                 COALESCE(u.o_totalprice, v1.o_totalprice) AS o_totalprice
          FROM v1 LEFT JOIN upd u ON u.o_orderkey = v1.o_orderkey
          UNION ALL
          SELECT u.o_orderkey, u.o_custkey, u.o_totalprice
          FROM upd u WHERE u.o_orderkey >= 1200
        )
        SELECT CAST(1 AS BIGINT) AS version, CAST(COUNT(*) AS BIGINT) AS rows_at,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
               TRUE AS v0_files_untouched
        FROM v1
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(COUNT(*) AS BIGINT),
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), TRUE
        FROM v2
        ORDER BY version
        """,
        doc="MERGE upsert over file-level manifests (merge_upsert — Delta's "
        "WHEN MATCHED UPDATE / WHEN NOT MATCHED INSERT on the same commit "
        "algebra as delete_where): v0 commits orders below key 1000, v1 "
        "appends 1000-1199 as its own file, v2 merges doubled-price rows "
        "for keys 1100-1299 — 1100-1199 UPDATE rows living only in v1's "
        "file (so only that file rewrites), 1200-1299 INSERT. Output: "
        "pre/post-merge aggregates + the v0_files_untouched contract (v0's "
        "live set survives into v2 — FALSE if the merge rewrote files "
        "containing no matched keys). Doubling a 2-decimal price is exact "
        "in binary FP, so the oracle's recomputed states hash exactly.",
    )
    def time_travel_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        o = load_table(spark, sf_dir, "orders")
        k = F.col("o_orderkey")
        cols = ["o_orderkey", "o_custkey", "o_totalprice"]
        table = scratch_dir("time_travel_merge")
        write_version(o.filter(k < 1000).select(cols), table, 0)
        v0_live = set(live_files(table, 0))
        append_version(
            o.filter((k >= 1000) & (k < 1200)).select(cols).coalesce(1), table, 1
        )
        updates = (
            o.filter((k >= 1100) & (k < 1300))
            .select(
                "o_orderkey",
                "o_custkey",
                (F.col("o_totalprice") * 2).alias("o_totalprice"),
            )
        )
        merge_upsert(spark, table, 2, updates, "o_orderkey")
        untouched = v0_live <= set(live_files(table, 2))

        def snap_agg(version: int) -> DataFrame:
            return read_version(spark, table, version).agg(
                F.lit(version).cast("bigint").alias("version"),
                F.count("*").alias("rows_at"),
                F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                .cast("double")
                .alias("total"),
                F.lit(untouched).alias("v0_files_untouched"),
            )

        return snap_agg(1).unionByName(snap_agg(2)).orderBy("version")


_register_time_travel_merge()
