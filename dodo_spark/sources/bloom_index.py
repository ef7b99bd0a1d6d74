"""File-level BLOOM INDEX in the versioned manifest — point lookups on
an UNSORTED key over a huge table (the Delta bloom-filter-index /
parquet bloom idea, on this repo's manifest commit algebra).

Footer min/max stats (``prune_files_by_stats``) prune range predicates
on CLUSTERED columns; they are useless for a point lookup on a column
the layout doesn't sort by — every file's [min,max] spans the domain.
This module stores a per-file bloom bitmap of the index column in the
commit manifest: ``read_point_lookup`` tests the probe's k positions
against each file's bitmap DRIVER-SIDE (pure metadata, zero data IO)
and scans only the files that might contain the key.

The bitmaps reuse the runtime-filter kernel (``operators/
runtime_filter.py``): md5-derived double hashing, so the driver-side
Python probe (hashlib.md5) and the executor-side build (Spark ``md5``)
compute IDENTICAL positions by construction. Bloom semantics carry
over: a probe may scan a false-positive file (wasted IO, counted) but
can never skip a file containing the key.

Write shape: the data is hash-repartitioned ON the index column before
writing, so every key lives in exactly ONE file — the lookup contract
``files_scanned == 1`` (no-FP case) that the verify key pins. One extra
pass computes the per-file bitmaps (a groupBy over exploded positions;
the collect is |files|·words rows — bounded metadata, not data). At
100 TB: bitmap size per file is tunable to the per-file key count; the
manifest carries KBs per file, and a point lookup costs one manifest
read + one file scan instead of the whole table.
"""

from __future__ import annotations

import base64
import hashlib
import struct

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.operators.runtime_filter import BLOOM_K, BLOOM_M_BITS
from dodo_spark.sources.versioned import (
    _check_commit_order,
    _check_retired_names,
    _commit,
    _first_add_versions,
    _join,
    _logical_read,
    _read_manifest,
    _rename_triples,
    _schema_events_upto,
    _write_data_files,
    list_versions,
    logical_schema,
)

__all__ = [
    "write_version_bloom_indexed",
    "append_version_bloom_indexed",
    "read_point_lookup",
    "bloom_words_for_files",
]


def _words(m_bits: int) -> int:
    return m_bits // 64


def bloom_words_for_files(
    spark: SparkSession,
    table_path: str,
    rel_files: list[str],
    index_col: str,
    m_bits: int = BLOOM_M_BITS,
    k: int = BLOOM_K,
    schema=None,
) -> dict[str, str]:
    """One metadata pass computing the per-file bloom bitmap of
    ``index_col`` over already-written ``rel_files`` (relative to
    ``table_path``): the shared builder behind the indexed writer AND
    compaction-time index REBUILD (compact_files). Returns
    {rel_file: base64 words}; files whose rows are all-NULL on the
    column get an all-zeros bitmap (probe never matches — correct,
    since the column's lookup filter can't match NULL either).
    Callers that just WROTE the files pass their ``schema`` to skip
    the read-back footer-inference job (the files are this commit's
    own output — the schema is known exactly)."""
    from dodo_spark.operators.runtime_filter import _h1_h2, _positions
    from dodo_spark.sources.versioned import _canon_file_ref

    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("mergeSchema", "true")
    read_back = (
        reader.parquet(*[_join(table_path, f) for f in rel_files])
        .select(
            F.input_file_name().alias("f"),
            F.col(index_col).alias("k"),
        )
        .filter(F.col("k").isNotNull())
    )
    h1, h2 = _h1_h2(F.col("k"))
    pos = read_back.select(
        "f", F.explode(F.array(*_positions(h1, h2, m_bits, k))).alias("p")
    )
    rows = (
        pos.select(
            "f",
            F.expr("p DIV 64").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "m"
            ),
        )
        .groupBy("f", "w")
        .agg(F.bit_or("m").alias("word"))
        .collect()  # bounded: |files| x occupied words of METADATA
    )
    per_file: dict[str, list[int]] = {f: [0] * _words(m_bits) for f in rel_files}
    canon_to_rel = {
        _canon_file_ref(_join(table_path, f)): f for f in rel_files
    }
    for r in rows:
        rel = canon_to_rel[_canon_file_ref(r["f"])]
        per_file[rel][r["w"]] = r["word"]
    return {
        rel: base64.b64encode(
            struct.pack(f"<{_words(m_bits)}q", *words)
        ).decode("ascii")
        for rel, words in per_file.items()
    }


def write_version_bloom_indexed(
    df: DataFrame,
    table_path: str,
    version: int,
    index_col: str,
    n_files: int = 8,
    m_bits: int = BLOOM_M_BITS,
) -> dict:
    """Commit ``df`` as ``version`` hash-partitioned on ``index_col``
    into ``n_files`` files, with a per-file bloom bitmap of the column
    stored in the manifest. Returns {"files", "indexed_col"}."""
    versions = _check_commit_order(table_path, version)
    _check_retired_names(
        table_path, versions, df.columns, "write_version_bloom_indexed"
    )
    prev_live = []
    if versions:
        from dodo_spark.sources.versioned import live_files

        prev_live = live_files(table_path, versions[-1])
    add = _write_data_files(
        df.repartition(n_files, F.col(index_col)), table_path, version
    )
    blooms = bloom_words_for_files(
        df.sparkSession, table_path, add, index_col, m_bits, BLOOM_K,
        schema=df.schema,
    )
    _commit(
        table_path,
        version,
        add=add,
        remove=prev_live,
        extra={
            "bloom_index": {
                "col": index_col,
                "m_bits": m_bits,
                "k": BLOOM_K,
                "files": blooms,
            }
        },
    )
    return {"files": len(add), "indexed_col": index_col}


def append_version_bloom_indexed(
    df: DataFrame,
    table_path: str,
    version: int,
    index_col: str,
    n_files: int = 1,
    m_bits: int = BLOOM_M_BITS,
) -> dict:
    """APPEND ``df`` as ``version`` with per-file bloom bitmaps for the
    NEW files — the incremental index-maintenance path (a plain
    ``append_version`` leaves its files unindexed: correct but
    scan-always). Together with the compaction-time rebuild this closes
    the index lifecycle: indexed write → indexed appends → OPTIMIZE
    rebuild, and a point lookup prunes across every vintage. The append
    is hash-partitioned on the index column like the writer, so within
    this commit a key lives in one file; across commits a key may live
    in one file PER COMMIT (the lookup scans each passing file)."""
    versions = _check_commit_order(table_path, version)
    if not versions:
        raise ValueError(
            f"no committed versions at {table_path}; use "
            "write_version_bloom_indexed for the initial commit"
        )
    _check_retired_names(
        table_path, versions, df.columns, "append_version_bloom_indexed"
    )
    add = _write_data_files(
        df.repartition(n_files, F.col(index_col)), table_path, version
    )
    blooms = bloom_words_for_files(
        df.sparkSession, table_path, add, index_col, m_bits, BLOOM_K,
        schema=df.schema,
    )
    _commit(
        table_path,
        version,
        add=add,
        remove=[],
        extra={
            "bloom_index": {
                "col": index_col,
                "m_bits": m_bits,
                "k": BLOOM_K,
                "files": blooms,
            }
        },
    )
    return {"files": len(add), "indexed_col": index_col}


def _spark_string_render(spark: SparkSession, value, dtype) -> str | None:
    """Render ``value`` exactly as the executor-side bitmap build did:
    ``CAST(CAST(value AS <column type>) AS STRING)``. Casting through
    the INDEX COLUMN's type first is load-bearing — an int probe 42 on
    a DOUBLE column must hash "42.0" (what the bitmaps contain), not
    "42", or every file is silently skipped. Python-side rendering is
    used only where provably identical (integral value on an integral
    column, str on string); everything else routes through a 1-row
    local Spark evaluation of the very same cast chain. Returns None
    when the value does not cast into the column's type at all (no
    stored value can equal it through that cast)."""
    from pyspark.sql import types as T

    if isinstance(value, bool):
        if isinstance(dtype, T.BooleanType):
            return "true" if value else "false"
    elif isinstance(value, int) and isinstance(
        dtype, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ):
        return str(value)
    elif isinstance(value, str) and isinstance(dtype, T.StringType):
        return value
    # try_cast: under ANSI (Spark 4 default) a malformed cast THROWS;
    # an uncastable probe must yield None (no stored value can match)
    row = spark.range(1).select(
        F.lit(value).try_cast(dtype).cast("string").alias("s")
    ).first()
    return row["s"]


def _probe_positions(rendered: str, m_bits: int, k: int) -> list[int]:
    """Driver-side twin of the executor kernel: identical md5-derived
    double hashing over the canonical string rendering (caller supplies
    the Spark-cast rendering via ``_spark_string_render``)."""
    h = hashlib.md5(rendered.encode("utf-8")).hexdigest()
    h1 = int(h[:12], 16)
    step = int(h[12:24], 16) * 2 + 1
    return [(h1 + i * step) % m_bits for i in range(k)]


def read_point_lookup(
    spark: SparkSession, table_path: str, value, version: int | None = None
) -> tuple[DataFrame, dict]:
    """Point lookup via the manifest bloom index: test the probe
    DRIVER-SIDE against each live file's bitmap, scan only passing
    files, filter exactly. Returns (rows_df, {"files_total",
    "files_scanned"}). Falls back to scanning files without an index
    entry (never skips blind)."""
    versions = list_versions(table_path)
    if not versions:
        raise ValueError(f"no committed versions at {table_path}")
    if version is None:
        version = max(versions)
    from dodo_spark.sources.versioned import live_files

    files = live_files(table_path, version)
    if not files:
        raise ValueError(
            f"version {version} at {table_path} has no live files"
        )
    # every entry binds its column name AS OF its manifest's commit; a
    # later rename_column moved the column, so map each recorded name
    # through the renames committed AFTER that manifest — exactly the
    # rule _logical_read applies to the data files (bitmaps hash
    # rendered VALUES, so they survive the rename unchanged). Without
    # the mapping, probing a renamed-then-reused name could silently
    # bind the filter to the WRONG column. Chain + first-add computed
    # ONCE and threaded into every _logical_read below.
    events = _schema_events_upto(table_path, version)
    renames = _rename_triples(events)
    first_add = _first_add_versions(table_path, version) if events else {}

    def logical_of(name: str, at_version: int) -> str:
        for rv, frm, to in renames:
            if rv > at_version and name == frm:
                name = to
        return name

    # index entries live in the manifest of each file's ADDING commit
    idx: dict[str, tuple[dict, str, int, int]] = {}
    col = None
    for v in versions:
        if v > version:
            break
        m = _read_manifest(table_path, v)
        bi = m.get("bloom_index")
        if not bi:
            continue
        col = logical_of(bi["col"], v)
        for rel, b64 in bi["files"].items():
            idx[rel] = (b64, logical_of(bi["col"], v), bi["m_bits"], bi["k"])
    if col is None:
        raise ValueError(f"no bloom index in any manifest at {table_path}")

    # the probe must render through the INDEX COLUMN's type. Fast path
    # (no schema events, column present in the newest-schema file): one
    # footer read. Otherwise the LOGICAL merged schema — memoized per
    # (table, version) in versioned.logical_schema, so the all-file
    # footer merge is planned at most once per version, not per lookup
    # (and miss-path empty frames on event-free tables no longer pay an
    # O(live files) footer merge — round-9 advisor finding).

    def merged_schema():
        return logical_schema(
            spark, table_path, files, version, events, first_add
        )

    if not events:
        # memoized in versioned's commit-purged schema cache under a
        # 3-tuple key (the purge matches on (path, version) prefix), so
        # repeated lookups at one version pay the single footer read once
        from dodo_spark.sources.versioned import (
            _schema_cache_get,
            _schema_cache_put,
        )

        ck = (table_path, version, "bloom_probe_fast")
        schema = _schema_cache_get(ck)
        if schema is None:
            schema = spark.read.parquet(_join(table_path, files[0])).schema
            _schema_cache_put(ck, schema)
        if col not in schema.names:
            schema = merged_schema()
    else:
        schema = merged_schema()
    if col not in schema.names:
        # the indexed column no longer exists at this version (dropped,
        # and no later lineage re-added it): a point lookup on it has no
        # answer — fail loudly rather than probe a ghost
        raise ValueError(
            f"bloom index column {col!r} was dropped at {table_path} "
            f"(version {version}); re-index on a live column"
        )
    rendered = _spark_string_render(spark, value, schema[col].dataType)

    def empty_frame():
        # schema-faithful empty result (a hit and a miss must expose the
        # same merged logical schema), built over range(0) so Catalyst
        # folds it to an empty LocalRelation — createDataFrame([], ...)
        # would parallelize an empty RDD and every downstream action
        # would pay a full job's scheduling overhead (~0.4 s measured)
        return spark.range(0).select(
            *[
                F.lit(None).cast(f.dataType).alias(f.name)
                for f in merged_schema().fields
            ]
        )

    if rendered is None:
        # the value does not cast into the column's type: no stored value
        # can equal it (and under ANSI the exact filter would throw) —
        # an empty result with zero files scanned is the true answer
        return empty_frame(), {"files_total": len(files), "files_scanned": 0}
    scan_files = []
    for f in files:
        entry = idx.get(f)
        if entry is None:
            scan_files.append(f)  # unindexed file: never skip blind
            continue
        b64, entry_col, m_bits, k = entry
        if entry_col != col:
            # the file's bitmap indexes a DIFFERENT column than the one
            # being probed — testing it would false-negative; treat the
            # file as unindexed (always scan, never skip blind)
            scan_files.append(f)
            continue
        words = struct.unpack(
            f"<{_words(m_bits)}q", base64.b64decode(b64)
        )
        if all(
            words[p // 64] & (1 << (p % 64))
            for p in _probe_positions(rendered, m_bits, k)
        ):
            scan_files.append(f)
    stats = {"files_total": len(files), "files_scanned": len(scan_files)}
    if not scan_files:
        return empty_frame(), stats
    # _logical_read: every vintage's physical names (the index column's
    # included) resolve to the logical schema, matching the mapped filter
    out = _logical_read(
        spark, table_path, scan_files, version, events, first_add
    ).filter(F.col(col) == F.lit(value))
    return out, stats


# ---------------------------------------------------------------------------
# verify key
# ---------------------------------------------------------------------------
def _register_bloom_index() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    probes = [7, 19, 1501]  # customers with orders; 1501 beyond sf0.001 range

    @register(
        "time_travel_bloom_index",
        oracle=f"""
        WITH probes AS (SELECT unnest(ARRAY{probes}) AS ck)
        SELECT p.ck AS probe_key,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total,
               TRUE AS pruned_to_one_file
        FROM probes p
        LEFT JOIN (SELECT * FROM orders WHERE o_orderkey < 5000) o
          ON o.o_custkey = p.ck
        GROUP BY p.ck ORDER BY p.ck
        """,
        doc="File-level BLOOM INDEX point lookups (the Delta bloom-"
        "filter-index idea on the manifest commit algebra): orders "
        "commit hash-partitioned on o_custkey into 8 files with a "
        "per-file bloom bitmap stored in the manifest; each probe tests "
        "its positions DRIVER-SIDE (zero data IO) and scans only "
        "passing files. Because hash partitioning puts every key in "
        "exactly one file, pruned_to_one_file pins files_scanned <= 1 "
        "per probe (a bloom false positive would scan 2 and fail the "
        "hash) — min/max footer stats cannot prune this lookup at all "
        "(the key is unsorted, every file spans the domain). The oracle "
        "recomputes each probe's rows from the base table; a probe for "
        "a key with no orders returns the 0-row group via the LEFT "
        "JOIN.",
    )
    def time_travel_bloom_index(spark: SparkSession, sf_dir: str) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir

        tbl = _join(scratch_dir("time_travel_bloom_index"), "tbl")
        o = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderkey") < 5000
        ).select("o_orderkey", "o_custkey", "o_totalprice")
        write_version_bloom_indexed(o, tbl, 0, "o_custkey", n_files=8)

        parts = []
        pruned_all = True
        for ck in probes:
            rows, stats = read_point_lookup(spark, tbl, ck)
            pruned_all = pruned_all and stats["files_scanned"] <= 1
            parts.append(
                rows.agg(
                    F.lit(ck).cast("bigint").alias("probe_key"),
                    F.count("*").alias("n_rows"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                    .cast("double")
                    .alias("total"),
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.withColumn(
            "pruned_to_one_file", F.lit(pruned_all)
        ).orderBy("probe_key")


_register_bloom_index()


def _register_bloom_compact() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    probes = [7, 19, 1501]

    @register(
        "time_travel_bloom_compact",
        oracle=f"""
        WITH probes AS (SELECT unnest(ARRAY{probes}) AS ck)
        SELECT p.ck AS probe_key,
               CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_rows,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
                 AS total,
               TRUE AS index_rebuilt,
               TRUE AS pruned_after_compact
        FROM probes p
        LEFT JOIN (SELECT * FROM orders WHERE o_orderkey < 5000) o
          ON o.o_custkey = p.ck
        GROUP BY p.ck ORDER BY p.ck
        """,
        doc="Compaction-aware BLOOM INDEX maintenance (r7 verdict "
        "stretch): orders commit bloom-indexed on o_custkey (v0, 8 "
        "hash-partitioned files), then an OPTIMIZE ZORDER rewrite "
        "(compact_files(zorder_by=(o_custkey, o_day)) — composing the "
        "layout_zorder Morton machinery with the manifest index) "
        "replaces every indexed file at v1. compact_files detects the "
        "ancestor bloom_index and REBUILDS per-file bitmaps for the "
        "rewritten files in the same commit, so point lookups keep "
        "pruning across the compaction instead of degrading to "
        "scan-always. index_rebuilt pins that v1's manifest carries an "
        "index entry for EVERY live file; pruned_after_compact pins "
        "that the probes' combined scans skipped at least one file "
        "(the z-layout no longer isolates a key in one file, so the "
        "per-probe bound is the bitmap's, not the partitioner's). The "
        "oracle recomputes every probe from the base table — a lookup "
        "that misses a row after the rewrite hash-fails.",
    )
    def time_travel_bloom_compact(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        from dodo_spark.operators.schema import scratch_dir
        from dodo_spark.sources.versioned import (
            _read_manifest,
            compact_files,
            live_files,
        )

        tbl = _join(scratch_dir("time_travel_bloom_compact"), "tbl")
        o = (
            load_table(spark, sf_dir, "orders")
            .filter(F.col("o_orderkey") < 5000)
            .select(
                "o_orderkey",
                "o_custkey",
                "o_totalprice",
                F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
                .cast("bigint")
                .alias("o_day"),
            )
        )
        write_version_bloom_indexed(o, tbl, 0, "o_custkey", n_files=8)
        compact_files(
            spark, tbl, 1, target_files=4, zorder_by=("o_custkey", "o_day")
        )

        live = live_files(tbl, 1)
        v1_idx = _read_manifest(tbl, 1).get("bloom_index") or {"files": {}}
        index_rebuilt = (
            v1_idx.get("col") == "o_custkey"
            and set(v1_idx["files"]) >= set(live)
        )

        parts = []
        scanned_total = 0
        for ck in probes:
            rows, stats = read_point_lookup(spark, tbl, ck)
            scanned_total += stats["files_scanned"]
            parts.append(
                rows.agg(
                    F.lit(ck).cast("bigint").alias("probe_key"),
                    F.count("*").alias("n_rows"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,4)"))
                    .cast("double")
                    .alias("total"),
                )
            )
        pruned = scanned_total < len(probes) * len(live)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return (
            out.withColumn("index_rebuilt", F.lit(index_rebuilt))
            .withColumn("pruned_after_compact", F.lit(pruned))
            .orderBy("probe_key")
        )


_register_bloom_compact()
