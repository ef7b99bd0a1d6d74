"""Manifest bloom index point lookups (sources/bloom_index.py)."""

from __future__ import annotations

import pytest

from dodo_spark.sources.bloom_index import (
    _probe_positions,
    read_point_lookup,
    write_version_bloom_indexed,
)
from dodo_spark.sources.versioned import append_version


def _df(spark, n):
    return spark.createDataFrame(
        [(i, i % 50, float(i)) for i in range(n)],
        "rid BIGINT, k BIGINT, val DOUBLE",
    )


def test_lookup_never_misses_and_prunes(spark, tmp_path):
    path = str(tmp_path / "bi")
    write_version_bloom_indexed(_df(spark, 2000), path, 0, "k", n_files=8)
    for key in (0, 7, 49):
        rows, stats = read_point_lookup(spark, path, key)
        got = {r["rid"] for r in rows.collect()}
        assert got == {i for i in range(2000) if i % 50 == key}
        assert stats["files_total"] == 8
        assert stats["files_scanned"] <= 1 + 1  # hash-partitioned (+FP slack)


def test_absent_key_scans_at_most_fp_files(spark, tmp_path):
    path = str(tmp_path / "bi")
    write_version_bloom_indexed(_df(spark, 500), path, 0, "k", n_files=4)
    rows, stats = read_point_lookup(spark, path, 999_999)
    assert rows.count() == 0
    assert stats["files_scanned"] <= 1  # ~always 0; 1 allows one FP


def test_unindexed_append_files_are_never_skipped(spark, tmp_path):
    """Fallback contract: files committed WITHOUT an index entry must
    always be scanned — a bloom index may waste IO, never lose rows."""
    path = str(tmp_path / "bi")
    write_version_bloom_indexed(_df(spark, 200), path, 0, "k", n_files=4)
    extra = spark.createDataFrame(
        [(9001, 7, 7.5)], "rid BIGINT, k BIGINT, val DOUBLE"
    )
    append_version(extra, path, 1)
    rows, stats = read_point_lookup(spark, path, 7)
    got = {r["rid"] for r in rows.collect()}
    assert 9001 in got
    assert got == {i for i in range(200) if i % 50 == 7} | {9001}
    # the unindexed appended file is in the scan set
    assert stats["files_scanned"] >= 2


def test_driver_probe_matches_executor_kernel(spark):
    """hashlib.md5 over str(value) must equal Spark md5(CAST AS STRING):
    same positions driver-side and executor-side, or skips would be
    wrong. Checked by recomputing positions in Spark SQL."""
    from pyspark.sql import functions as F

    from dodo_spark.operators.runtime_filter import (
        BLOOM_K,
        BLOOM_M_BITS,
        _h1_h2,
        _positions,
    )

    vals = [(0,), (12345,), (-7,), (2**61,)]
    df = spark.createDataFrame(vals, "k BIGINT")
    h1, h2 = _h1_h2(F.col("k"))
    got = df.select(
        "k", F.array(*_positions(h1, h2, BLOOM_M_BITS, BLOOM_K)).alias("p")
    ).collect()
    for r in got:
        assert list(r["p"]) == _probe_positions(
            str(r["k"]), BLOOM_M_BITS, BLOOM_K
        ), r["k"]


def test_probe_rendering_matches_spark_cast(spark):
    """Non-int probe values (bool, float, Decimal) must be rendered the
    way Spark's CAST(col AS STRING) renders them — Python str() says
    "True"/"0.1"; Spark says "true"/"0.1" but "1.0E16" for 1e16. The
    probe routes through _spark_string_render so positions match the
    executor-built bitmap for every type."""
    from decimal import Decimal

    from pyspark.sql import functions as F

    from dodo_spark.sources.bloom_index import _spark_string_render

    for v in (True, False, 0.1, 1e16, -2.5, Decimal("12.3400"), "s", 42):
        dtype = spark.range(1).select(F.lit(v)).schema[0].dataType
        expected = (
            spark.range(1)
            .select(F.lit(v).cast(dtype).cast("string").alias("s"))
            .first()["s"]
        )
        assert _spark_string_render(spark, v, dtype) == expected, v


def test_float_and_bool_lookups_never_miss(spark, tmp_path):
    """End-to-end: a lookup on a DOUBLE / BOOLEAN index column must find
    every row — the old str(value) probe rendering false-negatived on
    these types (e.g. Python 'True' vs Spark 'true')."""
    path = str(tmp_path / "bi_f")
    df = spark.createDataFrame(
        [(i, float(i) + 0.5, i % 2 == 0) for i in range(200)],
        "rid BIGINT, fk DOUBLE, bk BOOLEAN",
    )
    write_version_bloom_indexed(df, path, 0, "fk", n_files=4)
    rows, stats = read_point_lookup(spark, path, 7.5)
    assert {r["rid"] for r in rows.collect()} == {7}
    assert stats["files_scanned"] <= 1

    path_b = str(tmp_path / "bi_b")
    write_version_bloom_indexed(df, path_b, 0, "bk", n_files=2)
    rows, _ = read_point_lookup(spark, path_b, True)
    assert {r["rid"] for r in rows.collect()} == {
        i for i in range(200) if i % 2 == 0
    }


def test_mixed_index_columns_never_skip(spark, tmp_path):
    """Commits that indexed DIFFERENT columns: files whose entry column
    differs from the probed (latest) column are treated as unindexed —
    always scanned, never bloom-skipped with the wrong column's bitmap.
    v0 is indexed on 'a' (whose value domain excludes the probe), v1 on
    'b' (the probed column): the OLD code tested v0's a-bitmaps with the
    b-probe — a guaranteed miss here — and silently lost v0's rows."""
    path = str(tmp_path / "bi_mix")
    # a in [100,110): the a-bitmaps can never contain the probe "3"
    df0 = spark.createDataFrame(
        [(i, 100 + i % 10, i % 7) for i in range(100)],
        "rid BIGINT, a BIGINT, b BIGINT",
    )
    write_version_bloom_indexed(df0, path, 0, "a", n_files=2)

    # hand-commit an APPEND (v1) indexed on column "b" with an all-zeros
    # bitmap — truthful for the probe below (df1 has no b==3 rows)
    import base64 as _b64
    import struct as _struct

    from dodo_spark.operators.runtime_filter import BLOOM_K, BLOOM_M_BITS
    from dodo_spark.sources.versioned import _commit, _write_data_files

    df1 = spark.createDataFrame(
        [(1000 + i, 200, 5) for i in range(20)],
        "rid BIGINT, a BIGINT, b BIGINT",
    )
    add = _write_data_files(df1.repartition(1), path, 1)
    zero = _b64.b64encode(
        _struct.pack(f"<{BLOOM_M_BITS // 64}q", *([0] * (BLOOM_M_BITS // 64)))
    ).decode("ascii")
    _commit(
        path,
        1,
        add=add,
        remove=[],
        extra={
            "bloom_index": {
                "col": "b",
                "m_bits": BLOOM_M_BITS,
                "k": BLOOM_K,
                "files": {f: zero for f in add},
            }
        },
    )
    # latest index column is "b" -> probe b==3; v0 files (indexed on
    # "a") must be scan-always, so every b==3 row survives
    rows, stats = read_point_lookup(spark, path, 3)
    got = {r["rid"] for r in rows.collect()}
    assert got == {i for i in range(100) if i % 7 == 3}
    # both v0 files forced into the scan set (entry-col mismatch); the
    # v1 file is legitimately bloom-skipped (its bitmap is truthful)
    assert stats["files_scanned"] == 2


def test_lookup_without_index_raises(spark, tmp_path):
    from dodo_spark.sources.versioned import write_version

    path = str(tmp_path / "plain")
    write_version(_df(spark, 10), path, 0)
    with pytest.raises(ValueError, match="no bloom index"):
        read_point_lookup(spark, path, 1)


def test_compaction_rebuilds_bloom_index(spark, tmp_path):
    """compact_files on a bloom-indexed table rebuilds the per-file
    bitmaps for the rewritten files in the SAME commit (Delta OPTIMIZE
    maintains the bloom-filter index): lookups after the compaction
    stay correct AND still prune — they never degrade to scan-always."""
    from dodo_spark.sources.versioned import (
        _read_manifest,
        compact_files,
        live_files,
    )

    path = str(tmp_path / "bi")
    write_version_bloom_indexed(_df(spark, 2000), path, 0, "k", n_files=8)
    # plain bin-pack AND a z-order rewrite, chained
    compact_files(spark, path, 1, target_files=4)
    from pyspark.sql import functions as F

    bi1 = _read_manifest(path, 1)["bloom_index"]
    assert bi1["col"] == "k"
    assert set(bi1["files"]) == set(live_files(path, 1))

    compact_files(spark, path, 2, target_files=2, zorder_by=("k", "rid"))
    bi2 = _read_manifest(path, 2)["bloom_index"]
    assert set(bi2["files"]) == set(live_files(path, 2))

    pruned_something = False
    for key in (0, 7, 49):
        rows, stats = read_point_lookup(spark, path, key)
        got = {r["rid"] for r in rows.collect()}
        assert got == {i for i in range(2000) if i % 50 == key}, key
        pruned_something |= stats["files_scanned"] < stats["files_total"]
    # absent key: the rebuilt bitmaps still skip every file (no FP here)
    rows, stats = read_point_lookup(spark, path, 999_999)
    assert rows.count() == 0
    assert stats["files_scanned"] <= 1
    assert pruned_something or stats["files_total"] == 1


def test_compaction_without_index_adds_none(spark, tmp_path):
    """A compaction of a NEVER-indexed table must not invent an index."""
    from dodo_spark.sources.versioned import (
        _read_manifest,
        compact_files,
        write_version,
    )

    path = str(tmp_path / "plain")
    write_version(_df(spark, 100), path, 0)
    compact_files(spark, path, 1, target_files=1)
    assert "bloom_index" not in _read_manifest(path, 1)


def test_type_mismatched_probe_never_misses(spark, tmp_path):
    """An int probe on a DOUBLE column must render through the COLUMN's
    type ("42.0", what the bitmaps hashed), not Python str(42) — the
    round-8 review's false-negative: every file silently skipped while
    the exact filter would have matched 42.0."""
    path = str(tmp_path / "bi_t")
    df = spark.createDataFrame(
        [(i, float(i % 50)) for i in range(500)],
        "rid BIGINT, fk DOUBLE",
    )
    write_version_bloom_indexed(df, path, 0, "fk", n_files=4)
    rows, stats = read_point_lookup(spark, path, 42)  # int probe
    got = {r["rid"] for r in rows.collect()}
    assert got == {i for i in range(500) if i % 50 == 42}
    assert stats["files_scanned"] <= 1

    # a value that cannot cast into the column's type: no stored value
    # can equal it (ANSI filter would throw) -> empty, zero files read
    rows, stats = read_point_lookup(spark, path, "not-a-number")
    assert rows.count() == 0
    assert stats["files_scanned"] == 0


def test_indexed_append_prunes_across_vintages(spark, tmp_path):
    """append_version_bloom_indexed carries bitmaps for its own files:
    a lookup prunes across BOTH commit vintages (one file per commit
    for a present key, bloom-skip for the rest), and a compaction after
    the append rebuilds one unified index."""
    from dodo_spark.sources.bloom_index import append_version_bloom_indexed
    from dodo_spark.sources.versioned import compact_files

    path = str(tmp_path / "bi_app")
    write_version_bloom_indexed(_df(spark, 1000), path, 0, "k", n_files=4)
    extra = spark.createDataFrame(
        [(10_000 + i, i % 50, 0.0) for i in range(200)],
        "rid BIGINT, k BIGINT, val DOUBLE",
    )
    append_version_bloom_indexed(extra, path, 1, "k", n_files=4)

    rows, stats = read_point_lookup(spark, path, 7)
    got = {r["rid"] for r in rows.collect()}
    want = {i for i in range(1000) if i % 50 == 7} | {
        10_000 + i for i in range(200) if i % 50 == 7
    }
    assert got == want
    assert stats["files_total"] == 8
    # one file per vintage contains the key (+1 FP slack)
    assert stats["files_scanned"] <= 3

    # absent key: pruned to ~zero across both vintages
    rows, stats = read_point_lookup(spark, path, 999_999)
    assert rows.count() == 0
    assert stats["files_scanned"] <= 1

    compact_files(spark, path, 2, target_files=2)
    rows, stats = read_point_lookup(spark, path, 7)
    assert {r["rid"] for r in rows.collect()} == want
    assert stats["files_total"] == 2

    # initial commit must go through the writer, not the append
    import pytest as _pytest

    with _pytest.raises(ValueError, match="initial commit"):
        append_version_bloom_indexed(extra, str(tmp_path / "fresh"), 0, "k")


def test_bloom_lifecycle_randomized_against_model(spark, tmp_path):
    """Model-based check of the WHOLE index lifecycle: a random sequence
    of indexed appends, PLAIN (unindexed) appends, and bin-pack/Z-order
    compactions must keep every point lookup equal to a plain-Python
    dict model — and never scan more than the bitmaps allow. The mix of
    indexed and unindexed vintages exercises the scan-always fallback
    and the compaction rebuild together."""
    import random

    from dodo_spark.sources.bloom_index import append_version_bloom_indexed
    from dodo_spark.sources.versioned import append_version, compact_files

    rng = random.Random(11)
    path = str(tmp_path / "bl")

    def frame(rows):
        return spark.createDataFrame(rows, "rid BIGINT, k BIGINT, val DOUBLE")

    model: dict[int, int] = {i: i % 20 for i in range(300)}
    write_version_bloom_indexed(
        frame([(r, k, 0.0) for r, k in model.items()]), path, 0, "k",
        n_files=4,
    )
    next_rid = 1000
    for v in range(1, 9):
        op = rng.choice(["iappend", "append", "compact", "zorder"])
        if op in ("iappend", "append"):
            rows = {next_rid + i: rng.randrange(25) for i in range(40)}
            next_rid += 40
            df = frame([(r, k, 0.0) for r, k in rows.items()])
            if op == "iappend":
                append_version_bloom_indexed(df, path, v, "k", n_files=2)
            else:
                append_version(df, path, v)
            model.update(rows)
        elif op == "compact":
            compact_files(spark, path, v, target_files=rng.choice([1, 3]))
        else:
            compact_files(
                spark, path, v, target_files=2, zorder_by=("k", "rid")
            )
        # probe three present keys and one absent key against the model
        for key in (*rng.sample(sorted(set(model.values())), 3), 999):
            rows_df, stats = read_point_lookup(spark, path, key)
            got = {r["rid"] for r in rows_df.collect()}
            want = {r for r, k in model.items() if k == key}
            assert got == want, (v, op, key)
            assert stats["files_scanned"] <= stats["files_total"]


def test_lookup_on_empty_live_set_raises_cleanly(spark, tmp_path):
    from dodo_spark.sources.versioned import _commit

    path = str(tmp_path / "empty")
    # index commit, then a metadata-only commit removing everything
    write_version_bloom_indexed(_df(spark, 10), path, 0, "k", n_files=1)
    from dodo_spark.sources.versioned import live_files

    _commit(path, 1, add=[], remove=live_files(path, 0))
    with pytest.raises(ValueError, match="no live files"):
        read_point_lookup(spark, path, 1)


def test_empty_result_schema_matches_hits_after_evolution(spark, tmp_path):
    """After additive schema evolution, a MISS (all files pruned, or an
    uncastable probe) must expose the same merged schema as a HIT — the
    r8 advisor's finding was that the empty branches built the frame
    from files[:1] only, so a downstream select of a newer column
    worked for hits but raised for misses."""
    from dodo_spark.sources.bloom_index import (
        append_version_bloom_indexed,
        read_point_lookup,
        write_version_bloom_indexed,
    )

    path = str(tmp_path / "t")
    write_version_bloom_indexed(
        spark.createDataFrame(
            [(i, i % 10, float(i)) for i in range(100)],
            "rid BIGINT, k BIGINT, val DOUBLE",
        ),
        path,
        0,
        "k",
        n_files=2,
    )
    # additive evolution: the appended vintage carries a NEW column
    append_version_bloom_indexed(
        spark.createDataFrame(
            [(1000 + i, i % 10, 0.0, f"s{i}") for i in range(50)],
            "rid BIGINT, k BIGINT, val DOUBLE, extra STRING",
        ),
        path,
        1,
        "k",
    )

    hit, _ = read_point_lookup(spark, path, 3)
    assert "extra" in hit.columns

    # all-files-pruned miss: same columns, select of the new column works
    miss, stats = read_point_lookup(spark, path, 987654321)
    assert stats["files_scanned"] <= stats["files_total"]
    assert miss.columns == hit.columns
    assert miss.select("extra").count() == 0

    # uncastable probe (string on a BIGINT index column): same columns
    uncast, stats = read_point_lookup(spark, path, "not-a-number")
    assert stats["files_scanned"] == 0
    assert uncast.columns == hit.columns
    assert uncast.select("extra").count() == 0
