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
            r["k"], BLOOM_M_BITS, BLOOM_K
        ), r["k"]


def test_lookup_without_index_raises(spark, tmp_path):
    from dodo_spark.sources.versioned import write_version

    path = str(tmp_path / "plain")
    write_version(_df(spark, 10), path, 0)
    with pytest.raises(ValueError, match="no bloom index"):
        read_point_lookup(spark, path, 1)
