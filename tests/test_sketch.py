"""KMV/theta sketch properties (operators/sketch.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.functions.hashing import row_hash_int
from dodo_spark.operators.sketch import K, TWO48, kmv_sketch, sketch_stats


def _sk(spark, rows):
    df = spark.createDataFrame(rows, "seg STRING, elem BIGINT")
    return kmv_sketch(df, "seg", row_hash_int("elem"))


def test_exhaustive_segment_is_exact(spark):
    """A segment with < K distinct elements keeps them all and θ=2^48,
    so the estimate formula degenerates to the exact count."""
    sk = _sk(spark, [("a", i % 50) for i in range(500)])
    st = sketch_stats(sk).collect()[0]
    assert st["n_in"] == 50 and st["theta"] == TWO48
    est = (
        (st["n_in"] if st["n_in"] < K else K - 1)
        * float(TWO48)
        / st["theta"]
    )
    assert est == 50.0


def test_sketch_bounded_at_k(spark):
    sk = _sk(spark, [("a", i) for i in range(5000)])
    assert sk.count() == K
    st = sketch_stats(sk).collect()[0]
    assert st["n_in"] == K and 0 < st["theta"] < TWO48


def test_estimate_within_4_sigma(spark):
    n = 5000
    sk = _sk(spark, [("a", i) for i in range(n)])
    st = sketch_stats(sk).collect()[0]
    est = (K - 1) * float(TWO48) / st["theta"]
    assert abs(est - n) <= 4 * n / (K**0.5), est


def test_sketch_is_mergeable(spark):
    """KMV merge property: the K smallest of (sketch_a ∪ sketch_b)
    equals the sketch of the concatenated input — sketching is a
    one-pass, re-mergeable aggregate (the 100 TB rollup contract)."""
    rows_a = [("a", i) for i in range(3000)]
    rows_b = [("b", i) for i in range(1500, 4500)]
    sk_parts = _sk(spark, rows_a + rows_b)
    merged = (
        sk_parts.select("h")
        .distinct()
        .orderBy("h")
        .limit(K)
        .agg(F.max("h").alias("theta"), F.count("*").alias("n"))
        .collect()[0]
    )
    combined = _sk(
        spark, [("u", e) for _s, e in rows_a + rows_b]
    )
    st = sketch_stats(combined).collect()[0]
    assert merged["n"] == K and merged["theta"] == st["theta"]
