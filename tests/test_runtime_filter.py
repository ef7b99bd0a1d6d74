"""Bloom-filter semi-join pruning (operators/runtime_filter.py).

The correctness contract a bloom filter must keep:
- NO false negatives: every inserted key passes its own probe.
- Bounded false positives: a disjoint probe set mostly fails.
- Empty build side: nothing passes (all-zero bitmap, not an error).
- The fact stream crosses NO shuffle between its scan and the bloom
  test (the whole point of scan-side pruning).

Cross-engine parity of the bit positions themselves is proven by the
``join_bloom_prune`` verify key's DuckDB oracle, which recomputes the
same md5-derived probes.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from dodo_spark.operators.runtime_filter import bloom_bitmap, with_bloom_flag


def _keys_df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("k"))


def test_no_false_negatives(spark):
    keys = _keys_df(spark, 0, 2000)
    bitmap = bloom_bitmap(keys, "k")
    flagged = with_bloom_flag(keys, "k", bitmap)
    assert flagged.filter(~F.col("bloom_pass")).count() == 0


def test_false_positive_rate_bounded(spark):
    """2000 keys into 131072 bits at k=4 → load ~0.06, theoretical fp
    ~1e-5; a disjoint 5000-key probe set should see at most a handful."""
    bitmap = bloom_bitmap(_keys_df(spark, 0, 2000), "k")
    probes = _keys_df(spark, 1_000_000, 1_005_000)
    fp = with_bloom_flag(probes, "k", bitmap).filter("bloom_pass").count()
    assert fp <= 25, fp  # 0.5% — orders of magnitude above expectation


def test_empty_build_side_passes_nothing(spark):
    bitmap = bloom_bitmap(_keys_df(spark, 0, 0), "k")
    row = bitmap.collect()[0]
    assert all(w == 0 for w in row["__bloom"])
    flagged = with_bloom_flag(_keys_df(spark, 0, 100), "k", bitmap)
    assert flagged.filter("bloom_pass").count() == 0


def test_string_and_bigint_keys_hash_consistently(spark):
    """The kernel canonicalizes via CAST AS STRING, so bigint 42 and
    string '42' probe identical positions — the same convention the
    DuckDB oracle uses."""
    ints = _keys_df(spark, 0, 500)
    strs = ints.select(F.col("k").cast("string").alias("k"))
    bitmap = bloom_bitmap(ints, "k")
    assert (
        with_bloom_flag(strs, "k", bitmap).filter("NOT bloom_pass").count()
        == 0
    )


def test_fact_side_never_shuffles_before_bloom(spark, sf_dir):
    """Every numbered Exchange in the pruned-fact plan must sit BELOW the
    bitmap's BroadcastNestedLoopJoin (i.e. inside the bitmap build) — the
    fact scan reaches the bloom test without crossing a shuffle."""
    from dodo_spark.catalog import load_table
    from tests.test_plans import plan_of

    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    dim = orders.filter("o_orderpriority = '1-URGENT'").select(
        F.col("o_orderkey").alias("dk")
    )
    pruned = with_bloom_flag(
        lineitem.select("l_orderkey", "l_extendedprice"),
        "l_orderkey",
        bloom_bitmap(dim, "dk"),
    ).filter("bloom_pass")
    plan = plan_of(pruned)
    ids = {}
    for m in re.finditer(r"^\s*[+\-:*\s]*\((\d+)\)\s+(\w+)", plan, re.M):
        ids.setdefault(m.group(2), []).append(int(m.group(1)))
    assert "BroadcastNestedLoopJoin" in ids, sorted(ids)
    bnlj = min(ids["BroadcastNestedLoopJoin"])
    for ex in ids.get("Exchange", []):
        assert ex < bnlj, (ex, bnlj, plan)
    assert "SortMergeJoin" not in ids and "CartesianProduct" not in ids


def test_dpp_subquery_reaches_partition_filters(spark, sf_dir):
    """join_partition_pruned's fact scan must carry a
    dynamicpruningexpression in PartitionFilters — the runtime-filter
    subquery, not a static predicate (the dim filter is underivable from
    the join key by design, so a static prune is impossible)."""
    from dodo_spark.registry import REGISTRY
    from tests.test_plans import plan_of

    plan = plan_of(REGISTRY["join_partition_pruned"].fn(spark, sf_dir))
    pf = [
        ln
        for ln in plan.splitlines()
        if "PartitionFilters" in ln and "dynamicpruning" in ln
    ]
    assert pf, plan


def test_null_keys_contribute_no_bits_and_never_pass(spark):
    """NULL never matches an equi-semi-join, so a NULL build key adds no
    bits (previously a NULL map key would error) and a NULL probe key
    yields a non-true flag."""
    build = spark.createDataFrame([(1,), (None,), (2,)], "k BIGINT")
    bitmap = bloom_bitmap(build, "k")
    probes = spark.createDataFrame([(1,), (None,), (7,)], "k BIGINT")
    got = {
        r["k"]: r["bloom_pass"]
        for r in with_bloom_flag(probes, "k", bitmap).collect()
    }
    assert got[1] is True
    assert got[None] is not True  # NULL flag, never a match


def test_no_false_negatives_across_key_types_property(spark):
    """Property over mixed key domains (negatives, unicode strings,
    decimals rendered via CAST AS STRING): every inserted key passes its
    own probe — the kernel's canonical string rendering is total."""
    cases = [
        ("BIGINT", [(-5,), (0,), (7,), (2**62,)]),
        ("STRING", [("",), ("héllo",), ("新疆",), ("a\tb",)]),
        ("DOUBLE", [(1.5,), (-0.25,), (1e18,)]),
        ("DECIMAL(10,2)", None),  # built below: Decimal literals
    ]
    from decimal import Decimal

    for dtype, rows in cases:
        if rows is None:
            rows = [(Decimal("1.50"),), (Decimal("-0.25"),), (Decimal("0.00"),)]
        df = spark.createDataFrame(rows, f"k {dtype}")
        bitmap = bloom_bitmap(df, "k")
        misses = (
            with_bloom_flag(df, "k", bitmap).filter("NOT bloom_pass").count()
        )
        assert misses == 0, dtype
