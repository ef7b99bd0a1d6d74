"""Skew utilities: salted plans must equal their unsalted twins exactly —
the salt changes physical placement, never the result."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.operators.skew import replicated_skew_join, salted_agg


def _norm(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_agg_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_orderkey"
    )
    got = salted_agg(
        li,
        ["l_returnflag"],
        {
            "qty": ("sum", "l_quantity"),
            "n": ("count", "l_orderkey"),
            "mx": ("max", "l_quantity"),
        },
        salt_buckets=7,
    )
    want = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.count("l_orderkey").alias("n"),
        F.max("l_quantity").alias("mx"),
    )
    assert _norm(got.select("l_returnflag", "n", "mx")) == _norm(
        want.select("l_returnflag", "n", "mx")
    )
    # float sums: compare with tolerance (different grouping order)
    g = {r.l_returnflag: r.qty for r in got.collect()}
    w = {r.l_returnflag: r.qty for r in want.collect()}
    assert g.keys() == w.keys()
    for k in g:
        assert abs(g[k] - w[k]) < 1e-6 * max(1.0, abs(w[k]))


def test_replicated_skew_join_matches_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = (
        load_table(spark, sf_dir, "orders")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus")
    )
    got = replicated_skew_join(li, o, ["l_orderkey"], salt_buckets=5)
    want = li.join(o, ["l_orderkey"])
    assert got.count() == want.count()
    assert _norm(got) == _norm(want)
