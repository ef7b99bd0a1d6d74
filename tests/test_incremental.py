"""Delta-join view maintenance algebra (operators/incremental.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dodo_spark.operators.incremental import (
    merge_view_state,
    signed_join_delta,
)


def _orders(spark, rows):
    return spark.createDataFrame(
        rows, "c_custkey BIGINT, o_totalprice DOUBLE"
    )


def _dim(spark, rows):
    return spark.createDataFrame(rows, "c_custkey BIGINT, nation BIGINT")


def test_signed_delta_negates_on_removal(spark):
    dim = _dim(spark, [(1, 10), (2, 20)])
    add = signed_join_delta(
        _orders(spark, [(1, 5.0), (1, 7.0)]), dim, "c_custkey",
        "nation", "o_totalprice", 1,
    )
    rm = signed_join_delta(
        _orders(spark, [(1, 5.0)]), dim, "c_custkey",
        "nation", "o_totalprice", -1,
    )
    state = merge_view_state(None, [add, rm], "nation").collect()
    assert len(state) == 1
    assert state[0]["nation"] == 10 and state[0]["cnt"] == 1
    assert float(state[0]["total"]) == 7.0


def test_group_leaves_view_at_zero_count(spark):
    dim = _dim(spark, [(1, 10)])
    add = signed_join_delta(
        _orders(spark, [(1, 5.0)]), dim, "c_custkey",
        "nation", "o_totalprice", 1,
    )
    rm = signed_join_delta(
        _orders(spark, [(1, 5.0)]), dim, "c_custkey",
        "nation", "o_totalprice", -1,
    )
    assert merge_view_state(None, [add, rm], "nation").count() == 0


def test_rewrite_commit_nets_unchanged_rows(spark):
    """File-level CDC re-emits unchanged rows on both sides of a rewrite;
    the signed algebra must net them exactly (DECIMAL, not float)."""
    dim = _dim(spark, [(1, 10), (2, 20)])
    base = _orders(spark, [(1, 0.1), (1, 0.2), (2, 0.3)])
    state0 = merge_view_state(
        None,
        [signed_join_delta(base, dim, "c_custkey", "nation", "o_totalprice", 1)],
        "nation",
    )
    # rewrite: file [(1,0.1),(1,0.2)] -> [(1,0.2)] (delete of the 0.1 row)
    removed, added = (
        _orders(spark, [(1, 0.1), (1, 0.2)]),
        _orders(spark, [(1, 0.2)]),
    )
    state1 = merge_view_state(
        state0,
        [
            signed_join_delta(added, dim, "c_custkey", "nation", "o_totalprice", 1),
            signed_join_delta(removed, dim, "c_custkey", "nation", "o_totalprice", -1),
        ],
        "nation",
    )
    got = {r["nation"]: (r["cnt"], float(r["total"])) for r in state1.collect()}
    assert got == {10: (1, 0.2), 20: (1, 0.3)}


def test_dim_move_retracts_old_group(spark):
    """A dim row moving groups retracts from the old group and inserts
    into the new one — the MERGE path of materialized_join_refresh."""
    fact = _orders(spark, [(1, 1.0), (1, 2.0)])
    old = _dim(spark, [(1, 10)])
    new = _dim(spark, [(1, 11)])
    state0 = merge_view_state(
        None,
        [signed_join_delta(fact, old, "c_custkey", "nation", "o_totalprice", 1)],
        "nation",
    )
    state1 = merge_view_state(
        state0,
        [
            signed_join_delta(fact, new, "c_custkey", "nation", "o_totalprice", 1),
            signed_join_delta(fact, old, "c_custkey", "nation", "o_totalprice", -1),
        ],
        "nation",
    )
    got = {r["nation"]: (r["cnt"], float(r["total"])) for r in state1.collect()}
    assert got == {11: (2, 3.0)}
