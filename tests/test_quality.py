"""Expectations report semantics (operators/quality.py)."""

from __future__ import annotations

import pytest

from dodo_spark.operators.quality import expectations_report


def _report(spark, df, rules, parents=None):
    return {
        r["rule"]: (r["checked"], r["violations"], r["pass"])
        for r in expectations_report(df, rules, parents).collect()
    }


def test_rowwise_rules_count_violations_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, "O", 5.0), (2, None, -1.0), (None, "X", None)],
        "k BIGINT, status STRING, price DOUBLE",
    )
    got = _report(
        spark,
        df,
        [
            {"rule": "k_not_null", "kind": "not_null", "column": "k"},
            {"rule": "status_ok", "kind": "accepted_values",
             "column": "status", "values": ["O", "F"]},
            {"rule": "price_pos", "kind": "range", "column": "price",
             "min": 0},
        ],
    )
    # NULL violates accepted_values and range (unknown is not proven ok)
    assert got == {
        "k_not_null": (3, 1, False),
        "status_ok": (3, 2, False),
        "price_pos": (3, 2, False),
    }


def test_unique_counts_excess_rows_not_groups(spark):
    df = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (3,), (3,)], "k BIGINT"
    )
    got = _report(
        spark, df, [{"rule": "u", "kind": "unique", "column": "k"}]
    )
    assert got["u"] == (6, 3, False)  # 6 rows, 3 distinct -> 3 excess


def test_fk_counts_orphan_rows(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k BIGINT")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk BIGINT")
    got = _report(
        spark,
        child,
        [{"rule": "fk", "kind": "fk", "column": "k",
          "parent": "p", "parent_key": "pk"}],
        parents={"p": parent},
    )
    assert got["fk"] == (4, 2, False)  # both orphan ROWS count


def test_expr_rule_and_all_green(spark):
    df = spark.createDataFrame([(2,), (4,)], "k BIGINT")
    got = _report(
        spark,
        df,
        [{"rule": "even", "kind": "expr", "column": "k",
          "predicate": "k % 2 = 0"}],
    )
    assert got["even"] == (2, 0, True)


def test_unknown_kind_rejected(spark):
    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError, match="unknown expectation kind"):
        expectations_report(
            df, [{"rule": "x", "kind": "nope", "column": "k"}]
        )


def test_fk_ignores_null_child_keys(spark):
    """dbt relationship-test convention (and SQL NOT IN semantics): NULL
    child keys are not orphans — they belong to a not_null rule."""
    child = spark.createDataFrame([(1,), (None,), (9,)], "k BIGINT")
    parent = spark.createDataFrame([(1,), (2,)], "pk BIGINT")
    got = _report(
        spark,
        child,
        [{"rule": "fk", "kind": "fk", "column": "k",
          "parent": "p", "parent_key": "pk"}],
        parents={"p": parent},
    )
    assert got["fk"] == (3, 1, False)  # only k=9 is an orphan


def test_empty_rules_yield_empty_report(spark):
    df = spark.createDataFrame([(1,)], "k BIGINT")
    out = expectations_report(df, [])
    assert out.count() == 0
    assert out.columns == ["rule", "column", "checked", "violations", "pass"]


def test_fk_missing_parent_is_a_clear_error(spark):
    import pytest

    df = spark.createDataFrame([(1,)], "k BIGINT")
    with pytest.raises(ValueError, match="needs parents"):
        expectations_report(
            df,
            [{"rule": "fk", "kind": "fk", "column": "k",
              "parent": "p", "parent_key": "pk"}],
        )
