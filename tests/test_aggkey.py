"""Doris key-model merge views: UNIQUE-KEY upsert and the REPLACE /
REPLACE_IF_NOT_NULL merge rules (reference key models, SURVEY §1.3)."""

from __future__ import annotations

import pytest

from dodo_spark.ddl import parse_create_table
from dodo_spark.operators.aggkey import aggregate_key_view, unique_key_upsert

UNIQUE_DDL = """
CREATE TABLE u (
  `id` bigint NOT NULL,
  `val` varchar(10) NULL,
  `score` bigint NULL
) ENGINE=OLAP UNIQUE KEY(`id`) DISTRIBUTED BY HASH(`id`) BUCKETS 4
"""

AGG_DDL = """
CREATE TABLE a (
  `k` varchar(10) NULL,
  `total` bigint SUM NULL,
  `newest` varchar(10) REPLACE NULL,
  `newest_nn` varchar(10) REPLACE_IF_NOT_NULL NULL
) ENGINE=OLAP AGGREGATE KEY(`k`) DISTRIBUTED BY HASH(`k`) BUCKETS 4
"""


def test_unique_key_upsert_latest_wins(spark):
    t = parse_create_table(UNIQUE_DDL)
    df = spark.createDataFrame(
        [
            (1, "first", 10, 1),
            (1, "second", 20, 2),  # newer load seq -> wins
            (2, "only", 30, 1),
        ],
        "id bigint, val string, score bigint, seq bigint",
    )
    got = {r.id: (r.val, r.score) for r in unique_key_upsert(df, t, "seq").collect()}
    assert got == {1: ("second", 20), 2: ("only", 30)}


def test_aggregate_key_replace_rules(spark):
    t = parse_create_table(AGG_DDL)
    df = spark.createDataFrame(
        [
            ("x", 1, "a", "a", 1),
            ("x", 2, "b", None, 2),  # REPLACE takes 'b'; IF_NOT_NULL keeps 'a'
            ("y", 5, None, None, 1),
        ],
        "k string, total bigint, newest string, newest_nn string, seq bigint",
    )
    got = {
        r.k: (r.total, r.newest, r.newest_nn)
        for r in aggregate_key_view(df, t, order_col="seq").collect()
    }
    assert got["x"] == (3, "b", "a")
    assert got["y"] == (5, None, None)


def test_replace_without_order_col_rejected(spark):
    t = parse_create_table(AGG_DDL)
    df = spark.createDataFrame([("x", 1, "a", "a")], "k string, total bigint, newest string, newest_nn string")
    with pytest.raises(ValueError, match="order_col"):
        aggregate_key_view(df, t)
