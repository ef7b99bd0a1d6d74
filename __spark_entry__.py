"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All implementation lives in the ``dodo_spark`` package; this module is a
thin adapter over ``dodo_spark.registry``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dodo_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1 pricing summary) on /root/testdata/sf0.001."""
    from dodo_spark.operators.relational import agg_group

    return agg_group(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Driver adapter only: keys are evidence-ordered (never-oracle-checked
    first) so a capped driver correctness pass spends its budget on keys
    that still lack a green CORRECTNESS row. The library API
    (``dodo_spark.registry.queries``) keeps stable registration order."""
    qs = registry.queries()
    return {name: qs[name] for name in registry.evidence_order(list(qs))}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible verify key
    (evidence-ordered to match ``queries()``)."""
    os_ = registry.oracle_sql()
    return {name: os_[name] for name in registry.evidence_order(list(os_))}
