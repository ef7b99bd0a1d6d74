"""Verify-key registry.

Every operator from SURVEY.md §2 registers here under its verify key with a
``(spark, sf_dir) -> DataFrame`` callable and (when SQL-expressible) a DuckDB
oracle SQL twin. ``__spark_entry__.py`` simply reads this registry.

Conventions that keep the driver's order-insensitive value-hash stable:

- Alias EVERY computed column identically in the Spark plan and the oracle.
- Floating aggregates go through exact decimal accumulation:
  Spark ``sum(x.cast('decimal(18,4)')).cast('double')`` ==
  DuckDB ``CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE)`` — decimal sums are
  order-independent and identical across engines, and the final
  decimal->double cast is deterministic. Plain double sums are NOT safe: the
  two engines accumulate in different orders.
- Averages: exact decimal sum divided by count, division done in double on
  both sides.
- Integer aggregates: DuckDB SUM(BIGINT) returns HUGEINT — always cast the
  oracle back to BIGINT to match Spark's long.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QuerySpec", "REGISTRY", "register", "queries", "oracle_sql"]

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> driver runs rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame under a verify key."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate verify key: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers verify keys (idempotent)."""
    from dodo_spark.operators import (  # noqa: F401
        aggkey,
        analytics,
        dedup,
        events,
        funnel,
        relational,
        scalar,
        schema,
        similarity,
        skew,
        stats,
        text,
    )
    from dodo_spark.sources import auditlog  # noqa: F401
    from dodo_spark.plans import replay, diff  # noqa: F401
    from dodo_spark.gendata import plan  # noqa: F401
    from dodo_spark.streaming import events_stream  # noqa: F401
    from dodo_spark import anonymize, multimodal  # noqa: F401


def _evidence_order(names: list[str]) -> list[str]:
    """Order verify keys so those WITHOUT a green row in any prior
    CORRECTNESS_r*.json run first: if the driver's correctness pass has a
    key/time budget, it spends it on keys that still lack hard evidence.
    Stable within each group (registration order)."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    seen: set[str] = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        for k, v in data.items():
            if isinstance(v, dict) and (v.get("hash_match") or v.get("err") == "no_oracle"):
                seen.add(k)
    return sorted(names, key=lambda n: n in seen)


def queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: REGISTRY[name].fn for name in _evidence_order(list(REGISTRY))}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _evidence_order(list(REGISTRY))
        if REGISTRY[name].oracle is not None
    }
