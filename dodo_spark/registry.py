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

__all__ = ["QuerySpec", "REGISTRY", "register", "queries", "oracle_sql", "evidence_order"]

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
    from dodo_spark.sources import auditlog, versioned  # noqa: F401
    from dodo_spark.plans import replay, diff  # noqa: F401
    from dodo_spark.gendata import plan  # noqa: F401
    from dodo_spark.streaming import events_stream  # noqa: F401
    from dodo_spark import anonymize, multimodal  # noqa: F401


_EVIDENCE_CACHE: list[str] | None = None


def evidence_order(names: list[str]) -> list[str]:
    """DRIVER-TOOL ordering (used only by ``__spark_entry__``, never by the
    library API): verify keys WITHOUT a green row in any prior
    CORRECTNESS_r*.json run first, so a driver pass with a key/time budget
    spends it on keys that still lack hard evidence. ``err == "no_oracle"``
    counts as evidence because it records a completed rows-only run (the
    driver's deliberate weaker tier for non-SQL-expressible keys).
    Stable within each group (registration order); the CORRECTNESS files
    are parsed once per process (cached), so the ordering cannot drift
    mid-run."""
    global _EVIDENCE_CACHE
    if _EVIDENCE_CACHE is None:
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
        _EVIDENCE_CACHE = sorted(seen)
    seen_set = set(_EVIDENCE_CACHE)
    return sorted(names, key=lambda n: n in seen_set)


def queries() -> dict[str, QueryFn]:
    """All verify keys in stable registration order."""
    _load_all()
    return {name: REGISTRY[name].fn for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """Oracle twins in stable registration order."""
    _load_all()
    return {name: s.oracle for name, s in REGISTRY.items() if s.oracle is not None}
