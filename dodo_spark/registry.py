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


_EVIDENCE_CACHE: dict[str, tuple[int, str]] | None = None


def _evidence_rows() -> dict[str, tuple[int, str]]:
    """Latest completed driver evidence per key: name -> (round, tier) where
    tier is ``"green"`` (hash_match) or ``"no_oracle"`` (completed rows-only
    run). Parsed once per process (cached) so ordering cannot drift mid-run."""
    global _EVIDENCE_CACHE
    if _EVIDENCE_CACHE is None:
        import glob
        import json
        import os
        import re

        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        latest: dict[str, tuple[int, str]] = {}
        for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
            m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
            rnd = int(m.group(1)) if m else 0
            try:
                with open(p) as f:
                    data = json.load(f)
            except (OSError, ValueError):
                continue
            for k, v in data.items():
                if not isinstance(v, dict):
                    continue
                if v.get("hash_match"):
                    latest[k] = (rnd, "green")
                elif v.get("err") == "no_oracle":
                    latest[k] = (rnd, "no_oracle")
        _EVIDENCE_CACHE = latest
    return _EVIDENCE_CACHE


def evidence_order(names: list[str]) -> list[str]:
    """DRIVER-TOOL ordering (used only by ``__spark_entry__``, never by the
    library API), so a driver pass with a key/time budget spends it where
    evidence is weakest:

    1. UNPROVEN keys first: no completed row in any CORRECTNESS_r*.json, or
       the latest completed row is the rows-only tier (``err == "no_oracle"``)
       while the key NOW has an oracle twin — an oracle-tier upgrade
       invalidates the old weaker evidence and the key must re-queue.
    2. Then PROVEN keys by evidence age, oldest round first, so a capped pass
       rotates through stale rows instead of re-picking the same recent ones.

    Stable within each tier/round (registration order preserved by the sort's
    stability over the incoming ``names`` order)."""
    _load_all()
    latest = _evidence_rows()

    def key(n: str) -> tuple[int, int]:
        row = latest.get(n)
        if row is None:
            return (0, 0)  # never checked -> front
        rnd, tier = row
        spec = REGISTRY.get(n)
        if tier == "no_oracle" and spec is not None and spec.oracle is not None:
            return (0, 1)  # upgraded to full oracle since the rows-only run
        return (1, rnd)  # proven: oldest evidence first

    return sorted(names, key=key)


def queries() -> dict[str, QueryFn]:
    """All verify keys in stable registration order."""
    _load_all()
    return {name: REGISTRY[name].fn for name in REGISTRY}


def oracle_sql() -> dict[str, str]:
    """Oracle twins in stable registration order."""
    _load_all()
    return {name: s.oracle for name, s in REGISTRY.items() if s.oracle is not None}
