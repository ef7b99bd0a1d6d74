"""Offline genconf inference: observed dataset -> generator config.

The reference authors genconf YAML with an LLM over schema + stats
(B15, ``src/llm.go:23-116`` — impossible here: no network). This module
is the OFFLINE, rule-based core of that flow: measure the table, then
pick each column's generator rule from its statistics, emitting the same
genconf shape ``gendata`` consumes (``gendata/rules.py``) — so
``genconf-infer | gendata`` round-trips a dataset into a synthetic
sibling with matching row counts, key structure, value ranges,
categorical vocabularies, and null rates.

Heuristics (each is the deterministic version of what the reference's
LLM prompt asks for, ``introduction.md:336-342``):

- dense unique integer key (ndv == rows, max-min+1 == rows, no nulls)
  -> ``inc`` generator from the observed start
- low-cardinality string (ndv <= enum_max) -> ``enum`` with the observed
  values and frequency ``weights`` (bounded collect, guarded by ndv)
- 2-decimal-quantized double (money) -> DECIMAL(p,2) generator over the
  observed range — ALSO the cross-engine parity convention (SCALE.md)
- other numerics / timestamps -> uniform min..max from the stats
- free strings -> length range around the observed average
- null_frequency from the measured null rate when > 0
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dodo_spark.catalog import TABLES, load_table
from dodo_spark.operators.stats import column_stats

ENUM_MAX_NDV = 16
QUANT_SAMPLE = 10_000  # rows probed for 2-decimal quantization


def _is_int(dt: T.DataType) -> bool:
    return isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType))


def _infer_column(
    df: DataFrame, field: T.StructField, st: dict, row_count: int
) -> dict:
    c = field.name
    dt = field.dataType
    rule: dict = {"name": c}
    count, ndv, nulls = st["count"], st["ndv"], st["null_count"]
    if count and nulls:
        rule["null_frequency"] = round(nulls / (count + nulls), 6)
    if count == 0:
        # all-NULL (or empty) column: min/max are None, so every ranged
        # branch below would crash — fall back to the type-default rule,
        # with null_frequency 1.0 when the column has rows (ADVICE r5)
        if nulls:
            rule["null_frequency"] = 1.0
        return rule

    if _is_int(dt) and count == row_count and ndv == count and count > 1:
        lo, hi = int(float(st["min"])), int(float(st["max"]))
        if hi - lo + 1 == ndv:
            rule["gen"] = {"inc": 1, "start": lo}
            return rule

    if isinstance(dt, T.StringType):
        if 0 < ndv <= ENUM_MAX_NDV:
            freq = (
                df.filter(F.col(c).isNotNull())
                .groupBy(c)
                .count()
                .orderBy(c)
                .collect()  # bounded: <= ENUM_MAX_NDV rows (guarded by ndv)
            )
            total = sum(r["count"] for r in freq) or 1
            rule["gen"] = {
                "enum": [r[c] for r in freq],
                "weights": [round(r["count"] / total, 6) for r in freq],
            }
            return rule
        avg = int(st["avg_size_byte"] or 1)
        extent = 10 if avg > 10 else (5 if avg > 5 else 1)
        rule["length"] = {"min": max(1, avg - extent), "max": avg + extent}
        return rule

    if isinstance(dt, T.DoubleType) or isinstance(dt, T.FloatType):
        cents = F.round(F.col(c) * 100)
        off_grid = (
            df.select(c)
            .filter(F.col(c).isNotNull())
            .limit(QUANT_SAMPLE)
            .filter(F.abs(F.col(c) * 100 - cents) > 1e-9)
            .count()
        )
        lo, hi = float(st["min"]), float(st["max"])
        if off_grid == 0:
            digits = len(str(int(max(abs(lo), abs(hi), 1)))) + 2
            rule["gen"] = {"type": "DECIMAL"}
            rule["precision"] = min(18, digits + 2)
            rule["scale"] = 2
            rule["min"] = int(lo)
            rule["max"] = int(hi) + 1
        else:
            rule["min"] = lo
            rule["max"] = hi
        return rule

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType, T.DateType)):
        rule["min"] = str(st["min"])
        rule["max"] = str(st["max"])
        return rule

    if _is_int(dt):
        rule["min"] = int(float(st["min"]))
        rule["max"] = int(float(st["max"]))
        return rule

    # arrays/maps/structs: keep the type-default rule (length bounds)
    return rule


def infer_genconf(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> dict:
    """Measure each table and return the inferred genconf dict (the same
    shape ``gendata --genconf`` consumes). One stats aggregate per table
    plus one bounded collect per enum column."""
    out = []
    for name in tables or list(TABLES):
        df = load_table(spark, sf_dir, name)
        stats = {r["column_name"]: r.asDict() for r in column_stats(spark, sf_dir, name).collect()}
        row_count = max(
            (s["count"] + s["null_count"] for s in stats.values()), default=0
        )
        out.append(
            {
                "name": name,
                "row_count": int(row_count),
                "columns": [
                    _infer_column(df, f, stats[f.name], row_count)
                    for f in df.schema.fields
                ],
            }
        )
    return {"tables": out}
