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


# --------------------------------------------------------------------------
# verify key
# --------------------------------------------------------------------------
def _register_genconf_infer() -> None:
    from dodo_spark.registry import register

    @register(
        "genconf_infer",
        oracle="""
        WITH ck AS (
          SELECT COUNT(*) AS n, COUNT(c_custkey) AS cnt,
                 COUNT(DISTINCT c_custkey) AS ndv,
                 MIN(c_custkey) AS mn, MAX(c_custkey) AS mx
          FROM customer
        ), cn AS (
          SELECT COUNT(*) AS n, COUNT(c_name) AS cnt,
                 COUNT(DISTINCT c_name) AS ndv,
                 SUM(LENGTH(c_name)) AS len_sum
          FROM customer
        ), nk AS (
          SELECT COUNT(*) AS n, COUNT(c_nationkey) AS cnt,
                 COUNT(DISTINCT c_nationkey) AS ndv,
                 MIN(c_nationkey) AS mn, MAX(c_nationkey) AS mx
          FROM customer
        ), ab AS (
          SELECT COUNT(c_acctbal) AS cnt, MIN(c_acctbal) AS mn,
                 MAX(c_acctbal) AS mx,
                 COUNT(*) FILTER (
                   WHERE abs(c_acctbal*100 - round(c_acctbal*100)) > 1e-9
                 ) AS offgrid
          FROM customer
        ), mk AS (
          SELECT COUNT(c_mktsegment) AS cnt,
                 COUNT(DISTINCT c_mktsegment) AS ndv
          FROM customer
        ), mkf AS (
          SELECT string_agg(v || ':' || CAST(c AS VARCHAR), '|' ORDER BY v)
                 AS detail
          FROM (SELECT c_mktsegment AS v, CAST(COUNT(*) AS BIGINT) AS c
                FROM customer WHERE c_mktsegment IS NOT NULL
                GROUP BY c_mktsegment)
        )
        SELECT * FROM (
          SELECT 'c_custkey' AS column_name,
                 CASE WHEN cnt = n AND ndv = cnt AND cnt > 1
                           AND mx - mn + 1 = ndv
                      THEN 'inc' ELSE 'range_int' END AS rule_kind,
                 CAST(0 AS DOUBLE) AS null_frequency,
                 CAST(mn AS VARCHAR) AS param_lo,
                 CASE WHEN cnt = n AND ndv = cnt AND cnt > 1
                           AND mx - mn + 1 = ndv
                      THEN '' ELSE CAST(mx AS VARCHAR) END AS param_hi,
                 '' AS detail
          FROM ck
          UNION ALL
          SELECT 'c_name',
                 CASE WHEN ndv BETWEEN 1 AND 16 THEN 'enum'
                      ELSE 'length' END,
                 CAST(0 AS DOUBLE),
                 CAST(GREATEST(1, avg_b - ext) AS VARCHAR),
                 CAST(avg_b + ext AS VARCHAR), ''
          FROM (SELECT ndv, avg_b,
                       CASE WHEN avg_b > 10 THEN 10
                            WHEN avg_b > 5 THEN 5 ELSE 1 END AS ext
                FROM (SELECT ndv,
                             CAST(FLOOR(len_sum * 1.0 / cnt) AS BIGINT)
                             AS avg_b
                      FROM cn))
          UNION ALL
          SELECT 'c_nationkey',
                 CASE WHEN cnt = n AND ndv = cnt AND cnt > 1
                           AND mx - mn + 1 = ndv
                      THEN 'inc' ELSE 'range_int' END,
                 CAST(0 AS DOUBLE),
                 CAST(mn AS VARCHAR), CAST(mx AS VARCHAR), ''
          FROM nk
          UNION ALL
          SELECT 'c_acctbal',
                 CASE WHEN offgrid = 0 THEN 'decimal'
                      ELSE 'range_double' END,
                 CAST(0 AS DOUBLE),
                 CAST(CAST(trunc(mn) AS BIGINT) AS VARCHAR),
                 CAST(CAST(trunc(mx) AS BIGINT) + 1 AS VARCHAR),
                 'p=' || CAST(LEAST(18,
                   LENGTH(CAST(CAST(trunc(GREATEST(abs(mn), abs(mx), 1))
                               AS BIGINT) AS VARCHAR)) + 4) AS VARCHAR)
                 || ',s=2'
          FROM ab
          UNION ALL
          SELECT 'c_mktsegment',
                 CASE WHEN ndv BETWEEN 1 AND 16 THEN 'enum'
                      ELSE 'length' END,
                 CAST(0 AS DOUBLE), '', '', (SELECT detail FROM mkf)
          FROM mk
        ) ORDER BY column_name
        """,
        doc="B15 core, oracle-grade (round-5 verdict ask #2): genconf-infer "
        "measures the customer table and emits one generator rule per "
        "column; this key renders the inferred rule table (kind + "
        "parameters) and the DuckDB twin recomputes every stats-driven "
        "DECISION in SQL — dense-unique-contiguous int -> inc, "
        "low-cardinality string -> enum (categorical counts rendered as "
        "exact integers: the weights' numerators, so the hash is FP-free), "
        "2-decimal-quantized double -> DECIMAL(p,2) range, other ints -> "
        "min/max range, free strings -> length band around the floored "
        "mean byte length. A drifted threshold, wrong truncation (int() "
        "is trunc-toward-zero, not round), or a missed quantization probe "
        "flips a row and hash-mismatches. Reference: the LLM genconf "
        "authoring flow src/llm.go:23-116 whose deterministic core this "
        "is; rule shapes per gendata/rules.py.",
    )
    def genconf_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
        import pyspark.sql.types as T2

        df = load_table(spark, sf_dir, "customer")
        conf = infer_genconf(spark, sf_dir, tables=["customer"])
        rows = []
        for col in conf["tables"][0]["columns"]:
            name = col["name"]
            gen = col.get("gen") or {}
            nf = float(col.get("null_frequency", 0.0))
            if "inc" in gen:
                rows.append((name, "inc", nf, str(gen["start"]), "", ""))
            elif "enum" in gen:
                # the rule's weights are count/total ratios; render their
                # exact integer numerators so the cross-engine hash never
                # touches a rounded float
                freq = (
                    df.filter(F.col(name).isNotNull())
                    .groupBy(name)
                    .count()
                    .orderBy(name)
                    .collect()  # bounded by ENUM_MAX_NDV
                )
                detail = "|".join(f"{r[name]}:{r['count']}" for r in freq)
                rows.append((name, "enum", nf, "", "", detail))
            elif gen.get("type") == "DECIMAL":
                rows.append(
                    (name, "decimal", nf, str(col["min"]), str(col["max"]),
                     f"p={col['precision']},s={col['scale']}")
                )
            elif "length" in col:
                rows.append(
                    (name, "length", nf, str(col["length"]["min"]),
                     str(col["length"]["max"]), "")
                )
            elif "min" in col:
                kind = (
                    "range_int"
                    if isinstance(col["min"], int)
                    else "range_double"
                    if isinstance(col["min"], float)
                    else "range_time"
                )
                rows.append((name, kind, nf, str(col["min"]), str(col["max"]), ""))
            else:
                rows.append((name, "default", nf, "", "", ""))
        schema = T2.StructType(
            [
                T2.StructField("column_name", T2.StringType(), False),
                T2.StructField("rule_kind", T2.StringType(), False),
                T2.StructField("null_frequency", T2.DoubleType(), False),
                T2.StructField("param_lo", T2.StringType(), False),
                T2.StructField("param_hi", T2.StringType(), False),
                T2.StructField("detail", T2.StringType(), False),
            ]
        )
        return spark.createDataFrame(rows, schema).orderBy("column_name")


_register_genconf_infer()
