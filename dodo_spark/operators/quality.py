"""Declarative data-quality expectations over a DataFrame — the
Great-Expectations / dbt-tests REPORT form of the versioned layer's
fail-closed ``check_expectations`` gate (sources/versioned.py): instead
of aborting on the first violating batch, evaluate a rule TABLE and
return per-rule violation counts, so a 100 TB ingest can quarantine or
alert with full visibility rather than fail opaque.

Rule kinds and their execution shape:

- ``not_null`` / ``accepted_values`` / ``range`` / ``expr``: row-wise
  predicates — ALL of them fold into ONE conditional aggregate over a
  single scan (map-side partials; adding a rule adds a column, not a
  pass).
- ``unique``: violations = rows − distinct keys, computed in the same
  single aggregate via COUNT(DISTINCT col) — no second scan.
- ``fk``: referential check as a broadcast anti-join against the
  parent's key set (the dim side; at 100 TB the fact never shuffles).

The report schema is ``(rule, column, checked, violations, pass)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["expectations_report"]


def _viol(cond: Column) -> Column:
    """Count rows where the violation condition holds."""
    return F.coalesce(F.sum(F.when(cond, 1)), F.lit(0)).cast("bigint")


def expectations_report(
    df: DataFrame, rules: list[dict], parents: dict[str, DataFrame] | None = None
) -> DataFrame:
    """Evaluate ``rules`` against ``df``. Each rule is a dict with
    ``rule`` (report name), ``kind``, ``column``, and kind-specific
    params: ``values`` (accepted_values), ``min``/``max`` (range,
    either optional), ``predicate`` (expr — violation = NOT predicate),
    ``parent``/``parent_key`` (fk, resolved via ``parents``)."""
    aggs = []
    row_rules = []
    for r in rules:
        kind, col = r["kind"], r.get("column")
        if kind == "not_null":
            cond = F.col(col).isNull()
        elif kind == "accepted_values":
            cond = ~F.col(col).isin(*r["values"]) | F.col(col).isNull()
        elif kind == "range":
            cond = F.lit(False)
            if "min" in r:
                cond = cond | (F.col(col) < r["min"])
            if "max" in r:
                cond = cond | (F.col(col) > r["max"])
            cond = cond | F.col(col).isNull()
        elif kind == "expr":
            cond = ~F.expr(r["predicate"])
        elif kind == "unique":
            aggs.append(
                (F.count("*") - F.countDistinct(F.col(col)))
                .cast("bigint")
                .alias(f"__v_{r['rule']}")
            )
            row_rules.append(r)
            continue
        elif kind == "fk":
            continue  # joins below, not part of the scan aggregate
        else:
            raise ValueError(f"unknown expectation kind: {kind}")
        aggs.append(_viol(cond).alias(f"__v_{r['rule']}"))
        row_rules.append(r)

    if not rules:
        return df.sparkSession.createDataFrame(
            [],
            "rule STRING, column STRING, checked BIGINT, "
            "violations BIGINT, pass BOOLEAN",
        )

    parts = []
    # one row count serves every rule: reuse the single-scan aggregate's
    # __checked when row-wise rules exist, else count once — never once
    # per fk rule
    if aggs:
        one = df.agg(F.count("*").alias("__checked"), *aggs)
        checked_df = F.broadcast(
            one.select(F.col("__checked").alias("checked"))
        )
        for r in row_rules:
            parts.append(
                one.select(
                    F.lit(r["rule"]).alias("rule"),
                    F.lit(r.get("column", "")).alias("column"),
                    F.col("__checked").alias("checked"),
                    F.col(f"__v_{r['rule']}").alias("violations"),
                )
            )
    else:
        checked_df = F.broadcast(df.agg(F.count("*").alias("checked")))
    for r in rules:
        if r["kind"] != "fk":
            continue
        if not parents or r["parent"] not in parents:
            raise ValueError(
                f"fk rule {r['rule']!r} needs parents[{r['parent']!r}]"
            )
        parent = parents[r["parent"]]
        # dbt relationship-test convention (and the oracle's NOT IN
        # semantics): NULL child keys are not orphans — they belong to
        # a not_null rule
        orphans = (
            df.select(F.col(r["column"]).alias("__k"))
            .filter(F.col(r["column"]).isNotNull())
            .join(
                F.broadcast(
                    parent.select(
                        F.col(r["parent_key"]).alias("__k")
                    ).distinct()
                ),
                "__k",
                "anti",
            )
            .agg(F.count("*").alias("violations"))
        )
        parts.append(
            orphans.crossJoin(checked_df).select(
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["column"]).alias("column"),
                "checked",
                F.col("violations").cast("bigint").alias("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("pass", F.col("violations") == 0).orderBy("rule")


# ---------------------------------------------------------------------------
# verify key
# ---------------------------------------------------------------------------
def _register_expectations() -> None:
    from dodo_spark.catalog import load_table
    from dodo_spark.registry import register

    @register(
        "profile_expectations",
        oracle="""
        WITH base AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS checked,
                 CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL
                   THEN 1 END), 0) AS BIGINT) AS v_custkey_not_null,
                 CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                   AS v_orderkey_unique,
                 CAST(COALESCE(SUM(CASE WHEN o_orderstatus NOT IN
                   ('O','F','P') OR o_orderstatus IS NULL THEN 1 END), 0)
                   AS BIGINT) AS v_status_accepted,
                 CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0
                   OR o_totalprice IS NULL THEN 1 END), 0) AS BIGINT)
                   AS v_price_range,
                 CAST(COALESCE(SUM(CASE WHEN NOT (o_orderkey % 97 != 0)
                   THEN 1 END), 0) AS BIGINT) AS v_key_not_97
          FROM orders
        ), fk AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS v FROM orders
          WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)
        )
        SELECT rule, "column", checked, violations,
               (violations = 0) AS pass
        FROM (
          SELECT 'custkey_not_null' AS rule, 'o_custkey' AS "column",
                 checked, v_custkey_not_null AS violations FROM base
          UNION ALL
          SELECT 'orderkey_unique', 'o_orderkey', checked,
                 v_orderkey_unique FROM base
          UNION ALL
          SELECT 'status_accepted', 'o_orderstatus', checked,
                 v_status_accepted FROM base
          UNION ALL
          SELECT 'price_range', 'o_totalprice', checked,
                 v_price_range FROM base
          UNION ALL
          SELECT 'key_not_97', 'o_orderkey', checked,
                 v_key_not_97 FROM base
          UNION ALL
          SELECT 'custkey_fk', 'o_custkey', checked, fk.v
          FROM base, fk
        ) ORDER BY rule
        """,
        doc="Declarative expectations report (the Great-Expectations / "
        "dbt-tests pattern; report form of the versioned layer's "
        "fail-closed CHECK gate): six rules over orders — not-null, "
        "uniqueness (rows − distinct in the SAME single aggregate), "
        "accepted values, range, an arbitrary SQL predicate "
        "(deliberately failing: every 97th key, so the report carries "
        "real violation counts, not just zeros), and referential "
        "integrity as a broadcast anti-join. All row-wise rules fold "
        "into ONE scan; adding a rule adds a column, not a pass.",
    )
    def profile_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
        orders = load_table(spark, sf_dir, "orders")
        customer = load_table(spark, sf_dir, "customer")
        rules = [
            {"rule": "custkey_not_null", "kind": "not_null",
             "column": "o_custkey"},
            {"rule": "orderkey_unique", "kind": "unique",
             "column": "o_orderkey"},
            {"rule": "status_accepted", "kind": "accepted_values",
             "column": "o_orderstatus", "values": ["O", "F", "P"]},
            {"rule": "price_range", "kind": "range",
             "column": "o_totalprice", "min": 0},
            {"rule": "key_not_97", "kind": "expr",
             "column": "o_orderkey", "predicate": "o_orderkey % 97 != 0"},
            {"rule": "custkey_fk", "kind": "fk", "column": "o_custkey",
             "parent": "customer", "parent_key": "c_custkey"},
        ]
        return expectations_report(
            orders, rules, parents={"customer": customer}
        )


_register_expectations()
