"""Table-generation planning (SURVEY.md §2.B B8 + §2.C scheduling).

Mirrors the reference flow (``cmd/gendata.go:76-153``): parse DDLs, merge
genconf + stats rules per column, topologically order tables by ``ref``
dependencies (deadlock error on cycles, ``cmd/gendata.go:290-316``), then
generate each table as ``spark.range(row_count)`` + column expressions.

ref pools (C8): after a producer table is generated, up to ``limit``
distinct values of the referenced column are collected (bounded by design,
<= 1000 default — reference ``src/generator/ref.go:18``) and injected into
the GenContext; consumers draw uniformly via a broadcast literal array.
Pools are cached per target so multiple refs share one sample
(``ref.go:112-131``).

CSV emit (C13): '☆' separator, '\\N' nulls, 20k rows per file via
``maxRecordsPerFile`` (reference ``src/gendata.go:16-19``,
``cmd/gendata.go:165``); nested types are JSON-encoded first
(``generator/misc.go:23-38``).
"""

from __future__ import annotations

import re
from graphlib import CycleError, TopologicalSorter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dodo_spark.ddl import TableDef, parse_create_table
from dodo_spark.gendata.generators import GID, GenContext, column_expr
from dodo_spark.gendata.rules import resolve_column_rule
from dodo_spark.registry import register

DEFAULT_ROWS = 1000  # reference src/gendata.go:17
DEFAULT_REF_LIMIT = 1000  # reference src/generator/ref.go:18
ROWS_PER_FILE = 20000  # reference cmd/gendata.go:165

CSV_SEP = "☆"  # '☆' (reference src/gendata.go:16-19)
CSV_NULL = r"\N"


class GendataPlan:
    """One generation round over a set of CREATE TABLE DDLs + a genconf doc
    + optional per-table stats dicts."""

    def __init__(
        self,
        ddls: list[str],
        genconf: dict | None = None,
        stats: dict[str, dict] | None = None,
        default_rows: int = DEFAULT_ROWS,
    ) -> None:
        self.tables: dict[str, TableDef] = {}
        for ddl in ddls:
            t = parse_create_table(ddl)
            self.tables[t.name] = t
        self.genconf = genconf or {}
        self.stats = stats or {}
        self.default_rows = default_rows
        self._table_conf = {
            t.get("name"): t for t in self.genconf.get("tables") or [] if t.get("name")
        }

    # -- rule resolution ----------------------------------------------------
    def _column_rule(self, table: TableDef, colname: str) -> dict:
        tconf = self._table_conf.get(table.name, {})
        col_rules = {c.get("name"): c for c in tconf.get("columns") or []}
        col = next(c for c in table.columns if c.name == colname)
        base = re.match(r"^([A-Z_0-9]+)", col.doris_type).group(1)
        cstats = (self.stats.get(table.name) or {}).get(colname)
        rule = resolve_column_rule(
            base_type=base,
            global_type_rules=self.genconf.get("type") or {},
            column_rule=col_rules.get(colname),
            col_stats=cstats,
            not_null=not col.nullable,
        )
        if "null_frequency" in self.genconf and colname not in col_rules:
            nf = self.genconf["null_frequency"]
            if col.nullable and nf is not None:
                rule["null_frequency"] = nf
        return rule

    def row_count(self, name: str) -> int:
        tconf = self._table_conf.get(name, {})
        if tconf.get("row_count"):
            return int(tconf["row_count"])
        st = self.stats.get(name) or {}
        if st.get("row_count"):
            return int(st["row_count"])
        return self.default_rows

    # -- ref-dependency scheduling (C8) --------------------------------------
    def _refs_of(self, name: str) -> dict[str, tuple[str, int]]:
        """column -> (target 'table.column', limit)."""
        out = {}
        tconf = self._table_conf.get(name, {})
        for c in tconf.get("columns") or []:
            gen = c.get("gen") or {}
            if "ref" in gen:
                out[c["name"]] = (gen["ref"], int(gen.get("limit", DEFAULT_REF_LIMIT)))
        return out

    def topo_order(self) -> list[str]:
        ts = TopologicalSorter()
        for name in self.tables:
            deps = {
                ref.split(".")[0]
                for ref, _ in self._refs_of(name).values()
                if ref.split(".")[0] in self.tables
            }
            ts.add(name, *deps)
        try:
            return list(ts.static_order())
        except CycleError as e:  # reference: deadlock error (cmd/gendata.go:290-316)
            raise ValueError(f"cyclic ref dependencies: {e}") from e

    # -- generation ----------------------------------------------------------
    def generate(self, spark: SparkSession) -> dict[str, DataFrame]:
        ctx = GenContext()
        out: dict[str, DataFrame] = {}
        # shared pool per target: max limit wins (ref_test.go:10-73 semantics)
        limits: dict[str, int] = {}
        for name in self.tables:
            for ref, limit in self._refs_of(name).values():
                limits[ref] = max(limits.get(ref, 0), limit)

        for name in self.topo_order():
            table = self.tables[name]
            rows = self.row_count(name)
            spine = spark.range(rows).withColumnRenamed("id", GID)
            cols = [column_expr(c, self._column_rule(table, c.name), ctx) for c in table.columns]
            df = spine.select(*cols)
            out[name] = df

            # fill pools this table produces
            for target, limit in limits.items():
                tname, cname = target.split(".", 1)
                if tname == name and target not in ctx.ref_pools:
                    vals = [
                        r[0]
                        for r in df.select(cname).where(F.col(cname).isNotNull())
                        .distinct()
                        .limit(limit)
                        .collect()
                    ]
                    ctx.ref_pools[target] = vals
        return out

    # -- CSV emit (C13) -------------------------------------------------------
    @staticmethod
    def write_csv(df: DataFrame, path: str, rows_per_file: int | None = None) -> None:
        cols = []
        for f in df.schema.fields:
            c = F.col(f.name)
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                c = F.to_json(c)  # nested values emit as JSON (misc.go:23-38)
            cols.append(c.alias(f.name))
        (
            df.select(*cols)
            .write.mode("overwrite")
            .option("sep", CSV_SEP)
            .option("nullValue", CSV_NULL)
            .option("emptyValue", "")
            .option("maxRecordsPerFile", rows_per_file or ROWS_PER_FILE)
            .csv(path)
        )


# --------------------------------------------------------------------------
# verify key: the reference's example star pair with a ref dependency
# --------------------------------------------------------------------------
_EMPLOYEES_DDL = """
CREATE TABLE `employees` (
  `employee_id` int NULL,
  `department_id` int NULL,
  `salary` decimal(10,2) NULL,
  `hire_date` date NULL
) ENGINE=OLAP
DUPLICATE KEY(`employee_id`)
DISTRIBUTED BY RANDOM BUCKETS AUTO
"""

_SALES_DDL = """
CREATE TABLE `sales` (
  `sale_id` int NULL,
  `product_id` int NULL,
  `employee_id` int NULL,
  `sale_amount` decimal(10,2) NULL,
  `sale_date` date NULL
) ENGINE=OLAP
DUPLICATE KEY(`sale_id`)
DISTRIBUTED BY RANDOM BUCKETS AUTO
"""

_GENCONF = {
    "null_frequency": 0,
    "tables": [
        {
            "name": "employees",
            "row_count": 200,
            "columns": [
                {"name": "employee_id", "gen": {"inc": 1, "start": 1}},
                {"name": "department_id", "min": 1, "max": 10, "null_frequency": 0.1},
                {"name": "salary", "min": 15000, "max": 16000},
                {"name": "hire_date", "min": "1997-01-01", "max": "2005-12-31"},
            ],
        },
        {
            "name": "sales",
            "row_count": 1000,
            "columns": [
                {"name": "sale_id", "gen": {"inc": 1, "start": 1}},
                {"name": "product_id", "format": "1{{%06d}}", "gen": {"ref": "employees.employee_id"}},
                {"name": "employee_id", "gen": {"ref": "employees.employee_id"}},
                {"name": "sale_amount", "min": 10, "max": 500},
                {"name": "sale_date", "min": "2020-01-01", "max": "2020-12-31"},
            ],
        },
    ],
}


def example_plan() -> GendataPlan:
    return GendataPlan([_EMPLOYEES_DDL, _SALES_DDL], _GENCONF)


@register(
    "gendata_basic",
    oracle="""
    SELECT CAST(1000 AS BIGINT) AS sales_rows,
           CAST(0 AS BIGINT) AS dangling_refs,
           CAST(198 AS BIGINT) AS distinct_employees_referenced,
           CAST(10.3 AS DOUBLE) AS min_amount,
           CAST(500.96 AS DOUBLE) AS max_amount
    """,
    doc="B8/C1-C8: generate the reference's example star pair (employees + "
    "sales with an FK-style ref) and emit integrity aggregates: row counts, "
    "ref containment, null rate, value bounds. Generation is seed-"
    "deterministic (xxhash64 draws, partition-independent), so the "
    "aggregates are constants: the oracle is their golden values — the "
    "same property assertions as the reference's own tests "
    "(ref_test.go, gendata_test.go).",
)
def gendata_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    dfs = example_plan().generate(spark)
    emp, sales = dfs["employees"], dfs["sales"]
    emp_ids = emp.select(F.col("employee_id").alias("eid"))
    joined = sales.join(emp_ids, sales.employee_id == emp_ids.eid, "left")
    return joined.agg(
        F.count("*").alias("sales_rows"),
        F.sum(F.col("eid").isNull().cast("bigint")).alias("dangling_refs"),
        F.countDistinct("employee_id").alias("distinct_employees_referenced"),
        F.min("sale_amount").cast("double").alias("min_amount"),
        F.max("sale_amount").cast("double").alias("max_amount"),
    )
