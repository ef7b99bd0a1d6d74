"""Doris DDL -> Spark StructType translator (SURVEY.md §1.2/§1.3).

The reference parses DDL with a full ANTLR grammar (reference
``src/parser/DorisParser.g4:163-177, 1386-1402, 1685-1734``); we need only
the ``columnDefs`` block plus the physical-layout clauses, so a focused
depth-aware splitter + recursive-descent type parser covers the surface
without porting a 111k-line parser.

Type mapping (SURVEY §1.2): LARGEINT -> decimal(38,0); BITMAP ->
array<bigint>; HLL -> binary sketch source (modeled as bigint column +
approx_count_distinct at query time); JSON/JSONB/VARIANT -> string holding
JSON; IPV4/IPV6 -> string. AGG_STATE/QUANTILE_STATE/TIME are parsed but
flagged unsupported (same as the reference's generator,
``src/generator/generator.go:371-372``).

Layout mapping (SURVEY §1.3): DISTRIBUTED BY -> repartition/bucketBy hint,
PARTITION BY -> parquet partition columns, AGGREGATE KEY -> per-column agg
types recorded for an upsert view; indexes/properties recorded and ignored.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

__all__ = ["ColumnDef", "TableDef", "parse_type", "parse_create_table", "TYPE_ALIAS"]

# reference src/generator/generator_defaults.go:23-34
TYPE_ALIAS = {
    "INTEGER": "INT",
    "TEXT": "STRING",
    "BOOL": "BOOLEAN",
    "DECIMALV2": "DECIMAL",
    "DECIMALV3": "DECIMAL",
    "DATEV1": "DATE",
    "DATEV2": "DATE",
    "DATETIMEV1": "DATETIME",
    "DATETIMEV2": "DATETIME",
    "TIMESTAMP": "DATETIME",
}

AGG_TYPES = {
    "SUM",
    "MAX",
    "MIN",
    "REPLACE",
    "REPLACE_IF_NOT_NULL",
    "HLL_UNION",
    "BITMAP_UNION",
    "QUANTILE_UNION",
    "GENERIC",
    "NONE",
}

UNSUPPORTED_TYPES = {"AGG_STATE", "QUANTILE_STATE", "TIME", "ALL"}


@dataclass
class ColumnDef:
    name: str
    doris_type: str  # normalized, e.g. DECIMAL(10,2), ARRAY<INT>
    spark_type: T.DataType
    nullable: bool = True
    agg_type: str | None = None
    default: str | None = None
    comment: str | None = None
    auto_increment: bool = False


@dataclass
class TableDef:
    name: str
    columns: list[ColumnDef]
    key_type: str | None = None  # DUPLICATE | UNIQUE | AGGREGATE
    key_columns: list[str] = field(default_factory=list)
    distribution: dict | None = None  # {"kind": HASH|RANDOM, "columns": [...], "buckets": ...}
    partition_clause: str | None = None
    properties: dict = field(default_factory=dict)

    @property
    def schema(self) -> T.StructType:
        return T.StructType(
            [T.StructField(c.name, c.spark_type, c.nullable) for c in self.columns]
        )


# --------------------------------------------------------------------------
# type parser
# --------------------------------------------------------------------------
def _split_top(s: str, sep: str = ",") -> list[str]:
    """Split on sep at angle/paren depth 0."""
    parts, depth, start = [], 0, 0
    for i, ch in enumerate(s):
        if ch in "<(":
            depth += 1
        elif ch in ">)":
            depth -= 1
        elif ch == sep and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p.strip() for p in parts if p.strip()]


def _strip_comments(s: str) -> str:
    s = re.sub(r"--[^\n]*", "", s)
    return re.sub(r"/\*.*?\*/", "", s, flags=re.S)


def parse_type(type_str: str) -> tuple[str, T.DataType]:
    """Parse one Doris type string -> (normalized doris type, Spark type)."""
    s = _strip_comments(type_str).strip()
    m = re.match(r"^([A-Za-z_0-9]+)\s*(.*)$", s, flags=re.S)
    if not m:
        raise ValueError(f"cannot parse type: {type_str!r}")
    base = m.group(1).upper()
    rest = m.group(2).strip()
    base = TYPE_ALIAS.get(base, base)

    if base in UNSUPPORTED_TYPES:
        raise ValueError(f"unsupported Doris type (same gap as reference): {base}")

    simple = {
        "BOOLEAN": T.BooleanType(),
        "TINYINT": T.ByteType(),
        "SMALLINT": T.ShortType(),
        "INT": T.IntegerType(),
        "BIGINT": T.LongType(),
        "FLOAT": T.FloatType(),
        "DOUBLE": T.DoubleType(),
        "DATE": T.DateType(),
        "DATETIME": T.TimestampType(),
        "STRING": T.StringType(),
        "IPV4": T.StringType(),
        "IPV6": T.StringType(),
        "JSON": T.StringType(),
        "JSONB": T.StringType(),
        "VARIANT": T.StringType(),
    }
    if base == "LARGEINT":
        return "LARGEINT", T.DecimalType(38, 0)
    if base == "BITMAP":
        return "BITMAP", T.ArrayType(T.LongType())
    if base == "HLL":
        return "HLL", T.LongType()
    if base in simple:
        # DATETIME(p) precision and TINYINT(1)-style display width are noise
        return base, simple[base]

    if base == "DECIMAL":
        pm = re.match(r"^\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\)", rest)
        p = int(pm.group(1)) if pm else 9
        sc = int(pm.group(2)) if pm and pm.group(2) else 0
        p = min(p, 38)  # reference clamps precision to 38 (generator.go:252-325)
        sc = min(sc, p)
        return f"DECIMAL({p},{sc})", T.DecimalType(p, sc)
    if base in ("CHAR", "VARCHAR"):
        pm = re.match(r"^\(\s*(\d+)\s*\)", rest)
        n = int(pm.group(1)) if pm else (1 if base == "CHAR" else 65533)
        return f"{base}({n})", T.StringType()
    if base == "ARRAY":
        inner = re.match(r"^<(.*)>$", rest, flags=re.S)
        dt, st = parse_type(inner.group(1)) if inner else ("STRING", T.StringType())
        return f"ARRAY<{dt}>", T.ArrayType(st)
    if base == "MAP":
        inner = re.match(r"^<(.*)>$", rest, flags=re.S)
        k, v = _split_top(inner.group(1)) if inner else ("STRING", "STRING")
        kd, ks = parse_type(k)
        vd, vs = parse_type(v)
        return f"MAP<{kd},{vd}>", T.MapType(ks, vs)
    if base == "STRUCT":
        inner = re.match(r"^<(.*)>$", rest, flags=re.S)
        fields, norm = [], []
        for fdef in _split_top(inner.group(1)) if inner else []:
            fm = re.match(r"^`?([A-Za-z_0-9]+)`?\s*:\s*(.*)$", fdef, flags=re.S)
            fd, fs = parse_type(fm.group(2))
            fields.append(T.StructField(fm.group(1), fs))
            norm.append(f"{fm.group(1)}:{fd}")
        return "STRUCT<" + ",".join(norm) + ">", T.StructType(fields)
    raise ValueError(f"unknown Doris type: {base}")


# --------------------------------------------------------------------------
# CREATE TABLE parser
# --------------------------------------------------------------------------
_COL_RE = re.compile(
    r"^`?([A-Za-z_0-9@$]+)`?\s+(.+)$",
    flags=re.S,
)
_NON_COLUMN_PREFIX = ("INDEX", "PRIMARY", "CONSTRAINT", "KEY ", "KEY(", "UNIQUE ")


def _parse_column(entry: str) -> ColumnDef | None:
    if entry.upper().startswith(_NON_COLUMN_PREFIX):
        return None
    m = _COL_RE.match(entry.strip())
    if not m:
        return None
    name, rest = m.group(1), m.group(2).strip()

    comment = None
    cm = re.search(r"\bCOMMENT\s+'((?:[^']|'')*)'\s*$", rest, flags=re.I | re.S)
    if cm:
        comment = cm.group(1)
        rest = rest[: cm.start()].strip()

    default = None
    dm = re.search(r"\bDEFAULT\s+(\S+|'[^']*')\s*$", rest, flags=re.I)
    if dm:
        default = dm.group(1).strip("'")
        rest = rest[: dm.start()].strip()

    auto_inc = False
    am = re.search(r"\bAUTO_INCREMENT(\s*\(\s*\d+\s*\))?\s*$", rest, flags=re.I)
    if am:
        auto_inc = True
        rest = rest[: am.start()].strip()

    nullable = True
    nm = re.search(r"\b(NOT\s+NULL|NULL)\s*$", rest, flags=re.I)
    if nm:
        nullable = not nm.group(1).upper().startswith("NOT")
        rest = rest[: nm.start()].strip()

    agg = None
    toks = rest.rsplit(None, 1)
    if len(toks) == 2 and toks[1].upper() in AGG_TYPES:
        agg = toks[1].upper()
        rest = toks[0].strip()

    doris_type, spark_type = parse_type(rest)
    return ColumnDef(
        name=name,
        doris_type=doris_type,
        spark_type=spark_type,
        nullable=nullable,
        agg_type=agg,
        default=default,
        comment=comment,
        auto_increment=auto_inc,
    )


def parse_create_table(ddl: str) -> TableDef:
    """Parse a Doris CREATE TABLE statement into a TableDef."""
    s = _strip_comments(ddl)
    m = re.search(
        r"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?((?:`[^`]+`|[A-Za-z_0-9.]+))\s*\(",
        s,
        flags=re.I,
    )
    if not m:
        raise ValueError("not a CREATE TABLE statement")
    name = m.group(1).replace("`", "").split(".")[-1]

    # matching close paren of the columnDefs block
    depth, start, end = 0, m.end() - 1, -1
    in_str = False
    for i in range(start, len(s)):
        ch = s[i]
        if in_str:
            in_str = ch != "'"
            continue
        if ch == "'":
            in_str = True
        elif ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
            if depth == 0:
                end = i
                break
    body, tail = s[start + 1 : end], s[end + 1 :]

    columns = [c for c in (_parse_column(e) for e in _split_top(body)) if c is not None]

    key_type, key_cols = None, []
    km = re.search(r"\b(DUPLICATE|UNIQUE|AGGREGATE)\s+KEY\s*\(([^)]*)\)", tail, flags=re.I)
    if km:
        key_type = km.group(1).upper()
        key_cols = [c.strip().strip("`") for c in km.group(2).split(",") if c.strip()]

    distribution = None
    dm = re.search(
        r"\bDISTRIBUTED\s+BY\s+(HASH\s*\(([^)]*)\)|RANDOM)(?:\s+BUCKETS\s+(\d+|AUTO))?",
        tail,
        flags=re.I,
    )
    if dm:
        kind = "HASH" if dm.group(1).upper().startswith("HASH") else "RANDOM"
        cols = (
            [c.strip().strip("`") for c in dm.group(2).split(",")] if dm.group(2) else []
        )
        buckets = dm.group(3).upper() if dm.group(3) else "AUTO"
        distribution = {"kind": kind, "columns": cols, "buckets": buckets}

    pm = re.search(r"\bPARTITION\s+BY\s+(\w+\s*\([^)]*\))", tail, flags=re.I)
    partition_clause = pm.group(1) if pm else None

    props = dict(re.findall(r'"([^"]+)"\s*=\s*"([^"]*)"', tail))

    return TableDef(
        name=name,
        columns=columns,
        key_type=key_type,
        key_columns=key_cols,
        distribution=distribution,
        partition_clause=partition_clause,
        properties=props,
    )


def spark_type_to_doris(dt: T.DataType) -> str:
    """Spark type -> Doris type spelling (inverse of parse_type for the
    §1.2 mapping; used when dumping catalog tables to DDL files)."""
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.ByteType):
        return "TINYINT"
    if isinstance(dt, T.ShortType):
        return "SMALLINT"
    if isinstance(dt, T.IntegerType):
        return "INT"
    if isinstance(dt, T.LongType):
        return "BIGINT"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType) or isinstance(dt, T.TimestampNTZType):
        return "DATETIME"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.BinaryType):
        return "STRING"  # documented delta: no Doris binary column type
    if isinstance(dt, T.ArrayType):
        return f"ARRAY<{spark_type_to_doris(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"MAP<{spark_type_to_doris(dt.keyType)},{spark_type_to_doris(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_type_to_doris(f.dataType)}" for f in dt.fields)
        return f"STRUCT<{inner}>"
    raise ValueError(f"no Doris spelling for Spark type {dt}")


def render_create_table(table: TableDef) -> str:
    """TableDef -> Doris CREATE TABLE text (inverse of parse_create_table;
    reference dump writes `<db>.<table>.<type>.sql` files,
    cmd/dump.go:283-346). parse(render(parse(x))) == parse(x)."""
    lines = []
    for c in table.columns:
        null = "NOT NULL" if not c.nullable else "NULL"
        agg = f" {c.agg_type}" if c.agg_type else ""
        lines.append(f"  `{c.name}` {c.doris_type.lower()}{agg} {null}")
    body = ",\n".join(lines)
    tail = ["ENGINE=OLAP"]
    if table.key_type:
        keys = ", ".join(f"`{k}`" for k in table.key_columns)
        tail.append(f"{table.key_type} KEY({keys})")
    if table.partition_clause:
        tail.append(f"PARTITION BY {table.partition_clause}")
    d = table.distribution
    if d:
        if d["kind"] == "HASH":
            cols = ", ".join(f"`{c}`" for c in d["columns"])
            tail.append(f"DISTRIBUTED BY HASH({cols}) BUCKETS {d['buckets']}")
        else:
            tail.append(f"DISTRIBUTED BY RANDOM BUCKETS {d['buckets']}")
    if table.properties:
        props = ",\n".join(f'  "{k}" = "{v}"' for k, v in table.properties.items())
        tail.append(f"PROPERTIES (\n{props}\n)")
    return f"CREATE TABLE `{table.name}` (\n{body}\n)\n" + "\n".join(tail)


def tabledef_from_dataframe(name: str, schema: T.StructType) -> TableDef:
    """Catalog table -> TableDef (for DDL dump of live tables)."""
    cols = [
        ColumnDef(
            name=f.name,
            doris_type=spark_type_to_doris(f.dataType),
            spark_type=f.dataType,
            nullable=f.nullable,
        )
        for f in schema.fields
    ]
    return TableDef(name=name, columns=cols)
