"""Column-expression builders for data generation (SURVEY.md §2.C, C1-C13).

The reference walks a per-row Go generator tree (``src/generator/
generator.go:64-107``); here every generator is a Spark Column expression
over a ``spark.range(row_count)`` spine, so generation is columnar,
shuffle-free and scales linearly with executors.

Determinism: NO ``rand()`` — its stream depends on partitioning. Every
random draw is ``xxhash64(row_id, seed[, salt])`` mapped to [0,1), which is
reproducible under any partition layout and any session. ``salt`` threads
the element index through array/map/struct children so collection elements
differ within a row (reference ``GetChildGen`` recursion,
``generator.go:459-472``).

Implemented rule kinds: type generators (C1), null_frequency (C2), length
(C3), format + tags (C4, a curated tag subset of the reference's gofakeit
list), inc (C5), enum+weights (C6), parts (C7), ref (C8, pools injected by
``plan``), type override (C9), complex children element/key/value/fields/
structure (C11), from (C12, plan-level). The ``golang`` escape hatch (C10)
is intentionally unsupported: arbitrary-code generators don't belong in a
distributed plan; use a registered Python callable at the plan level.
"""

from __future__ import annotations

import datetime as _dt
import re
import zlib
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dodo_spark import ddl as ddlmod
from dodo_spark.gendata.rules import default_date_range

__all__ = ["GenContext", "build_generator", "column_expr", "GID"]

GID = "__gid"  # the spark.range spine column

_CHARSET = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"


class GenContext:
    """Shared state for one generation round: ref pools (C8) are bounded
    value lists (<= limit, default 1000 — reference src/generator/ref.go:18)
    sampled from already-generated tables and broadcast as literals."""

    def __init__(self) -> None:
        self.ref_pools: dict[str, list[Any]] = {}


def _seed_int(seed: str) -> int:
    return zlib.crc32(seed.encode())


def _uniform(seed: str, salt: Column | None = None) -> Column:
    args = [F.col(GID), F.lit(_seed_int(seed))]
    if salt is not None:
        args.append(salt)
    return F.pmod(F.xxhash64(*args), F.lit(1_000_000_000)).cast("double") / 1.0e9


def _rand_long(seed: str, lo: int, hi: int, salt: Column | None = None) -> Column:
    if hi < lo:
        lo, hi = hi, lo
    span = hi - lo + 1
    return (F.floor(_uniform(seed, salt) * span) + lo).cast("bigint")


def _rand_string(seed: str, length: Column, max_len: int, salt: Column | None) -> Column:
    """Alphanumeric random string: md5 -> base64 -> translate into the
    reference's a-zA-Z0-9 charset (misc.go:165-189), then cut to length."""
    blocks = max(1, (max_len + 21) // 22)
    parts = []
    for b in range(blocks):
        args = [F.col(GID).cast("string"), F.lit(f"{seed}#s{b}")]
        if salt is not None:
            args.append(salt.cast("string"))
        parts.append(
            F.translate(F.base64(F.unhex(F.md5(F.concat_ws("|", *args)))), "+/=", "ab")
        )
    return F.concat(*parts).substr(F.lit(1), length)


def _length_rule(rule: Any, default_min: int, default_max: int) -> tuple[int, int]:
    if rule is None:
        return default_min, default_max
    if isinstance(rule, dict):
        return int(rule.get("min", default_min)), int(rule.get("max", default_max))
    return int(rule), int(rule)


def _rand_len(seed: str, rule: Any, dmin: int, dmax: int, salt: Column | None) -> Column:
    lo, hi = _length_rule(rule, dmin, dmax)
    lo = max(lo, 0)
    hi = max(hi, lo)
    if lo == hi:
        return F.lit(lo)
    return _rand_long(seed + "#len", lo, hi, salt)


def _to_date(v: Any) -> _dt.date:
    if isinstance(v, _dt.datetime):
        return v.date()
    if isinstance(v, _dt.date):
        return v
    return _dt.date.fromisoformat(str(v)[:10])


def _to_ts(v: Any) -> _dt.datetime:
    if isinstance(v, _dt.datetime):
        return v
    if isinstance(v, _dt.date):
        return _dt.datetime(v.year, v.month, v.day)
    s = str(v)
    return (
        _dt.datetime.fromisoformat(s)
        if len(s) > 10
        else _dt.datetime.fromisoformat(s + " 00:00:00")
    )


# --------------------------------------------------------------------------
# format templates (C4)
# --------------------------------------------------------------------------
_TOKEN_RE = re.compile(r"\{\{(.*?)\}\}")

# the full tag surface lives in format_tags (reference registers ~200
# zero-arg gofakeit fakers, src/generator/format_tags.go:38-86); legacy
# spellings kept for genconfs written against the round-1 engine
_TAG_ALIASES = {"firstname": "first_name", "lastname": "last_name"}


def _tag_md5(seed: str) -> Column:
    return F.md5(F.concat(F.col(GID).cast("string"), F.lit(seed)))


def _tag_value(tag: str, seed: str) -> Column:
    from dodo_spark.gendata import format_tags

    value = format_tags.tag_column(_TAG_ALIASES.get(tag, tag), seed, _rand_long, _tag_md5)
    if value is None:
        raise ValueError(
            f"unknown format tag '{tag}' (supported: "
            f"{len(format_tags.supported_tags())} tags, see gendata/format_tags.py)"
        )
    return value


_GO_VERB = re.compile(r"^%[-+ 0#]*\d*(?:\.\d+)?[a-zA-Z]$")


def _apply_format(fmt: str, inner_vals: list[Column], seed: str) -> Column:
    """Render a Go-style template: {{%verb}} consumes the next inner value,
    {{tag}} injects a built-in tag (reference src/generator/format.go:22-81)."""
    fmt_parts: list[str] = []
    args: list[Column] = []
    pos = 0
    consumed = 0
    for m in _TOKEN_RE.finditer(fmt):
        fmt_parts.append(fmt[pos : m.start()].replace("%", "%%"))
        token = m.group(1).strip()
        if token.startswith("%"):
            if not _GO_VERB.match(token):
                raise ValueError(f"unsupported format verb '{token}'")
            verb = "%s" if token.endswith(("v", "q")) else token
            if consumed >= len(inner_vals):
                raise ValueError(f"format parts out of range in '{fmt}'")
            fmt_parts.append(verb)
            args.append(inner_vals[consumed])
            consumed += 1
        else:
            fmt_parts.append("%s")
            args.append(_tag_value(token, seed))
        pos = m.end()
    fmt_parts.append(fmt[pos:].replace("%", "%%"))
    return F.format_string("".join(fmt_parts), *args)


# --------------------------------------------------------------------------
# type-driven generators (C1)
# --------------------------------------------------------------------------
def _base_of(doris_type: str) -> tuple[str, str]:
    m = re.match(r"^([A-Z_0-9]+)\s*(.*)$", doris_type.strip(), flags=re.S)
    return m.group(1), m.group(2)


def _type_generator(
    doris_type: str, rule: dict, seed: str, ctx: GenContext, salt: Column | None
) -> Column:
    base, rest = _base_of(doris_type)

    if base == "BOOLEAN":
        return _uniform(seed, salt) < 0.5
    int_types = {"TINYINT": "tinyint", "SMALLINT": "smallint", "INT": "int", "BIGINT": "bigint"}
    if base in int_types:
        lo, hi = int(rule.get("min", 0)), int(rule.get("max", 0))
        return _rand_long(seed, lo, hi, salt).cast(int_types[base])
    if base == "LARGEINT":
        return _rand_long(seed, int(rule.get("min", 0)), int(rule.get("max", 0)), salt).cast(
            "decimal(38,0)"
        )
    if base in ("FLOAT", "DOUBLE"):
        lo, hi = float(rule.get("min", 0)), float(rule.get("max", 0))
        v = _uniform(seed, salt) * (hi - lo) + lo
        return v.cast("float") if base == "FLOAT" else v
    if base == "DECIMAL":
        pm = re.match(r"^\((\d+),(\d+)\)$", rest.replace(" ", "")) if rest else None
        p = int(pm.group(1)) if pm else int(rule.get("precision", 9))
        s = int(pm.group(2)) if pm else int(rule.get("scale", 0))
        p, s = min(p, 38), min(int(rule.get("scale", s)), min(p, 38))
        int_digits = p - s
        lo = int(rule.get("min", 0))
        hi = min(int(rule.get("max", 0)), 10**min(int_digits, 18) - 1 if int_digits else 0)
        ip = _rand_long(seed + "#i", lo, max(lo, hi), salt)
        if s == 0:
            return ip.cast(f"decimal({p},{s})")
        fs = min(s, 18)
        frac = _rand_long(seed + "#f", 0, 10**fs - 1, salt)
        txt = F.format_string(f"%d.%0{fs}d{'0' * (s - fs)}", ip, frac)
        return txt.cast(f"decimal({p},{s})")
    if base == "DATE":
        dmin, dmax = default_date_range()
        lo = _to_date(rule["min"]) if "min" in rule and rule["min"] is not None else dmin
        hi = _to_date(rule["max"]) if "max" in rule and rule["max"] is not None else dmax
        days = max((hi - lo).days, 0)
        return F.date_add(F.lit(lo), _rand_long(seed, 0, days, salt).cast("int"))
    if base == "DATETIME":
        dmin, dmax = default_date_range()
        lo = _to_ts(rule["min"]) if "min" in rule and rule["min"] is not None else _to_ts(dmin)
        hi = _to_ts(rule["max"]) if "max" in rule and rule["max"] is not None else _to_ts(dmax)
        span = max(int((hi - lo).total_seconds()), 0)
        start = int(lo.replace(tzinfo=_dt.timezone.utc).timestamp())
        return F.timestamp_seconds(F.lit(start) + _rand_long(seed, 0, span, salt))
    if base == "CHAR":
        n = int(rest.strip("()") or 1) if rest else 1
        return _rand_string(seed, F.lit(n), n, salt)  # exactly n (generator.go:357-363)
    if base in ("VARCHAR", "STRING", "TEXT"):
        cap = int(rest.strip("()")) if base == "VARCHAR" and rest else 65533
        lo, hi = _length_rule(rule.get("length"), 1, 10)
        lo, hi = max(1, min(lo, cap)), max(1, min(hi, cap))
        return _rand_string(seed, _rand_len(seed, {"min": lo, "max": hi}, lo, hi, salt), hi, salt)
    if base == "IPV4":
        return F.format_string(
            "%d.%d.%d.%d", *[_rand_long(f"{seed}#ip{i}", 0, 255, salt) for i in range(4)]
        )
    if base == "IPV6":
        h = F.md5(F.concat_ws("|", F.col(GID).cast("string"), F.lit(seed + "#ip6")))
        return F.concat_ws(
            ":", *[F.substring(h, 1 + 4 * i, 4) for i in range(8)]
        )
    if base == "BITMAP":
        # array of int64 loaded via bitmap_from_array (src/gendata.go:170-172)
        length = _rand_len(seed, rule.get("length"), 5, 5, salt)
        lo, hi = int(rule.get("min", 0)), int(rule.get("max", 2147483647))
        return F.transform(
            F.sequence(F.lit(1), length.cast("int")),
            lambda i: _rand_long(seed + "#bm", lo, hi, i if salt is None else salt * 1000 + i),
        )
    if base in ("JSON", "JSONB", "VARIANT"):
        structure = rule.get("structure", "STRUCT<col1:SMALLINT, col2:SMALLINT>")
        sdt, _ = ddlmod.parse_type(str(structure))
        inner_rule = {k: v for k, v in rule.items() if k in ("fields", "element", "key", "value", "length")}
        return F.to_json(build_generator(sdt, inner_rule, seed + "#json", ctx, salt))
    if base == "ARRAY":
        elem_type = rest[1:-1] if rest.startswith("<") else "STRING"
        elem_rule = rule.get("element") or {}
        length = _rand_len(seed, rule.get("length"), 1, 3, salt)
        return F.transform(
            F.sequence(F.lit(1), length.cast("int")),
            lambda i: build_generator(
                elem_type, elem_rule, seed + "#elem", ctx, i if salt is None else salt * 1000 + i
            ),
        )
    if base == "MAP":
        kt, vt = ddlmod._split_top(rest[1:-1]) if rest.startswith("<") else ("STRING", "STRING")
        length = _rand_len(seed, rule.get("length"), 1, 3, salt)
        idx = F.sequence(F.lit(1), length.cast("int"))
        keys = F.array_distinct(
            F.transform(
                idx,
                lambda i: build_generator(
                    kt, rule.get("key") or {}, seed + "#key", ctx, i if salt is None else salt * 1000 + i
                ),
            )
        )
        vals = F.transform(
            keys,
            lambda _, i: build_generator(
                vt, rule.get("value") or {}, seed + "#val", ctx,
                (i + 1) if salt is None else salt * 1000 + i + 1,
            ),
        )
        return F.map_from_arrays(keys, vals)
    if base == "STRUCT":
        _, spark_struct = ddlmod.parse_type(doris_type)
        field_rules = {fr.get("name"): fr for fr in rule.get("fields") or [] if isinstance(fr, dict)}
        inner_types = dict(
            zip(
                [f.name for f in spark_struct.fields],
                ddlmod._split_top(rest[1:-1]) if rest.startswith("<") else [],
            )
        )
        cols = []
        for f in spark_struct.fields:
            ft = inner_types.get(f.name, "STRING").split(":", 1)[-1]
            fr = field_rules.get(f.name, {})
            cols.append(
                build_generator(ft, fr, f"{seed}.{f.name}", ctx, salt).alias(f.name)
            )
        return F.struct(*cols)
    if base == "HLL":
        # not generated locally (reference generator.go:368-370); plan-level
        # `from:` mapping fills it — placeholder NULL here
        return F.lit(None).cast("bigint")
    raise ValueError(f"no generator for type {doris_type}")


# --------------------------------------------------------------------------
# custom generators (gen: rules) + wrappers
# --------------------------------------------------------------------------
def build_generator(
    doris_type: str, rule: dict, seed: str, ctx: GenContext, salt: Column | None = None
) -> Column:
    """Generator tree -> Column: custom ``gen:`` kind if present, else the
    type-driven generator; ``format`` and ``null_frequency`` wrap outermost
    (reference generator.go:64-107)."""
    rule = rule or {}
    gen = rule.get("gen") or {}
    fmt = rule.get("format")
    inner_vals: list[Column] | None = None

    if "inc" in gen or "start" in gen:
        step = int(gen.get("inc", 1) or 1)
        start = int(gen.get("start", 1))
        value = (F.col(GID) * step + start).cast("bigint")
    elif "enum" in gen:
        value = _enum_generator(doris_type, gen, seed, ctx, salt)
    elif "parts" in gen:
        if not fmt:
            raise ValueError("parts generator requires a format (generator.go:91-93)")
        inner_vals = [
            _part_value(doris_type, p, f"{seed}#part{i}", ctx, salt)
            for i, p in enumerate(gen["parts"])
        ]
        value = None
    elif "ref" in gen:
        target = gen["ref"]
        pool = ctx.ref_pools.get(target)
        if pool is None:
            raise ValueError(f"ref pool not generated yet: {target} (topo-order bug)")
        if not pool:
            value = F.lit(None)
        else:
            arr = F.array(*[F.lit(v) for v in pool])
            value = F.element_at(arr, _rand_long(seed + "#ref", 1, len(pool), salt).cast("int"))
    elif "type" in gen:
        other = str(gen["type"]).upper()
        sub_rule = {k: v for k, v in {**rule, **gen}.items() if k not in ("gen", "format", "type")}
        value = build_generator(other, sub_rule, seed + "#astype", ctx, salt)
    elif "golang" in gen:
        raise ValueError(
            "the 'golang:' escape hatch (C10, reference src/generator/"
            "golang.go:26-65) is not supported in the Spark engine: arbitrary "
            "Go code cannot run in a distributed plan. Use a 'format:' "
            "template with tags, an 'enum:' rule, or register a Python "
            "callable at the plan level (GendataPlan custom generators)"
        )
    else:
        value = _type_generator(doris_type, rule, seed, ctx, salt)

    if fmt:
        if inner_vals is None:
            inner_vals = [] if value is None else [value]
        formatted = _apply_format(fmt, inner_vals, seed)
        if inner_vals:
            any_null = inner_vals[0].isNull()
            for v in inner_vals[1:]:
                any_null = any_null | v.isNull()
            formatted = F.when(any_null, F.lit(None)).otherwise(formatted)
        value = formatted

    p = float(rule.get("null_frequency") or 0)
    if p > 0:
        value = F.when(_uniform(seed + "#null", salt) < p, F.lit(None)).otherwise(value)
    return value


def _part_value(
    doris_type: str, part: Any, seed: str, ctx: GenContext, salt: Column | None
) -> Column:
    if isinstance(part, dict):
        return build_generator(part.get("gen", {}).get("type", doris_type).upper()
                               if isinstance(part.get("gen"), dict) and "type" in part["gen"]
                               else doris_type,
                               part, seed, ctx, salt)
    return F.lit(part)


def _enum_generator(
    doris_type: str, gen: dict, seed: str, ctx: GenContext, salt: Column | None
) -> Column:
    """enum + weights (C6, reference enum.go:24-97): weighted choice among
    literals or nested generators."""
    options = gen["enum"]
    weights = gen.get("weights")

    def opt_value(opt: Any, i: int) -> Column:
        if isinstance(opt, dict):
            return build_generator(doris_type, opt if "gen" in opt or "format" in opt else {"gen": {}, **opt},
                                   f"{seed}#opt{i}", ctx, salt) if ("gen" in opt or "format" in opt) \
                else build_generator(doris_type, opt, f"{seed}#opt{i}", ctx, salt)
        return F.lit(opt)

    if weights:
        if abs(sum(weights) - 1.0) > 1e-6:
            raise ValueError("enum weights must sum to 1 (enum.go:24-97)")
        u = _uniform(seed + "#enum", salt)
        cum = 0.0
        expr = None
        for i, (opt, w) in enumerate(zip(options, weights)):
            cum += w
            v = opt_value(opt, i)
            expr = F.when(u < cum, v) if expr is None else expr.when(u < cum, v)
        return expr.otherwise(opt_value(options[-1], len(options) - 1))
    idx = _rand_long(seed + "#enum", 0, len(options) - 1, salt)
    expr = None
    for i, opt in enumerate(options):
        v = opt_value(opt, i)
        expr = F.when(idx == i, v) if expr is None else expr.when(idx == i, v)
    return expr


def column_expr(coldef: ddlmod.ColumnDef, rule: dict, ctx: GenContext) -> Column:
    """Full column expression, cast to the column's Spark type when no
    format string reshaped it."""
    value = build_generator(coldef.doris_type, rule, coldef.name, ctx)
    if not (rule or {}).get("format"):
        value = value.cast(coldef.spark_type)
    return value.alias(coldef.name)
