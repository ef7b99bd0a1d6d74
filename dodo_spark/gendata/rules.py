"""Genconf rule model (SURVEY.md §2.C; reference ``src/generator/generator_defaults.go``).

Rule resolution order (reference ``src/gendata.go:104-162``,
``generator_defaults.go:165-198``):

    stats-derived  <-  per-type defaults  <-  genconf global ``type:`` rules
                   <-  per-table/per-column rules

``gen:`` sub-rules override everything at the column level *except*
``null_frequency`` and ``format`` (reference ``introduction.md:336-342``).
A genconf YAML may hold up to 128 ``---``-separated documents, each one
generation round (``cmd/gendata.go:38``).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import yaml

__all__ = [
    "DEFAULT_TYPE_RULES",
    "MAX_GENCONF_DOCS",
    "load_genconf",
    "merge_rules",
    "resolve_column_rule",
    "stats_rule",
]

MAX_GENCONF_DOCS = 128  # reference cmd/gendata.go:38

_I8, _I16, _I32 = 127, 32767, 2147483647

# reference generator_defaults.go:77-162 (DATE/DATETIME relative-to-now
# ranges are resolved at plan build time)
DEFAULT_TYPE_RULES: dict[str, dict[str, Any]] = {
    "ARRAY": {"length": {"min": 1, "max": 3}},
    "MAP": {"length": {"min": 1, "max": 3}},
    "JSON": {"structure": "STRUCT<col1:SMALLINT, col2:SMALLINT>"},
    "JSONB": {"structure": "STRUCT<col1:SMALLINT, col2:SMALLINT>"},
    "VARIANT": {"structure": "STRUCT<col1:SMALLINT, col2:SMALLINT>"},
    "BITMAP": {"length": 5, "min": 0, "max": _I32},
    "TEXT": {"length": {"min": 1, "max": 10}},
    "STRING": {"length": {"min": 1, "max": 10}},
    "VARCHAR": {"length": {"min": 1, "max": 10}},
    "TINYINT": {"min": 0, "max": _I8},
    "SMALLINT": {"min": 0, "max": _I16},
    "INT": {"min": 0, "max": _I32},
    "BIGINT": {"min": 0, "max": _I32},
    "LARGEINT": {"min": 0, "max": _I32},
    "FLOAT": {"min": 0, "max": _I16},
    "DOUBLE": {"min": 0, "max": _I32},
    "DECIMAL": {"min": 0, "max": _I32},
    "BOOLEAN": {},
    "CHAR": {},
    "DATE": {},  # resolved to [now-10y, now] lazily
    "DATETIME": {},
    "HLL": {},
    "IPV4": {},
    "IPV6": {},
    "STRUCT": {},
}

GLOBAL_NULL_FREQUENCY = 0.0


def default_date_range() -> tuple[_dt.date, _dt.date]:
    """[now-10y, now] (reference generator_defaults.go:154-161). Pinned to a
    day boundary so a plan is reproducible within a run."""
    today = _dt.date.today()
    return today.replace(year=today.year - 10), today


def merge_rules(base: dict, override: dict) -> dict:
    """Deep merge: override wins; nested dicts merge recursively."""
    out = dict(base)
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = merge_rules(out[k], v)
        else:
            out[k] = v
    return out


def stats_rule(base_type: str, col_stats: dict | None) -> dict:
    """Stats-derived rule (reference src/gendata.go:104-146): null frequency
    from null_count/count; string length from avg_size_byte with the +-5/10
    extent hack; min/max for everything else."""
    if not col_stats:
        return {}
    rule: dict[str, Any] = {}
    count = col_stats.get("count") or col_stats.get("row_count") or 0
    null_count = col_stats.get("null_count", 0)
    if count and 0 <= null_count / count < 1:
        rule["null_frequency"] = null_count / count

    string_like = base_type in ("STRING", "TEXT", "VARCHAR", "CHAR")
    if string_like:
        avg = int(col_stats.get("avg_size_byte") or 0)
        rule["length"] = avg
        mn, mx = str(col_stats.get("min", "")), str(col_stats.get("max", ""))
        if base_type != "CHAR" and len(mn) != len(mx):
            extent = 10 if avg > 10 else (5 if avg > 5 else 0)
            rule["length"] = {"min": avg - extent, "max": avg + extent}
    else:
        if col_stats.get("min") not in (None, ""):
            rule["min"] = col_stats["min"]
        if col_stats.get("max") not in (None, ""):
            rule["max"] = col_stats["max"]
    return rule


def resolve_column_rule(
    base_type: str,
    global_type_rules: dict[str, dict],
    column_rule: dict | None,
    col_stats: dict | None = None,
    not_null: bool = False,
) -> dict:
    """Full resolution chain for one column."""
    rule = stats_rule(base_type, col_stats)
    rule = merge_rules(DEFAULT_TYPE_RULES.get(base_type, {}), rule)
    g = global_type_rules.get(base_type.lower()) or global_type_rules.get(base_type) or {}
    rule = merge_rules(rule, g)
    if column_rule:
        rule = merge_rules(rule, column_rule)
    if not_null:
        rule["null_frequency"] = 0  # reference src/gendata.go:156-159
    rule.setdefault("null_frequency", GLOBAL_NULL_FREQUENCY)
    return rule


def load_genconf(text_or_path: str) -> list[dict]:
    """Load a (possibly multi-document) genconf YAML; one dict per round."""
    try:
        with open(text_or_path) as f:
            text = f.read()
    except (OSError, ValueError):
        text = text_or_path
    docs = [d for d in yaml.safe_load_all(text) if d is not None]
    if len(docs) > MAX_GENCONF_DOCS:
        raise ValueError(f"genconf has more than {MAX_GENCONF_DOCS} documents")
    return docs or [{}]
