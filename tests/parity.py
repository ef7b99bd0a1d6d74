"""Local replica of the driver's DuckDB-oracle correctness gate.

Runs a registered Spark query and its DuckDB oracle over the same parquet
tables, normalizes both results, and asserts:
  1. row count equality
  2. column-name set equality + compatible dtype kinds
  3. order-insensitive exact value equality (the stand-in for the driver's
     value hash — stricter than any hash, so passing here implies the hash
     matches)
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb
import numpy as np
import pandas as pd

from dodo_spark.catalog import TABLES, table_path

__all__ = ["duckdb_con", "run_oracle", "normalize", "assert_parity"]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Pre-register every test table as a view, like the driver does."""
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def run_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> pd.DataFrame:
    return con.sql(sql).df()


def _canon_cell(v) -> str:
    """Deterministic canonical string for one cell."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "∅"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "∅" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, (pd.Timestamp, datetime)):
        if pd.isna(v):
            return "∅"
        t = pd.Timestamp(v)
        # DuckDB DATE columns arrive as datetime64 via .df(); render naive
        # midnight as the date form (the driver's normalizer does the same)
        # so they compare equal to a Spark DateType — consistent with the
        # dtype-level date/datetime _COMPAT rule below
        if t.tzinfo is None and t == t.normalize():
            return t.date().isoformat()
        return t.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if v is pd.NaT:
        return "∅"
    try:
        if pd.isna(v):
            return "∅"
    except (TypeError, ValueError):
        pass
    return str(v)


def _kind(dtype, series: pd.Series) -> str:
    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datetime"
    if dtype == object:
        for v in series.dropna().head(5):
            if isinstance(v, (datetime, pd.Timestamp)):
                return "datetime"
            if isinstance(v, date):
                return "date"
            if isinstance(v, (int, np.integer)):
                return "int"
            if isinstance(v, (float, np.floating)):
                return "float"
            if isinstance(v, (list, np.ndarray)):
                return "array"
        return "str"
    return str(dtype)


def normalize(df: pd.DataFrame) -> tuple[list[tuple[str, ...]], dict[str, str]]:
    """(sorted canonical rows, column->dtype-kind) with columns name-sorted."""
    cols = sorted(df.columns)
    kinds = {c: _kind(df[c].dtype, df[c]) for c in cols}
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    rows.sort()
    return rows, kinds


# date vs datetime: DuckDB DATE arrives as object-of-date or datetime64 —
# treat as compatible; everything else must match exactly.
_COMPAT = {frozenset({"date", "datetime"})}


def assert_parity(
    spark_df, oracle_df: pd.DataFrame, name: str = "?", float_rtol: float = 0.0
) -> None:
    """Strict by default (exact repr match — the driver-gate stand-in).

    ``float_rtol``: opt-in relative tolerance for float cells ONLY, for
    beyond-gate-scale comparisons: decimal SUMS are exact on both engines,
    but once a sum needs >15-16 significant digits the final
    decimal->double CAST differs by 1 ulp between Spark (correctly-rounded
    BigDecimal) and DuckDB (scaled-integer division). Driver-gate
    magnitudes never reach that; sf1+ rehearsals do.

    ``spark_df`` may be a pre-collected pandas frame (the scale rehearsal
    times the Spark materialization separately from the compare)."""
    sp = spark_df.toPandas() if hasattr(spark_df, "toPandas") else spark_df
    assert len(sp) == len(oracle_df), (
        f"{name}: row count {len(sp)} (spark) != {len(oracle_df)} (oracle)"
    )
    srows, skinds = normalize(sp)
    orows, okinds = normalize(oracle_df)
    assert set(skinds) == set(okinds), (
        f"{name}: columns {sorted(skinds)} (spark) != {sorted(okinds)} (oracle)"
    )
    for c in skinds:
        if skinds[c] != okinds[c] and frozenset({skinds[c], okinds[c]}) not in _COMPAT:
            raise AssertionError(
                f"{name}: column {c} dtype kind {skinds[c]} (spark) != {okinds[c]} (oracle)"
            )
    if float_rtol > 0.0 and srows != orows:
        def _close(a: str, b: str) -> bool:
            if a == b:
                return True
            try:
                fa, fb = float(a), float(b)
            except ValueError:
                return False
            return math.isclose(fa, fb, rel_tol=float_rtol)

        if len(srows) == len(orows) and all(
            len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
            for a, b in zip(srows, orows)
        ):
            return
    if srows != orows:
        diffs = [
            (i, a, b) for i, (a, b) in enumerate(zip(srows, orows)) if a != b
        ][:5]
        raise AssertionError(
            f"{name}: value mismatch; first diffs (spark vs oracle), cols={sorted(skinds)}: "
            + "\n".join(f"  row {i}:\n    S={a}\n    O={b}" for i, a, b in diffs)
        )
