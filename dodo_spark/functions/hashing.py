"""Result-hashing kernels (SURVEY.md §2.B B12).

The reference hashes replay results with blake3 over rows in arrival order
(``src/replay.go:189-215``) — meaningless under distributed execution, so
the engine defines the hash as an ORDER-INSENSITIVE commutative aggregate:

    result_hash = SUM( int64( first 12 hex chars of md5(row canonical) ) )

md5 is available and bit-identical in both Spark and DuckDB; 12 hex chars
= 48 bits keeps every partial sum exact even in double-accumulating
engines. Null cells canonicalize to a sentinel so (NULL,'') != ('',NULL).

The SUM itself is taken modulo 2^48: a plain int64 sum of 48-bit values
overflows beyond ~32k rows — Spark (non-ANSI) wraps silently while DuckDB's
HUGEINT sum then errors on the BIGINT cast, silently breaking cross-engine
equality. Spark accumulates in DECIMAL(38,0) (exact), DuckDB in HUGEINT
(exact); both reduce mod 2^48, so the hash is exact at any row count.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["row_md5", "row_hash_int", "result_hash", "sql_row_md5", "sql_hex_int", "sql_result_hash"]

NULL_SENTINEL = "\x01N"
FIELD_SEP = "\t"
HEX_CHARS = 12
HASH_MOD = 1 << 48  # sum reduced mod 2^48: exact in both engines at any row count


def row_md5(*cols: Column | str) -> Column:
    canon = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(NULL_SENTINEL))
        for c in cols
    ]
    return F.md5(F.concat_ws(FIELD_SEP, *canon))


def row_hash_int(*cols: Column | str) -> Column:
    return F.conv(F.substring(row_md5(*cols), 1, HEX_CHARS), 16, 10).cast("bigint")


def result_hash(*cols: Column | str) -> Column:
    """Commutative aggregate hash of a result set (exact at any row count:
    decimal accumulation, reduced mod 2^48)."""
    return (
        F.pmod(F.sum(row_hash_int(*cols).cast("decimal(38,0)")), F.lit(HASH_MOD))
        .cast("bigint")
        .alias("result_hash")
    )


def sql_row_md5(cols: list[str]) -> str:
    canon = ", ".join(f"coalesce(CAST({c} AS VARCHAR), chr(1) || 'N')" for c in cols)
    return f"md5(concat_ws(chr(9), {canon}))"


def sql_hex_int(h: str, n: int = HEX_CHARS) -> str:
    """DuckDB twin of conv(hex,16,10): positional strpos arithmetic (no
    conv() in DuckDB). Use on a CTE column holding the md5 digest."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({h}, {i + 1}, 1)) - 1) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"CAST({terms} AS BIGINT)"


def sql_result_hash(h: str = "h") -> str:
    """SUM of hex-int over a CTE exposing the per-row digest as column h.
    HUGEINT sum (exact) reduced mod 2^48 — twin of :func:`result_hash`.
    Row hashes are non-negative, so plain ``%`` equals pmod."""
    return f"CAST(SUM({sql_hex_int(h)}) % {HASH_MOD} AS BIGINT)"
