"""Vector kernels over ``array<float>`` embedding columns.

Cross-engine determinism trick: floats are scaled to 1e-6-unit LONGs first
(``round(x * 1e6)``), so dot products and norms are exact integer sums —
order-independent and bit-identical in Spark and DuckDB (they stay below
2^53, so even a double-accumulating engine computes them exactly). The
final cosine is then a fixed sequence of double ops on identical inputs.

All kernels are built-in higher-order functions (zip_with/aggregate):
JVM-side, codegen'd, no Python boundary — at 100 TB the cosine is a
scan-side projection.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "scaled_vec",
    "dot_long",
    "cosine",
    "norm2_long",
    "cosine_pre",
    "SCALE",
    "sql_scaled_vec",
    "sql_cosine",
]

SCALE = 1_000_000


def scaled_vec(col: Column | str, scale: int = SCALE) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(c, lambda x: F.round(x.cast("double") * scale).cast("bigint"))


def dot_long(a: Column, b: Column) -> Column:
    """Exact integer dot product of two scaled vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two scaled-long vectors, deterministic double."""
    dot = dot_long(a, b).cast("double")
    na = dot_long(a, a).cast("double")
    nb = dot_long(b, b).cast("double")
    return dot / (F.sqrt(na) * F.sqrt(nb))


def norm2_long(v: Column) -> Column:
    """Exact integer squared norm of a scaled vector — precompute this
    per VECTOR (one scan-side projection) before any pairwise join so the
    join evaluates one array aggregate per pair instead of three."""
    return dot_long(v, v)


def cosine_pre(a: Column, b: Column, na2: Column, nb2: Column) -> Column:
    """``cosine`` with the squared norms precomputed via ``norm2_long``.

    Bit-identical to ``cosine``: the norms are exact integers (< 2^53),
    so casting the precomputed BIGINT to double yields the same value
    the inline ``dot_long(a, a).cast("double")`` produces, and the final
    double op sequence (dot / (sqrt * sqrt)) is unchanged. In an n²
    (or q×n) join this removes the two per-pair norm aggregates — the
    per-pair cost drops from three 64-element array reductions to one."""
    dot = dot_long(a, b).cast("double")
    return dot / (F.sqrt(na2.cast("double")) * F.sqrt(nb2.cast("double")))


def sql_scaled_vec(expr: str, scale: int = SCALE) -> str:
    """DuckDB twin of scaled_vec."""
    return f"list_transform({expr}, x -> CAST(round(CAST(x AS DOUBLE) * {scale}) AS BIGINT))"


def sql_cosine(a: str, b: str) -> str:
    """DuckDB twin of cosine over already-scaled vectors.

    list_dot_product accumulates in double, which is exact here because
    every partial sum of scaled-long products stays below 2^53.
    """
    return (
        f"(list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b}))))"
    )
