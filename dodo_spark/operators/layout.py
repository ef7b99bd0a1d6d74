"""Data-layout operators: Z-order (Morton) clustering for multi-dimension
file skipping.

Beyond-reference scale surface (the lakehouse OPTIMIZE ZORDER primitive,
public analogues: Delta OPTIMIZE ZORDER BY, Iceberg sort-order z-curves):
a table range-partitioned and sorted by ONE column skips files only for
predicates on that column; interleaving the bits of two quantized columns
into a Morton code and laying files out along the curve gives BOTH columns
locality, so footer min/max stats prune files for either predicate. At
100 TB the layout job is one repartitionByRange on the z-value (a single
shuffle, AQE-sized) and the payoff is permanent: every later scan with a
selective predicate on either dimension opens a fraction of the files
(proved quantitatively by tests/test_layout.py against the same writer).

The z-value arithmetic is pure integer (quantize to 8 bits per dimension,
interleave via div/mod by powers of two), identical expression text on
both engines — no UDF, no float, whole-stage-codegen friendly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dodo_spark.catalog import load_table
from dodo_spark.registry import register

__all__ = ["z_formula", "zorder_frame", "zorder_repartitioned", "write_zordered"]

_BITS = 8
_SIDE = 1 << _BITS  # 256 cells per dimension


def z_formula(qx: str, qy: str, div: str) -> str:
    """Morton interleave of two pre-quantized 0..255 integer expressions
    as a SQL string: bit i of ``qx`` lands at position 2i+1, bit i of
    ``qy`` at 2i. Uses only div/mod/multiply on non-negative integers so
    the SAME formula (modulo the integer-division spelling: Spark ``DIV``,
    DuckDB ``//``) evaluates bit-identically on both engines."""
    terms = [
        f"((({qx} {div} {1 << i}) % 2) * {1 << (2 * i + 1)}"
        f" + (({qy} {div} {1 << i}) % 2) * {1 << (2 * i)})"
        for i in range(_BITS)
    ]
    return "(" + " + ".join(terms) + ")"


def zorder_frame(
    df: DataFrame,
    xcol: str,
    ycol: str,
    bounds: tuple[int, int, int, int],
    zcol: str = "z",
) -> DataFrame:
    """``df`` plus a ``zcol`` column: both integer dimensions quantized to
    ``_BITS`` bits against the supplied (minx, maxx, miny, maxy) bounds,
    then Morton-interleaved. Bounds are passed in (driver-side bounded
    literals — 4 scalars, the ref-pool idiom) so the frame itself stays a
    pure projection: no shuffle, no scan beyond the caller's. Raises if
    the input already carries a column named ``zcol`` — silently
    overwriting user data with the Morton code is never acceptable."""
    if zcol in df.columns:
        raise ValueError(
            f"zorder helper column {zcol!r} collides with an input column;"
            " pass a different zcol"
        )
    minx, maxx, miny, maxy = bounds
    qx = f"((CAST({xcol} AS BIGINT) - {minx}) * {_SIDE}) DIV {maxx - minx + 1}"
    qy = f"((CAST({ycol} AS BIGINT) - {miny}) * {_SIDE}) DIV {maxy - miny + 1}"
    return df.withColumn(zcol, F.expr(z_formula(f"({qx})", f"({qy})", "DIV")))


def zorder_repartitioned(
    df: DataFrame,
    xcol: str,
    ycol: str,
    n_files: int,
    bounds: tuple[int, int, int, int] | None = None,
) -> DataFrame:
    """``df`` laid out along the z-curve: range-partitioned on the
    z-value into ``n_files`` partitions, sorted within each, helper
    column dropped. The ONE shared recipe behind write_zordered and the
    versioned layer's OPTIMIZE-ZORDER compaction. ``bounds`` defaults to
    the frame's own extremes (one bounded 4-scalar aggregate); an empty
    or all-NULL frame falls back to a plain coalesce — there is nothing
    to cluster."""
    if bounds is None:
        ext = df.agg(
            F.min(xcol), F.max(xcol), F.min(ycol), F.max(ycol)
        ).collect()[0]
        if any(v is None for v in ext):
            return df.coalesce(max(1, n_files))
        bounds = (ext[0], ext[1], ext[2], ext[3])
    # collision-safe helper name: a user table legitimately named a
    # column "z"; clobbering it then dropping it would silently lose
    # that column's data in the rewritten files (round-8 advisor fix)
    zcol = "__zorder"
    while zcol in df.columns:
        zcol = "_" + zcol
    return (
        zorder_frame(df, xcol, ycol, bounds, zcol=zcol)
        .repartitionByRange(max(1, n_files), zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    xcol: str,
    ycol: str,
    bounds: tuple[int, int, int, int],
    n_files: int = 16,
) -> None:
    """Lay ``df`` out along the z-curve and write parquet. Each file then
    covers a contiguous z-range = a small tile in (x, y) space, so its
    footer min/max on BOTH columns is tight and either predicate skips
    most files. One shuffle total."""
    zorder_repartitioned(df, xcol, ycol, n_files, bounds).write.mode(
        "overwrite"
    ).parquet(path)


_ZORDER_ORACLE = f"""
WITH base AS (
  SELECT o_custkey AS c,
         date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d
  FROM orders
), ext AS (
  SELECT MIN(c) AS minc, MAX(c) AS maxc, MIN(d) AS mind, MAX(d) AS maxd
  FROM base
), q AS (
  SELECT c, d,
         ((c - minc) * {_SIDE}) // (maxc - minc + 1) AS qx,
         ((d - mind) * {_SIDE}) // (maxd - mind + 1) AS qy
  FROM base CROSS JOIN ext
), zed AS (
  SELECT c, d, {z_formula("qx", "qy", "//")} AS z FROM q
)
SELECT CAST(z // 1024 AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(c) AS BIGINT) AS min_cust, CAST(MAX(c) AS BIGINT) AS max_cust,
       CAST(MIN(d) AS BIGINT) AS min_day, CAST(MAX(d) AS BIGINT) AS max_day
FROM zed GROUP BY bucket ORDER BY bucket
"""


@register(
    "layout_zorder",
    oracle=_ZORDER_ORACLE,
    doc="Z-order (Morton) clustering of orders on (o_custkey, order day): "
    "quantize both dimensions to 8 bits against the table extremes, "
    "interleave the bits with pure div/mod integer arithmetic (the same "
    "formula text runs on both engines — no UDF), and report each "
    "64-z-range bucket's row count and per-dimension min/max envelope. "
    "The tight per-bucket envelopes on BOTH columns are the payload: "
    "files laid out along this curve (write_zordered) are skippable via "
    "footer stats for predicates on either dimension, where a "
    "single-column sort only serves one. Dimension extremes are 4 "
    "driver-side scalars (bounded-literal idiom); everything else is one "
    "scan + one aggregate. tests/test_layout.py proves the skipping "
    "quantitatively against the written files.",
)
def layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    )
    ext = o.agg(
        F.min("c"), F.max("c"), F.min("d"), F.max("d")
    ).collect()[0]
    z = zorder_frame(o, "c", "d", (ext[0], ext[1], ext[2], ext[3]))
    return (
        z.groupBy(F.expr("z DIV 1024").alias("bucket"))
        .agg(
            F.count("*").alias("n"),
            F.min("c").alias("min_cust"),
            F.max("c").alias("max_cust"),
            F.min("d").alias("min_day"),
            F.max("d").alias("max_day"),
        )
        .orderBy("bucket")
    )
