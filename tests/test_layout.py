"""Z-order layout: the written files must actually be skippable on BOTH
dimensions, which is the entire point of the curve."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F


def _file_ranges(path: str, cols: list[str]) -> list[dict[str, tuple]]:
    """Per parquet file: {col: (min, max)} from footer row-group stats."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        rng: dict[str, tuple] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name in cols and col.statistics is not None:
                    mn, mx = col.statistics.min, col.statistics.max
                    if name in rng:
                        rng[name] = (min(rng[name][0], mn), max(rng[name][1], mx))
                    else:
                        rng[name] = (mn, mx)
        out.append(rng)
    return out


def _survivors(ranges, col, lo, hi) -> int:
    """Files a [lo, hi] predicate on col must still open."""
    return sum(1 for r in ranges if not (r[col][1] < lo or r[col][0] > hi))


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    from dodo_spark.operators.layout import write_zordered, zorder_frame

    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        F.col("o_custkey").alias("c"),
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01"))
        .cast("bigint")
        .alias("d"),
    )
    ext = o.agg(F.min("c"), F.max("c"), F.min("d"), F.max("d")).collect()[0]
    bounds = (ext[0], ext[1], ext[2], ext[3])
    n_files = 16

    zpath = str(tmp_path / "zordered")
    write_zordered(o, zpath, "c", "d", bounds, n_files=n_files)
    # baseline: the same data laid out by a single-dimension sort (date)
    dpath = str(tmp_path / "datesorted")
    (
        o.repartitionByRange(n_files, "d")
        .sortWithinPartitions("d")
        .write.mode("overwrite")
        .parquet(dpath)
    )

    zr = _file_ranges(zpath, ["c", "d"])
    dr = _file_ranges(dpath, ["c", "d"])
    assert len(zr) == n_files and len(dr) == n_files

    # a ~10%-wide slice on each dimension
    c_lo, c_hi = ext[0], ext[0] + (ext[1] - ext[0]) // 10
    d_lo, d_hi = ext[2], ext[2] + (ext[3] - ext[2]) // 10

    # date-sorted layout: perfect on d, useless on c (every file spans c)
    assert _survivors(dr, "d", d_lo, d_hi) <= 3
    assert _survivors(dr, "c", c_lo, c_hi) == n_files

    # z-ordered layout: BOTH predicates skip at least half the files
    z_c = _survivors(zr, "c", c_lo, c_hi)
    z_d = _survivors(zr, "d", d_lo, d_hi)
    assert z_c <= n_files // 2, f"custkey slice opens {z_c}/{n_files}"
    assert z_d <= n_files // 2, f"day slice opens {z_d}/{n_files}"

    # layout changes bytes on disk, never content
    assert (
        spark.read.parquet(zpath).count()
        == o.count()
    )


def test_z_formula_is_a_bijective_interleave(spark):
    """Every (qx, qy) in the 8-bit grid maps to a distinct z in
    [0, 65536) and the curve preserves tile locality: the top 6 bits of
    z identify an 8x32 region... verified structurally by inverting the
    interleave."""
    from dodo_spark.operators.layout import z_formula

    df = (
        spark.range(0, 256)
        .selectExpr("id AS qx")
        .crossJoin(spark.range(0, 256).selectExpr("id AS qy"))
        .selectExpr("qx", "qy", f"{z_formula('qx', 'qy', 'DIV')} AS z")
    )
    row = df.agg(
        F.countDistinct("z").alias("nz"),
        F.min("z").alias("mn"),
        F.max("z").alias("mx"),
    ).collect()[0]
    assert (row["nz"], row["mn"], row["mx"]) == (65536, 0, 65535)
    # invert: de-interleaving the odd/even bits recovers qx/qy exactly
    bad = df.selectExpr(
        "qx",
        "qy",
        " + ".join(f"((z DIV {1 << (2 * i + 1)}) % 2) * {1 << i}" for i in range(8))
        + " AS rx",
        " + ".join(f"((z DIV {1 << (2 * i)}) % 2) * {1 << i}" for i in range(8))
        + " AS ry",
    ).filter("rx != qx OR ry != qy")
    assert bad.count() == 0


def test_zorder_helper_never_clobbers_a_user_column_named_z(spark, tmp_path):
    """A table that already has a column named "z": zorder_repartitioned
    must preserve its values (collision-safe helper name), and the
    low-level zorder_frame must refuse rather than silently overwrite
    (round-8 advisor fix)."""
    import pytest

    from dodo_spark.operators.layout import zorder_frame, zorder_repartitioned

    df = spark.createDataFrame(
        [(i, i % 16, i % 32, i * 100) for i in range(500)],
        "rid BIGINT, x BIGINT, y BIGINT, z BIGINT",
    )
    out = zorder_repartitioned(df, "x", "y", 4)
    got = {(r["rid"], r["z"]) for r in out.collect()}
    assert got == {(i, i * 100) for i in range(500)}
    assert set(out.columns) == {"rid", "x", "y", "z"}

    with pytest.raises(ValueError, match="collides"):
        zorder_frame(df, "x", "y", (0, 15, 0, 31))
