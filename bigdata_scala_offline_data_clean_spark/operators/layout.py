"""Data-layout optimization: z-order clustering for multi-column pruning.

Sorting a table by one column makes that column's per-file min/max ranges
narrow (parquet row-group / file skipping prunes scans), but destroys
locality for every other column.  Z-ordering interleaves the bits of
several columns' bucket ranks into one clustering key, so per-file ranges
stay narrow for ALL participating columns -- the standard layout for a
100 TB fact table filtered sometimes by date, sometimes by customer.

Everything here is integer column arithmetic (bucket via min/max scaling,
bit interleave via shifts) -- engine-portable, oracle-checkable, and
zero-UDF.  The min/max scalars ride a broadcast single-row cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BITS = 4  # 16 buckets per dimension


def _bucket(col: Column, mn: Column, mx: Column, bits: int = BITS) -> Column:
    """Scale a numeric column to an integer bucket 0 .. 2^bits - 1.

    Uniform min/max scaling: exact integer arithmetic after one double
    multiply that both engines evaluate identically.  (Production variant:
    approx-quantile boundaries for skewed columns -- same interleave.)
    """
    n = F.lit(2**bits)
    span = (mx - mn + F.lit(1)).cast("double")
    return F.least(
        n - F.lit(1),
        F.floor((col - mn).cast("double") * n / span).cast("bigint"),
    )


def zvalue(bx: Column, by: Column, bits: int = BITS) -> Column:
    """Interleave two bucket ranks' bits: z = ... y1 x1 y0 x0."""
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        z = (
            z
            + (F.shiftrightunsigned(bx, i) % 2) * F.lit(4**i)
            + (F.shiftrightunsigned(by, i) % 2) * F.lit(2 * 4**i)
        )
    return z


def zorder_layout(
    df: DataFrame,
    col_x: str,
    col_y: str,
    n_partitions: int,
    bits: int = BITS,
) -> DataFrame:
    """Cluster ``df`` by the z-value of (col_x, col_y).

    Range-partition + sort within partitions on z: each output file covers
    a small z-range, i.e. a small rectangle in (x, y) space, so min/max
    file skipping prunes on EITHER column.  One pass, one range exchange;
    the min/max scalars are a broadcast single-row aggregate, not a
    driver action.
    """
    stats = df.agg(
        F.min(col_x).alias("__minx"),
        F.max(col_x).alias("__maxx"),
        F.min(col_y).alias("__miny"),
        F.max(col_y).alias("__maxy"),
    )
    z = zvalue(
        _bucket(F.col(col_x), F.col("__minx"), F.col("__maxx"), bits),
        _bucket(F.col(col_y), F.col("__miny"), F.col("__maxy"), bits),
        bits,
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("__z", z)
        .repartitionByRange(n_partitions, "__z")
        .sortWithinPartitions("__z")
        .drop("__minx", "__maxx", "__miny", "__maxy", "__z")
    )


def zorder_stats(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = BITS,
) -> DataFrame:
    """Per-z-bucket occupancy and (x, y) bounding boxes.

    The auditable core of the layout: for each z value, the min/max of
    both columns -- narrow boxes everywhere mean every file a range filter
    touches is mostly relevant.  Pure integer output, oracle-exact.
    """
    stats = df.agg(
        F.min(col_x).alias("__minx"),
        F.max(col_x).alias("__maxx"),
        F.min(col_y).alias("__miny"),
        F.max(col_y).alias("__maxy"),
    )
    z = zvalue(
        _bucket(F.col(col_x), F.col("__minx"), F.col("__maxx"), bits),
        _bucket(F.col(col_y), F.col("__miny"), F.col("__maxy"), bits),
        bits,
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn("z", z)
        .groupBy("z")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(col_x).alias("min_x"),
            F.max(col_x).alias("max_x"),
            F.min(col_y).alias("min_y"),
            F.max(col_y).alias("max_y"),
        )
    )
