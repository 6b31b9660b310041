"""Temporal joins Spark lacks as built-ins: as-of join and bucketed range join.

Both are implemented as compositions of existing DataFrame ops (the
preferred path for custom operators) with shuffle shapes that survive scale:

- ``asof_join``: the union-window trick.  Tag both sides, union on
  (key, time), one window pass carries the most recent right-side payload
  forward, keep left rows.  ONE shuffle on the join key -- contrast with the
  naive inequality join, which Spark plans as a broadcast-nested-loop.
- ``range_join_bucketed``: equi-join on (key, coarse time bucket) with a
  residual interval filter.  Each right row lands in every bucket its
  interval overlaps; the join is hash-partitioned, never nested-loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    strict: bool = False,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (``<`` when ``strict``) sharing the key ``on``.
    ``direction="forward"`` mirrors it: the EARLIEST right row with
    ``right_ts >= left_ts`` (``>`` when strict) -- the "next event after"
    lookup (e.g. first fulfillment after an order).

    Returns the left columns + ``payload`` columns (null when no prior
    right row exists).  Right-side timestamp ties resolve deterministically
    to the greatest payload struct (least, under ``forward``).

    Scale: both sides shuffle once on ``on``; the window is one ascending
    sort per key partition.  No broadcast, no nested loop -- the plan is
    insensitive to the left:right size ratio.
    """
    lcols = left.columns
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__l"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),
        F.struct(*payload).alias("__p"),
    )
    l = l.withColumn("__p", F.lit(None).cast(r.schema["__p"].dataType))
    r = r.withColumn("__l", F.lit(None).cast(l.schema["__l"].dataType))
    cols = ["__k", "__t", "__side", "__l", "__p"]
    unioned = l.select(*cols).unionByName(r.select(*cols))

    # At equal ts: non-strict sorts right (0) before left (1) so the left
    # row sees it; strict reverses, hiding equal-timestamp right rows.
    # Forward = the same single window pass over the opposite time order
    # (approaching left_ts from above), so "last seen" = nearest-after.
    side_order = F.col("__side").asc() if not strict else F.col("__side").desc()
    if direction == "backward":
        t_order, p_order = F.col("__t").asc(), F.col("__p").asc_nulls_first()
    elif direction == "forward":
        t_order, p_order = F.col("__t").desc(), F.col("__p").desc_nulls_first()
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    w = (
        Window.partitionBy("__k")
        .orderBy(t_order, side_order, p_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn("__asof", F.last("__p", ignorenulls=True).over(w))
    return carried.where(F.col("__side") == 1).select(
        *[F.col("__l")[c].alias(c) for c in lcols],
        *[F.col("__asof")[c].alias(c) for c in payload],
    )


def _bucket_of(ts, bucket_seconds: int):
    """Epoch-aligned coarse bucket index of a timestamp column."""
    return F.floor(F.unix_timestamp(ts) / bucket_seconds).cast("long")


def range_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    range_start: str,
    range_end: str,
    payload: list[str],
    bucket_seconds: int = 86_400,
) -> DataFrame:
    """Interval-containment join: left rows matched to every right row whose
    ``[range_start, range_end)`` contains ``left_ts`` and shares key ``on``.

    Both sides map into coarse epoch-aligned buckets (a right interval
    explodes into each bucket it overlaps), the join is a hash equi-join on
    (key, bucket), and the exact interval predicate filters residuals.
    Bucket width is the selectivity knob: ~the typical interval length is a
    good default.
    """
    l = left.withColumn("__bucket", _bucket_of(F.col(left_ts), bucket_seconds))
    r = right.select(
        F.col(on).alias("__rk"),
        F.col(range_start).alias("__rs"),
        F.col(range_end).alias("__re"),
        F.explode(
            F.sequence(
                _bucket_of(F.col(range_start), bucket_seconds),
                _bucket_of(F.col(range_end), bucket_seconds),
            )
        ).alias("__bucket"),
        *[F.col(c) for c in payload],
    )
    joined = l.join(r, (l[on] == r["__rk"]) & (l["__bucket"] == r["__bucket"]))
    return joined.where(
        (F.col(left_ts) >= F.col("__rs")) & (F.col(left_ts) < F.col("__re"))
    ).select(*left.columns, *payload)
