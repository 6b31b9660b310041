"""SCD-2 (slowly-changing-dimension, history-keeping) operators.

The reference's merge jobs are SCD-1: the newest row per key wins and
history is discarded (CustomerInfDataClean.scala:41-45 -- row_number over
modified_time desc, keep rank 1).  The natural next ask of the same
warehouse is SCD-2: keep every version with an effective-time interval.
Two entry points:

- ``scd2_from_changelog``: rebuild the full history table from an event
  log (key, attrs, ts) -- the backfill path.
- ``scd2_merge``: apply one batch of updates to an existing SCD-2
  dimension -- the incremental path.

Scale: both are one shuffle on the key.  ``scd2_from_changelog`` uses two
window passes over the *same* (partitionBy key, orderBy ts) spec, so
Spark sorts once and reuses the exchange; there is no self-join.
``scd2_merge`` joins current rows to the update batch (broadcast-eligible
when the batch is a daily delta) and unions the untouched history back
without rescanning it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    attr_cols: list[str],
    ts_col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Collapse an event log into SCD-2 intervals.

    Consecutive rows (per ``key``, ordered by ``ts_col`` then ``tiebreak``)
    with identical ``attr_cols`` merge into one interval; each change opens
    a new interval.  Output: key, attrs, ``effective_from``,
    ``effective_to`` (NULL = open), ``is_current``.

    Comparison with the previous row is null-safe: NULL -> NULL is not a
    change.  Pass ``tiebreak`` (e.g. an event id) when ``ts_col`` can tie,
    or interval boundaries are nondeterministic -- same fix as the SCD-1
    dedup (SURVEY §8 Q3).
    """
    order = [F.col(ts_col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key).orderBy(*order)

    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    is_first = F.lag(F.col(ts_col)).over(w).isNull()

    segments = df.withColumn("__chg", is_first | changed).where(F.col("__chg"))
    # same partition+order spec as w: Catalyst reuses the exchange and sort
    w2 = Window.partitionBy(key).orderBy(*order)
    eff_to = F.lead(F.col(ts_col)).over(w2)
    return segments.select(
        key,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        eff_to.alias("effective_to"),
        eff_to.isNull().alias("is_current"),
    )


def scd2_merge(
    dim_df: DataFrame,
    updates_df: DataFrame,
    key: str,
    attr_cols: list[str],
    ts_col: str = "effective_from",
    update_ts_col: str = "ts",
) -> DataFrame:
    """Apply one update batch to an SCD-2 dimension.

    ``updates_df`` holds at most one row per key (pre-dedupe a bigger batch
    with ``dedup_latest``).  Per key: if the attrs changed, the current row
    closes at the update's timestamp and a new current row opens; if they
    are identical, nothing changes; unknown keys insert as new current
    rows.  Closed history rows pass through untouched.
    """
    hist = dim_df.where(~F.col("is_current"))
    cur = dim_df.where(F.col("is_current"))

    u = updates_df.select(
        F.col(key).alias("__u_key"),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        F.col(update_ts_col).alias("__u_ts"),
    )
    j = cur.join(u, cur[key] == u["__u_key"], "full_outer")

    same = F.lit(True)
    for c in attr_cols:
        same = same & F.col(c).eqNullSafe(F.col(f"__u_{c}"))

    # existing current rows: close when a differing update arrived
    kept = j.where(F.col(key).isNotNull()).select(
        key,
        *attr_cols,
        F.col("effective_from"),
        F.when(F.col("__u_key").isNotNull() & ~same, F.col("__u_ts"))
        .otherwise(F.col("effective_to"))
        .alias("effective_to"),
        (F.col("__u_key").isNull() | same).alias("is_current"),
    )
    # new current rows: changed keys + brand-new keys
    opened = j.where(
        F.col("__u_key").isNotNull() & (F.col(key).isNull() | ~same)
    ).select(
        F.col("__u_key").alias(key),
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        F.col("__u_ts").alias("effective_from"),
        F.lit(None).cast(dim_df.schema["effective_to"].dataType).alias(
            "effective_to"
        ),
        F.lit(True).alias("is_current"),
    )
    return hist.select(*kept.columns).unionByName(kept).unionByName(opened)


def scd3_merge(
    dim_df: DataFrame,
    updates_df: DataFrame,
    key: str,
    attr_col: str,
    prev_col: str | None = None,
) -> DataFrame:
    """SCD type 3: apply one update batch keeping ONE level of history in
    a previous-value column (``prev_<attr>`` by default).

    Where SCD-2 appends interval rows (full history, growing table) and
    SCD-1 overwrites (no history), SCD-3 keeps the table exactly
    key-sized with the prior value beside the current one -- the shape
    reporting teams use for "segment vs previous segment" comparisons.
    Semantics per key:

    - update with a DIFFERENT value: attr <- new, prev <- old
    - update with the SAME value: unchanged (prev keeps its old content)
    - no update: row passes through untouched
    - ``updates_df`` must be deduped to one row per key (same contract as
      ``scd2_merge``)

    One equi-join on the key; daily update batches broadcast under AQE,
    so the dimension never re-shuffles for maintenance.
    """
    prev_col = prev_col or f"prev_{attr_col}"
    if prev_col not in dim_df.columns:
        dim_df = dim_df.withColumn(
            prev_col, F.lit(None).cast(dim_df.schema[attr_col].dataType)
        )
    u = updates_df.select(
        F.col(key), F.col(attr_col).alias("__new")
    )
    j = dim_df.join(u, key, "left")
    changed = F.col("__new").isNotNull() & ~F.col("__new").eqNullSafe(
        F.col(attr_col)
    )
    out_cols = []
    for c in dim_df.columns:
        if c == attr_col:
            out_cols.append(
                F.when(changed, F.col("__new")).otherwise(F.col(attr_col)).alias(c)
            )
        elif c == prev_col:
            out_cols.append(
                F.when(changed, F.col(attr_col)).otherwise(F.col(prev_col)).alias(c)
            )
        else:
            out_cols.append(F.col(c))
    return j.select(*out_cols)
