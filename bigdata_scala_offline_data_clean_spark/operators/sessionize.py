"""Gap-based sessionization: assign events to sessions per key.

A session breaks when the gap to the previous event exceeds ``gap_seconds``.
Batch implementation is the lag + running-sum-of-breaks composition -- two
window passes over ONE hash exchange on the key (the second window reuses
the first's partitioning; Catalyst plans a single Exchange).  The streaming
counterpart is ``F.session_window`` (see streaming/jobs.py rollups).

Engine-portable: integer epoch arithmetic only, so the DuckDB oracle
reproduces session ids exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Add ``session_id`` (key-scoped, 0-based) and ``is_session_start``.

    Rows ordered by ``ts_col`` within each key; a new session starts when
    the previous event is more than ``gap_seconds`` older (or absent).
    Session ASSIGNMENT is deterministic even under (key, ts) ties (a zero
    gap never starts a session, so tied rows always share a session), but
    pass ``tiebreak`` (a unique column, e.g. the event id) to pin the full
    row order inside the window as well.
    """
    order = [ts_col] if tiebreak is None else [ts_col, tiebreak]
    w = Window.partitionBy(key).orderBy(*order)
    prev = F.lag(F.unix_timestamp(F.col(ts_col))).over(w)
    is_start = F.when(
        prev.isNull() | (F.unix_timestamp(F.col(ts_col)) - prev > gap_seconds),
        F.lit(1),
    ).otherwise(F.lit(0))
    out = df.withColumn("is_session_start", is_start)
    return out.withColumn(
        "session_id",
        F.sum("is_session_start").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        - F.lit(1),
    )


def session_stats(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int = 1800,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-session rollup: bounds, event count, duration seconds."""
    s = sessionize(df, key, ts_col, gap_seconds, tiebreak=tiebreak)
    return s.groupBy(key, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        (
            F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
        ).alias("duration_sec"),
    )


def capped_event_paths(
    events: DataFrame,
    cap: int,
    grp: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-key ordered event-type path, truncated to the first ``cap``
    events: ``(grp, path, n_events)`` with ``path`` '>'-joined.

    BOUNDED aggregation state (round-9 hardening, shared by a61/a107 --
    one definition so the window spec / tie-break can never diverge
    between them): a per-key ``row_number`` window ranks events (a
    disk-spillable sort) and the aggregation collects only ``rn <= cap``
    structs via a conditional collect, so the in-heap buffer holds
    <= ``cap`` structs per key at ANY skew -- a bare ``collect_list`` +
    post-slice would buffer a whale key's entire history first.  The
    groupBy rides the window's hash partitioning (no second exchange);
    ``n_events`` still counts ALL events.  ``array_sort`` restores
    arrival order inside the capped buffer (deterministic via the
    ``id_col`` tie-break).
    """
    from pyspark.sql import Window

    w = Window.partitionBy(grp).orderBy(ts_col, id_col)
    ranked = events.withColumn("__rn", F.row_number().over(w))
    seq = F.array_sort(
        F.collect_list(
            F.when(
                F.col("__rn") <= cap,
                F.struct(ts_col, id_col, type_col),
            )
        )
    )
    return ranked.groupBy(grp).agg(
        F.concat_ws(
            ">", F.transform(seq, lambda x: x[type_col])
        ).alias("path"),
        F.count(F.lit(1)).alias("n_events"),
    )
