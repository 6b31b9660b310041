"""Incremental aggregate maintenance: partial-aggregate merge.

The daily-rollup pattern at 100 TB: recomputing a cumulative aggregate from
table history scans everything ever written; maintaining it incrementally
scans ONLY the new partition and merges constant-size partial aggregates
into the cumulative table.  Works for any algebraic aggregate --
sum/count/min/max directly, avg = sum/count at read time.

The reference's archetype D (CustomerAddrLevelAggrDataClean.scala:23-44)
recomputes its DWS aggregate from the full DWD dimension every run; this is
the Spark-idiomatic replacement that makes the run cost O(delta), not
O(history).

Sums are decimal-exact so incremental and full recomputation agree
bit-for-bit regardless of merge order (floating-point sums would drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum_": F.sum,
    "n_rows": F.sum,
    "min_": F.min,
    "max_": F.max,
}


def partial_agg(
    df: DataFrame,
    keys: list[str],
    sum_cols: tuple[str, ...] = (),
    min_cols: tuple[str, ...] = (),
    max_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One partition's partial aggregate: (keys, sum_*, min_*, max_*, n_rows).

    Partial aggregation combines map-side; the shuffle carries one row per
    key per partition processed, never raw rows.
    """
    aggs = [
        F.sum(F.col(c).cast("decimal(28,2)")).alias(f"sum_{c}") for c in sum_cols
    ]
    aggs += [F.min(c).alias(f"min_{c}") for c in min_cols]
    aggs += [F.max(c).alias(f"max_{c}") for c in max_cols]
    aggs.append(F.count(F.lit(1)).alias("n_rows"))
    return df.groupBy(*keys).agg(*aggs)


def merge_partial_aggs(base: DataFrame | None, delta: DataFrame, keys: list[str]) -> DataFrame:
    """Fold a new partial aggregate into the cumulative one.

    Every non-key column merges by its name prefix (sum_/min_/max_/n_rows)
    -- the algebraic-aggregate property that makes incremental == full
    recompute.  ``base=None`` bootstraps the first run.
    """
    if base is None:
        return delta
    merged = base.unionByName(delta)
    aggs = []
    for c in merged.columns:
        if c in keys:
            continue
        fn = next((f for p, f in _MERGE.items() if c.startswith(p)), None)
        if fn is None:
            raise ValueError(f"column {c!r} has no mergeable prefix")
        aggs.append(fn(c).alias(c))
    return merged.groupBy(*keys).agg(*aggs)


def finalize_agg(df: DataFrame, avg_of: dict[str, str] | None = None) -> DataFrame:
    """Read-time finishers: derived averages, doubles for sink schemas.

    ``avg_of`` maps output name -> sum_ column, divided by n_rows.
    """
    out = df
    for name, sum_col in (avg_of or {}).items():
        # divide in double space (decimal division rounds at decimal scale
        # first -- engines disagree on the last bit)
        out = out.withColumn(
            name, F.col(sum_col).cast("double") / F.col("n_rows")
        )
    for c, t in out.dtypes:
        if t.startswith("decimal"):
            out = out.withColumn(c, F.col(c).cast("double"))
    return out


def delta_join_rows(
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Incremental JOIN-view maintenance: the rows to APPEND when deltas
    arrive on both sides of a materialized equi-join view.

    Classic delta-join algebra for append-only inputs:

        V_new = V_old  UNION ALL  (dA >< B_old) UNION ALL (A_old >< dB)
                       UNION ALL  (dA >< dB)

    The three delta terms are disjoint from V_old and from each other (a
    row pairs a delta tuple with an old or delta tuple, never two old
    ones), so maintenance is pure append -- no dedup pass, no rescan of
    the view.  Cost is O(|delta| x match fanout): each delta side joins
    the OTHER side's current state, and since deltas are small next to
    the accumulated state the optimizer broadcasts them (asserted in the
    plan gate) -- the big sides never re-shuffle.

    ``how`` is restricted to inner: outer variants need retraction
    handling (an old unmatched row can become matched), which append-only
    maintenance cannot express.
    """
    if how != "inner":
        raise ValueError(
            f"delta_join_rows maintains inner-join views only, got {how!r}: "
            "outer joins need retractions, not appends"
        )
    return (
        da.join(b_old, on)
        .unionByName(a_old.join(db, on))
        .unionByName(da.join(db, on))
    )


def retract_rows(
    cum: DataFrame,
    deletions: DataFrame,
    keys: list[str],
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Apply row DELETIONS to a cumulative partial aggregate in O(|delta|).

    The GDPR/right-to-be-forgotten propagation path: purging rows from
    the fact table must also correct every downstream rollup, and
    rescanning history to rebuild them is exactly what incremental
    maintenance exists to avoid.  sum/count are groups under addition, so
    a deletion is a NEGATED partial merged like any other delta; the
    decimal-exact sums make retract-then-merge bit-equal to a full
    recompute over the surviving rows (asserted in tests and by the c35
    oracle).  min/max are NOT retractable (removing the minimum needs the
    runner-up, which the partial no longer holds) -- callers keeping
    min/max must rebuild those columns from source, and this function
    refuses cumulative frames that carry them rather than corrupt state.
    Keys whose rows are all retracted keep an ``n_rows = 0`` tombstone;
    ``drop_empty`` filtering is left to the caller's compaction policy.
    """
    bad = [
        c for c in cum.columns
        if c.startswith("min_") or c.startswith("max_")
    ]
    if bad:
        raise ValueError(
            f"min/max partials are not retractable: {bad}; rebuild those "
            "columns from source"
        )
    neg = partial_agg(deletions, keys, sum_cols=sum_cols)
    for c in neg.columns:
        if c.startswith("sum_") or c == "n_rows":
            neg = neg.withColumn(c, -F.col(c))
    return merge_partial_aggs(cum, neg, keys)
