"""Skew-mitigation helpers: salting for hot keys.

AQE's skew-join splitting handles moderate skew automatically; these helpers
are for the pathological cases a 100 TB pipeline hits (a null-key flood, one
customer with 10% of all events) where the *aggregation* or *join input
itself* must be pre-split.

Both are pure DataFrame transforms:

- ``salted_aggregate``: two-phase agg -- groupBy (key, salt) partial, then
  groupBy key final.  The hot key's rows spread over ``buckets`` reducers in
  phase 1; phase 2 moves ``buckets`` rows per key, not the raw mass.
- ``salted_join``: replicate the small side ``buckets`` times with an
  explicit salt column, salt the big side randomly -- every (key, salt)
  bucket joins independently, so one hot key occupies ``buckets`` tasks.

The salt is ``pmod(hash(random-ish cols or monotonic id), buckets)`` --
deterministic per row, uniform enough to split a hot key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _salt(buckets: int, *cols: str) -> Column:
    """Deterministic per-row salt in [0, buckets): hash of distinguishing
    columns (falls back to a random uniform when none are given)."""
    if cols:
        return F.pmod(F.hash(*[F.col(c) for c in cols]), F.lit(buckets))
    return (F.rand(seed=42) * buckets).cast("int")


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    buckets: int = 16,
    salt_cols: list[str] | None = None,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    ``aggs``: {output_col: "sum:col" | "count:*" | "max:col" | "min:col"}.
    Only decomposable aggregates are supported (sum/count/max/min) --
    exactly the ones whose partial/final split is associative.
    """
    salt = _salt(buckets, *(salt_cols or []))
    partial_exprs, final_exprs = [], []
    for out, spec in aggs.items():
        fn, _, col = spec.partition(":")
        p = f"__p_{out}"
        if fn == "count":
            partial_exprs.append(F.count(F.lit(1)).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "sum":
            partial_exprs.append(F.sum(col).alias(p))
            final_exprs.append(F.sum(p).alias(out))
        elif fn == "max":
            partial_exprs.append(F.max(col).alias(p))
            final_exprs.append(F.max(p).alias(out))
        elif fn == "min":
            partial_exprs.append(F.min(col).alias(p))
            final_exprs.append(F.min(p).alias(out))
        else:
            raise ValueError(f"non-decomposable aggregate: {spec}")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partial_exprs)
    return phase1.groupBy(*keys).agg(*final_exprs)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    how: str = "inner",
    buckets: int = 8,
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Use when one join key dominates the big side and the small side is too
    large to broadcast outright.  Replication multiplies the small side
    ``buckets``x -- keep ``buckets`` modest.

    Only ``inner``/``left``(-outer)/``left_semi`` are supported: with a
    right or full outer join every unmatched small-side row would surface
    once PER REPLICA, silently duplicating output.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi", "leftsemi"}
    if how.replace("_", "").lower() not in {a.replace("_", "") for a in allowed}:
        raise ValueError(
            f"salted_join supports inner/left/left_semi, got {how!r}: outer "
            "joins would emit unmatched small-side rows once per replica"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big_salted = big.withColumn("__salt", _salt(buckets))
    replicas = F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    small_replicated = small.withColumn("__salt", replicas)
    out = big_salted.join(small_replicated, [*keys, "__salt"], how)
    return out.drop("__salt")
