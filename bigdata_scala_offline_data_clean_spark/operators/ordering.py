"""Deterministic global ordering: seeded corpus shuffle and scalable rank.

Training-data pipelines need a reproducible global shuffle (the example
order of an epoch) and, generally, a global row rank.  The naive Spark
form -- ``row_number() OVER (ORDER BY ...)`` with no partition -- funnels
the entire table through ONE task; at 100 TB that is the canonical
scale-killer.

``global_rank`` uses the two-phase construction instead:

1. bucket every row by a prefix of its order key (the buckets are ordered:
   every key in bucket i sorts before every key in bucket i+1),
2. count rows per bucket (one tiny aggregate), cumulative-sum the counts
   driver-side (256 rows), broadcast the offsets back,
3. rank = bucket offset + intra-bucket ``row_number`` -- the window now
   partitions by bucket, so the sort distributes across the cluster.

Equivalent to the single-partition window row-for-row (asserted in tests
and by the DuckDB oracle), with max task size |table|/256 instead of
|table|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_rank(
    df: DataFrame,
    order_col: str,
    tiebreak: str,
    rank_col: str = "rank",
    bucket_chars: int = 2,
) -> DataFrame:
    """1-based dense global rank by (``order_col``, ``tiebreak``).

    ``order_col`` must be a hex-string key (e.g. an md5) so that its first
    ``bucket_chars`` characters give ordered, roughly-uniform buckets.
    """
    bucket = F.substring(F.col(order_col), 1, bucket_chars)
    b = df.withColumn("__bucket", bucket)
    counts = (
        b.groupBy("__bucket").agg(F.count(F.lit(1)).alias("__n"))
        .orderBy("__bucket")
        .collect()
    )
    offsets, acc = [], 0
    for r in counts:
        offsets.append((r["__bucket"], acc))
        acc += r["__n"]
    if not offsets:  # empty input: rank column exists, zero rows
        return b.withColumn(rank_col, F.lit(None).cast("long")).drop("__bucket")
    off = df.sparkSession.createDataFrame(offsets, ["__bucket", "__offset"])
    w = Window.partitionBy("__bucket").orderBy(order_col, tiebreak)
    return (
        b.join(F.broadcast(off), "__bucket")
        .withColumn(rank_col, F.col("__offset") + F.row_number().over(w))
        .drop("__bucket", "__offset")
    )


def deterministic_shuffle(
    df: DataFrame,
    id_col: str,
    seed: str = "epoch0",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Seeded, reproducible corpus shuffle: rank by md5(seed || id).

    Changing ``seed`` gives an independent permutation (a new epoch order);
    the same seed always yields the same order on any cluster layout.
    """
    keyed = df.withColumn(
        "__shuffle_key", F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string")))
    )
    return global_rank(keyed, "__shuffle_key", id_col, rank_col=rank_col).drop(
        "__shuffle_key"
    )


def equidepth_histogram(
    df: DataFrame, col: str, n_buckets: int = 10
) -> DataFrame:
    """Exact equi-depth histogram over an integer-domain column.

    The scalable exact-quantile construction: aggregate to per-VALUE
    counts first (one shuffle, output = |distinct values| rows -- for
    bounded-precision metrics that is orders of magnitude below the row
    count), then rank the small value table with an ordinary window and
    assign each value group to bucket ``(rank_before * k) div N``.  Rows
    of one value never split across buckets, so heavy ties produce the
    documented uneven depths instead of nondeterministic splits.  Pure
    integer arithmetic end to end -- oracle-exact.

    The unpartitioned window is deliberate: it runs over the aggregated
    value table, not the corpus (the naive ``ntile() OVER (ORDER BY col)``
    over raw rows is the single-task scale-killer this replaces).
    """
    counts = df.groupBy(F.col(col).alias("v")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    total = counts.agg(F.sum("cnt").alias("n_total"))
    ranked = counts.crossJoin(F.broadcast(total)).select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(w), F.lit(0)).alias("rank_before"),
        "n_total",
    )
    # integer floor-div keeps the assignment exact at any N (the double
    # division form would round above 2^53)
    bucket = F.expr(f"(rank_before * {int(n_buckets)}) div n_total")
    return (
        ranked.groupBy(bucket.alias("bucket"))
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
        )
    )
