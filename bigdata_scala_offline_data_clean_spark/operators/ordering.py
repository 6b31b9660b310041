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
