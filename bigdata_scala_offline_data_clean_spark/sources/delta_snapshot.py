"""Delta-snapshot source -- the HBase side-channel, Spark-native.

The reference scans HBase ``ods:<table>_offline`` tables with a server-side
rowkey regex filter, decodes bytes per cell, and lifts the RDD into a
DataFrame with a hard-coded StructType (OrderMasterDataClean.scala:76-154,
OrderDetailDataClean.scala:58-103, ProductBrowseDataClean.scala:53-86).

Spark-first replacement: the "offline supplement" data is a parquet table
with a leading ``row_key`` string column; the regex rowkey filter
(``RowFilter(EQUAL, RegexStringComparator(".*20221001.*"))``,
OrderMasterDataClean.scala:29-30,80-82) becomes an ``rlike`` predicate that
Catalyst evaluates in the scan stage.  No per-row byte decoding is needed --
parquet is typed -- but a ``decoders`` hook keeps parity with
HbaseCliUtil.getValue (HbaseCliUtil.scala:8-11) for sources that do deliver
untyped cells.

Scale notes: a regex can't use parquet row-group statistics, so at 100 TB
the delta table should be *partitioned by the date embedded in the rowkey*
(our writer does this when a ``snapshot_date`` column exists), turning the
regex filter into partition pruning + cheap residual rlike.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def read_delta_snapshot(
    spark: SparkSession,
    path: str,
    rowkey_pattern: str | None = None,
    snapshot_date: str | None = None,
    decoders: dict[str, Callable[[Column], Column]] | None = None,
) -> DataFrame:
    """Read an offline-supplement snapshot.

    - ``rowkey_pattern``: regex over ``row_key`` (S5, server-side RowFilter
      equivalent; e.g. ``".*20221001.*"``).
    - ``snapshot_date``: if the table is partitioned by ``snapshot_date``,
      an equality prune that makes the regex redundant at scale.
    - ``decoders``: optional per-column cast/transform map (S6 stand-in).
    """
    df = spark.read.parquet(path)
    if snapshot_date is not None and "snapshot_date" in df.columns:
        df = df.where(F.col("snapshot_date") == snapshot_date)
    if rowkey_pattern is not None:
        df = df.where(F.col("row_key").rlike(rowkey_pattern))
    for col, fn in (decoders or {}).items():
        df = df.withColumn(col, fn(F.col(col)))
    return df
