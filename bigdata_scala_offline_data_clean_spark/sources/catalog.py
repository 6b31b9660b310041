"""Table sources: layered warehouse + driver testdata loaders.

The reference reads Hive tables in three ways (SURVEY.md §2.1):

- S1  ``SELECT * FROM ods.t WHERE etl_date='...'``   (SimpleDataCleanUtils.scala:20)
- S2  rename-projected scan of the latest partition  (OrderMasterDataClean.scala:42-73)
- S3  ``sparkSession.table("dwd.dim_customer_inf")`` (CustomerAddrLevelAggrDataClean.scala:23-25)

and discovers "latest" either with a driver-side scalar fetch (S12/A1,
SimpleDataCleanUtils.scala:19) or an uncorrelated scalar subquery (A2,
OrderMasterDataClean.scala:70-71).

Here the warehouse is a path convention ``<root>/<layer>/<table>`` of parquet
partitioned by ``etl_date`` -- the Spark-native stand-in for the reference's
Hive metastore.  Partition pruning is automatic: ``.where(etl_date == lit)``
on a ``partitionBy("etl_date")`` layout prunes directories at planning time,
exactly what the reference's inlined literal achieved manually.

Scale notes
-----------
- ``latest_partition`` lists partitions from the file index (metadata-only;
  no data scan) instead of the reference's full-table ``SELECT MAX(etl_date)``
  -- at 100 TB the reference's approach scans every partition's footer; ours
  reads only the directory listing.
- All reads are lazy DataFrames; column pruning and predicate pushdown reach
  the parquet scan via Catalyst (verify with ``.explain`` -> PushedFilters).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_testdata(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver-generated testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql queries."""
    for t in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(t)


class Warehouse:
    """Layered parquet warehouse: ``<root>/<layer>/<table>/etl_date=.../``.

    Replaces the reference's Hive metastore + HDFS layout
    (Constants.scala:6-12) with a location-addressed catalog that needs no
    external service.  ``etl_date`` is a string partition column in
    ``yyyyMMdd`` form, as in the reference.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root

    def path(self, layer: str, table: str) -> str:
        return os.path.join(self.root, layer, table)

    # -- filesystem (Hadoop FS API -- works for file:/, hdfs:/, s3a:/ roots,
    #    unlike os.listdir which silently breaks off the driver-local disk) --

    def _fs_and_path(self, path: str):
        jvm = self.spark._jvm
        jsc = self.spark._jsc
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(jsc.hadoopConfiguration())
        return fs, hpath

    def exists(self, layer: str, table: str) -> bool:
        fs, hpath = self._fs_and_path(self.path(layer, table))
        return bool(fs.exists(hpath))

    # -- reads ------------------------------------------------------------

    def table(self, layer: str, table: str) -> DataFrame:
        """S3: whole-table read by name."""
        return self.spark.read.parquet(self.path(layer, table))

    def partition(self, layer: str, table: str, etl_date: str) -> DataFrame:
        """S1: one-partition scan; Catalyst prunes to the single directory."""
        return self.table(layer, table).where(F.col("etl_date") == etl_date)

    def latest_partition(self, layer: str, table: str) -> str | None:
        """A1/S12: latest etl_date.

        Metadata-only -- lists partition directory names through the Hadoop
        FileSystem API (so HDFS/S3 warehouse roots work, not just the driver
        disk), never scanning data.  The reference's ``SELECT MAX(etl_date)``
        + ``.collect()(0)(0)`` (SimpleDataCleanUtils.scala:19) reads rows;
        at 100 TB that touches every partition's footer -- this touches none.
        Falls back to ``max(etl_date)`` over the DataFrame if the listing is
        unavailable (e.g. object stores without directory semantics).
        """
        try:
            fs, hpath = self._fs_and_path(self.path(layer, table))
            if not fs.exists(hpath):
                return None
            parts = []
            for status in fs.listStatus(hpath):
                name = status.getPath().getName()
                if name.startswith("etl_date="):
                    parts.append(name.split("=", 1)[1])
            if parts:
                return max(parts)
            return None
        except Exception:
            if not self.exists(layer, table):
                return None
            row = self.table(layer, table).agg(F.max("etl_date")).first()
            return row[0] if row else None

    def latest(self, layer: str, table: str) -> DataFrame:
        """Latest-partition scan (the reference's two-step fetch, fused)."""
        p = self.latest_partition(layer, table)
        if p is None:
            # empty table with correct behaviour for first-run pipelines
            raise FileNotFoundError(f"no partitions in {layer}.{table}")
        return self.partition(layer, table, p)

    # -- writes (S8-S10) ----------------------------------------------------

    def append(self, df: DataFrame, layer: str, table: str) -> None:
        """S8: append into a partitioned table (insertInto semantics)."""
        df.write.mode("append").partitionBy("etl_date").parquet(
            self.path(layer, table)
        )

    def overwrite_partitions(self, df: DataFrame, layer: str, table: str) -> None:
        """S9: dynamic-partition overwrite -- replaces only the partitions
        present in ``df`` (session conf partitionOverwriteMode=dynamic
        mirrors hive.exec.dynamic.partition, SparkSessionBuilder.scala:15-16).
        """
        df.write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("etl_date").parquet(self.path(layer, table))

    def overwrite_table(self, df: DataFrame, layer: str, table: str) -> None:
        """S10: create-or-replace whole table
        (CustomerAddrLevelAggrDataClean.scala:41-44)."""
        df.write.mode("overwrite").option(
            "partitionOverwriteMode", "static"
        ).partitionBy("etl_date").parquet(self.path(layer, table))

    # -- physical-layout management (the knobs that matter at 100 TB) -------

    def write_bucketed(
        self,
        df: DataFrame,
        layer: str,
        table: str,
        bucket_cols: list[str],
        buckets: int = 32,
        sort_cols: list[str] | None = None,
    ) -> str:
        """Write a hash-bucketed (optionally sorted) table; returns the
        catalog name (``<layer>_<table>``).

        Two tables bucketed on their join key with the same bucket count
        join with ZERO exchanges -- the shuffle is paid once at write time
        and amortized over every subsequent join/aggregate on that key.
        That is the difference between re-shuffling a 100 TB fact table per
        query and never shuffling it again.  Bucketing requires the catalog
        (``saveAsTable``) because bucket metadata lives there, not in the
        parquet footer; the files still land under the warehouse path.
        """
        name = f"{layer}_{table}"
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.option("path", self.path(layer, table)).saveAsTable(name)
        return name

    def bucketed_table(self, layer: str, table: str) -> DataFrame:
        """Read back a bucketed table through the catalog (the path-based
        reader would drop the bucket spec and reintroduce the shuffle)."""
        return self.spark.table(f"{layer}_{table}")

    def compact_partition(
        self, layer: str, table: str, etl_date: str, target_files: int
    ) -> None:
        """Rewrite one partition into ``target_files`` parquet files.

        Streaming/incremental appends accumulate small files; at scale the
        resulting per-file task overhead dominates scan cost.  Compaction =
        read + repartition + dynamic-partition overwrite of just that
        partition (other partitions untouched).
        """
        part = self.partition(layer, table, etl_date).repartition(target_files)
        self.overwrite_partitions(part, layer, table)
