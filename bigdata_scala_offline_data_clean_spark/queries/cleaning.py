"""Cleaning/pipeline queries: sinks and end-to-end archetype runs.

These exercise the write paths (S8 append, S9 dynamic-partition overwrite,
S10 overwrite table -- SimpleDataCleanUtils.scala:30,
CustomerInfDataClean.scala:70-88, CustomerAddrLevelAggrDataClean.scala:41-44)
by writing to a scratch warehouse and reading back; the oracle states the
expected final table contents, so the round-trip is value-checked, not just
row-counted.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import Warehouse
from . import QuerySpec
from ._util import load_table, ts_str

ORDER_SEL = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"]


def _orders_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "orders").withColumn(
        "o_orderdate", ts_str("o_orderdate")
    )


# ---------------------------------------------------------------------------
# c01 -- S8 + S9: append two partitions, dynamic-overwrite one, read back.
# Expected final state: partition 20220101 (even keys, intact) +
# partition 20220102 rewritten to the %5==0 subset with a marker priority.
# ---------------------------------------------------------------------------


def c01_write_readback(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _orders_str(spark, sf_dir)
    scratch = tempfile.mkdtemp(prefix="ods_spark_wh_")
    try:
        wh = Warehouse(spark, scratch)
        d1 = o.where(F.col("o_orderkey") % 2 == 0).withColumn(
            "etl_date", F.lit("20220101")
        )
        d2 = o.where(F.col("o_orderkey") % 2 == 1).withColumn(
            "etl_date", F.lit("20220102")
        )
        wh.append(d1, "dwd", "fact_orders")  # S8
        wh.append(d2, "dwd", "fact_orders")  # S8
        d3 = (
            o.where(F.col("o_orderkey") % 5 == 0)
            .withColumn("o_orderpriority", F.lit("REWRITTEN"))
            .withColumn("etl_date", F.lit("20220102"))
        )
        wh.overwrite_partitions(d3, "dwd", "fact_orders")  # S9 dynamic
        back = wh.table("dwd", "fact_orders")
        # partition col may be type-inferred by the reading session; pin string
        back = back.withColumn("etl_date", F.col("etl_date").cast("string"))
        out = back.select(*ORDER_SEL, "o_orderdate", "etl_date")
        out = spark.createDataFrame(out.collect(), out.schema)  # materialize before rmtree
        return out
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


C01_SQL = """
WITH o AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority,
         strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate
  FROM orders
)
SELECT *, '20220101' AS etl_date FROM o WHERE o_orderkey % 2 = 0
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       'REWRITTEN' AS o_orderpriority, o_orderdate, '20220102' AS etl_date
FROM o WHERE o_orderkey % 5 = 0
"""


QUERIES: dict[str, QuerySpec] = {
    "c01_write_readback": QuerySpec(c01_write_readback, C01_SQL),
}
