"""Schema-evolution-tolerant parquet reads.

A long-lived warehouse accumulates files written under different schema
versions (columns added over time).  Spark's default parquet read takes
the schema from one footer and silently drops columns that file lacks;
``mergeSchema`` unions footers instead, so old files surface new columns
as NULL and nothing is lost.

Scale note: merging reads the footer of EVERY file at planning time --
cheap next to the scan itself but not free on multi-million-file tables;
enable it per-read here rather than globally
(``spark.sql.parquet.mergeSchema`` stays off), and prefer registering an
explicit evolved schema once a table's layout stabilizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_evolved(
    spark: SparkSession, path: str, schema: StructType | None = None
) -> DataFrame:
    """Read a parquet directory whose files span schema versions.

    With ``schema`` given, planning skips the footer sweep entirely (the
    explicit-registry path, schemas.py); otherwise footers are merged.
    Either way, files missing a column yield NULL for it.
    """
    if schema is not None:
        return spark.read.schema(schema).parquet(path)
    return spark.read.option("mergeSchema", "true").parquet(path)
