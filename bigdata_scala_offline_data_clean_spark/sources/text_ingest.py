"""Messy text-format ingestion: CSV/JSON with corrupt-record capture.

The reference ingests only well-formed Hive tables; a real cleaning
pipeline's front door is semi-structured text where some fraction of rows
is malformed.  Spark's PERMISSIVE mode keeps every input row -- malformed
ones land in a corrupt-record column instead of killing the job
(FAILFAST) or silently vanishing (DROPMALFORMED).  These helpers split the
stream into (good, bad) frames so the pipeline can load the good rows and
quarantine the bad ones with full fidelity for later repair.

Scale notes: the split is two filters over one scan (Spark caches nothing
here -- at 100 TB, persist or write the parsed frame once and derive both
sides from it).  Schema is explicit, never inferred: inference is a full
extra pass over the data and non-deterministic under sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def _with_corrupt_field(schema: StructType) -> StructType:
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return StructType(list(schema.fields) + [StructField(CORRUPT_COL, StringType())])


def read_csv_clean(
    spark: SparkSession,
    path: str,
    schema: StructType,
    header: bool = True,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """Read CSV permissively; returns (good_rows, quarantined_raw_lines).

    Good rows carry the declared schema; quarantine is the raw offending
    line, one column, ready to write to a badRecords table.
    """
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .options(**options)
        .csv(path)
    )
    # Spark disallows selecting ONLY the corrupt column from a raw read
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN); cache materializes the parsed
    # rows so both sides derive from one scan -- also the right call at
    # scale (otherwise good/bad re-parse the input twice).
    df = df.cache()
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad


def read_json_clean(
    spark: SparkSession,
    path: str,
    schema: StructType,
    **options: str,
) -> tuple[DataFrame, DataFrame]:
    """JSON-lines twin of :func:`read_csv_clean`."""
    df = (
        spark.read.schema(_with_corrupt_field(schema))
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .options(**options)
        .json(path)
    )
    df = df.cache()  # see read_csv_clean
    good = df.where(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.where(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_record")
    )
    return good, bad
