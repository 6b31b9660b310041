"""PySpark-native offline data-cleaning / analytics engine.

A from-scratch rebuild of the capabilities of
``kanseiu/bigdata-scala-offline-data-clean`` (a Spark 3.1 / Scala 2.12 layered-warehouse
ETL suite: ODS -> DWD -> DWS with an HBase delta side-channel), re-expressed
as an idiomatic PySpark library:

- ``session``    -- SparkSession factory (reference: SparkSessionBuilder.scala:7-21)
- ``schemas``    -- central StructType registry (reference hard-codes StructTypes
                    per job, e.g. OrderMasterDataClean.scala:127-151)
- ``sources``    -- partitioned-table scans, latest-partition discovery, and the
                    delta-snapshot source that replaces HBase TableInputFormat
- ``operators``  -- the operator library: audit stamping, SCD-1 window dedup,
                    full-outer coalesce merge, star denormalisation, plus
                    large-scale training-data ops (dedup, similarity, text)
- ``pipelines``  -- the four pipeline archetypes (A: append-clean, B: SCD-1
                    merge, C: delta merge, D: star aggregate) as parametrised
                    functions + the 12 reference jobs as ``JOBS`` configs
- ``queries``    -- the driver-checked query registry (PySpark + DuckDB
                    oracle pairs feeding ``__spark_entry__.py``)
- ``streaming``  -- Structured Streaming counterparts: incremental append-
                    clean, watermarked dedup, tumbling-window rollups (the
                    reference declares spark-streaming in pom.xml:26-29 but
                    never uses it)

Everything here is stock DataFrame/SQL -- no RDDs, no custom Catalyst rules --
so Catalyst/Tungsten/AQE provide pushdown, pruning, join selection, codegen
and skew handling for free at cluster scale.
"""

__version__ = "0.2.0"

from .session import build_session, stop_session  # noqa: E402,F401
from .sources.catalog import Warehouse  # noqa: E402,F401
from .pipelines import JOBS, run_job  # noqa: E402,F401

__all__ = [
    "JOBS",
    "Warehouse",
    "build_session",
    "run_job",
    "stop_session",
]
