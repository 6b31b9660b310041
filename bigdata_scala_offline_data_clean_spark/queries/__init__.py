"""Query registry: every driver-checked query lives here.

Each module exposes ``QUERIES: dict[name, QuerySpec]``; the union feeds the
driver contract in ``__spark_entry__.py`` (``queries()`` / ``oracle_sql()``).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: the PySpark implementation and its DuckDB oracle.

    ``oracle`` is ANSI SQL over the pre-registered testdata views; ``None``
    marks ops that are not SQL-expressible (driver falls back to a rows-only
    check).  Column names/aliases MUST match between the two.
    """

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


def all_queries() -> dict[str, QuerySpec]:
    from . import analytics, cleaning, parity, streaming_q

    out: dict[str, QuerySpec] = {}
    for mod in (parity, analytics, cleaning, streaming_q):
        overlap = out.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(mod.QUERIES)
    return out
