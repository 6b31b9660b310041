"""Data-quality operators: profiling, uniqueness, referential integrity.

The reference "checks" data with show(false) and an eyeball
(CustomerInfDataClean.scala:63-64); these are the programmatic equivalents a
warehouse actually needs, each a single aggregation pass (profiling) or a
broadcast/hash anti-join (integrity) -- shapes that hold at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Per-column profile in ONE aggregation pass over the table:
    row count, null count, distinct count, min/max (as strings).

    Output: one row per column (unpivoted driver-side from the single-row
    aggregate -- the data is scanned exactly once).
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"),
            F.countDistinct(c).alias(f"__distinct_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__min_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__max_{c}"),
        ]
    row = df.agg(*aggs).first()
    out = [
        (c, row["__n"], row[f"__nulls_{c}"], row[f"__distinct_{c}"],
         row[f"__min_{c}"], row[f"__max_{c}"])
        for c in cols
    ]
    return df.sparkSession.createDataFrame(
        out, "col_name string, n_rows bigint, n_nulls bigint, "
        "n_distinct bigint, min_str string, max_str string"
    )


def evaluate_expectations(
    df: DataFrame,
    expectations: dict[str, tuple["F.Column", "object"]],
) -> DataFrame:
    """Data-contract rules in ONE aggregation pass.

    ``expectations`` maps rule name -> (metric aggregate expression, pass
    predicate -- a Python callable over the observed value), e.g.::

        {"no_null_keys": (F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)),
                          lambda m: m == 0)}

    Output: one row per rule -- (rule, observed double, passed boolean).
    All metrics ride a single agg over one scan (k rules never cost k
    count() actions re-reading 100 TB k times); the per-rule unpivot
    happens driver-side on the one-row result, same pattern as
    ``profile_columns``.
    """
    names = list(expectations)
    row = df.agg(
        *[
            expectations[n][0].cast("double").alias(f"__m_{i}")
            for i, n in enumerate(names)
        ]
    ).first()
    out = [
        (n, row[f"__m_{i}"], bool(expectations[n][1](row[f"__m_{i}"])))
        for i, n in enumerate(names)
    ]
    return df.sparkSession.createDataFrame(
        out, "rule string, observed double, passed boolean"
    )


def orphan_rows(
    fact: DataFrame, dim: DataFrame, fact_key: str, dim_key: str
) -> DataFrame:
    """Referential-integrity violations: fact rows whose key has no match in
    the dimension (anti-join; dimension side broadcast when small)."""
    return fact.join(
        dim.select(F.col(dim_key).alias(fact_key)), on=fact_key, how="left_anti"
    )


def uniqueness_violations(df: DataFrame, keys: list[str]) -> DataFrame:
    """Key groups appearing more than once: (keys..., dup_count)."""
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("dup_count"))
        .where(F.col("dup_count") > 1)
    )


def k_anonymity(
    df: DataFrame, qi_cols: list[str], k: int = 5
) -> DataFrame:
    """Per-quasi-identifier-group re-identification audit.

    A released dataset is k-anonymous when every combination of
    quasi-identifier values (the columns an attacker can link externally)
    covers at least ``k`` individuals.  One aggregation pass keyed on the
    QI tuple: ``group_n`` (equivalence-class size) and ``k_anon``
    (``group_n >= k``; FALSE rows are the classes that must be suppressed
    or generalized before release).  Shuffle = |QI combinations|, with
    map-side partials -- the audit scales like any groupBy, and the QI
    cardinality it outputs is exactly what generalization tuning needs.
    """
    return df.groupBy(*qi_cols).agg(
        F.count(F.lit(1)).alias("group_n"),
        (F.count(F.lit(1)) >= k).alias("k_anon"),
    )
