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


def histogram_kl_drift(
    df: DataFrame,
    group_cols: list[str],
    part_col: str,
    value_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Per-(group, partition) distribution-drift monitor: KL divergence of
    the partition's value histogram against the group's overall histogram.

    The data-drift alarm for continuously-ingested tables: a day whose
    value distribution diverges from the corpus (schema-valid but
    statistically wrong -- a unit change, a stuck sensor, a bad backfill)
    spikes ``kl_divergence`` even though every row passes row-level
    expectations.  Buckets are equal-width from the group's min/max (a
    per-group scalar frame broadcast back); probabilities are exact
    integer ratios.  Broadcast contract: the joined histogram frames are
    ``|group combinations| x n_buckets`` rows, so ``group_cols`` must be
    a bounded monitoring dimension (source, lang, table) -- NOT a
    high-cardinality key -- for the forced broadcasts to be sound; the
    day-keyed probe side is the only corpus-scaling frame.  Each
    ``p * ln(p/q)`` term is rounded to 9 decimals and
    summed through DECIMAL(28,9) (the a55 pattern) so the result is
    order-independent and engine-portable.  ``p_day = 0`` buckets
    contribute 0 and every observed day bucket exists in the group
    histogram, so the divergence is always finite.
    """
    g = list(group_cols)
    bounds = df.groupBy(*g).agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    )
    b = df.join(F.broadcast(bounds), g).select(
        *g,
        part_col,
        F.when(
            F.col("__hi") == F.col("__lo"), F.lit(0)
        ).otherwise(
            F.least(
                F.lit(n_buckets - 1),
                F.floor(
                    (F.col(value_col) - F.col("__lo"))
                    / ((F.col("__hi") - F.col("__lo")) / n_buckets)
                ).cast("int"),
            )
        ).alias("__b"),
    )
    day_counts = b.groupBy(*g, part_col, "__b").agg(
        F.count(F.lit(1)).alias("__dc")
    )
    all_counts = b.groupBy(*g, "__b").agg(F.count(F.lit(1)).alias("__ac"))
    day_totals = b.groupBy(*g, part_col).agg(F.count(F.lit(1)).alias("__dn"))
    all_totals = b.groupBy(*g).agg(F.count(F.lit(1)).alias("__an"))
    j = (
        day_counts.join(F.broadcast(all_counts), [*g, "__b"])
        .join(F.broadcast(day_totals), [*g, part_col])
        .join(F.broadcast(all_totals), g)
    )
    p = F.col("__dc") / F.col("__dn")
    q = F.col("__ac") / F.col("__an")
    term = F.round(p * F.log(p / q), 9).cast("decimal(28,9)")
    return (
        j.groupBy(*g, part_col)
        .agg(F.round(F.sum(term).cast("double"), 6).alias("kl_divergence"))
    )
