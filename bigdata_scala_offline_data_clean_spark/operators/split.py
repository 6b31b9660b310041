"""Deterministic dataset splitting for training pipelines.

``randomSplit`` is partitioning-dependent (re-running after a repartition
reassigns rows); training corpora need splits that are a pure function of
the document id, so a doc lands in the same split on every run, on any
cluster, at any scale, and new data never migrates old rows between splits.

The split key is the first byte of md5("<salt>|<id>") -> 0..255, compared
against cumulative fraction boundaries.  md5-nibble arithmetic matches the
engine-portable scheme used by SimHash (operators/dedup.py), so the DuckDB
oracle reproduces assignments exactly.  Narrow projection, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import _nibble_val


def _bucket(id_col: Column, salt: str) -> Column:
    """First md5 byte of the salted id: uniform 0..255."""
    h = F.md5(F.concat(F.lit(f"{salt}|"), id_col.cast("string")))
    return _nibble_val(F.substring(h, 1, 1)) * 16 + _nibble_val(F.substring(h, 2, 1))


def weighted_sample_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k form).

    Efraimidis-Spirakis A-ES: each row gets key = u^(1/w) for a uniform u
    and weight w; the k largest keys are a weighted sample without
    replacement.  The uniform comes from 16 bits of md5(salt|id) -- a pure
    function of (salt, id), so the sample is reproducible on any cluster
    and stable as unrelated rows churn (same property as ``hash_split``).

    The key is rounded to 9 decimals (libm pow may differ by 1 ULP across
    engines) and ties break on id, so selection is total-order
    deterministic.  Top-k executes as TakeOrderedAndProject: per-partition
    heaps of size k merged on one reducer -- no global sort of the table.
    """
    h = F.md5(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string")))
    h16 = (
        _nibble_val(F.substring(h, 1, 1)) * 4096
        + _nibble_val(F.substring(h, 2, 1)) * 256
        + _nibble_val(F.substring(h, 3, 1)) * 16
        + _nibble_val(F.substring(h, 4, 1))
    )
    u = (h16 + F.lit(0.5)) / F.lit(65536.0)
    key = F.round(F.pow(u, F.lit(1.0) / F.col(weight_col)), 9)
    return (
        df.select(
            id_col,
            F.col(weight_col).alias("weight"),
            key.alias("sample_key"),
        )
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum sampling: keep a row iff its hash bucket
    falls under its stratum's fraction.

    The mixture-construction primitive (e.g. 30% web, 100% books): unlike
    ``sampleBy``, membership is a pure function of (salt, id), so the
    sample is reproducible across runs/clusters and stable as new data
    arrives.  Strata absent from ``fractions`` are dropped.  Zero shuffles.
    """
    b = _bucket(F.col(id_col), salt)
    keep = F.lit(False)
    for stratum, frac in fractions.items():
        keep = keep | (
            (F.col(strata_col) == stratum) & (b < float(frac) * 256.0)
        )
    return df.where(keep)


def hash_split(
    df: DataFrame,
    splits: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row a split label with deterministic hash bucketing.

    ``splits`` maps label -> fraction (must sum to ~1; the last label
    absorbs rounding).  Changing ``salt`` draws an independent assignment.
    """
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions sum to {total}, expected 1.0")
    b = _bucket(F.col(id_col), salt)
    labels = list(splits)
    expr = F.lit(labels[-1])
    cum = 0.0
    # build CASE back-to-front; earlier labels claim [cum, cum+frac)
    thresholds = []
    for lab in labels[:-1]:
        cum += splits[lab]
        thresholds.append((lab, cum * 256.0))
    for lab, bound in reversed(thresholds):
        expr = F.when(b < bound, F.lit(lab)).otherwise(expr)
    return df.withColumn(out_col, expr)


def _u32(id_col: Column, salt: str) -> Column:
    """First 8 md5 nibbles of the salted id -> uniform 0 .. 2^32-1.

    Finer-grained than ``_bucket`` (sampling rates resolve to ~2e-10, not
    1/256); DuckDB mirrors it as ``CAST('0x' || substr(md5(..),1,8) AS
    BIGINT)``.
    """
    h = F.md5(F.concat(F.lit(f"{salt}|"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")


def temperature_mixture_rates(
    df: DataFrame, by: str, temperature: float = 0.5
) -> DataFrame:
    """Per-group keep rates for temperature-based mixture reweighting.

    The multilingual/source-rebalancing scheme (GPT-3 / mT5 style): group
    g with n_g rows gets target share w_g = n_g^T / sum_j n_j^T, i.e. the
    empirical distribution raised to ``temperature`` < 1, which flattens
    head groups and upsamples the tail.  ``rate_g = min(1, w_g * N / n_g)``
    caps at 1 (no duplication -- pair with an explicit upsample op if > 1x
    is wanted).  Rates are rounded to 9 decimals so both engines compare
    the identical double against the hash bucket.

    One tiny aggregation (k groups) + a broadcast join of the two scalar
    totals (an unpartitioned window would funnel through one task and warn;
    the agg + broadcast-crossJoin form expresses the same k-row math).
    """
    counts = df.groupBy(by).agg(F.count(F.lit(1)).alias("n_docs"))
    pw = F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature)))
    totals = counts.agg(
        F.sum(pw).alias("__sum_pw"), F.sum("n_docs").alias("__total")
    )
    rate = F.round(
        F.least(
            F.lit(1.0),
            pw / F.col("__sum_pw") * F.col("__total") / F.col("n_docs"),
        ),
        9,
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(by, "n_docs", rate.alias("rate"))
    )


def temperature_sample(
    df: DataFrame,
    by: str,
    temperature: float = 0.5,
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample head groups to the temperature mixture.

    Membership is a pure function of (salt, id): reproducible across runs,
    clusters, and data growth.  The k-row rate table broadcast-joins onto
    the corpus -- one scan, zero extra shuffles of the data itself.
    """
    rates = temperature_mixture_rates(df, by, temperature)
    u = _u32(F.col(id_col), salt).cast("double") / F.lit(float(2**32))
    return (
        df.join(F.broadcast(rates), by)
        .where(u < F.col("rate"))
        .drop("n_docs", "rate")
    )
