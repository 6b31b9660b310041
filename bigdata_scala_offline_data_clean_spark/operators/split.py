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
