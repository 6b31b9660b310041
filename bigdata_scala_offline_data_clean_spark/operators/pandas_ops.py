"""Arrow-vectorized Pandas UDF operators -- the sanctioned Python path.

Everything else in this engine stays JVM-side; this module is the template
for the cases where Python is genuinely unavoidable (a numpy/scipy scoring
model, a tokenizer, an embedding op).  Rules it demonstrates:

- ``@pandas_udf`` (Arrow batch transfer, ~10-100x over row-at-a-time UDFs);
- pure batch-local arithmetic (no cross-row state), so the operator is
  embarrassingly parallel and partitioning-independent;
- numpy math inside, one Series in -> one Series out.

Cross-checked in tests against the equivalent JVM column expression --
which is also the performance lesson: when an expression CAN be written
with built-ins, the built-in wins; reach for this only past that point.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


@pandas_udf("double")
def _sigmoid_score(chars: pd.Series, tokens: pd.Series) -> pd.Series:
    """Toy quality model: logistic over chars-per-token (numpy-vectorized)."""
    avg_len = chars.to_numpy(dtype="float64") / np.maximum(
        tokens.to_numpy(dtype="float64"), 1.0
    )
    return pd.Series(1.0 / (1.0 + np.exp(-(avg_len - 5.0))))


def vectorized_quality_score(chars: str | Column, tokens: str | Column) -> Column:
    """Arrow-batched quality score column; see module docstring."""
    return _sigmoid_score(F.col(chars) if isinstance(chars, str) else chars,
                          F.col(tokens) if isinstance(tokens, str) else tokens)


def grouped_ols(
    df,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    round_digits: int = 6,
    sort_cols: list[str] | None = None,
):
    """Per-group OLS fit (slope, intercept, r2, n) via grouped-map
    ``applyInPandas`` -- the Arrow path for per-group model fitting.

    The grouped-map shape: Spark shuffles each group to one worker as a
    pandas frame, numpy does the closed-form fit, one result row comes
    back per group.  Right when the per-group computation is a real model
    (here: closed-form regression; in production: sklearn/scipy fits) and
    groups individually fit in worker memory -- the per-group analogue of
    ``mapInPandas``.  For degenerate groups (n < 2 or zero x-variance)
    slope/intercept/r2 are NULL.

    Float sums depend on accumulation order, and a shuffled group arrives
    in nondeterministic row order -- pass ``sort_cols`` (a per-group total
    order) to make the fit value-stable across runs; ``round_digits``
    absorbs the remaining last-bit difference vs an engine's own
    regr_slope/regr_intercept accumulation.
    """
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    sort_by = list(sort_cols or [])
    gframe = df.select(*dict.fromkeys([*group_cols, x_col, y_col, *sort_by]))
    out_schema = StructType(
        [gframe.schema[c] for c in group_cols]
        + [
            StructField("slope", DoubleType()),
            StructField("intercept", DoubleType()),
            StructField("r2", DoubleType()),
            StructField("n", LongType(), False),
        ]
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        if sort_by:
            pdf = pdf.sort_values(sort_by)
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        x = pdf[x_col].to_numpy(dtype="float64")
        y = pdf[y_col].to_numpy(dtype="float64")
        n = len(pdf)
        slope = intercept = r2 = None
        if n >= 2:
            mx, my = x.mean(), y.mean()
            sxx = ((x - mx) ** 2).sum()
            if sxx > 0.0:
                sxy = ((x - mx) * (y - my)).sum()
                slope = sxy / sxx
                intercept = my - slope * mx
                syy = ((y - my) ** 2).sum()
                r2 = (sxy * sxy) / (sxx * syy) if syy > 0.0 else None
        r = round_digits
        return pd.DataFrame(
            [
                {
                    **keys,
                    "slope": None if slope is None else round(slope, r),
                    "intercept": None if intercept is None else round(intercept, r),
                    "r2": None if r2 is None else round(r2, r),
                    "n": n,
                }
            ]
        )

    return gframe.groupBy(*group_cols).applyInPandas(fit, out_schema)


def debounce(
    df,
    key_col: str,
    ts_us_col: str,
    order_col: str,
    gap_us: int,
):
    """Per-key sequential debounce: keep a row iff >= ``gap_us`` has passed
    since the last KEPT row of the same key.

    This is the canonical case where Spark's built-ins genuinely cannot
    express the semantics: the keep decision depends on the last *kept*
    timestamp, a running suppression that no window frame or
    ``session_window`` models (a session extends while inter-event gaps
    are small; debounce re-arms from the kept anchor, so events at
    t=0,3,6 with gap 5 keep {0, 6} but form ONE session).  Hence
    ``applyInPandas``: Arrow ships each key group to Python once, the
    linear scan runs over a sorted group, and the output is deterministic
    for any partitioning because groups are disjoint.

    At 100 TB the shuffle is one hash(key) exchange and state is one
    timestamp per group -- same cost shape as a windowed dedup; the
    Python loop is O(rows per key).

    Optimization round 17 (guide §4.5 / §2.3): the grouped-map
    ``applyInPandas`` form invoked Python once per KEY -- one pandas
    DataFrame construction and one Arrow round-trip per (typically
    tiny) user group, and the grouped-map shuffle ships whole groups.
    The same semantics fall out of one hash(key) repartition + an
    in-partition (key, ts, order) sort + a single ``mapInPandas`` scan:
    groups are contiguous within a partition, batches arrive in
    partition order, and the per-key anchor carries across batch
    boundaries -- so Python is now invoked once per ~10k-row Arrow
    batch instead of once per key, with the identical keep decisions
    (asserted by the unchanged pytest + a103's recursive-CTE oracle).

    Output: input columns + ``kept`` boolean.
    """
    import pandas as pd  # noqa: F811 (Arrow worker re-import)

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    ) + ", kept boolean"
    cols = [f.name for f in df.schema.fields]

    def scan(batches):
        prev_key = None
        last = None  # last KEPT ts of prev_key (never None mid-group)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            keys = pdf[key_col].to_numpy()
            if pdf[key_col].isna().any():
                # a null key group must not re-arm per row (NaN != NaN):
                # normalize nulls to a single sentinel object
                keys = pdf[key_col].astype(object).where(
                    pdf[key_col].notna(), None
                ).to_numpy()
            ts = pdf[ts_us_col].to_numpy()
            kept = np.empty(n, dtype=bool)
            for i in range(n):
                k = keys[i]
                if k != prev_key:
                    prev_key = k
                    last = ts[i]
                    kept[i] = True
                elif ts[i] - last >= gap_us:
                    last = ts[i]
                    kept[i] = True
                else:
                    kept[i] = False
            out = pdf[cols].copy()
            out["kept"] = kept
            yield out

    parts = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.repartition(parts, key_col)
        .sortWithinPartitions(key_col, ts_us_col, order_col)
        .mapInPandas(scan, out_schema)
    )
