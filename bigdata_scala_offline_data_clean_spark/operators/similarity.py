"""Similarity search over embedding columns (``array<float>``).

- ``cosine_topk``: brute-force exact top-k -- the correctness baseline.
  The query set is broadcast; candidates never shuffle until the final
  per-query top-k window (shuffle keyed on query id, k rows per query
  after AQE partial top-k).
- ``lsh_ann_topk``: the scale path -- random-hyperplane LSH buckets shrink
  the candidate set from |corpus| to |bucket|; recall is tunable with
  ``planes``/``probes``.

Dot products run JVM-side via ``aggregate``/``zip_with`` over the array
column (sequential fold -> deterministic double, reproducible by the
DuckDB oracle's ordered list_reduce).  No Python row path anywhere.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in double precision (deterministic).

    The fold ORDER is load-bearing: it is bit-identical to the oracle's
    ordered ``list_reduce`` (:data:`DOT_SQL`), so every cosine/distance
    query must use THIS helper and that template rather than re-rolling
    the fold (round-9 review fix: five private copies existed).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


_dot = dot_product  # internal callers predate the public name

# DuckDB twin of ``dot_product`` -- format with a=<left expr>, b=<right>
DOT_SQL = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (s, v) -> s + v)"
)


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def with_cosine(df: DataFrame, a: str, b: str, out: str = "cosine") -> Column:
    return df.withColumn(out, _dot(F.col(a), F.col(b)) / (_norm(F.col(a)) * _norm(F.col(b))))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_digits: int | None = 6,
    label_col: str | None = None,
    carry_labels: bool = False,
    method: str = "matmul",
) -> DataFrame:
    """Exact brute-force cosine top-k: (q_id, n_id, cosine, rank).

    ``queries`` is broadcast (a query batch is small next to the corpus);
    the corpus is scanned once, map-side.  ``round_digits`` quantizes the
    score before ranking so rank order is stable across engines/platforms;
    ties break on neighbor id ascending.

    ``label_col`` switches on hard-negative mode: labels ride both sides,
    same-label pairs are dropped in the join condition (before scoring),
    and the output gains ``(q_label, n_label)`` -- the
    :func:`hard_negative_topk` contract, which delegates here so the
    scoring/rounding/tie-break flow has exactly one implementation.
    ``carry_labels`` keeps the labels on the output WITHOUT filtering
    same-label pairs (the a172 label-noise contract).

    ``method`` (optimization round 17, guide §4.2): ``"matmul"``
    (default) scores each corpus partition against the broadcast query
    matrix with one BLAS matmul inside ``mapInPandas`` and emits only the
    per-partition top-``k`` rows per query -- the per-pair
    ``aggregate``/``zip_with`` fold evaluates interpreted per element,
    numpy does the same FLOPs vectorized (the established
    ``_neardup_pairs_matmul`` pattern, same ``_round_half_up6``
    quantization so ranks are the documented 6dp contract in both paths).
    Partial top-k is exact: (cosine desc, n_id asc) is a total order, so
    the union of per-partition top-k contains the global top-k, which the
    final window then selects.  ``"fold"`` keeps the pure-Catalyst
    sequential-fold path (bit-identical to the oracle BEFORE rounding).
    The matmul path requires ``round_digits`` (rank stability across the
    BLAS/fold ulp gap is what the quantization provides); unrounded
    callers fall back to the fold.
    """
    from pyspark.sql import Window

    use_matmul = method == "matmul" and round_digits is not None
    if use_matmul:
        scored = _topk_partials_matmul(
            corpus, queries, id_col, vec_col, k, round_digits,
            label_col=label_col, carry_labels=carry_labels,
        )
    else:
        # per-vector norms computed before the join, not per pair (see
        # embedding_neardup_pairs) -- identical fold, O(n*dim) instead of
        # O(n*q*dim)
        q_lbl = [F.col(label_col).alias("q_label")] if label_col else []
        c_lbl = [F.col(label_col).alias("n_label")] if label_col else []
        if carry_labels and not label_col:
            raise ValueError("carry_labels requires label_col")
        q = queries.select(
            F.col(id_col).alias("q_id"),
            *q_lbl,
            F.col(vec_col).alias("__q_vec"),
            _norm(F.col(vec_col)).alias("__q_norm"),
        )
        c = corpus.select(
            F.col(id_col).alias("n_id"),
            *c_lbl,
            F.col(vec_col).alias("__c_vec"),
            _norm(F.col(vec_col)).alias("__c_norm"),
        )
        cond = F.col("q_id") != F.col("n_id")
        if label_col and not carry_labels:
            cond = cond & (F.col("q_label") != F.col("n_label"))
        scored = c.join(F.broadcast(q), cond).withColumn(
            "cosine",
            _dot(F.col("__q_vec"), F.col("__c_vec"))
            / (F.col("__q_norm") * F.col("__c_norm")),
        )
        if round_digits is not None:
            scored = scored.withColumn(
                "cosine", F.round("cosine", round_digits)
            )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    out = ["q_id", "n_id", "cosine", "rank"]
    if label_col:
        out = ["q_id", "q_label", "n_id", "n_label", "cosine", "rank"]
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(*out)
    )


def _topk_partials_matmul(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    round_digits: int,
    label_col: str | None = None,
    carry_labels: bool = False,
) -> DataFrame:
    """Per-partition cosine top-k candidates via Arrow + BLAS.

    The query batch (ids, labels, row-normalized float64 matrix) is a
    Spark broadcast -- bounded by the :func:`cosine_topk` contract (the
    query side IS the small side).  Each corpus partition computes one
    ``block @ Q.T`` matmul, quantizes HALF_UP at ``round_digits`` (the
    fold path's ``F.round`` mode -- :func:`_round_half_up6`'s ulp caveat
    applies), masks self-pairs (and same-label pairs in hard-negative
    mode), and emits its top-``k`` rows per query under the (cosine
    desc, n_id asc) total order.  Output is a candidate superset of the
    global top-k: ``<= k * n_queries`` rows per partition, so the final
    window's exchange carries k-bounded rows, never |corpus| x |queries|.
    """
    import numpy as np
    import pandas as pd

    cols = [id_col, vec_col] + ([label_col] if label_col else [])

    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"q_id {id_type}, n_id {id_type}, cosine double"
    if label_col:
        lbl_type = corpus.schema[label_col].dataType.simpleString()
        schema += f", q_label {lbl_type}, n_label {lbl_type}"

    qpdf = queries.select(*cols).toPandas()
    if len(qpdf) == 0:
        # empty query batch -> empty result (the 2-D matmul/argsort below
        # needs at least one query column)
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = qpdf[id_col].to_numpy()
    q_m = _np_unit_rows(
        np.asarray(qpdf[vec_col].tolist(), dtype=np.float64)
    )
    q_labels = qpdf[label_col].to_numpy() if label_col else None
    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, q_m, q_labels))
    scale = 10.0 ** round_digits
    exclude_same_label = bool(label_col) and not carry_labels

    def gen(batches):
        b_ids, b_m, b_labels = bc.value
        for batch in batches:
            if len(batch) == 0:
                continue
            n_ids = batch[id_col].to_numpy()
            order = np.argsort(n_ids, kind="stable")
            n_ids = n_ids[order]
            c = _np_unit_rows(
                np.asarray(
                    batch[vec_col].to_numpy()[order].tolist(),
                    dtype=np.float64,
                )
            )
            n_labels = (
                batch[label_col].to_numpy()[order]
                if label_col is not None
                else None
            )
            # HALF_UP quantization at round_digits (F.round's mode)
            s = c @ b_m.T
            s = np.sign(s) * np.floor(np.abs(s) * scale + 0.5) / scale
            mask = n_ids[:, None] == b_ids[None, :]
            if exclude_same_label:
                mask |= n_labels[:, None] == b_labels[None, :]
            s[mask] = -np.inf
            # rows are sorted by n_id asc, so a STABLE argsort of -s is
            # exactly the (cosine desc, n_id asc) rank order
            top = np.argsort(-s, axis=0, kind="stable")[:k, :]
            qi = np.broadcast_to(
                np.arange(len(b_ids))[None, :], top.shape
            ).ravel()
            ci = top.ravel()
            cos = s[ci, qi]
            keep = cos != -np.inf
            qi, ci, cos = qi[keep], ci[keep], cos[keep]
            out = {"q_id": b_ids[qi], "n_id": n_ids[ci], "cosine": cos}
            if label_col:
                out["q_label"] = b_labels[qi]
                out["n_label"] = n_labels[ci]
            yield pd.DataFrame(out)

    # spread narrow byte-split scans across the cores before the BLAS
    # stage (the corpus parquet can arrive as one split at bench scale;
    # no-op on cluster-wide inputs) -- operators/etl.spread_narrow_scan
    from .etl import spread_narrow_scan

    src = spread_narrow_scan(corpus.select(*cols), id_col)
    return src.mapInPandas(gen, schema=schema)


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
    round_digits: int | None = 6,
) -> DataFrame:
    """Contrastive hard-negative mining: per query, the top-``k`` most
    cosine-similar corpus vectors with a DIFFERENT label.

    The standard mining step before contrastive / metric-learning
    fine-tuning: "hard" negatives are the near-misses the model must learn
    to separate.  Delegates to :func:`cosine_topk` in label mode (one
    implementation of the scoring/rounding/tie-break flow -- round-9
    review fix: this was a 50-line near-copy).  Output: ``(q_id,
    q_label, n_id, n_label, cosine, rank)``.
    """
    return cosine_topk(
        corpus,
        queries,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        round_digits=round_digits,
        label_col=label_col,
    )


def l2_norm(vec: Column) -> Column:
    """Public L2-norm fold (sequential double fold -- deterministic,
    mirrored by the oracle's ordered ``list_reduce``)."""
    return _norm(vec)


class PercolationRiskError(ValueError):
    """The requested cosine threshold would percolate the near-dup
    merge graph (estimated chance pair degree over budget) -- raised by
    the opt-in guard on :func:`embedding_neardup_pairs` /
    :func:`semdedup` BEFORE any pair work runs.  Remediation:
    :func:`calibrate_cosine_threshold` (round-15 finding: recalibrate
    tau; retraining the quantizer alone makes keep rate worse)."""


def _sample_pair_cosines(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    sample_size: int,
    n_total: int | None = None,
):
    """Shared canonical-sample pair-cosine block for
    :func:`calibrate_cosine_threshold` and
    :func:`estimate_chance_pair_degree`: (n_total, sorted ascending 6dp
    off-diagonal cosines of the top-``sample_size``-by-``id_col``
    sample).  ONE implementation on purpose -- both operators' contracts
    depend on the identical canonical order, zero-norm handling
    (:func:`_np_unit_rows`) and HALF_UP rounding
    (:func:`_round_half_up6`); review r16 flagged the previous
    hand-duplication.  ``n_total`` skips the count when the caller
    already holds it.  Returns vals=None when n_total < 2."""
    import numpy as np

    if n_total is None:
        n_total = corpus.count()
    if n_total < 2:
        return n_total, None
    sample = [
        r[1]
        for r in sorted(
            (r[0], r[1])
            for r in corpus.select(id_col, vec_col)
            .orderBy(F.col(id_col).asc())
            .limit(sample_size)
            .collect()
        )
    ]
    if len(sample) < 2:
        # a stale caller-supplied n_total >= 2 over a corpus that now
        # holds < 2 rows (ADVICE r16): no pair space, empty distribution
        return n_total, np.empty(0, dtype=np.float64)
    m = _np_unit_rows(np.asarray(sample, dtype=np.float64))
    s = _round_half_up6(m @ m.T)
    iu = np.triu_indices(len(m), 1)
    return n_total, np.sort(s[iu])


def estimate_chance_pair_degree(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.3,
    sample_size: int = 256,
    n_total: int | None = None,
) -> float:
    """Bounded-cost estimate of the mean chance pair degree at a cosine
    threshold: ``P(cos >= tau) * (n - 1)`` from the canonical top-S
    sample's pair-exceedance rate -- the a216 probe's math as an
    operator, O(S^2 + count) while the corpus grows.

    Percolation is decided by this number (round 15, SCALE.md): once it
    crosses ~1 the transitive-closure merge graph collapses into a
    giant component and dedup deletes the corpus.  Deterministic
    (canonical top-``sample_size`` rows by ``id_col``, no RNG), so
    guards built on it are reproducible across sessions.  ``n_total``
    lets a caller that already counted the corpus skip the re-count."""
    n_total, vals = _sample_pair_cosines(
        corpus, vec_col, id_col, sample_size, n_total
    )
    if vals is None or len(vals) == 0:
        return 0.0
    exceed = int((vals >= threshold).sum())
    return exceed / len(vals) * (n_total - 1)


def _percolation_guard(
    corpus: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float,
    budget: float,
    op_name: str,
    n_total: int | None = None,
    sample_size: int = 256,
) -> None:
    """``sample_size`` (ADVICE r16): a guard protecting a CALIBRATED tau
    must estimate on the same canonical sample the calibration used -- a
    smaller subsample's exceedance rate can be higher than the full
    sample's, so the default-256 guard could reject a tau that
    legitimately meets its budget on the 512+-row calibration sample.
    Callers that calibrated pass their S through."""
    deg = estimate_chance_pair_degree(
        corpus, vec_col, id_col, threshold,
        sample_size=sample_size, n_total=n_total,
    )
    if deg >= budget:
        raise PercolationRiskError(
            f"{op_name}: estimated chance pair degree {deg:.3f} >= "
            f"budget {budget} at cosine threshold {threshold} -- the "
            "merge graph would percolate and dedup would collapse the "
            "corpus into one group.  Recalibrate the threshold with "
            "calibrate_cosine_threshold (retraining the quantizer alone "
            "makes this WORSE; see a215/a216 and SCALE.md round 15)."
        )


def embedding_neardup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    method: str = "matmul",
    guard_max_chance_degree: float | None = None,
    guard_sample_size: int = 256,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (a, b, cosine) with a < b and
    cosine >= threshold.

    ``guard_max_chance_degree`` (round 16, opt-in): run the a216
    percolation estimate FIRST and raise :class:`PercolationRiskError`
    when the estimated chance pair degree at ``threshold`` meets the
    budget -- turning round 15's falsification (a fixed tau silently
    percolates as n grows) into a precondition.  ``None`` (default)
    preserves the unguarded behavior; monitoring-style callers
    (a215/a216 themselves) must NOT set it.

    With ``planes`` given, candidates come from hyperplane-LSH buckets (the
    100 TB path: the self-join is keyed on the bucket id and high-cosine
    pairs almost always share sign patterns); without, the exact all-pairs
    comparison runs (correctness baseline -- quadratic, small corpora only).

    ``method`` selects the exact path's execution strategy:

    - ``"matmul"`` (default): Arrow-batched ``mapInPandas`` computing a
      BLAS block matmul of each corpus partition against the broadcast
      normalized matrix.  ~10x faster than the fold -- higher-order array
      expressions evaluate interpreted per element, numpy does the same
      FLOPs vectorized.  Requires one side to fit a broadcast, which the
      exact-all-pairs baseline presupposes anyway (quadratic output).
    - ``"fold"``: pure Catalyst ``aggregate``/``zip_with`` expressions,
      sequential-fold determinism (bit-identical to the DuckDB oracle's
      ordered list_reduce *before* rounding; matmul matches after the
      documented round-to-6 quantization).
    """
    if guard_max_chance_degree is not None:
        _percolation_guard(
            corpus, vec_col, id_col, threshold,
            guard_max_chance_degree, "embedding_neardup_pairs",
            sample_size=guard_sample_size,
        )
    if planes is None and method == "matmul":
        return _neardup_pairs_matmul(corpus, id_col, vec_col, threshold)
    # norms are computed ONCE per vector before the join -- inside the
    # join condition they would be re-folded per PAIR (O(n^2 * dim) extra
    # higher-order-function work); same fold order, so values are identical
    a = corpus.select(
        F.col(id_col).alias("a"),
        F.col(vec_col).alias("__va"),
        _norm(F.col(vec_col)).alias("__na"),
    )
    b = corpus.select(
        F.col(id_col).alias("b"),
        F.col(vec_col).alias("__vb"),
        _norm(F.col(vec_col)).alias("__nb"),
    )
    if planes is not None:
        a = a.withColumn("__bucket", lsh_bucket("__va", planes))
        b = b.withColumn("__bucket", lsh_bucket("__vb", planes))
        pairs = a.join(b, "__bucket").where(F.col("a") < F.col("b"))
    else:
        pairs = a.join(b, F.col("a") < F.col("b"))
    scored = pairs.withColumn(
        "cosine",
        F.round(
            _dot(F.col("__va"), F.col("__vb")) / (F.col("__na") * F.col("__nb")),
            6,
        ),
    )
    return scored.where(F.col("cosine") >= threshold).select("a", "b", "cosine")


def _round_half_up6(arr):
    """numpy ROUND_HALF_UP at 6dp -- ``F.round``'s mode (away from zero
    at midpoints), NOT numpy's banker's rounding, so the matmul paths
    threshold the same 6dp value the fold paths do.  Residual caveat:
    a BLAS dot and a sequential fold can still differ in the last ulp
    BEFORE rounding; 6dp absorbs that except within ~1 ulp of a
    rounding boundary."""
    import numpy as np

    return np.sign(arr) * np.floor(np.abs(arr) * 1e6 + 0.5) / 1e6


def _np_unit_rows(m):
    """Row-normalize, mapping zero-norm rows to ZERO vectors (ADVICE
    r11/r12: a bare divide yields NaN rows, and numpy ``NaN >= t`` is
    False while Spark orders NaN above every double -- silent path
    divergence).  A zero row's similarity to everything is 0.0 < any
    positive threshold, so zero-norm vectors simply never pair here;
    documented contract, matching "cosine undefined => not a near-dup"."""
    import numpy as np

    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0.0, 1.0, n)


# Driver/executor memory budget for the broadcast corpus matrix of
# _neardup_pairs_matmul: 8 bytes * n * d must stay under this, or the
# caller must take the LSH-bucketed fold path instead.
MATMUL_BROADCAST_BUDGET_BYTES = 512 * 1024 * 1024


def _neardup_pairs_matmul(
    corpus: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """Exact all-pairs cosine via Arrow + BLAS.

    The normalized corpus matrix is a Spark broadcast (ids + float64
    ``n x d`` numpy array); ``mapInPandas`` streams corpus partitions and
    emits each block's ``block @ M.T`` rows above threshold with a < b.
    Work stays data-parallel across partitions; only the matrix (8nd
    bytes) is replicated, same budget as any broadcast join side.  Cosines
    are rounded to 6 digits HALF_UP before thresholding, mirroring the
    fold path's ``F.round`` (see :func:`_round_half_up6` for the ulp
    caveat); zero-norm vectors never pair (:func:`_np_unit_rows`).

    The broadcast budget is ENFORCED, not advisory (VERDICT r11/r12
    task): a bounded count+dim probe runs before ``toPandas()``, and a
    corpus whose 8nd bytes exceed ``MATMUL_BROADCAST_BUDGET_BYTES``
    raises instead of OOMing the driver -- the error names the scale
    path (``embedding_neardup_pairs(..., planes=...)``, LSH-bucketed
    fold, no materialization).
    """
    import numpy as np
    import pandas as pd

    # ONE evaluation of the corpus lineage (ADVICE r13): the budget
    # probe and the toPandas() materialization must see the same rows --
    # a nondeterministic source could pass the size check on one
    # evaluation yet materialize a larger one.  The lazy pin stores the
    # computed partitions executor-side on the probe's action; the
    # budget error still fires BEFORE anything crosses to the driver
    # (but the probe action has by then materialized the projection
    # into executor memory/disk -- ADVICE r14 -- so the error path
    # frees those blocks before raising).
    proj = corpus.select(id_col, vec_col).localCheckpoint(eager=False)
    probe = proj.select(
        F.count(F.lit(1)).alias("n"),
        F.max(F.size(F.col(vec_col))).alias("d"),
    ).collect()[0]
    n_rows, dim = probe["n"], probe["d"] or 0
    need = 8 * n_rows * dim
    if need > MATMUL_BROADCAST_BUDGET_BYTES:
        try:
            # free the checkpointed projection blocks (the probe pinned
            # them executor-side).  JVM-internal reach-in: the Python
            # DataFrame API exposes no handle to a localCheckpoint's
            # RDD; LogicalRDD.rdd() verified on Spark 4.1.x -- on a
            # version bump a signature change degrades to the old
            # blocks-linger-until-GC behavior, never an error.
            proj._jdf.queryExecution().analyzed().rdd().unpersist(False)
        except Exception:
            pass
        raise ValueError(
            f"matmul path would broadcast {need / 2**20:.0f} MiB "
            f"({n_rows} x {dim} float64) > budget "
            f"{MATMUL_BROADCAST_BUDGET_BYTES / 2**20:.0f} MiB; use the "
            "LSH-bucketed fold path instead: "
            "embedding_neardup_pairs(corpus, planes=hyperplanes(dim)) "
            "never materializes the corpus.  (Note: the size probe has "
            "already evaluated this projection into executor storage "
            "once; those blocks are unpersisted before this error.)"
        )
    pdf = proj.toPandas()
    ids = pdf[id_col].to_numpy()
    m = _np_unit_rows(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
    bc = corpus.sparkSession.sparkContext.broadcast((ids, m))

    def gen(batches):
        b_ids, b_m = bc.value
        for batch in batches:
            a_ids = batch[id_col].to_numpy()
            a = _np_unit_rows(
                np.asarray(batch[vec_col].tolist(), dtype=np.float64)
            )
            s = _round_half_up6(a @ b_m.T)
            keep = (s >= threshold) & (a_ids[:, None] < b_ids[None, :])
            ai, bi = np.nonzero(keep)
            yield pd.DataFrame(
                {"a": a_ids[ai], "b": b_ids[bi], "cosine": s[ai, bi]}
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    return proj.mapInPandas(
        gen, schema=f"a {id_type}, b {id_type}, cosine double"
    )


def hyperplanes(dim: int, planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (driver-side constants)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def lsh_bucket(vec_sql: str, planes: list[list[float]]) -> Column:
    """Sign-bit bucket id for a vector under fixed hyperplanes.

    ``vec_sql`` is the vector column's SQL text (the expr-text fold rule,
    round 14): the per-plane literal dot folds build as ONE parsed
    string -- same zip_with/aggregate ops, same cast order, same
    ``>= 0`` sign rule and bit weights as the old Column-lambda form, so
    bucket ids (and the a11 oracle) are unchanged."""
    bits = []
    for i, p in enumerate(planes):
        arr = "array(" + ", ".join(_dlit(x) for x in p) + ")"
        fold = (
            f"aggregate(zip_with({vec_sql}, {arr}, "
            f"(a, b) -> cast(a as double) * cast(b as double)), "
            f"0D, (acc, v) -> acc + v)"
        )
        bits.append(f"if({fold} >= 0, {2**i}, 0)")
    return F.expr(f"cast({' + '.join(bits)} as bigint)")


def train_ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_clusters: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    order_col: str | None = None,
) -> list[list[float]]:
    """Coarse k-means quantizer trained on a bounded driver-side sample.

    The sample (not the corpus) crosses to the driver -- at 100 TB you
    sample a few thousand vectors, never the table.  numpy Lloyd iterations
    with a fixed seed => deterministic centroids.

    ``order_col`` (round 13): with a bare ``limit`` the sample's ROW ORDER
    follows the scan's partition layout, and float means over reordered
    rows drift in the last ulp -- so two sessions with different
    ``maxPartitionBytes`` could train different centroids from identical
    data.  Naming a unique id column makes the sample canonical: the
    bounded top-``sample_size`` rows by that column
    (TakeOrderedAndProject, still never the table), in a fixed order.
    Rows-only-checked queries that must reproduce under ANY session
    (a209) require this; ad-hoc training does not.
    """
    import numpy as np

    if order_col is not None:
        sample = [
            r[1]
            for r in sorted(
                (r[0], r[1])
                for r in corpus.select(order_col, vec_col)
                .orderBy(F.col(order_col).asc())
                .limit(sample_size)
                .collect()
            )
        ]
    else:
        sample = [
            r[0] for r in corpus.select(vec_col).limit(sample_size).collect()
        ]
    x = np.asarray(sample, dtype=np.float64)
    rng = np.random.default_rng(seed)
    centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(0)
    return centroids.tolist()


def calibrate_cosine_threshold(
    corpus: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    chance_degree: float = 0.05,
    sample_size: int = 2048,
    min_tau: float = 0.0,
    warn_dup_level: float = 0.9,
    n_total: int | None = None,
) -> float:
    """Corpus-calibrated near-duplicate cosine threshold: the smallest
    6dp tau at which the expected CHANCE pair degree per document stays
    below ``chance_degree``.

    Round-15 measurement (the reason this operator exists): a FIXED
    cosine threshold silently stops meaning "near-duplicate" as the
    corpus grows.  The chance-cosine tail of the corpus is a fixed
    distribution, so the expected number of chance pairs per document,
    ``P(cos >= tau) * (n - 1)``, grows LINEARLY with the corpus -- once
    it crosses ~1, the transitive-closure merge graph percolates into a
    giant component and the keep rate collapses regardless of quantizer
    quality (measured on the sf0.1 embeddings: at tau = 0.3 the exact
    all-pairs keep rate is 0.0005 -- everything merges into one blob --
    while at the calibrated tau the genuine near-dups still pair).
    Retraining the quantizer CANNOT fix this (a finer quantizer finds
    MORE of the chance pairs and makes keep rate strictly worse --
    tests/test_round15.py pins both directions); the threshold itself
    must track ``n``.

    Mechanics mirror :func:`train_ivf_centroids`: a bounded canonical
    sample (top ``sample_size`` by ``id_col``, never the table) crosses
    to the driver, its off-diagonal 6dp-rounded cosine distribution
    estimates the tail, and tau is the smallest sampled cosine whose
    exceedance rate * (n - 1) <= ``chance_degree``, one 6dp step above
    the largest chance-level cosine (conservative: real duplicate pairs
    in the sample can only push tau UP, never let chance pairs in).
    Deterministic: canonical order, no RNG.  Returns
    ``max(tau, min_tau)``.

    Many-duplicates caveat (ADVICE r15): the tail budget counts ALL
    sampled pairs at/above tau, chance AND genuine near-duplicates
    alike.  On a corpus whose sample holds more TRUE-dup pairs than the
    budget ``k``, those pairs consume it and tau lands one step ABOVE
    the true-dup cosine level -- semantic dedup then silently becomes a
    no-op that still satisfies the keep-rate alarm (vacuously: nothing
    merges).  Conservative by design (tau only goes up; chance pairs
    are never let in), but it must not pass silently: when the boundary
    cosine the budget landed on is already near-duplicate-grade
    (``>= warn_dup_level``), a ``UserWarning`` fires -- cosine alone
    cannot separate chance from genuine pairs, so the remediation is a
    larger sample, a tighter ``chance_degree``, or pre-deduping the
    sample before calibrating.  The return value is unchanged (the
    guard never silently lowers tau back into chance territory).
    """
    import warnings

    import numpy as np

    n_total, vals = _sample_pair_cosines(
        corpus, vec_col, id_col, sample_size, n_total
    )
    # len == 0 (ADVICE r16): a caller-supplied stale n_total >= 2 over a
    # corpus with < 2 rows yields an EMPTY pair array, and the rank
    # arithmetic below would index vals[-...] -- same degenerate case as
    # vals is None, same answer
    if vals is None or len(vals) == 0:
        return min_tau
    # exceedance budget: at most chance_degree / (n_total - 1) of pair
    # space may sit at or above tau
    budget = chance_degree / (n_total - 1)
    # sampled pairs allowed >= tau (clamped: an all-permissive budget
    # degrades to one step above the sample minimum, then min_tau)
    k = min(int(np.floor(budget * len(vals))), len(vals) - 1)
    # tau = one 6dp step above the (k+1)-th largest sampled cosine
    boundary = float(vals[len(vals) - 1 - k])
    if boundary >= warn_dup_level:
        warnings.warn(
            f"calibrate_cosine_threshold: the exceedance budget (k={k}) "
            f"landed on a boundary cosine of {boundary:.6f} >= "
            f"{warn_dup_level} -- the sample's top pairs look like GENUINE "
            "near-duplicates consuming the chance budget, so the returned "
            "tau likely makes semantic dedup a no-op; enlarge the sample, "
            "tighten chance_degree, or pre-dedup the sample",
            UserWarning,
            stacklevel=2,
        )
    tau = boundary + 1e-6
    return round(max(tau, min_tau), 6)


def corpus_fingerprint(
    corpus: DataFrame, vec_col: str = "embedding"
) -> tuple[int, int]:
    """(count, checksum) identity of an embedding corpus -- the key of
    a220's trained-artifact registry (round 17).

    The checksum is ``SUM(CAST(floor(1e6 * CAST(vec[1] AS DOUBLE)) AS
    BIGINT))``: float -> double widening is exact, ``floor`` of a double
    is exact, and integer sums are order/partitioning-independent, so
    BOTH engines (and any partition layout) compute the identical pair.
    A corpus COUNT alone is ambiguous (the sf0.001 and sf0.01 testdata
    both hold 500 embeddings with different values); production
    registries key artifacts by a dataset snapshot id, and this is that
    id derived from the data itself.  One bounded aggregate -- the S12
    driver-scalar pattern, O(1) rows back."""
    row = corpus.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.floor(
                F.element_at(F.col(vec_col), 1).cast("double") * 1e6
            ).cast("long")
        ).alias("chk"),
    ).collect()[0]
    return int(row["n"]), int(row["chk"] or 0)


# DuckDB twin of corpus_fingerprint's checksum -- format with the table
CORPUS_CHK_SQL = (
    "SUM(CAST(floor(CAST({t}.embedding[1] AS DOUBLE) * 1e6) AS BIGINT))"
)


# Adaptive calibration sample size (round 17, VERDICT r16 task #2).
# Round 16 hit the k=0 boundary: at the 10x replica (n = 50k) a FIXED
# S = 512 gives npairs ~ 131k and a budget rank k = floor(0.05/(n-1) *
# npairs) that floors to 0, so tau degenerates to sample-max + 1e-6.
# The budget rank stays >= 1 only if the pair count grows with n, i.e.
# S ~ sqrt(n): with S = c * isqrt(n), k ~ 0.05 * c^2 / 2 -- constant in
# n.  c = 8 puts that constant at ~1.6.  The floor keeps small corpora
# at the round-16 behavior (512 was exact there); the cap bounds the
# driver-side canonical-sample collect (_sample_pair_cosines is
# O(S * dim) driver memory and O(S^2) pair work: at S_MAX = 2048 and
# dim = 64 that is ~1 MiB collected and ~2M sampled pairs -- the stated
# ceiling the round-16 verdict asked for; corpora needing tighter
# budgets at n > (2048/8)^2 = 65k tighten chance_degree instead).
CALIBRATION_SAMPLE_MIN = 512
CALIBRATION_SAMPLE_MAX = 2048
CALIBRATION_SAMPLE_PER_SQRT = 8


def calibration_sample_size(n_total: int) -> int:
    """S(n) = clamp(8 * isqrt(n), 512, 2048) -- the adaptive canonical
    sample size for :func:`calibrate_cosine_threshold` /
    :func:`estimate_chance_pair_degree`.  Pure integer arithmetic
    (``math.isqrt``; the SQL twin's ``floor(sqrt(n))`` is exact for
    n < 2^52), so both engines derive the identical plan literal from
    the corpus count."""
    import math

    return min(
        max(
            CALIBRATION_SAMPLE_PER_SQRT * math.isqrt(max(n_total, 0)),
            CALIBRATION_SAMPLE_MIN,
        ),
        CALIBRATION_SAMPLE_MAX,
    )


def _dlit(x: float) -> str:
    """Spark-SQL double literal: repr round-trips the value exactly and
    the D suffix stops the parser reading it as DECIMAL."""
    return repr(float(x)) + "D"


def l2_fold_sql(vec_sql: str, cent: list[float], off: int = 0) -> str:
    """Spark-SQL text of the squared-L2 sequential fold between
    ``vec[off+1 .. off+len]`` and a literal centroid -- same zip_with +
    aggregate ops, same 0D init, same cast order as the old Column-lambda
    form, built as TEXT so one ``F.expr`` parse replaces thousands of
    py4j Column constructions (the a16 rewrite measured ~10s of pure
    DRIVER time per call saved; SCALE.md records the rule: any
    literal-quantizer fold family beyond ~50 nodes is built as expr
    text).  The DuckDB twin stays ``_l2_seg_sql`` -- identical
    elementwise ops in identical order."""
    arr = "array(" + ", ".join(_dlit(x) for x in cent) + ")"
    seg = f"slice({vec_sql}, {off + 1}, {len(cent)})"
    return (
        f"aggregate(zip_with({seg}, {arr}, "
        f"(a, b) -> (cast(a as double) - b) * (cast(a as double) - b)), "
        f"0D, (acc, v) -> acc + v)"
    )


def argmin_struct_sql(dists: list[str]) -> str:
    """Single-pass min/argmin over per-centroid distance folds: a
    ``struct(d, cid)`` fold returning BOTH the min distance and its
    1-based position.  ``array_position(darr, array_min(darr))``
    evaluates every fold TWICE (interpreted HOFs get no CSE; ADVICE
    r13); the strict ``<`` keeps the earlier element on ties, so the
    lowest cid wins -- identical to first-min ``array_position`` and to
    the oracle's ``row_number(d ASC, cid ASC)``."""
    items = ", ".join(
        f"struct({d} as d, {i + 1} as cid)" for i, d in enumerate(dists)
    )
    return (
        f"aggregate(array({items}), "
        f"struct(cast('Infinity' as double) as d, 1 as cid), "
        f"(acc, x) -> if(x.d < acc.d, x, acc))"
    )


def _l2_dists(vec_sql: str, centroids: list[list[float]]) -> Column:
    """Array of sequential squared-L2 folds from the column ``vec_sql``
    to each literal centroid -- the shared assignment primitive (fold
    order matches the DuckDB twin exactly).  Takes the vector column as
    SQL TEXT, not a Column: the literal tree is built as one expr string
    (round 14, the recorded expr-text fold rule applied to its last
    call sites)."""
    return F.expr(
        "array(" + ", ".join(l2_fold_sql(vec_sql, c) for c in centroids) + ")"
    )


def _l2_min_struct(vec_sql: str, centroids: list[list[float]]) -> Column:
    """``struct(d, cid)`` of the nearest centroid in ONE fold pass."""
    return F.expr(
        argmin_struct_sql([l2_fold_sql(vec_sql, c) for c in centroids])
    )


def _ivf_bucket(vec_sql: str, centroids: list[list[float]]) -> Column:
    """1-based index of the nearest centroid (squared L2), ties -> first.
    ``vec_sql`` is the vector column's SQL text (see :func:`_l2_dists`);
    bigint, like the ``array_position`` form it replaces."""
    return F.expr(
        argmin_struct_sql(
            [l2_fold_sql(vec_sql, c) for c in centroids]
        )
        + ".cid"
    ).cast("bigint")


def ivf_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_clusters: int = 16,
    n_probes: int = 2,
    seed: int = 42,
) -> DataFrame:
    """IVF approximate top-k: assign the corpus to coarse clusters, probe
    each query's ``n_probes`` nearest clusters, exact cosine inside.

    The corpus shuffles once on the cluster id; per query the candidate set
    is ~``n_probes/n_clusters`` of the corpus.  Recall rises with
    ``n_probes`` (= exact search at ``n_probes = n_clusters``).
    """
    import numpy as np

    from pyspark.sql import Window

    centroids = train_ivf_centroids(
        corpus, vec_col, n_clusters=n_clusters, seed=seed
    )
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__c_vec"),
        _norm(F.col(vec_col)).alias("__c_norm"),
        _ivf_bucket(vec_col, centroids).alias("bucket"),
    )
    # probe assignment for the (small) query set: driver-side numpy
    cent = np.asarray(centroids)
    q_rows = queries.select(id_col, vec_col).collect()
    probes = []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        order = (((cent - v) ** 2).sum(1)).argsort()[:n_probes]
        probes.extend((r[0], int(b) + 1) for b in order)  # 1-based buckets
    q_probe = corpus.sparkSession.createDataFrame(
        probes, ["q_id", "bucket"]
    ).join(
        queries.select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("__q_vec"),
            _norm(F.col(vec_col)).alias("__q_norm"),
        ),
        "q_id",
    )
    scored = (
        c.join(F.broadcast(q_probe), "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__q_vec"), F.col("__c_vec"))
                / (F.col("__c_norm") * F.col("__q_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def lsh_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    seed: int = 42,
    probe_bits: int = 0,
) -> DataFrame:
    """Approximate top-k: hyperplane-LSH bucket join, exact cosine inside
    the bucket.  Corpus shuffles once on the bucket id (vs. a full
    crossjoin in brute force); recall rises with fewer planes (bigger
    buckets) or with multi-probe.

    ``probe_bits=1`` enables standard multi-probe LSH: each QUERY also
    probes the ``planes`` buckets at Hamming distance 1 from its home
    bucket (sign flips on the planes its projection was closest to zero
    on are the likeliest to hide true neighbors).  Only the tiny query
    side explodes (x ``planes+1``); the corpus still shuffles once, and
    each (query, neighbor) pair can match at most one probed bucket, so
    no candidate dedup is needed.
    """
    from pyspark.sql import Window

    hp = hyperplanes(dim, planes, seed)
    c = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__c_vec"),
        _norm(F.col(vec_col)).alias("__c_norm"),
        lsh_bucket(vec_col, hp).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__q_vec"),
        _norm(F.col(vec_col)).alias("__q_norm"),
        lsh_bucket(vec_col, hp).alias("bucket"),
    )
    if probe_bits >= 1:
        flips = F.array(F.lit(0), *[F.lit(2**i) for i in range(planes)])
        q = q.withColumn("__flip", F.explode(flips)).withColumn(
            "bucket", F.col("bucket").bitwiseXOR(F.col("__flip"))
        ).drop("__flip")
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__q_vec"), F.col("__c_vec"))
                / (F.col("__c_norm") * F.col("__q_norm")),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "rank")
    )


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    max_df: int = 200,
    threshold: float = 0.3,
) -> DataFrame:
    """Sparse lexical near-dup pairs: cosine over TF-IDF top-``k`` vectors.

    The weighted companion to ``ngram_jaccard_pairs``: each document is
    reduced to its top-``k`` TF-IDF terms, candidates are generated by the
    term inverted index (docs sharing >= 1 surviving term), and the cosine
    is computed over the sparse vectors.  ``max_df`` drops terms whose
    inverted-index posting list exceeds the cap -- the standard stopword
    guard that keeps the candidate join linear in corpus size (a term in
    every document would otherwise recreate all-pairs).

    Engine parity: weights are 6-decimal-rounded tf-idf values, dot
    products and squared norms accumulate as exact DECIMAL(30,12)
    (commutative -- partitioning-independent), and the final
    sqrt/division is IEEE-deterministic on identical inputs.
    """
    from .text import tfidf_top_terms

    feats = tfidf_top_terms(df, id_col, text_col, k).where(F.col("tfidf") > 0)
    posting = feats.groupBy("term").agg(F.count(F.lit(1)).alias("__df"))
    feats = (
        feats.join(posting.where(F.col("__df") <= max_df), "term")
        .select(id_col, "term", "tfidf")
    )
    dec = "decimal(30,12)"
    norms = feats.groupBy(id_col).agg(
        F.sqrt(
            F.sum((F.col("tfidf") * F.col("tfidf")).cast(dec)).cast("double")
        ).alias("norm")
    )
    a = feats.select(
        F.col(id_col).alias("a"), "term", F.col("tfidf").alias("wa")
    )
    b = feats.select(
        F.col(id_col).alias("b"), "term", F.col("tfidf").alias("wb")
    )
    dots = (
        a.join(b, "term")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum((F.col("wa") * F.col("wb")).cast(dec)).cast("double").alias("dot"))
    )
    na = norms.select(F.col(id_col).alias("a"), F.col("norm").alias("na"))
    nb = norms.select(F.col(id_col).alias("b"), F.col("norm").alias("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .select(
            "a",
            "b",
            (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ): compress embeddings to m byte-codes and search
# with asymmetric distance (query-side lookup tables).  At 100 TB this is
# the memory story for ANN: a 64-dim float32 vector (256 B) becomes m=8
# uint8 codes (8 B, 32x), and candidate scoring reads codes + a broadcast
# LUT instead of the raw vectors.
# ---------------------------------------------------------------------------


def train_pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    sample_size: int = 2048,
    iters: int = 10,
    seed: int = 42,
    order_col: str | None = None,
) -> list[list[list[float]]]:
    """Per-subspace k-means codebooks from a bounded driver-side sample.

    Returns ``m`` codebooks of ``ksub`` centroids over ``dim/m`` floats.
    Like ``train_ivf_centroids``, only the sample crosses to the driver --
    train on a few thousand vectors, never the corpus.  ``order_col``
    makes the sample canonical (same contract as
    :func:`train_ivf_centroids`): required when the trained artifact must
    be reproducible across sessions/partition layouts.
    """
    import numpy as np

    if order_col is not None:
        sample = [
            r[1]
            for r in sorted(
                (r[0], r[1])
                for r in corpus.select(order_col, vec_col)
                .orderBy(F.col(order_col).asc())
                .limit(sample_size)
                .collect()
            )
        ]
    else:
        sample = [
            r[0] for r in corpus.select(vec_col).limit(sample_size).collect()
        ]
    x = np.asarray(sample, dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True)  # L2 rank == cosine rank
    dim = x.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.default_rng(seed)
    books = []
    for j in range(m):
        xs = x[:, j * dsub : (j + 1) * dsub]
        cents = xs[rng.choice(len(xs), size=min(ksub, len(xs)), replace=False)]
        for _ in range(iters):
            d = ((xs[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
            assign = d.argmin(1)
            for c in range(len(cents)):
                members = xs[assign == c]
                if len(members):
                    cents[c] = members.mean(0)
        books.append(cents.tolist())
    return books


def pq_encode(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """(id, codes) with ``codes[j]`` = 0-based nearest centroid of subspace j.

    Arrow-batched ``mapInPandas``: the argmin over ``m x ksub`` centroids is
    a vectorized numpy matmul per batch -- the expression-tree form would
    be m*ksub folded aggregates per row, far outside codegen comfort.  The
    codebook broadcast is a few KB.
    """
    import numpy as np
    import pandas as pd

    books = np.asarray(codebooks, dtype=np.float64)  # m x ksub x dsub
    m, _, dsub = books.shape
    bc = df.sparkSession.sparkContext.broadcast(books)

    def gen(batches):
        bks = bc.value
        for batch in batches:
            ids = batch[id_col]
            v = np.asarray(batch[vec_col].tolist(), dtype=np.float64)
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            codes = np.empty((len(v), m), dtype=np.int32)
            for j in range(m):
                xs = v[:, j * dsub : (j + 1) * dsub]
                # ||x - c||^2 = ||x||^2 - 2 x.c + ||c||^2; argmin drops ||x||^2
                d = -2.0 * xs @ bks[j].T + (bks[j] ** 2).sum(1)[None, :]
                codes[:, j] = d.argmin(1)
            yield pd.DataFrame({id_col: ids, "codes": list(codes)})

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, vec_col).mapInPandas(
        gen, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    m: int = 8,
    ksub: int = 16,
    refine: int = 50,
    seed: int = 42,
) -> DataFrame:
    """PQ asymmetric-distance top-k: exact query subvectors against
    quantized corpus codes, with exact re-ranking of the top ``refine``
    pool per query.

    Per query a flat ``m*ksub`` lookup table of squared L2 distances to
    every centroid is built driver-side (queries are the small side, as in
    IVF) and broadcast; a candidate's approximate distance is m JVM-side
    array lookups -- ``aggregate(sequence, ...)`` over the codes, no
    Python in the scoring path and no raw vectors read.  Output:
    (q_id, n_id, approx_dist, rank), ties broken on id.
    """
    import numpy as np

    from pyspark.sql import Window

    books = train_pq_codebooks(
        corpus, vec_col, m=m, ksub=ksub, seed=seed
    )
    bks = np.asarray(books)
    _, real_ksub, dsub = bks.shape
    codes = pq_encode(corpus, id_col, vec_col, books).withColumnRenamed(
        id_col, "n_id"
    )
    q_rows = queries.select(id_col, vec_col).collect()
    luts = []
    for r in q_rows:
        v = np.asarray(r[1], dtype=np.float64)
        v /= np.linalg.norm(v)
        lut = np.concatenate(
            [
                ((bks[j] - v[j * dsub : (j + 1) * dsub]) ** 2).sum(1)
                for j in range(m)
            ]
        )
        luts.append((r[0], [float(x) for x in np.round(lut, 9)]))
    q_lut = corpus.sparkSession.createDataFrame(luts, ["q_id", "lut"])
    dist = F.expr(
        f"round(aggregate(sequence(0, {m - 1}), 0D, (acc, j) -> "
        f"acc + lut[j * {real_ksub} + codes[j]]), 6)"
    )
    scored = (
        codes.join(F.broadcast(q_lut), F.col("q_id") != F.col("n_id"))
        .withColumn("approx_dist", dist)
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("approx_dist").asc(), F.col("n_id").asc()
    )
    pool = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= refine)
        .select("q_id", "n_id", "approx_dist")
    )
    # refine: exact cosine over the approx pool only (refine rows per
    # query, not the corpus) -- the standard ADC + re-rank design; the
    # code distance orders the pool, the raw vectors order the answer
    qv = queries.select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("__q_vec"),
        _norm(F.col(vec_col)).alias("__q_norm"),
    )
    cv = corpus.select(
        F.col(id_col).alias("n_id"),
        F.col(vec_col).alias("__c_vec"),
        _norm(F.col(vec_col)).alias("__c_norm"),
    )
    exact = (
        pool.join(F.broadcast(qv), "q_id")
        .join(cv, "n_id")
        .withColumn(
            "cosine",
            F.round(
                _dot(F.col("__q_vec"), F.col("__c_vec"))
                / (F.col("__q_norm") * F.col("__c_norm")),
                6,
            ),
        )
    )
    wr = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= k)
        .select("q_id", "n_id", "cosine", "approx_dist", "rank")
    )


def pq_adc_topk_partials(
    corpus: DataFrame,
    queries: DataFrame,
    books: list[list[list[float]]],
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    normalize: bool = False,
) -> DataFrame:
    """Per-partition PQ encode + asymmetric-distance top-k candidates,
    one Arrow pass against a broadcast numpy codebook.

    Round 18 (guide §4.2): the frozen-codebook queries (a76, a200) used
    to inline the ``m x ksub x dsub`` codebook as literal Spark-SQL
    fold trees -- a76's encode is 256 zip_with/aggregate folds and its
    ADC term forest carries ~16k double literals, so PARSE + analysis +
    codegen dominated the query (~4 s driver-side at ANY data size;
    8c/32c scaling ratio 1.07 confirmed it never touched executors).
    The identical arithmetic now runs vectorized per corpus partition;
    the codebook travels once as a broadcast array.

    Bit-exactness contract (the oracle is unchanged):

    - folds accumulate left-to-right in float64 exactly like Catalyst's
      ``aggregate(..., 0D, (acc, v) -> acc + v)`` -- numpy elementwise
      ``acc = acc + term`` applied in the same index order (never
      ``np.sum``, whose pairwise order differs);
    - code assignment is ``np.argmin`` = first strict minimum, the
      ``argmin_struct_sql`` / first-min ``row_number(d ASC, cid ASC)``
      tie rule;
    - the ADC distance is a per-(query, j, cid) term table -- the term
      value only depends on that triple, so one table replaces the
      per-pair fold bit-identically -- summed in j order;
    - ``normalize=True`` divides each element by the vector's
      sequential-fold L2 norm before the subtraction, matching the
      a76 form ``(cast(a as double) / nrm - b)`` (same fold as
      ``_norm``); zero-norm rows produce the same inf/nan doubles the
      Catalyst division would.

    Output: ``(q_id, n_id, __dist)`` -- each corpus partition's top-k
    rows per query under the (dist asc, n_id asc) total order, a
    candidate superset of the global top-k (partial top-k under a
    total order).  The caller's row_number window selects the final
    pool; its exchange carries <= k * |queries| rows per partition
    instead of |corpus| x |queries|.
    """
    import numpy as np
    import pandas as pd

    bks = np.asarray(books, dtype=np.float64)  # m x ksub x dsub
    m, _, dsub = bks.shape

    id_type = corpus.schema[id_col].dataType.simpleString()
    schema = f"q_id {id_type}, n_id {id_type}, __dist double"

    qpdf = queries.select(id_col, vec_col).toPandas()
    if len(qpdf) == 0:
        return corpus.sparkSession.createDataFrame([], schema)
    q_ids = qpdf[id_col].to_numpy()
    q_m = np.asarray(qpdf[vec_col].tolist(), dtype=np.float64)

    def _seq_norm(x: "np.ndarray") -> "np.ndarray":
        # sqrt of the left-to-right fold of x_i^2 -- bit-identical to
        # operators.similarity._norm / queries.analytics._norm_sql
        acc = np.zeros(len(x), dtype=np.float64)
        for i in range(x.shape[1]):
            acc = acc + x[:, i] * x[:, i]
        return np.sqrt(acc)

    def _sub_dists(v: "np.ndarray", j: int) -> "np.ndarray":
        # (rows, ksub) squared-L2 of subvector j to every centroid,
        # accumulated in dim order (the zip_with/aggregate fold)
        acc = np.zeros((len(v), bks.shape[1]), dtype=np.float64)
        for i in range(dsub):
            diff = v[:, j * dsub + i][:, None] - bks[j, :, i][None, :]
            acc = acc + diff * diff
        return acc

    vq = q_m / _seq_norm(q_m)[:, None] if normalize else q_m
    # lut[q, j, c] = the ADC term for (query q, subspace j, code c) --
    # exactly the value the per-pair Catalyst fold computed, which only
    # ever depended on this triple
    lut = np.stack([_sub_dists(vq, j) for j in range(m)], axis=1)

    bc = corpus.sparkSession.sparkContext.broadcast((q_ids, lut))

    def gen(batches):
        b_ids, b_lut = bc.value
        nq = len(b_ids)
        for batch in batches:
            if len(batch) == 0:
                continue
            n_ids = batch[id_col].to_numpy()
            order = np.argsort(n_ids, kind="stable")
            n_ids = n_ids[order]
            x = np.asarray(
                batch[vec_col].to_numpy()[order].tolist(), dtype=np.float64
            )
            v = x / _seq_norm(x)[:, None] if normalize else x
            dist = np.zeros((len(v), nq), dtype=np.float64)
            for j in range(m):
                code_j = _sub_dists(v, j).argmin(axis=1)  # first-min ties
                dist = dist + b_lut[:, j, :][:, code_j].T  # j-ordered fold
            mask = n_ids[:, None] == b_ids[None, :]
            dist[mask] = np.inf
            # rows are n_id-sorted, so a STABLE argsort of dist is the
            # (dist asc, n_id asc) rank order
            top = np.argsort(dist, axis=0, kind="stable")[:k, :]
            qi = np.broadcast_to(np.arange(nq)[None, :], top.shape).ravel()
            ci = top.ravel()
            keep = ~mask[ci, qi]
            qi, ci = qi[keep], ci[keep]
            yield pd.DataFrame(
                {
                    "q_id": b_ids[qi],
                    "n_id": n_ids[ci],
                    "__dist": dist[ci, qi],
                }
            )

    from .etl import spread_narrow_scan

    src = spread_narrow_scan(corpus.select(id_col, vec_col), id_col)
    return src.mapInPandas(gen, schema=schema)


def _assign_matmul(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Arrow/numpy nearest-centroid assignment -- the large-k scale path
    of :func:`semdedup` (round-11 10x measurement: the interpreted
    per-centroid fold is the dominant term once k scales with the
    corpus).  Emits the same frame shape as the fold path: ``(id, vec
    float64, __nrm, cluster 1-based, __d2c)``; argmin ties break on the
    first (lowest) centroid, like ``array_position(arr,
    array_min(arr))``.

    BIT-IDENTICAL to the fold contract (ADVICE r14): the first cut
    expanded ``x.x - 2 x.c + c.c`` through BLAS, whose summation order
    differs from the sequential ``(x - c)^2`` fold in the last ulp --
    enough to flip near-tie argmins or a 6dp-boundary d2c against the
    DuckDB twin (``l2_fold_sql`` / ``_l2_seg_sql``).  The distance
    matrix is now accumulated dimension-at-a-time (``d2 += (a_j -
    c_j)^2`` for j in vector order): each (row, centroid) cell performs
    the exact IEEE operation sequence of the SQL fold (``0 + v_1 + v_2
    + ...``, elementwise double subtract/square), still vectorized over
    the (n x k) plane per step -- O(nkd) like the matmul, without its
    reordering.  ``numpy.argmin`` returns the FIRST minimum, matching
    the strict-``<`` struct fold and the oracle's ``row_number(d ASC,
    cid ASC)``.  The within-cluster PAIR search (cosine) stays BLAS;
    its residual last-ulp-vs-fold caveat is documented at
    :func:`_round_half_up6` and absorbed by the 6dp rounding except
    within ~1 ulp of a rounding boundary.
    """
    import numpy as np
    import pandas as pd

    c = np.asarray(centroids, dtype=np.float64)
    dim = c.shape[1]

    def gen(batches):
        for batch in batches:
            a = np.asarray(batch[vec_col].tolist(), dtype=np.float64)
            if len(a) == 0:
                continue
            # sequential-fold distance matrix (see docstring): identical
            # IEEE op order to l2_fold_sql per (row, centroid) cell
            d2 = np.zeros((a.shape[0], c.shape[0]), dtype=np.float64)
            for j in range(dim):
                diff = a[:, j, None] - c[None, :, j]
                d2 += diff * diff
            cl = d2.argmin(axis=1)
            yield pd.DataFrame(
                {
                    id_col: batch[id_col].to_numpy(),
                    vec_col: list(a),
                    "__nrm": np.sqrt((a * a).sum(axis=1)),
                    "cluster": cl + 1,
                    "__d2c": d2[np.arange(len(a)), cl],
                }
            )

    id_type = corpus.schema[id_col].dataType.simpleString()
    return corpus.select(id_col, vec_col).mapInPandas(
        gen,
        schema=(
            f"{id_col} {id_type}, {vec_col} array<double>, __nrm double, "
            "cluster int, __d2c double"
        ),
    )


def semdedup(
    corpus: DataFrame,
    centroids: list[list[float]],
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign: str = "fold",
    pair_block: int = 4096,
    guard_max_chance_degree: float | None = None,
    guard_sample_size: int = 256,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023): assign
    every vector to its nearest centroid, find within-cluster cosine
    near-duplicate groups (transitive closure), and keep ONE
    representative per group -- the member closest to its cluster
    centroid, ties broken on the minimum id.

    Returns one row per input vector: ``(id_col, cluster, group_id,
    d2c, is_kept)`` -- ``group_id`` is the minimum id reachable through
    the near-dup pair graph, ``d2c`` the squared L2 distance to the own
    centroid (rounded 6 for output; the RAW fold orders the keeper
    choice, bit-identical across engines per the a199 fold contract).

    Scale: the within-cluster pair join is the SemDeDup contract -- the
    quantizer granularity is the knob that bounds it.  ``centroids``
    arrives as a parameter (the shipped-artifact pattern shared with
    ``ivf_ann_topk``): production scales the cluster count with the
    corpus (paper regime k ~ sqrt(n) or finer) so per-cluster membership
    -- and with it the quadratic term -- stays bounded; the transitive
    closure is the same O(log n)-round star contraction as text dedup.
    On the matmul path ``pair_block`` makes even a mis-trained whale
    cluster survivable (round 13, upgrading the round-13a loud-error
    cap): each cluster is split into id-ordered blocks of at most
    ``pair_block`` members and the pair search runs per BLOCK PAIR
    (i <= j), so no single task ever holds more than two blocks --
    per-task memory is O(pair_block^2) and the whale's quadratic pair
    work distributes across its block-pair grid instead of one task.
    The quantizer knob remains the real fix (a whale cluster still
    costs O(|cluster|^2) sims in total); the sub-split turns the
    failure mode from an OOM/error into bounded, scheduled work.

    ``guard_max_chance_degree`` (round 16, opt-in): the a216
    percolation estimate runs FIRST -- before any assignment work --
    and raises :class:`PercolationRiskError` when the estimated
    CORPUS-WIDE chance pair degree at ``threshold`` meets the budget.
    The quantizer only partitions the pair space, it cannot remove
    chance pairs (round 15 measured that a finer quantizer finds MORE
    of them), so the corpus-level estimate is the right precondition
    for the within-cluster merge too.
    """
    from .dedup import connected_components

    if guard_max_chance_degree is not None:
        _percolation_guard(
            corpus, vec_col, id_col, threshold,
            guard_max_chance_degree, "semdedup",
            sample_size=guard_sample_size,
        )
    if assign == "matmul":
        v = _assign_matmul(corpus, centroids, id_col, vec_col)
    elif assign == "fold":
        # one struct fold yields BOTH the cluster and the distance; the
        # checkpoint below pins the frame BEFORE field extraction, so
        # the k-fold pass runs exactly once per row (the old
        # array_position(darr, array_min(darr)) + array_min(darr)
        # projection folded the k distances three times -- ADVICE r13's
        # no-CSE-on-interpreted-HOFs point)
        v = corpus.select(
            id_col,
            vec_col,
            _norm(F.col(vec_col)).alias("__nrm"),
            _l2_min_struct(vec_col, centroids).alias("__mc"),
        )
    else:
        raise ValueError("assign must be 'fold' or 'matmul'")
    # recompute pin (review fix): v feeds both self-join sides AND the
    # final assignment, and the centroid distance pass is the dominant
    # per-row cost -- without the pin the corpus projection re-runs 3x
    v = v.localCheckpoint(eager=False)
    if assign == "fold":
        v = v.select(
            id_col,
            vec_col,
            "__nrm",
            F.col("__mc.cid").cast("int").alias("cluster"),
            F.col("__mc.d").alias("__d2c"),
        )
    if assign == "matmul":
        # scale path all the way down: per-cluster pairwise cosine via
        # BLAS inside applyInPandas (round-11 10x measurement: with k
        # scaled to the corpus the interpreted pair fold, not the
        # assignment, dominates).  Whale-safe by construction (round 13,
        # replacing the earlier loud-error cap): every cluster splits
        # into id-ordered blocks of <= ``pair_block`` members, each row
        # fans out to its block-pair participations, and the grouped
        # kernel sees AT MOST TWO BLOCKS -- a cluster of any size
        # distributes its pair grid across (n_blocks^2 + n_blocks) / 2
        # bounded tasks instead of one quadratic task.  Fan-out per row
        # is n_blocks (= |cluster| / pair_block), the inherent
        # O(n^2 / pair_block) data movement of an exact pair search.
        # Cosines round 6dp HALF_UP before thresholding -- F.round's
        # mode, the fold-path contract (_round_half_up6); zero-norm
        # rows never pair (_np_unit_rows).  Blocks are id-ordered, so
        # cross-block pairs satisfy a < b automatically and same-block
        # pairs filter on id -- each unordered pair is emitted exactly
        # once.
        import pandas as pd

        w = Window.partitionBy("cluster").orderBy(F.col(id_col).asc())
        vb = (
            v.select("cluster", id_col, vec_col)
            .withColumn(
                "__blk",
                F.floor(
                    (F.row_number().over(w) - 1) / F.lit(pair_block)
                ).cast("int"),
            )
        )
        nb = vb.groupBy("cluster").agg(F.max("__blk").alias("__nb"))
        parts = (
            vb.join(nb, "cluster")
            .select(
                "cluster",
                id_col,
                vec_col,
                F.explode(
                    F.expr(
                        "concat("
                        "transform(sequence(__blk, __nb), "
                        "  j -> struct(__blk as bi, j as bj, 0 as side)), "
                        "case when __blk = 0 then array() else "
                        "transform(sequence(0, __blk - 1), "
                        "  i -> struct(i as bi, __blk as bj, 1 as side)) "
                        "end)"
                    )
                ).alias("__p"),
            )
            .select(
                "cluster", id_col, vec_col,
                F.col("__p.bi").alias("__bi"),
                F.col("__p.bj").alias("__bj"),
                F.col("__p.side").alias("__side"),
            )
        )

        def pgen(key, pdf):
            import numpy as np

            bi, bj = key[1], key[2]
            left = pdf if bi == bj else pdf[pdf["__side"] == 0]
            right = pdf if bi == bj else pdf[pdf["__side"] == 1]
            ids_a = left[id_col].to_numpy()
            ids_b = right[id_col].to_numpy()
            if len(ids_a) == 0 or len(ids_b) == 0:
                return pd.DataFrame({"a": ids_a[:0], "b": ids_b[:0]})
            m_a = _np_unit_rows(
                np.asarray(left[vec_col].tolist(), dtype=np.float64)
            )
            m_b = (
                m_a
                if bi == bj
                else _np_unit_rows(
                    np.asarray(right[vec_col].tolist(), dtype=np.float64)
                )
            )
            sim = _round_half_up6(m_a @ m_b.T)
            keep = (sim >= threshold) & (ids_a[:, None] < ids_b[None, :])
            ai, bj_ = np.nonzero(keep)
            return pd.DataFrame({"a": ids_a[ai], "b": ids_b[bj_]})

        id_type = corpus.schema[id_col].dataType.simpleString()
        pairs = (
            parts.groupBy("cluster", "__bi", "__bj")
            .applyInPandas(pgen, schema=f"a {id_type}, b {id_type}")
        )
    else:
        a, b = v.alias("a"), v.alias("b")
        cos = F.round(
            dot_product(F.col(f"a.{vec_col}"), F.col(f"b.{vec_col}"))
            / (F.col("a.__nrm") * F.col("b.__nrm")),
            6,
        )
        pairs = (
            a.join(
                b,
                (F.col("a.cluster") == F.col("b.cluster"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .where(cos >= threshold)
            .select(
                F.col(f"a.{id_col}").alias("a"),
                F.col(f"b.{id_col}").alias("b"),
            )
        )
    cc = connected_components(pairs).withColumnRenamed("node", id_col)
    assigned = v.join(cc, id_col, "left").select(
        id_col,
        "cluster",
        F.coalesce(F.col("component"), F.col(id_col)).alias("group_id"),
        "__d2c",
    )
    wk = Window.partitionBy("group_id").orderBy(
        F.col("__d2c").asc(), F.col(id_col).asc()
    )
    return assigned.select(
        id_col,
        "cluster",
        "group_id",
        F.round("__d2c", 6).alias("d2c"),
        (F.row_number().over(wk) == 1).alias("is_kept"),
    )
