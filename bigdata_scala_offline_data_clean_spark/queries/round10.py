"""Round-10 queries: oracle-checked IVF / PQ ANN cores + real media codecs.

VERDICT r9 task #2: a16 (IVF) and a76 (PQ) were the only 2 of 300
registry queries without exact-match oracle evidence, because their
k-means training step is seeded-but-engine-specific.  These two queries
factor out the DETERMINISTIC core of each index -- the part that runs
over the 100 TB corpus -- against a PINNED coarse quantizer, and give
DuckDB the identical quantizer, so every step is exact-match checked:

- a199_ivf_assign: coarse-cluster assignment (argmin squared-L2 over the
  pinned centroids), per-query probe selection (2 nearest centroids),
  and exact cosine top-k inside the probed buckets.
- a200_pq_adc: per-subspace code assignment (m=8 subspaces of dim/8,
  codebook = the pinned centroids' subvectors) and asymmetric-distance
  top-k (sum over subspaces of L2(query subvector, coded centroid)).

The pinned quantizer is DATA-DERIVED: the embeddings of ``vec_id`` 100..
107 act as the 8 centroids.  In production the quantizer is an offline-
trained artifact shipped to the job (FAISS-style); pinning specific
corpus vectors reproduces that contract with zero literal-precision risk
-- both engines read the SAME float32 parquet values and widen to double
exactly, so every distance is bit-identical and every argmin/tie agrees.
The k-means TRAINING path stays covered by a16/a76 (recall monitors +
pytest pinning full-probe == exact); reference: the trained-quantizer
variants live in ``operators/similarity.py:278,529``.

Float parity: every distance is the repo's sequential zip_with/aggregate
fold (init 0.0) mirrored by DuckDB's ordered ``list_transform`` +
``list_reduce`` (no init -- equal because the first term ``t0 + 0.0 ==
t0`` for non-negative squares); ties break on centroid id / neighbor id
ascending on BOTH sides; ``round(., 6)`` touches output columns only,
never rank keys.

Scale design (100 TB): the corpus is touched by ONE projection pass --
bucket id / code array are pure expressions over 8 (resp. 8x8) literal
centroid folds, JVM-side inside whole-stage codegen, no shuffle and no
Python.  The 5-query probe/ADC frames broadcast; the only shuffle is the
final per-query top-k window (5 keys x bounded candidates).  The
candidate set for IVF is the probed buckets only (~n_probes/k_clusters
of the corpus), the standard IVF contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_SEED_LO, _SEED_HI = 100, 107  # pinned quantizer: 8 corpus vectors
_N_CENT = _SEED_HI - _SEED_LO + 1
_DIM = 64
_NQ, _K, _PROBES = 5, 5, 2
_M, _DSUB = 8, _DIM // 8  # PQ: 8 subspaces of 8 dims


def _l2_seg_sql(a: str, b: str, off: str, n: int) -> str:
    """DuckDB twin of ``similarity.l2_fold_sql`` over ``{a}[off+1..off+n]``
    vs ``{b}[off+1..off+n]`` -- identical elementwise ops, identical
    order."""
    d = f"(CAST({a}[{off} + i] AS DOUBLE) - CAST({b}[{off} + i] AS DOUBLE))"
    return (
        f"list_reduce(list_transform(generate_series(1, {n}), "
        f"i -> {d} * {d}), (acc, x) -> acc + x)"
    )


def _seed_vectors(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """The 8 pinned quantizer vectors -- a bounded driver fetch (8 rows of
    64 floats), the 'load the trained index artifact' step of a real
    deployment.  float32 -> Python float is exact double widening."""
    e = load_table(spark, sf_dir, "embeddings")
    rows = (
        e.where(F.col("vec_id").between(_SEED_LO, _SEED_HI))
        .select("vec_id", "embedding")
        .collect()
    )
    by_id = {int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in rows}
    return [by_id[i] for i in range(_SEED_LO, _SEED_HI + 1)]


# ---------------------------------------------------------------------------
# a199 -- IVF assignment + probed exact top-k, exact-match checked.
# ---------------------------------------------------------------------------


def a199_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import _ivf_bucket, _norm, dot_product, l2_fold_sql

    cents = _seed_vectors(spark, sf_dir)
    e = load_table(spark, sf_dir, "embeddings")

    # the operator's own nearest-centroid assignment (squared-L2 argmin,
    # 1-based, ties -> first == DuckDB row_number(d ASC, cid ASC) = 1);
    # since round 14 a single-pass struct fold built as expr TEXT (the
    # recorded expr-text fold rule; values and tie rule unchanged)
    bucket = _ivf_bucket("embedding", cents).cast("int")

    corpus = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("__c_vec"),
        _norm(F.col("embedding")).alias("__c_norm"),
        bucket.alias("n_bucket"),
    )
    # probe selection for the 5 queries: explode the 8 (cid, dist) pairs
    # and keep the 2 nearest -- 40 rows, broadcast with the query vectors
    # (expr text, not Column lambdas -- one parse vs ~8x64 py4j calls)
    pr = F.explode(
        F.expr(
            "array("
            + ", ".join(
                f"struct({i + 1} as cid, "
                f"{l2_fold_sql('embedding', c)} as d)"
                for i, c in enumerate(cents)
            )
            + ")"
        )
    )
    wq = Window.partitionBy("q_id").orderBy(
        F.col("d").asc(), F.col("cid").asc()
    )
    probes = (
        e.where(F.col("vec_id") < _NQ)
        .select(
            F.col("vec_id").alias("q_id"),
            F.col("embedding").alias("__q_vec"),
            _norm(F.col("embedding")).alias("__q_norm"),
            pr.alias("__p"),
        )
        .select("q_id", "__q_vec", "__q_norm", "__p.cid", "__p.d")
        .withColumn("__pr", F.row_number().over(wq))
        .where(F.col("__pr") <= _PROBES)
        .select("q_id", "__q_vec", "__q_norm", F.col("cid").alias("__probe"))
    )
    scored = (
        corpus.join(
            F.broadcast(probes),
            (F.col("n_bucket") == F.col("__probe"))
            & (F.col("q_id") != F.col("n_id")),
        )
        .withColumn(
            "cosine",
            F.round(
                dot_product(F.col("__q_vec"), F.col("__c_vec"))
                / (F.col("__q_norm") * F.col("__c_norm")),
                6,
            ),
        )
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= _K)
        .select("q_id", "n_id", "n_bucket", "cosine", "rank")
    )


def _a199_sql() -> str:
    from ..operators.similarity import DOT_SQL as dot

    l2 = _l2_seg_sql("e.embedding", "s.cv", "0", _DIM)
    l2q = _l2_seg_sql("q.qv", "s.cv", "0", _DIM)
    qq, cc = dot.format(a="q.qv", b="q.qv"), dot.format(a="c.cv2", b="c.cv2")
    qc = dot.format(a="q.qv", b="c.cv2")
    return f"""
WITH seeds AS (
  SELECT CAST(vec_id - {_SEED_LO - 1} AS INT) AS cid, embedding AS cv
  FROM embeddings WHERE vec_id BETWEEN {_SEED_LO} AND {_SEED_HI}
), assign AS (
  SELECT n_id, cid AS n_bucket FROM (
    SELECT e.vec_id AS n_id, s.cid,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {l2} ASC, s.cid ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
  WHERE vec_id < {_NQ}
), probes AS (
  SELECT q_id, cid AS probe FROM (
    SELECT q.q_id, s.cid,
           row_number() OVER (
             PARTITION BY q.q_id ORDER BY {l2q} ASC, s.cid ASC) AS rn
    FROM q CROSS JOIN seeds s
  ) WHERE rn <= {_PROBES}
), cand AS (
  SELECT p.q_id, a.n_id, a.n_bucket
  FROM probes p JOIN assign a ON a.n_bucket = p.probe
  WHERE p.q_id <> a.n_id
), scored AS (
  SELECT cand.q_id, cand.n_id, cand.n_bucket,
         round({qc} / (sqrt({qq}) * sqrt({cc})), 6) AS cosine
  FROM cand
  JOIN (SELECT vec_id, embedding AS cv2 FROM embeddings) c
    ON c.vec_id = cand.n_id
  JOIN q ON q.q_id = cand.q_id
), ranked AS (
  SELECT q_id, n_id, n_bucket, cosine,
         row_number() OVER (
           PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored
)
SELECT q_id, n_id, n_bucket, cosine, rank FROM ranked WHERE rank <= {_K}
"""


QUERIES["a199_ivf_assign"] = QuerySpec(a199_ivf_assign, _a199_sql())


# ---------------------------------------------------------------------------
# a200 -- PQ code assignment + asymmetric-distance top-k, exact-match
# checked.  Codebook j = subvectors [j*8+1 .. j*8+8] of the 8 pinned
# vectors; a corpus vector's code_j is the 1-based argmin centroid of
# subspace j; ADC(q, n) folds the 8 per-subspace L2 terms in j order.
# ---------------------------------------------------------------------------


def a200_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_adc_topk_partials

    cents = _seed_vectors(spark, sf_dir)
    books = [
        [c[j * _DSUB : (j + 1) * _DSUB] for c in cents] for j in range(_M)
    ]  # books[j][cid-1] = centroid subvector
    e = load_table(spark, sf_dir, "embeddings")

    # Round 18 (guide §4.2): the 8x8x8 literal fold trees (encode argmin
    # + ADC term forest, formerly Spark-SQL expr text) are replaced by
    # ONE Arrow pass against the broadcast numpy codebook --
    # pq_adc_topk_partials preserves the fold order, the first-min tie
    # rule, and the j-ordered ADC sum bit-identically (its docstring is
    # the contract), so the oracle twin is unchanged.
    parts = pq_adc_topk_partials(
        e, e.where(F.col("vec_id") < _NQ), books, _K, normalize=False
    )
    wk = Window.partitionBy("q_id").orderBy(
        F.col("__dist").asc(), F.col("n_id").asc()
    )
    return (
        parts.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= _K)
        .select(
            "q_id",
            "n_id",
            F.round("__dist", 6).alias("approx_dist"),
            "rank",
        )
    )


def _a200_sql() -> str:
    l2c = _l2_seg_sql("e.embedding", "s.cv", "(js.j * 8)", _DSUB)
    l2q = _l2_seg_sql("q.qv", "s.cv", "(c.j * 8)", _DSUB)
    return f"""
WITH seeds AS (
  SELECT CAST(vec_id - {_SEED_LO - 1} AS INT) AS cid, embedding AS cv
  FROM embeddings WHERE vec_id BETWEEN {_SEED_LO} AND {_SEED_HI}
), codes AS (
  SELECT n_id, j, cid AS code FROM (
    SELECT e.vec_id AS n_id, js.j, s.cid,
           row_number() OVER (
             PARTITION BY e.vec_id, js.j ORDER BY {l2c} ASC, s.cid ASC
           ) AS rn
    FROM embeddings e
    CROSS JOIN generate_series(0, {_M - 1}) AS js(j)
    CROSS JOIN seeds s
  ) WHERE rn = 1
), q AS (
  SELECT vec_id AS q_id, embedding AS qv FROM embeddings
  WHERE vec_id < {_NQ}
), terms AS (
  SELECT q.q_id, c.n_id, c.j, {l2q} AS t
  FROM codes c
  JOIN seeds s ON s.cid = c.code
  CROSS JOIN q
  WHERE q.q_id <> c.n_id
), adc AS (
  SELECT q_id, n_id,
         list_reduce(list(t ORDER BY j), (acc, x) -> acc + x) AS dist
  FROM terms GROUP BY q_id, n_id
), ranked AS (
  SELECT q_id, n_id, round(dist, 6) AS approx_dist,
         row_number() OVER (
           PARTITION BY q_id ORDER BY dist ASC, n_id ASC) AS rank
  FROM adc
)
SELECT q_id, n_id, approx_dist, rank FROM ranked WHERE rank <= {_K}
"""


QUERIES["a200_pq_adc"] = QuerySpec(a200_pq_adc, _a200_sql())


# ---------------------------------------------------------------------------
# a201 / a202 -- real media codecs under oracle check (VERDICT r9 task #4).
#
# The formerly-stubbed decode paths in operators/multimodal.py are now
# pure-stdlib parsers for the uncompressed formats (P6 PPM, RIFF/WAVE
# 16-bit PCM), wired as the DEFAULT decoder= / resizer= / resampler=.
# These two queries exercise them end-to-end: a deterministic payload is
# synthesized per document (PPM bytes JVM-side from md5 arithmetic; WAV
# via struct.pack inside the same Arrow batch), the REAL decoder parses
# it back, and DuckDB recomputes the expected metadata independently
# from the generating arithmetic -- a mis-parse (wrong endianness, wrong
# header offset, off-by-one raster slice, wrong nearest-neighbor or
# zero-order-hold index convention) breaks the exact match.
#
# Scale design (100 TB): payload synthesis is a codegen projection
# (concat/unhex/substring on binary, no Python); decode is the
# sanctioned Arrow `mapInPandas` slow path -- one pass over the corpus,
# zero shuffles, per-batch memory bounded by the Arrow batch size; the
# driver never sees a payload.  Float parity: the only non-integer
# outputs are single IEEE divisions of exact integer sums, rounded to 6
# on both sides.  Injection points for compressed formats (PIL /
# soundfile) remain the production contract.
# ---------------------------------------------------------------------------

_HEXD = "0123456789abcdef"


def _bv(hx: str, p: str) -> str:
    """DuckDB: value of the 1-based byte ``p`` of the blob whose hex
    string is ``{hx}`` -- two strpos nibble lookups."""
    return (
        f"(16 * (strpos('{_HEXD}', substr({hx}, 2*({p})-1, 1)) - 1)"
        f" + (strpos('{_HEXD}', substr({hx}, 2*({p}), 1)) - 1))"
    )


def a201_ppm_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from ..operators.multimodal import decode_image, resize_image

    docs = load_table(spark, sf_dir, "documents")
    # deterministic P6 payload, built JVM-side: dims from doc_id, raster
    # = first 3*w*h bytes of 7 repeats of md5(text) (112 >= max 105)
    hx = F.md5(F.encode(F.col("text"), "utf-8"))
    base = docs.select(
        "doc_id",
        (F.col("doc_id") % 7 + 1).cast("int").alias("__w"),
        (F.col("doc_id") % 5 + 1).cast("int").alias("__h"),
        F.concat(*([F.unhex(hx)] * 7)).alias("__pixfull"),
    )
    header = F.encode(
        F.concat(
            F.lit("P6\n"),
            F.col("__w").cast("string"),
            F.lit(" "),
            F.col("__h").cast("string"),
            F.lit("\n255\n"),
        ),
        "utf-8",
    )
    payload = F.concat(
        header, F.expr("substring(__pixfull, 1, 3 * __w * __h)")
    )
    pdf_in = base.select("doc_id", payload.alias("payload"))

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "width", "height", "maxval",
                    "n_pixel_bytes", "mean_r", "resized_mean_r",
                )
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                img = decode_image(bytes(b))        # default: stdlib P6
                rz = resize_image(bytes(b), (3, 2))  # default: NN resize
                r, rr = img["pixels"][0::3], rz["pixels"][0::3]
                out["doc_id"].append(doc_id)
                out["width"].append(img["width"])
                out["height"].append(img["height"])
                out["maxval"].append(img["maxval"])
                out["n_pixel_bytes"].append(len(img["pixels"]))
                out["mean_r"].append(
                    sum(r) / (img["width"] * img["height"])
                )
                out["resized_mean_r"].append(sum(rr) / 6)
            yield pd.DataFrame(out)

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("maxval", IntegerType()),
            StructField("n_pixel_bytes", LongType()),
            StructField("mean_r", DoubleType()),
            StructField("resized_mean_r", DoubleType()),
        ]
    )
    return (
        pdf_in.mapInPandas(gen, schema)
        .withColumn("mean_r", F.round("mean_r", 6))
        .withColumn("resized_mean_r", F.round("resized_mean_r", 6))
    )


def _a201_sql() -> str:
    # resized (3x2) nearest-neighbor source R byte for output cell k:
    # y = k // 3, x = k % 3; src = (y*h // 2)*w + (x*w // 3); byte 3*src+1
    rk = "3*(((k // 3) * h // 2) * w + ((k % 3) * w // 3)) + 1"
    return f"""
WITH base AS (
  SELECT doc_id, CAST(doc_id % 7 + 1 AS INT) AS w,
         CAST(doc_id % 5 + 1 AS INT) AS h, repeat(md5(text), 7) AS hx
  FROM documents
)
SELECT doc_id, w AS width, h AS height, 255 AS maxval,
  CAST(3*w*h AS BIGINT) AS n_pixel_bytes,
  round(CAST(list_reduce(list_transform(range(0, w*h),
      k -> {_bv('hx', '3*k+1')}), (a,b) -> a+b) AS DOUBLE) / (w*h), 6)
    AS mean_r,
  round(CAST(list_reduce(list_transform(range(0, 6),
      k -> {_bv('hx', rk)}), (a,b) -> a+b) AS DOUBLE) / 6, 6)
    AS resized_mean_r
FROM base
"""


QUERIES["a201_ppm_decode"] = QuerySpec(a201_ppm_decode, _a201_sql())


def a202_wav_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import struct

    import pandas as pd

    from ..operators.multimodal import decode_audio, resample_audio

    docs = load_table(spark, sf_dir, "documents")

    def gen(batches):
        for pdf in batches:
            out: dict[str, list] = {
                k: []
                for k in (
                    "doc_id", "n_channels", "sample_rate",
                    "bits_per_sample", "n_frames", "duration_ms",
                    "sum_sq", "resampled_n", "resampled_sum",
                )
            }
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                rate = 8000 + 4000 * int(doc_id % 3)
                n = 8 + int(doc_id % 5)
                data = (hashlib.md5(text.encode("utf-8")).digest() * 2)[
                    : 2 * n
                ]
                payload = struct.pack(
                    "<4sI4s4sIHHIIHH4sI", b"RIFF", 36 + len(data),
                    b"WAVE", b"fmt ", 16, 1, 1, rate, rate * 2, 2, 16,
                    b"data", len(data),
                ) + data
                a = decode_audio(payload)            # default: RIFF walk
                rs = resample_audio(payload, 4000)   # default: ZOH
                out["doc_id"].append(doc_id)
                out["n_channels"].append(a["n_channels"])
                out["sample_rate"].append(a["sample_rate"])
                out["bits_per_sample"].append(a["bits_per_sample"])
                out["n_frames"].append(a["n_frames"])
                out["duration_ms"].append(
                    a["n_frames"] * 1000.0 / a["sample_rate"]
                )
                out["sum_sq"].append(sum(v * v for v in a["samples"]))
                out["resampled_n"].append(rs["n_frames"])
                out["resampled_sum"].append(sum(rs["samples"]))
            yield pd.DataFrame(out)

    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("n_channels", IntegerType()),
            StructField("sample_rate", IntegerType()),
            StructField("bits_per_sample", IntegerType()),
            StructField("n_frames", LongType()),
            StructField("duration_ms", DoubleType()),
            StructField("sum_sq", LongType()),
            StructField("resampled_n", LongType()),
            StructField("resampled_sum", LongType()),
        ]
    )
    return docs.select("doc_id", "text").mapInPandas(gen, schema).withColumn(
        "duration_ms", F.round("duration_ms", 6)
    )


def _a202_sql() -> str:
    # little-endian signed int16 sample i (0-based) of the data bytes
    samp = (
        f"(CASE WHEN {_bv('hx', '2*i+1')} + 256 * {_bv('hx', '2*i+2')}"
        f" >= 32768 THEN {_bv('hx', '2*i+1')} + 256 * {_bv('hx', '2*i+2')}"
        f" - 65536 ELSE {_bv('hx', '2*i+1')} + 256 * {_bv('hx', '2*i+2')}"
        f" END)"
    )
    # zero-order hold: output frame j reads source frame j*rate // 4000
    rsamp = samp.replace("2*i", "2*(j * rate // 4000)")
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(8000 + 4000 * (doc_id % 3) AS INT) AS rate,
         CAST(8 + doc_id % 5 AS BIGINT) AS n,
         repeat(md5(text), 2) AS hx
  FROM documents
)
SELECT doc_id, 1 AS n_channels, rate AS sample_rate,
  16 AS bits_per_sample, n AS n_frames,
  round(CAST(n * 1000.0 AS DOUBLE) / rate, 6) AS duration_ms,
  CAST(list_reduce(list_transform(range(0, CAST(n AS INT)),
       i -> {samp} * {samp}), (a,b) -> a+b) AS BIGINT) AS sum_sq,
  CAST(n * 4000 // rate AS BIGINT) AS resampled_n,
  CAST(list_reduce(list_transform(range(0, CAST(n * 4000 // rate AS INT)),
       j -> {rsamp}), (a,b) -> a+b) AS BIGINT) AS resampled_sum
FROM base
"""


QUERIES["a202_wav_decode"] = QuerySpec(a202_wav_decode, _a202_sql())


# ---------------------------------------------------------------------------
# a203 -- winnowing fingerprint matches (Schleimer-Wilkerson-Aiken / MOSS).
#
# The localized-near-dup detector the registry lacked: a06's min-shingle
# is ONE global fingerprint per doc (whole-document identity), MinHash
# estimates whole-document Jaccard -- winnowing keeps the per-window
# minimum k-gram hash, so PARTIAL overlap between long documents still
# shares fingerprints, with the guarantee that any common substring of
# >= w + k - 1 chars yields >= 1 shared fingerprint (pytest-pinned).
#
# Scale: one projection pass explodes char k-grams; the window min is
# partitioned per document (never data-sized); the cross-doc join is an
# inverted index with the standard ubiquity cap (fingerprints in more
# than df_cap docs are boilerplate and dropped BEFORE the self-join, the
# same whale bound as the LSH bucket cap), so per-fingerprint fan-out is
# <= df_cap^2 under any corpus.  Oracle note: DuckDB evaluates WHERE
# before window functions, so its full-window filter must wrap the
# window in a subquery or the trailing grams silently vanish from every
# frame (found during parity work; the Spark side filters after .over).
# ---------------------------------------------------------------------------

_WN_K, _WN_W, _WN_CAP, _WN_TOP = 5, 4, 20, 20


def a203_winnowing_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import winnow_fingerprints, winnow_match_pairs

    d = load_table(spark, sf_dir, "documents")
    fps = winnow_fingerprints(d, k=_WN_K, w=_WN_W)
    pairs = winnow_match_pairs(fps, df_cap=_WN_CAP)
    # top-N FIRST via orderBy+limit (TakeOrderedAndProject -- never a
    # global single-task sort of the pair table), THEN the rank window
    # over the <= _WN_TOP surviving rows (plan-visibly limit-bounded)
    top = pairs.orderBy(
        F.col("n_shared").desc(), F.col("a").asc(), F.col("b").asc()
    ).limit(_WN_TOP)
    wr = Window.orderBy(
        F.col("n_shared").desc(), F.col("a").asc(), F.col("b").asc()
    )
    return top.withColumn("rank", F.row_number().over(wr))


def _a203_sql() -> str:
    return f"""
WITH grams AS (
  SELECT doc_id, p AS pos, md5(substr(text, p, {_WN_K})) AS h,
         length(text) - {_WN_K} + 1 AS n
  FROM documents,
       LATERAL unnest(generate_series(1,
           greatest(length(text) - {_WN_K} + 1, 0))) AS t(p)
), winmin AS (
  SELECT doc_id, pos, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {_WN_W - 1} FOLLOWING)
           AS fp
  FROM grams
), fps AS (
  SELECT DISTINCT doc_id, fp FROM winmin WHERE pos <= n - {_WN_W} + 1
), capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fps
  ) WHERE df <= {_WN_CAP}
), pairs AS (
  SELECT a.doc_id AS a, b.doc_id AS b, count(*) AS n_shared
  FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a, b, n_shared,
       row_number() OVER (ORDER BY n_shared DESC, a ASC, b ASC) AS rank
FROM pairs QUALIFY rank <= {_WN_TOP}
"""


QUERIES["a203_winnowing_matches"] = QuerySpec(
    a203_winnowing_matches, _a203_sql()
)
