"""Round-11 queries: duplicated-span REMOVAL (the curation transform).

VERDICT r10 task #2: round 10 added the winnowing *detector* (a203 match
pairs); this round adds the operator a curation pipeline actually runs --
the cleaned corpus with duplicated spans excised (Lee et al. 2022-style
exact substring dedup, winnowing-localized), plus bytes-removed stats.

Removal is expressed as per-position gram coverage with NO Python:
winnowing windows whose min-gram fingerprint appears in >= 2 distinct
documents mark their character span ``[pos, pos + w + k - 2]`` for
removal (occurrences in the minimum doc_id holding the fingerprint are
kept -- one canonical copy survives); coverage is a difference-array
cumsum over span-edge events; the kept segments re-assemble via
``substring`` + ``array_join``.  DuckDB recomputes the identical
pipeline (string_agg ORDER BY over the same cumsum), so the full
cleaned text is exact-match checked, not just the stats.

Guarantee (pytest-pinned): a shared substring of >= w + k - 1 chars is
FULLY removed from every non-keeper document -- every fully-inside
window's min is shared, and their spans union to the whole substring.
Windows straddling the boundary may drag up to w + k - 2 neighboring
chars along (winnowing granularity; documented tradeoff).

Scale (100 TB): per-document gram explode + window min (one repartition
by doc); consecutive same-fp windows collapse to runs inside the same
doc partition (lag + running sum, no extra shuffle) before the
fingerprint join; duplicated-fp detection is a plain fp groupBy -- no
self-join, so no df_cap is needed and ubiquitous boilerplate is REMOVED
rather than whale-capped.  Coverage events are 2 per removal run (never
per-character); per-doc aggregate state is bounded by the kept-interval
list, at most the size of the document row itself.

Reference parity note: the reference ETL suite has no text curation ops
(src/main/scala/com/kanseiu/spark/handler -- warehouse jobs only); this
family extends the engine into the training-data domain per the brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_SD_K, _SD_W = 5, 4  # winnowing params, shared with a203


def a204_span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cleaned corpus after duplicated-span removal over ``documents``:
    every span covered by a cross-document winnowing fingerprint is
    excised except in its canonical (minimum doc_id) holder."""
    from ..operators.text import winnow_span_dedup

    d = load_table(spark, sf_dir, "documents")
    return winnow_span_dedup(
        d, k=_SD_K, w=_SD_W, keep="first", min_doc_freq=2
    )


def _a204_sql(
    k: int = _SD_K, w: int = _SD_W, src: str = "documents"
) -> str:
    """``k``/``w``/``src`` re-point the winnowing grain and the scanned
    relation (round 13: c68 runs the identical span-dedup pipeline at a
    coarser grain over its doc-deduped survivor CTE)."""
    span = w + k - 2
    return f"""
WITH grams AS (
  SELECT doc_id, p AS pos, md5(substr(text, p, {k})) AS h,
         length(text) - {k} + 1 AS n
  FROM {src},
       LATERAL unnest(generate_series(1,
           greatest(length(text) - {k} + 1, 0))) AS t(p)
), winmin AS (
  SELECT doc_id, pos, n,
         min(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
           AS fp
  FROM grams
), wins AS (
  -- full windows only (WHERE runs before window functions in DuckDB,
  -- so the filter wraps the windowed subquery -- same note as a203)
  SELECT doc_id, pos, fp FROM winmin WHERE pos <= n - {w} + 1
), dup AS (
  SELECT fp, min(doc_id) AS keeper
  FROM (SELECT DISTINCT doc_id, fp FROM wins)
  GROUP BY fp HAVING count(*) >= 2
), rem AS (
  SELECT w.doc_id, w.pos AS s, w.pos + {span} AS e
  FROM wins w JOIN dup USING (fp)
  WHERE w.doc_id <> dup.keeper
), ev AS (
  SELECT doc_id, s AS pos, 1 AS d FROM rem
  UNION ALL SELECT doc_id, e + 1 AS pos, -1 AS d FROM rem
  UNION ALL SELECT DISTINCT doc_id, 1 AS pos, 0 AS d FROM rem
), agg AS (
  SELECT doc_id, pos, sum(d) AS d FROM ev GROUP BY doc_id, pos
), cum AS (
  SELECT doc_id, pos,
         sum(d) OVER (PARTITION BY doc_id ORDER BY pos) AS cov,
         lead(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
  FROM agg
), cum2 AS (
  SELECT doc_id, pos, cov, nxt,
         coalesce(lag(cov) OVER (PARTITION BY doc_id ORDER BY pos), 0)
           AS prevcov
  FROM cum
), segs AS (
  SELECT c.doc_id,
         string_agg(
           CASE WHEN cov = 0
                THEN substr(d.text, pos,
                            coalesce(nxt - 1, length(d.text)) - pos + 1)
                ELSE '' END, '' ORDER BY pos) AS clean,
         sum(CASE WHEN cov > 0 AND prevcov = 0 THEN 1 ELSE 0 END)
           AS n_spans
  FROM cum2 c JOIN {src} d USING (doc_id)
  GROUP BY c.doc_id
)
SELECT d.doc_id,
       coalesce(s.clean, d.text) AS clean_text,
       CAST(length(d.text) AS BIGINT) AS orig_len,
       CAST(length(coalesce(s.clean, d.text)) AS BIGINT) AS kept_len,
       CAST(length(d.text) - length(coalesce(s.clean, d.text)) AS BIGINT)
         AS removed_chars,
       CAST(coalesce(s.n_spans, 0) AS BIGINT) AS n_spans
FROM {src} d LEFT JOIN segs s USING (doc_id)
"""


QUERIES["a204_span_dedup"] = QuerySpec(a204_span_dedup, _a204_sql())

# ---------------------------------------------------------------------------
# a205 -- DSIR importance scoring (Xie et al. 2023, "Data Selection via
# Importance Resampling"): score every document by the log-likelihood
# ratio of a hashed-token model of the TARGET domain (here: lang='en'
# documents) vs the raw corpus, the standard recipe for up-sampling
# domain-relevant pretraining data.
#
# Float parity: bucket counts are exact integers; each bucket's log
# ratio ln(((ct+1)*(Ns+B)) / ((cs+1)*(Nt+B))) is computed from identical
# integer-derived doubles in both engines and pre-rounded to 9 dp ->
# DECIMAL(12,9) (the a110 entropy precedent for cross-engine ln); the
# per-document score is then an EXACT decimal fold sum(tf * lr) with one
# final cast->round(6) -- no IEEE accumulation anywhere.
#
# Scale (100 TB): one token explode; bucket counts are a 64-row groupBy
# (map-side combined); the 64-row log-ratio frame is PROVABLY bounded by
# the hash modulus, so the forced broadcast is safe (the documented
# exception to the no-forced-broadcast rule); per-doc work is a
# (doc, bucket) pre-aggregation (<= 64 rows per doc) + one broadcast
# join + one doc groupBy.  No self-joins, no windows.
# ---------------------------------------------------------------------------

_DSIR_B = 64  # hashed-feature buckets (16-bit md5 prefix % 64)
_DSIR_TARGET_LANG = "en"
_LR_DEC = "decimal(12,9)"  # |ln ratio| < 1e3 by construction
_TF_DEC = "decimal(9,0)"  # per-(doc,bucket) term count


def a205_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("int"),
        F.lit(_DSIR_B),
    )
    tb = tok.select("doc_id", "lang", bucket.alias("b"))
    # ONE explode pass (review fix): the (doc, lang, bucket) term table is
    # the only consumer of the token explode and every other frame derives
    # from it -- cnts by re-grouping on the bucket, tot by summing the
    # 64-row cnts (bit-identical integers to a direct corpus aggregate).
    # The pin keeps the explode from re-running for the cnts and score
    # branches; dtf is (doc, bucket)-sized, <= 64 rows per doc.
    dtf = (
        tb.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    is_t = F.when(F.col("lang") == _DSIR_TARGET_LANG, F.col("tf")).otherwise(
        F.lit(0)
    )
    cnts = dtf.groupBy("b").agg(
        F.sum(is_t).alias("ct"), F.sum("tf").alias("cs")
    )
    tot = cnts.agg(F.sum("ct").alias("nt"), F.sum("cs").alias("ns"))
    num = (F.col("ct") + 1).cast("double") * (
        F.col("ns") + _DSIR_B
    ).cast("double")
    den = (F.col("cs") + 1).cast("double") * (
        F.col("nt") + _DSIR_B
    ).cast("double")
    # <= 64 rows by the hash modulus: provably bounded, broadcast-safe
    lr = F.broadcast(
        cnts.crossJoin(F.broadcast(tot)).select(
            "b", F.round(F.log(num / den), 9).cast(_LR_DEC).alias("lr")
        )
    )
    score = (
        dtf.join(lr, "b")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").cast("long").alias("n_toks"),
            F.round(
                F.sum(F.col("tf").cast(_TF_DEC) * F.col("lr")).cast("double"),
                6,
            ).alias("dsir_score"),
        )
    )
    return d.select("doc_id", "lang").join(score, "doc_id").select(
        "doc_id",
        "lang",
        "n_toks",
        "dsir_score",
        (F.col("dsir_score") > 0).alias("selected"),
    )


def _a205_sql() -> str:
    b, lang = _DSIR_B, _DSIR_TARGET_LANG
    return f"""
WITH tok AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
), tb AS (
  SELECT doc_id, lang,
         CAST(('0x' || substr(md5(tok), 1, 4)) AS INTEGER) % {b} AS b
  FROM tok
), cnts AS (
  SELECT b, sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS ct,
         count(*) AS cs
  FROM tb GROUP BY b
), tot AS (
  SELECT sum(CASE WHEN lang = '{lang}' THEN 1 ELSE 0 END) AS nt,
         count(*) AS ns
  FROM tb
), lr AS (
  SELECT b,
         CAST(round(ln((CAST(ct + 1 AS DOUBLE) * CAST(ns + {b} AS DOUBLE))
                     / (CAST(cs + 1 AS DOUBLE) * CAST(nt + {b} AS DOUBLE))),
                    9) AS DECIMAL(12,9)) AS lr
  FROM cnts, tot
), dtf AS (
  SELECT doc_id, b, count(*) AS tf FROM tb GROUP BY doc_id, b
), score AS (
  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS n_toks,
         round(CAST(sum(CAST(tf AS DECIMAL(9,0)) * lr) AS DOUBLE), 6)
           AS dsir_score
  FROM dtf JOIN lr USING (b) GROUP BY doc_id
)
SELECT d.doc_id, d.lang, s.n_toks, s.dsir_score,
       s.dsir_score > 0 AS selected
FROM documents d JOIN score s USING (doc_id)
"""


QUERIES["a205_dsir_importance"] = QuerySpec(a205_dsir_importance, _a205_sql())


# ---------------------------------------------------------------------------
# a206 -- near-dup cluster PRUNE: the corpus-level dedup transform (keep
# one canonical document per MinHash-LSH connected component, drop the
# rest) -- the doc-level sibling of a204's span-level removal, and the
# operation a curation pipeline runs right before training.  a25 emits
# the cluster map; this emits the per-document keep/drop DECISION with
# cluster sizes, so the downstream filter `WHERE is_kept` yields the
# pruned corpus and `1 - sum(is_kept)/count(*)` is the dedup rate.
# Scale: reuses a25's banded-LSH pair generation (whale-capped buckets,
# never all-pairs) and O(log n) star-contraction components; the added
# work is one window over the component map partitioned by rep_id.
# ---------------------------------------------------------------------------


def a206_neardup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.dedup import dedup_clusters, minhash_dedup_pairs
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE, _MH_THRESHOLD

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_dedup_pairs(
        d,
        shingle_n=_MH_SHINGLE,
        num_hashes=_MH_N,
        bands=_MH_BANDS,
        threshold=_MH_THRESHOLD,
    )
    clusters = dedup_clusters(d, pairs)
    w = Window.partitionBy("rep_id")
    return clusters.select(
        "doc_id",
        "rep_id",
        F.count(F.lit(1)).over(w).cast("long").alias("cluster_size"),
        (F.col("doc_id") == F.col("rep_id")).alias("is_kept"),
    )


def _a206_sql() -> str:
    from .analytics import _a25_sql

    return f"""
SELECT doc_id, rep_id,
       CAST(count(*) OVER (PARTITION BY rep_id) AS BIGINT) AS cluster_size,
       doc_id = rep_id AS is_kept
FROM ({_a25_sql()})
"""


QUERIES["a206_neardup_prune"] = QuerySpec(a206_neardup_prune, _a206_sql())

# ---------------------------------------------------------------------------
# a207 -- SemDeDup (Abbas et al. 2023): semantic deduplication over the
# embedding corpus.  Assign every vector to its nearest pinned centroid
# (the a199 quantizer contract: 8 data-derived seed vectors, so both
# engines fold identical doubles), connect within-cluster cosine
# near-duplicates transitively, keep ONE representative per group (the
# member closest to its centroid, ties -> min vec_id).  The per-vector
# keep/drop decision is the training-set filter the paper applies.
#
# Scale: the within-cluster pair join is the SemDeDup contract; the
# quantizer granularity bounds it (production scales n_clusters with
# the corpus -- paper regime k ~ sqrt(n) -- via the trained a16 path;
# the operator takes centroids as a parameter).  Closure is the same
# O(log n) star contraction as text dedup; the oracle mirrors it with
# a25's recursive CTE.
# ---------------------------------------------------------------------------

_SD_COS = 0.3  # near-dup threshold on the 6dp-rounded cosine (a21's tau)


def a207_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semdedup
    from .round10 import _seed_vectors

    e = load_table(spark, sf_dir, "embeddings")
    # assign='matmul' (r17, guide §4.2): the within-cluster pair search
    # runs as per-block BLAS instead of the interpreted per-pair dot
    # fold self-join; the assignment fold is the dimension-at-a-time
    # bit-identical form (see _assign_matmul) -- oracle re-verified
    # exact at 3 SFs
    return semdedup(
        e, _seed_vectors(spark, sf_dir), threshold=_SD_COS,
        assign="matmul",
    )


def _a207_sql() -> str:
    from ..operators.similarity import DOT_SQL as dot

    from .round10 import _SEED_HI, _SEED_LO, _DIM, _l2_seg_sql

    l2 = _l2_seg_sql("e.embedding", "s.cv", "0", _DIM)
    ab = dot.format(a="x.embedding", b="y.embedding")
    aa = dot.format(a="x.embedding", b="x.embedding")
    bb = dot.format(a="y.embedding", b="y.embedding")
    return f"""
WITH RECURSIVE seeds AS (
  SELECT CAST(vec_id - {_SEED_LO - 1} AS INT) AS cid, embedding AS cv
  FROM embeddings WHERE vec_id BETWEEN {_SEED_LO} AND {_SEED_HI}
), assign AS MATERIALIZED (
  SELECT vec_id, cid AS cluster, d AS d2c FROM (
    SELECT e.vec_id, s.cid, {l2} AS d,
           row_number() OVER (
             PARTITION BY e.vec_id ORDER BY {l2} ASC, s.cid ASC) AS rn
    FROM embeddings e CROSS JOIN seeds s
  ) WHERE rn = 1
), v AS MATERIALIZED (
  SELECT a.vec_id, a.cluster, a.d2c, e.embedding
  FROM assign a JOIN embeddings e USING (vec_id)
), pairs AS MATERIALIZED (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM v x JOIN v y ON x.cluster = y.cluster AND x.vec_id < y.vec_id
  WHERE round({ab} / (sqrt({aa}) * sqrt({bb})), 6) >= {_SD_COS}
), sym AS (
  SELECT a AS u, b AS w FROM pairs
  UNION
  SELECT b AS u, a AS w FROM pairs
), reach(node, r) AS (
  SELECT vec_id, vec_id FROM v
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.w = reach.node
), comp AS (
  SELECT node AS vec_id, min(r) AS group_id FROM reach GROUP BY node
)
SELECT v.vec_id, CAST(v.cluster AS INT) AS cluster, c.group_id,
       round(v.d2c, 6) AS d2c,
       row_number() OVER (
         PARTITION BY c.group_id ORDER BY v.d2c ASC, v.vec_id ASC) = 1
         AS is_kept
FROM v JOIN comp c USING (vec_id)
"""


QUERIES["a207_semdedup"] = QuerySpec(a207_semdedup, _a207_sql())

# ---------------------------------------------------------------------------
# a208 -- PORTABLE deterministic HyperLogLog (Flajolet et al. 2007, the
# Google HLL++ small-range correction): per event_type, a 256-register
# HLL over user_id whose registers derive from md5 -- so the DuckDB
# oracle recomputes the IDENTICAL estimate, upgrading the engine's HLL
# story from rows-only (a27/c28 use Spark-internal sketches) to full
# exact-match checked.
#
# Register math is integer-exact end to end: register = first md5 byte,
# rho = 49 - bitlength(next 48 hash bits) (minimal bin() string in both
# engines), and the harmonic sum folds as sum(2^(49-rho)) in BIGINT
# (max 256 * 2^48 < 2^57) -- the float division and the alpha*m^2*2^49
# literal are single IEEE ops on identical operands.  The small-range
# branch (V > 0 and E <= 2.5m -> linear counting m*ln(m/V)) rounds its
# ln to 6dp in the output only.
#
# Scale: ONE aggregation pass -- per (event_type, register) max-rho
# (map-side combined, <= 256 rows per group), then a per-group fold.
# This is the mergeable-partials shape: the register table IS the
# shippable sketch; OR-merging registers across shards = max(rho).
# ---------------------------------------------------------------------------

from ..operators.sketches import HLL_ALPHA_C as _HLL_ALPHA_C  # noqa: E402
from ..operators.sketches import HLL_M as _HLL_M  # noqa: E402


def a208_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketches import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    regs = hll_registers(ev, ["event_type"], "user_id")
    est = hll_estimate(regs, ["event_type"])
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    e = F.col("hll_estimate")
    return est.join(exact, "event_type").select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_exact"),
        F.round(e, 6).alias("hll_estimate"),
        F.round(F.abs(e - F.col("n_exact")) / F.col("n_exact"), 6).alias(
            "rel_err"
        ),
    )


def _a208_sql() -> str:
    return f"""
WITH hashed AS (
  SELECT event_type,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 2))
              AS INTEGER) AS reg,
         CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 3, 12))
              AS BIGINT) AS x,
         user_id
  FROM events
  WHERE user_id IS NOT NULL  -- mirrors hll_registers' NULL drop
), rhod AS (
  SELECT event_type, reg, user_id,
         CASE WHEN x = 0 THEN 49 ELSE 49 - length(bin(x)) END AS rho
  FROM hashed
), regs AS (
  SELECT event_type, reg, max(rho) AS r
  FROM rhod GROUP BY event_type, reg
), per AS (
  SELECT event_type, count(*) AS filled,
         sum(CAST(1 AS BIGINT) << (49 - r)) AS s_filled
  FROM regs GROUP BY event_type
), exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events
  GROUP BY event_type
), est AS (
  SELECT p.event_type, x.n_exact,
         CASE WHEN ({_HLL_M} - p.filled) > 0
                   AND ({_HLL_ALPHA_C!r} /
                        CAST(p.s_filled + ({_HLL_M} - p.filled)
                             * (CAST(1 AS BIGINT) << 49) AS DOUBLE))
                       <= {2.5 * _HLL_M}
              THEN CAST({_HLL_M} AS DOUBLE)
                   * ln(CAST({_HLL_M} AS DOUBLE)
                        / CAST({_HLL_M} - p.filled AS DOUBLE))
              ELSE {_HLL_ALPHA_C!r} /
                   CAST(p.s_filled + ({_HLL_M} - p.filled)
                        * (CAST(1 AS BIGINT) << 49) AS DOUBLE)
         END AS e,
         x.n_exact AS nx
  FROM per p JOIN exact x USING (event_type)
)
SELECT event_type, CAST(n_exact AS BIGINT) AS n_exact,
       round(e, 6) AS hll_estimate,
       round(abs(e - nx) / nx, 6) AS rel_err
FROM est
"""


QUERIES["a208_hll_distinct"] = QuerySpec(a208_hll_distinct, _a208_sql())
