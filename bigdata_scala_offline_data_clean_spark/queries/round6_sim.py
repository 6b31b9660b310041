"""Round-6 queries, dedup / similarity / embedding / graph family.

Split out of ``round6.py`` in round 10 (VERDICT r9 task #7).  Families
here: a114 canonical selection, a115 embedding centroid drift, a119
kNN label vote, a123 Jaccard threshold curve, a126 LSH candidate
precision/recall, a127 dedup impact report, a112 theta-sketch
intersection overlap, a132 fixed-seed k-means (FULL oracle), a133
multi-hop BFS reachability, a138 near-dup cluster-size distribution.

Float rule: see ``round6_stats`` docstring (shared repo convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_DEC = "decimal(28,9)"

# ---------------------------------------------------------------------------
# a114 -- canonical selection: keep the best-quality doc per near-dup cluster
# ---------------------------------------------------------------------------

_A114_N, _A114_THRESHOLD = 3, 0.2


def a114_canonical_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_clusters, ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=_A114_N, threshold=_A114_THRESHOLD)
    clusters = dedup_clusters(d, pairs)
    # survivorship by quality (longest doc), NOT first-id -- the struct-max
    # is a mergeable agg, so canonical selection adds one groupBy on the
    # cluster id, no window over the corpus
    scored = clusters.join(d.select("doc_id", "n_chars"), "doc_id")
    best = scored.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.max(F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("nid"))).alias(
            "__b"
        ),
    )
    return (
        best.where(F.col("cluster_size") >= 2)
        .select(
            "rep_id",
            "cluster_size",
            (-F.col("__b.nid")).cast("bigint").alias("keep_doc_id"),
            F.col("__b.n_chars").alias("keep_n_chars"),
            (F.col("cluster_size") - 1).alias("n_dropped"),
        )
    )


def _a114_sql() -> str:
    from .analytics import _a08_sql

    a08 = _a08_sql().strip().rstrip("\n")
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
{a08}
), sym AS (
  SELECT a AS u, b AS v FROM pairs UNION SELECT b, a FROM pairs
), reach(node, r) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node
), clusters AS (
  SELECT node AS doc_id, min(r) AS rep_id FROM reach GROUP BY node
), scored AS (
  SELECT c.rep_id, c.doc_id, d.n_chars,
         row_number() OVER (PARTITION BY c.rep_id
                            ORDER BY d.n_chars DESC, c.doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY c.rep_id) AS cluster_size
  FROM clusters c JOIN documents d USING (doc_id)
)
SELECT rep_id, cluster_size, CAST(doc_id AS BIGINT) AS keep_doc_id,
       n_chars AS keep_n_chars, cluster_size - 1 AS n_dropped
FROM scored WHERE rn = 1 AND cluster_size >= 2
"""


QUERIES["a114_canonical_selection"] = QuerySpec(
    a114_canonical_selection, _a114_sql()
)


# ---------------------------------------------------------------------------
# a115 -- embedding centroid drift: per-label cosine between corpus halves
# ---------------------------------------------------------------------------

_A115_DRIFT = 0.995


def a115_centroid_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode("embedding").alias("dim", "val"),
    )
    # centroid = decimal-exact per-dim sums / count: the algebraic shape
    # (sum, n) that map-side combines -- at 100 TB each (label, half, dim)
    # cell reduces before the exchange, so the shuffle is O(labels*dims)
    sums = ex.groupBy("label", "half", "dim").agg(
        F.sum(F.round(F.col("val").cast("double"), 9).cast(_DEC)).alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    cent = sums.select(
        "label",
        "half",
        "dim",
        (F.col("s").cast("double") / F.col("n")).alias("c"),
        "n",
    )
    c0 = cent.where(F.col("half") == 0).select(
        "label", "dim", F.col("c").alias("c0"), F.col("n").alias("n0")
    )
    c1 = cent.where(F.col("half") == 1).select(
        "label", "dim", F.col("c").alias("c1"), F.col("n").alias("n1")
    )
    j = c0.join(c1, ["label", "dim"])
    agg = j.groupBy("label").agg(
        F.max("n0").alias("n_half0"),
        F.max("n1").alias("n_half1"),
        F.sum(F.round(F.col("c0") * F.col("c1"), 9).cast(_DEC))
        .cast("double")
        .alias("dot"),
        F.sum(F.round(F.col("c0") * F.col("c0"), 9).cast(_DEC))
        .cast("double")
        .alias("s0"),
        F.sum(F.round(F.col("c1") * F.col("c1"), 9).cast(_DEC))
        .cast("double")
        .alias("s1"),
    )
    cos = F.round(F.col("dot") / (F.sqrt("s0") * F.sqrt("s1")), 6)
    return agg.select(
        "label",
        "n_half0",
        "n_half1",
        cos.alias("centroid_cosine"),
        (cos < _A115_DRIFT).alias("drifted"),
    )


A115_SQL = f"""
WITH ex AS (
  SELECT label, vec_id % 2 AS half, i - 1 AS dim,
         CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
), sums AS (
  SELECT label, half, dim,
         sum(CAST(round(val, 9) AS DECIMAL(28,9))) AS s, count(*) AS n
  FROM ex GROUP BY 1, 2, 3
), cent AS (
  SELECT label, half, dim, CAST(s AS DOUBLE) / n AS c, n FROM sums
), j AS (
  SELECT a.label, a.dim, a.c AS c0, b.c AS c1, a.n AS n0, b.n AS n1
  FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 0 AND b.half = 1
), agg AS (
  SELECT label, max(n0) AS n_half0, max(n1) AS n_half1,
         CAST(sum(CAST(round(c0 * c1, 9) AS DECIMAL(28,9))) AS DOUBLE) AS dot,
         CAST(sum(CAST(round(c0 * c0, 9) AS DECIMAL(28,9))) AS DOUBLE) AS s0,
         CAST(sum(CAST(round(c1 * c1, 9) AS DECIMAL(28,9))) AS DOUBLE) AS s1
  FROM j GROUP BY 1
)
SELECT label, n_half0, n_half1,
       round(dot / (sqrt(s0) * sqrt(s1)), 6) AS centroid_cosine,
       round(dot / (sqrt(s0) * sqrt(s1)), 6) < {_A115_DRIFT} AS drifted
FROM agg
"""

QUERIES["a115_centroid_shift"] = QuerySpec(a115_centroid_shift, A115_SQL)


# ---------------------------------------------------------------------------
# a119 -- kNN label classification (leave-one-out over the embedding corpus)
# ---------------------------------------------------------------------------

_A119_K, _A119_NQ = 5, 50


def a119_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _A119_NQ)
    knn = cosine_topk(e, q, k=_A119_K)
    # vote = one groupBy over the k*nq neighbor rows; label lookup joins
    # are broadcasts of the (tiny) query frame / corpus labels
    labeled = knn.join(
        e.select(F.col("vec_id").alias("n_id"), F.col("label").alias("n_label")),
        "n_id",
    )
    votes = labeled.groupBy("q_id", "n_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("votes").desc(), F.col("n_label").asc()
    )
    pred = votes.withColumn("rn", F.row_number().over(w)).where(
        F.col("rn") == 1
    )
    truth = e.where(F.col("vec_id") < _A119_NQ).select(
        F.col("vec_id").alias("q_id"), F.col("label").alias("true_label")
    )
    per_q = pred.join(truth, "q_id").select(
        "q_id",
        "true_label",
        F.col("n_label").alias("pred_label"),
        "votes",
        (F.col("n_label") == F.col("true_label")).alias("correct"),
    )
    acc = per_q.agg(
        F.round(
            F.sum(F.when(F.col("correct"), 1).otherwise(0)) / F.count(F.lit(1)), 4
        ).alias("accuracy")
    )
    return per_q.crossJoin(F.broadcast(acc))


def _a119_sql() -> str:
    from ..operators.similarity import DOT_SQL as dot

    qq, cc = dot.format(a="qv", b="qv"), dot.format(a="cv", b="cv")
    qc = dot.format(a="qv", b="cv")
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS true_label, embedding AS qv
  FROM embeddings WHERE vec_id < {_A119_NQ}
), c AS (
  SELECT vec_id AS n_id, label AS n_label, embedding AS cv FROM embeddings
), scored AS (
  SELECT q_id, n_id, n_label,
         round({qc} / (sqrt({qq}) * sqrt({cc})), 6) AS cosine
  FROM c, q WHERE q_id <> n_id
), ranked AS (
  SELECT q_id, n_label,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, n_id ASC) AS rank
  FROM scored
), votes AS (
  SELECT q_id, n_label, count(*) AS votes
  FROM ranked WHERE rank <= {_A119_K} GROUP BY 1, 2
), pred AS (
  SELECT q_id, n_label, votes,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY votes DESC, n_label ASC) AS rn
  FROM votes
), per_q AS (
  SELECT p.q_id, q.true_label, p.n_label AS pred_label, p.votes,
         p.n_label = q.true_label AS correct
  FROM pred p JOIN q USING (q_id) WHERE p.rn = 1
), acc AS (
  SELECT round(sum(CASE WHEN correct THEN 1 ELSE 0 END) / count(*), 4)
           AS accuracy
  FROM per_q
)
SELECT q_id, true_label, pred_label, votes, correct, accuracy
FROM per_q CROSS JOIN acc
"""


QUERIES["a119_knn_classify"] = QuerySpec(a119_knn_classify, _a119_sql())


# ---------------------------------------------------------------------------
# a123 -- Jaccard threshold sensitivity curve (dedup-tuning diagnostic)
# ---------------------------------------------------------------------------

_A123_N, _A123_FLOOR = 3, 0.1


def a123_jaccard_threshold_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import ngram_jaccard_pairs

    d = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(d, n=_A123_N, threshold=_A123_FLOOR)
    # identical double -> identical floor in both engines (the jaccard is
    # one division of exact ints); curve frame is <=10 rows, so the
    # cumulative window is the documented small-frame exception
    bucketed = (
        pairs.groupBy(
            F.floor(F.col("jaccard") * 10).cast("int").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        # provable no-op (jaccard in [0,1] -> <=11 buckets); makes the
        # bound visible to the plan audit's unpartitioned-window rule
        .limit(11)
    )
    w = Window.orderBy(F.col("bucket").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return bucketed.select(
        (F.col("bucket") / 10.0).alias("threshold_lo"),
        "n_pairs",
        F.sum("n_pairs").over(w).alias("n_pairs_at_or_above"),
    )


def _a123_sql() -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - {_A123_N - 1}, 1)),
                   i -> array_to_string(t[i:i+{_A123_N - 1}], ' ')))) AS gram
  FROM toks
), cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM grams l JOIN grams r ON l.gram = r.gram AND l.doc_id < r.doc_id
), counts AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT c.a, c.b, count(*) AS n_inter
  FROM cands c
  JOIN grams ga ON ga.doc_id = c.a
  JOIN grams gb ON gb.doc_id = c.b AND gb.gram = ga.gram
  GROUP BY c.a, c.b
), pairs AS (
  SELECT CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) AS jaccard
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.a
  JOIN counts cb ON cb.doc_id = i.b
), bucketed AS (
  SELECT CAST(floor(jaccard * 10) AS INTEGER) AS bucket, count(*) AS n_pairs
  FROM pairs WHERE jaccard >= {_A123_FLOOR} GROUP BY 1
)
SELECT bucket / 10.0 AS threshold_lo, n_pairs,
       sum(n_pairs) OVER (ORDER BY bucket DESC
                          ROWS UNBOUNDED PRECEDING) AS n_pairs_at_or_above
FROM bucketed
"""


QUERIES["a123_jaccard_threshold_curve"] = QuerySpec(
    a123_jaccard_threshold_curve, _a123_sql()
)


# ---------------------------------------------------------------------------
# a126 -- MinHash-LSH candidate evaluation: precision/recall vs exact truth
# ---------------------------------------------------------------------------


def a126_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import (
        candidate_pairs,
        lsh_bands,
        minhash_signatures,
        shingles,
    )
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE, _MH_THRESHOLD

    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", _MH_SHINGLE).persist()
    cands = candidate_pairs(
        lsh_bands(minhash_signatures(sh, "doc_id", _MH_N), "doc_id", _MH_N,
                  _MH_BANDS),
        "doc_id",
    )
    # exact truth: single-pass shared-gram jaccard over the SAME shingle
    # frame (the all-pairs-above-threshold ground set LSH approximates)
    from ..operators.dedup import jaccard_pairs_from_shingles

    truth = (
        jaccard_pairs_from_shingles(sh, "doc_id")
        .where(F.col("jaccard") >= _MH_THRESHOLD)
        .select("a", "b")
    )
    tp = cands.join(truth, ["a", "b"], "inner").count()
    n_cands, n_truth = cands.count(), truth.count()
    sh.unpersist()
    prec = tp / n_cands if n_cands else 0.0
    rec = tp / n_truth if n_truth else 0.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return spark.createDataFrame(
        [(n_cands, n_truth, tp, round(prec, 6), round(rec, 6), round(f1, 6))],
        "n_cands bigint, n_truth bigint, tp bigint, "
        "precision double, recall double, f1 double",
    )


def _a126_sql() -> str:
    from ..operators.dedup import _MH_MOD, _mh_consts
    from .analytics import _MH_BANDS, _MH_N, _MH_SHINGLE, _MH_THRESHOLD

    rows = _MH_N // _MH_BANDS
    base = "CAST(('0x' || substr(md5(gram), 1, 8)) AS BIGINT)"
    mins = ",\n         ".join(
        f"min(({a} * {base} + {b}) % {_MH_MOD}) AS mh_{i}"
        for i, (a, b) in ((i, _mh_consts(i)) for i in range(_MH_N))
    )
    band_selects = "\n  UNION ALL\n".join(
        f"  SELECT doc_id, {b} AS band_id, md5(concat_ws('|', "
        + ", ".join(f"mh_{b * rows + i}" for i in range(rows))
        + ")) AS band_sig FROM sigs"
        for b in range(_MH_BANDS)
    )
    return f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - {_MH_SHINGLE - 1}, 1)),
                   i -> array_to_string(t[i:i+{_MH_SHINGLE - 1}], ' ')))) AS gram
  FROM toks
), sigs AS (
  SELECT doc_id,
         {mins}
  FROM grams GROUP BY doc_id
), bands AS (
{band_selects}
), cands AS (
  SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
  FROM bands l JOIN bands r
    ON l.band_id = r.band_id AND l.band_sig = r.band_sig AND l.doc_id < r.doc_id
), counts AS (
  SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id
), inter AS (
  SELECT ga.doc_id AS a, gb.doc_id AS b, count(*) AS n_inter
  FROM grams ga JOIN grams gb
    ON ga.gram = gb.gram AND ga.doc_id < gb.doc_id
  GROUP BY 1, 2
), truth AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN counts ca ON ca.doc_id = i.a
  JOIN counts cb ON cb.doc_id = i.b
  WHERE CAST(n_inter AS DOUBLE) / (ca.n + cb.n - n_inter) >= {_MH_THRESHOLD}
), m AS (
  SELECT (SELECT count(*) FROM cands) AS n_cands,
         (SELECT count(*) FROM truth) AS n_truth,
         (SELECT count(*) FROM cands JOIN truth USING (a, b)) AS tp
)
SELECT n_cands, n_truth, tp,
       round(CASE WHEN n_cands > 0 THEN CAST(tp AS DOUBLE) / n_cands
                  ELSE 0.0 END, 6) AS precision,
       round(CASE WHEN n_truth > 0 THEN CAST(tp AS DOUBLE) / n_truth
                  ELSE 0.0 END, 6) AS recall,
       round(CASE WHEN tp > 0 THEN
           2.0 * (CAST(tp AS DOUBLE) / n_cands) * (CAST(tp AS DOUBLE) / n_truth)
           / (CAST(tp AS DOUBLE) / n_cands + CAST(tp AS DOUBLE) / n_truth)
           ELSE 0.0 END, 6) AS f1
FROM m
"""


QUERIES["a126_lsh_recall_eval"] = QuerySpec(a126_lsh_recall_eval, _a126_sql())


# ---------------------------------------------------------------------------
# a127 -- dedup impact report: docs/chars kept after exact + near dedup
# ---------------------------------------------------------------------------


def a127_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    scored = clusters.join(d.select("doc_id", "text", "n_chars"), "doc_id")
    return scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_exact_unique"),
        F.countDistinct("rep_id").alias("n_neardup_clusters"),
        F.sum("n_chars").alias("chars_before"),
        F.sum(
            F.when(F.col("rep_id") == F.col("doc_id"), F.col("n_chars")).otherwise(0)
        ).alias("chars_kept"),
        F.round(
            F.sum(
                F.when(F.col("rep_id") == F.col("doc_id"), F.col("n_chars")).otherwise(
                    0
                )
            )
            / F.sum("n_chars"),
            6,
        ).alias("kept_ratio"),
    )


def _a127_sql() -> str:
    from .analytics import _a25_sql

    a25 = _a25_sql().strip().rstrip("\n")
    # the full a25 statement (itself WITH RECURSIVE ... SELECT) nests
    # verbatim as this CTE's body
    return f"""
WITH clusters AS MATERIALIZED (
{a25}
)
SELECT count(*) AS n_docs,
       count(DISTINCT d.text) AS n_exact_unique,
       count(DISTINCT c.rep_id) AS n_neardup_clusters,
       sum(d.n_chars) AS chars_before,
       sum(CASE WHEN c.rep_id = c.doc_id THEN d.n_chars ELSE 0 END)
         AS chars_kept,
       round(sum(CASE WHEN c.rep_id = c.doc_id THEN d.n_chars ELSE 0 END)
             / sum(d.n_chars), 6) AS kept_ratio
FROM clusters c JOIN documents d USING (doc_id)
"""


QUERIES["a127_dedup_impact"] = QuerySpec(a127_dedup_impact, _a127_sql())


# ---------------------------------------------------------------------------
# a112 -- sketch set algebra: theta-intersection audience overlap, exact
# companion + self-verifying error bound (the a27 trick: the estimate
# itself is non-portable, so the driver-checked columns are the exact
# values plus booleans that go red if the sketch ever drifts)
# ---------------------------------------------------------------------------

_A112_REL = 0.05  # theta intersections are exact-mode at testdata scale


def a112_sketch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    tu = e.select("event_type", "user_id").distinct()
    # HLL only unions; theta sketches close the set algebra -- the
    # intersection estimate comes from the per-type sketches alone (KB
    # each), while the exact companion re-keys the (type, user) frame once
    sk = tu.groupBy("event_type").agg(
        F.theta_sketch_agg(F.col("user_id").cast("string")).alias("sk"),
        F.count(F.lit(1)).alias("n_users"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("ska"),
        F.col("n_users").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("skb"),
        F.col("n_users").alias("n_b"),
    )
    est = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            F.theta_sketch_estimate(
                F.theta_intersection("ska", "skb")
            ).alias("__est"),
        )
    )
    ua = tu.select(F.col("event_type").alias("type_a"), "user_id")
    ub = tu.select(F.col("event_type").alias("type_b"), "user_id")
    exact = (
        ua.join(ub, "user_id")
        .where(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    j = est.join(exact, ["type_a", "type_b"])
    tol = F.greatest(F.lit(2.0), F.col("exact_overlap") * _A112_REL)
    return j.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "exact_overlap",
        (F.abs(F.col("__est") - F.col("exact_overlap")) <= tol).alias("est_ok"),
    )


A112_SQL = """
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), totals AS (
  SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1
), exact AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS exact_overlap
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b, ta.n_users AS n_a, tb.n_users AS n_b,
       exact_overlap, TRUE AS est_ok
FROM exact
JOIN totals ta ON ta.event_type = type_a
JOIN totals tb ON tb.event_type = type_b
"""

QUERIES["a112_sketch_overlap"] = QuerySpec(a112_sketch_overlap, A112_SQL)


# ---------------------------------------------------------------------------
# a132 -- fixed-seed k-means (2 unrolled iterations, FULL oracle): unlike
# a16's data-trained IVF (rows-only by design), seeding with the first k
# vectors and keeping distances as exact decimals makes every assignment
# bit-identical across engines -- the iterative-ML primitive with a real
# correctness gate
# ---------------------------------------------------------------------------

_A132_K = 4


def a132_kmeans_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    vecs = e.select(
        "vec_id", F.posexplode("embedding").alias("dim", "__xf")
    ).select("vec_id", "dim", F.col("__xf").cast("double").alias("x"))
    # the per-dim frame feeds 5 consumers (seed centroids, 2 assignment
    # rounds, the update); persist so the explode runs once (lazy-builder
    # persist policy, SCALE.md Cache lifecycle)
    vecs = vecs.persist()
    cents0 = vecs.where(F.col("vec_id") < _A132_K).select(
        F.col("vec_id").alias("cluster"), "dim", F.col("x").alias("c")
    )

    def assign(cents: DataFrame) -> DataFrame:
        # centroids are k x dims rows (KB) -> broadcast; distances are
        # decimal-exact sums of rounded squared diffs, so the argmin
        # comparison (and its cluster-asc tie-break) is engine-portable
        d = vecs.join(F.broadcast(cents), "dim")
        dist = d.groupBy("vec_id", "cluster").agg(
            F.sum(
                F.round((F.col("x") - F.col("c")) * (F.col("x") - F.col("c")), 9)
                .cast(_DEC)
            ).alias("dist")
        )
        w = Window.partitionBy("vec_id").orderBy(
            F.col("dist").asc(), F.col("cluster").asc()
        )
        return (
            dist.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .select("vec_id", "cluster")
        )

    a1 = assign(cents0)
    # update = decimal-exact per-dim means (algebraic: map-side combinable)
    cents1 = (
        vecs.join(a1, "vec_id")
        .groupBy("cluster", "dim")
        .agg(
            F.round(
                F.sum(F.col("x").cast(_DEC)).cast("double") / F.count(F.lit(1)), 9
            ).alias("c")
        )
    )
    a2 = assign(cents1)
    sizes = a2.groupBy("cluster").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        a2.join(a1.withColumnRenamed("cluster", "__c1"), "vec_id")
        .join(F.broadcast(sizes), "cluster")
        .select(
            "vec_id",
            "cluster",
            (F.col("__c1") != F.col("cluster")).alias("moved"),
            "cluster_size",
        )
    )


A132_SQL = f"""
WITH vecs AS (
  SELECT vec_id, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
), cents0 AS (
  SELECT vec_id AS cluster, dim, x AS c FROM vecs WHERE vec_id < {_A132_K}
), d1 AS (
  SELECT v.vec_id, c.cluster,
         sum(CAST(round((v.x - c.c) * (v.x - c.c), 9) AS DECIMAL(28,9)))
           AS dist
  FROM vecs v JOIN cents0 c USING (dim) GROUP BY 1, 2
), a1 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d1
  ) WHERE rn = 1
), cents1 AS (
  SELECT a1.cluster, v.dim,
         round(CAST(sum(CAST(v.x AS DECIMAL(28,9))) AS DOUBLE) / count(*), 9)
           AS c
  FROM vecs v JOIN a1 USING (vec_id) GROUP BY 1, 2
), d2 AS (
  SELECT v.vec_id, c.cluster,
         sum(CAST(round((v.x - c.c) * (v.x - c.c), 9) AS DECIMAL(28,9)))
           AS dist
  FROM vecs v JOIN cents1 c USING (dim) GROUP BY 1, 2
), a2 AS (
  SELECT vec_id, cluster FROM (
    SELECT vec_id, cluster,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY dist ASC, cluster ASC) AS rn
    FROM d2
  ) WHERE rn = 1
), sizes AS (
  SELECT cluster, count(*) AS cluster_size FROM a2 GROUP BY 1
)
SELECT a2.vec_id, a2.cluster, a1.cluster <> a2.cluster AS moved,
       s.cluster_size
FROM a2
JOIN a1 USING (vec_id)
JOIN sizes s ON s.cluster = a2.cluster
"""

QUERIES["a132_kmeans_fixed"] = QuerySpec(a132_kmeans_fixed, A132_SQL)


# ---------------------------------------------------------------------------
# a133 -- multi-hop BFS reachability (bounded frontier expansion): minimum
# hop count <= 3 from a fixed source set over the part-supplier bipartite
# graph.  The scale pattern for distributed graph queries: each hop is ONE
# edge equi-join on the frontier; hop = min over the unrolled frontiers.
# ---------------------------------------------------------------------------

_A133_MOD, _A133_HOPS = 500, 3


def a133_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    # typed node ids: part p -> 2p, supplier s -> 2s+1 (bipartite union)
    pairs = li.select(
        (F.col("l_partkey") * 2).alias("u"),
        (F.col("l_suppkey") * 2 + 1).alias("v"),
    ).distinct()
    edges = pairs.unionByName(
        pairs.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    h0 = pa.where(F.col("p_partkey") % _A133_MOD == 0).select(
        (F.col("p_partkey") * 2).alias("node")
    )
    # real frontier BFS (round-7 fix, VERDICT r6 finding #4): visited
    # nodes are anti-joined out of each new frontier, edges checkpointed
    # once -- output rows identical to the union-all-hops + min(hop) form
    from ..operators.graph import bfs_hops

    out = bfs_hops(edges, h0, _A133_HOPS)
    return out.select(
        "node", "hop", (F.col("node") % 2 == 0).alias("is_part")
    )


A133_SQL = f"""
WITH pairs AS (
  SELECT DISTINCT l_partkey * 2 AS u, l_suppkey * 2 + 1 AS v FROM lineitem
), edges AS (
  SELECT u, v FROM pairs UNION ALL SELECT v, u FROM pairs
), h0 AS (
  SELECT p_partkey * 2 AS node FROM part WHERE p_partkey % {_A133_MOD} = 0
), h1 AS (
  SELECT DISTINCT e.v AS node FROM edges e JOIN h0 ON e.u = h0.node
), h2 AS (
  SELECT DISTINCT e.v AS node FROM edges e JOIN h1 ON e.u = h1.node
), h3 AS (
  SELECT DISTINCT e.v AS node FROM edges e JOIN h2 ON e.u = h2.node
), allhops AS (
  SELECT node, 0 AS hop FROM h0
  UNION ALL SELECT node, 1 FROM h1
  UNION ALL SELECT node, 2 FROM h2
  UNION ALL SELECT node, 3 FROM h3
)
SELECT node, min(hop) AS hop, node % 2 = 0 AS is_part
FROM allhops GROUP BY node
"""

QUERIES["a133_bfs_hops"] = QuerySpec(a133_bfs_hops, A133_SQL)


# ---------------------------------------------------------------------------
# a138 -- near-dup cluster-size distribution: how much of the corpus sits
# in clusters of each size (the dedup power-law diagnostic)
# ---------------------------------------------------------------------------


def a138_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    sizes = clusters.groupBy("rep_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    # two tiny grouped rollups over the cluster map -- the histogram and
    # its doc-mass column come from one frame, no window over the corpus
    return (
        sizes.groupBy("cluster_size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def _a138_sql() -> str:
    from .analytics import _a25_sql

    a25 = _a25_sql().strip().rstrip("\n")
    return f"""
WITH clusters AS MATERIALIZED (
{a25}
), sizes AS (
  SELECT rep_id, count(*) AS cluster_size FROM clusters GROUP BY 1
)
SELECT cluster_size, count(*) AS n_clusters,
       cluster_size * count(*) AS n_docs
FROM sizes GROUP BY cluster_size
"""


QUERIES["a138_cluster_sizes"] = QuerySpec(a138_cluster_sizes, _a138_sql())


