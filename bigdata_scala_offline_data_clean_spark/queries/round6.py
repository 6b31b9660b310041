"""Round-6 queries: corpus statistics, drift, evaluation, and merges.

Corpus / text statistics: a110 char entropy (gibberish detector), a111
Zipf fit, a113 n-gram novelty, a129 stop-gram stats, a131 cross-source
3-gram overlap matrix, c51 crawl health.

Dedup / similarity: a114 canonical selection (best-quality survivor per
near-dup cluster), a123 Jaccard threshold curve, a126 LSH candidate
precision/recall, a127 dedup impact report, a119 kNN label vote, a115
embedding centroid drift, a132 fixed-seed k-means (FULL oracle -- the
iterative-ML primitive), a112 theta-sketch intersection overlap, a133
multi-hop BFS reachability (one frontier equi-join per hop).

Analytics: a116 chi-squared independence, a118 RFM segmentation, a120
market-basket rules, a121 lang-id confusion matrix, a122 trailing
z-score volume anomaly, a124 TPC-H-Q20-shape decorrelation, a125 ABC /
Pareto classes, a128 exact-k stratified sample, a130 weekday-seasonal
baseline backtest, a117 forward as-of join, a134 linear multi-touch
attribution (q15's bucketed range join), a135 vocab coverage curve,
a136 label balance weights.

Warehouse / pipeline: c49 MERGE INTO (predicate WHEN-clauses), c50
k-anonymity generalization ladder, c52 inferred dimension members, c53
write-audit-publish gate, c54 GDPR subject-access export, c55
shuffle-partition advisor, s13 streaming volume-anomaly maintenance
(shares a122's oracle verbatim).

All floats follow the repo rule (``_util`` docstring): per-term
``round(expr, 9)`` -> exact ``DECIMAL(28,9)`` sums (order-independent)
-> final ``round(., 6)`` on deterministic double arithmetic; decimal
PRODUCTS cast operands before multiplying (Spark rounds the double
product half-up, DuckDB half-even).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_DEC = "decimal(28,9)"


# ---------------------------------------------------------------------------
# a110 -- per-document Shannon character entropy (gibberish detector)
# ---------------------------------------------------------------------------

_A110_LOW = 3.5  # bits/char floor: natural English text sits ~4.0-4.3


def a110_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    chars = d.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    counts = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    # H = log2(n) - (1/n) * sum(cnt*log2(cnt)): one grouped agg, no
    # per-probability division inside the sum (cnt*log2(cnt) is a
    # deterministic double per distinct char; rounded -> exact decimal sum)
    per_doc = counts.groupBy("doc_id").agg(
        F.sum("cnt").alias("n_chars_seen"),
        F.count(F.lit(1)).alias("distinct_chars"),
        F.sum(F.round(F.col("cnt") * F.log2("cnt"), 9).cast(_DEC)).alias("__s"),
    )
    ent = F.round(
        F.log2("n_chars_seen") - F.col("__s").cast("double") / F.col("n_chars_seen"),
        6,
    )
    return per_doc.select(
        "doc_id",
        "n_chars_seen",
        "distinct_chars",
        ent.alias("entropy_bits"),
        (ent < _A110_LOW).alias("low_entropy"),
    )


A110_SQL = f"""
WITH chars AS (
  SELECT doc_id, unnest(string_split(text, '')) AS ch FROM documents
), counts AS (
  SELECT doc_id, ch, count(*) AS cnt FROM chars WHERE ch <> '' GROUP BY 1, 2
), per_doc AS (
  SELECT doc_id, sum(cnt) AS n_chars_seen, count(*) AS distinct_chars,
         sum(CAST(round(cnt * log2(cnt), 9) AS DECIMAL(28,9))) AS s
  FROM counts GROUP BY 1
)
SELECT doc_id, n_chars_seen, distinct_chars,
       round(log2(n_chars_seen) - CAST(s AS DOUBLE) / n_chars_seen, 6)
         AS entropy_bits,
       round(log2(n_chars_seen) - CAST(s AS DOUBLE) / n_chars_seen, 6)
         < {_A110_LOW} AS low_entropy
FROM per_doc
"""

QUERIES["a110_char_entropy"] = QuerySpec(a110_char_entropy, A110_SQL)


# ---------------------------------------------------------------------------
# a111 -- Zipf's-law fit: OLS slope of ln(freq) on ln(rank)
# ---------------------------------------------------------------------------

_A111_MIN_FREQ = 2


def a111_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import ranked_value_counts

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    # min_freq >= 2 floor (round-7, VERDICT r6 finding #3): the raw-token
    # vocabulary is unbounded at web scale (typos, URLs) and the hapax
    # tail dominates it; a Zipf OLS fit is insensitive to that tail, and
    # the floor keeps every ranked frame sub-linear in the corpus.
    freq = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .where(F.col("freq") >= _A111_MIN_FREQ)
    )
    # rank ties broken by token (total order -> identical ranks in
    # DuckDB).  The rank is decomposed by FREQUENCY GROUP so no window
    # ever spans the whole vocabulary: rank(tok) = (#tokens with higher
    # freq, from the two-level-ranked distinct-frequency table -- O(sqrt
    # corpus) rows, since sum of distinct freqs <= total tokens) + the
    # intra-group row_number partitioned by freq.
    fcounts = freq.groupBy("freq").agg(F.count(F.lit(1)).alias("ntok"))
    rk = ranked_value_counts(
        fcounts.select((-F.col("freq")).alias("__ord"), "ntok"),
        value_col="__ord",
        count_col="ntok",
    ).select((-F.col("__ord")).alias("freq"), F.col("rank_before").alias("__rb"))
    # plain equi-join: the freq->offset map shares the hash(freq)
    # partitioning with the intra-group window (AQE broadcasts it when
    # small; at web scale it is O(sqrt corpus) rows -- either plan works)
    w = Window.partitionBy("freq").orderBy(F.col("tok").asc())
    xy = freq.join(rk, "freq").select(
        F.round(
            F.log((F.col("__rb") + F.row_number().over(w)).cast("double")), 9
        ).alias("x"),
        F.round(F.log("freq"), 9).alias("y"),
    )
    sums = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(_DEC)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(_DEC)).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 9).cast(_DEC)).cast("double").alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 9).cast(_DEC)).cast("double").alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 9).cast(_DEC)).cast("double").alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    return sums.select(
        F.col("n").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(cov * cov / (varx * vary), 6).alias("r2"),
    )


A111_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS freq FROM toks WHERE tok <> '' GROUP BY 1
  HAVING count(*) >= {_A111_MIN_FREQ}
), xy AS (
  SELECT round(ln(CAST(row_number() OVER (ORDER BY freq DESC, tok ASC)
                        AS DOUBLE)), 9) AS x,
         round(ln(freq), 9) AS y
  FROM freq
), sums AS (
  SELECT count(*) AS n,
         CAST(sum(CAST(x AS DECIMAL(28,9))) AS DOUBLE) AS sx,
         CAST(sum(CAST(y AS DECIMAL(28,9))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS DOUBLE) AS sxx,
         CAST(sum(CAST(round(y * y, 9) AS DECIMAL(28,9))) AS DOUBLE) AS syy
  FROM xy
)
SELECT n AS n_terms,
       round((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS zipf_slope,
       round((sy - (sxy - sx * sy / n) / (sxx - sx * sx / n) * sx) / n, 6)
         AS intercept,
       round((sxy - sx * sy / n) * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
FROM sums
"""

QUERIES["a111_zipf_fit"] = QuerySpec(a111_zipf_fit, A111_SQL)


# ---------------------------------------------------------------------------
# a113 -- n-gram novelty: share of a document's 3-grams first seen there
# ---------------------------------------------------------------------------

_A113_N = 3


def a113_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    sh = shingles(d, "doc_id", "text", _A113_N)
    # one shuffle on gram: min(doc_id) is the mergeable "first seen" agg,
    # then the (gram, first_doc) frame joins back -- at 100 TB both sides
    # hash-partition on gram and the join co-locates with the agg exchange
    first = sh.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        sh.join(first, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(
                F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
            ).alias("n_novel"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_grams"), 6).alias("novelty"),
    )


A113_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - {_A113_N - 1}, 1)),
                   i -> array_to_string(t[i:i+{_A113_N - 1}], ' ')))) AS gram
  FROM toks
), first AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY 1
), per_doc AS (
  SELECT g.doc_id, count(*) AS n_grams,
         sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS n_novel
  FROM grams g JOIN first f USING (gram) GROUP BY 1
)
SELECT doc_id, n_grams, n_novel, round(n_novel / n_grams, 6) AS novelty
FROM per_doc
"""

QUERIES["a113_ngram_novelty"] = QuerySpec(a113_ngram_novelty, A113_SQL)


# ---------------------------------------------------------------------------
# a116 -- chi-squared independence: l_returnflag x l_linestatus
# ---------------------------------------------------------------------------


def a116_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    obs = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("observed")
    )
    # marginals re-aggregate the tiny cell table (no second scan of
    # lineitem); every join below is a broadcast of a <=#cells frame
    rt = obs.groupBy("l_returnflag").agg(F.sum("observed").alias("row_n"))
    ct = obs.groupBy("l_linestatus").agg(F.sum("observed").alias("col_n"))
    tot = obs.agg(F.sum("observed").alias("grand_n"))
    cells = (
        obs.join(F.broadcast(rt), "l_returnflag")
        .join(F.broadcast(ct), "l_linestatus")
        .crossJoin(F.broadcast(tot))
    )
    # expected from exact integer products -> one double division
    e = (F.col("row_n") * F.col("col_n")).cast("double") / F.col("grand_n")
    contrib = F.round((F.col("observed") - e) * (F.col("observed") - e) / e, 9)
    cells = cells.select(
        "l_returnflag",
        "l_linestatus",
        "observed",
        F.round(e, 6).alias("expected"),
        contrib.alias("__c"),
    )
    total = cells.agg(
        F.sum(F.col("__c").cast(_DEC)).cast("double").alias("__chi2"),
        F.count(F.lit(1)).alias("__cells"),
    )
    return cells.crossJoin(F.broadcast(total)).select(
        "l_returnflag",
        "l_linestatus",
        "observed",
        "expected",
        F.round("__c", 6).alias("contribution"),
        F.round("__chi2", 6).alias("chi2_total"),
    )


A116_SQL = """
WITH obs AS (
  SELECT l_returnflag, l_linestatus, count(*) AS observed
  FROM lineitem GROUP BY 1, 2
), rt AS (
  SELECT l_returnflag, sum(observed) AS row_n FROM obs GROUP BY 1
), ct AS (
  SELECT l_linestatus, sum(observed) AS col_n FROM obs GROUP BY 1
), tot AS (
  SELECT sum(observed) AS grand_n FROM obs
), cells AS (
  SELECT o.l_returnflag, o.l_linestatus, o.observed,
         CAST(r.row_n * c.col_n AS DOUBLE) / t.grand_n AS e
  FROM obs o
  JOIN rt r USING (l_returnflag)
  JOIN ct c USING (l_linestatus)
  CROSS JOIN tot t
), contribs AS (
  SELECT l_returnflag, l_linestatus, observed,
         round(e, 6) AS expected,
         round((observed - e) * (observed - e) / e, 9) AS c
  FROM cells
), total AS (
  SELECT CAST(sum(CAST(c AS DECIMAL(28,9))) AS DOUBLE) AS chi2 FROM contribs
)
SELECT l_returnflag, l_linestatus, observed, expected,
       round(c, 6) AS contribution, round(chi2, 6) AS chi2_total
FROM contribs CROSS JOIN total
"""

QUERIES["a116_chi2_independence"] = QuerySpec(a116_chi2_independence, A116_SQL)


# ---------------------------------------------------------------------------
# a118 -- RFM segmentation: recency/frequency/monetary quintile rollup
# ---------------------------------------------------------------------------

_A118_Q = 5


def a118_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("monetary"),
    )
    anchor = o.agg(F.max("o_orderdate").alias("anchor"))
    per_cust = per_cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.to_date("anchor"), F.to_date("last_order")).alias(
            "recency_days"
        ),
        "frequency",
        "monetary",
    )
    # quintiles via distributed_ntile (round-7 fix: the per-customer frame
    # grows linearly with the data, so the previous unpartitioned ntile
    # windows were single-task global sorts of the whole customer base --
    # VERDICT r6 finding #1).  Each call is row-for-row identical to
    # ntile() OVER (ORDER BY col [DESC], o_custkey ASC), with the sort
    # distributed by the two-level value-rank construction; the frame is
    # checkpointed once so the three chained calls don't recompute the
    # orders groupBy through each other's lineage.
    from ..operators.ordering import distributed_ntile

    per_cust = per_cust.localCheckpoint(eager=False)
    tiled = distributed_ntile(
        per_cust, _A118_Q, "recency_days", tie_cols=["o_custkey"],
        tile_col="r_q",
    ).localCheckpoint(eager=False)
    tiled = distributed_ntile(
        tiled, _A118_Q, "frequency", ascending=False,
        tie_cols=["o_custkey"], tile_col="f_q",
    ).localCheckpoint(eager=False)
    tiled = distributed_ntile(
        tiled, _A118_Q, "monetary", ascending=False,
        tie_cols=["o_custkey"], tile_col="m_q",
    ).select("o_custkey", "monetary", "r_q", "f_q", "m_q")
    return (
        tiled.groupBy("r_q", "f_q", "m_q")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("monetary").cast("double").alias("segment_monetary"),
        )
        .select(
            "r_q",
            "f_q",
            "m_q",
            "n_customers",
            "segment_monetary",
            ((F.col("r_q") <= 2) & (F.col("f_q") <= 2) & (F.col("m_q") <= 2)).alias(
                "is_champion"
            ),
        )
    )


A118_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order, count(*) AS frequency,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS monetary
  FROM orders GROUP BY 1
), anchor AS (
  SELECT max(o_orderdate) AS anchor FROM orders
), rfm AS (
  SELECT o_custkey,
         datediff('day', CAST(last_order AS DATE), CAST(anchor AS DATE))
           AS recency_days,
         frequency, monetary
  FROM per_cust CROSS JOIN anchor
), tiled AS (
  SELECT o_custkey, monetary,
         ntile({_A118_Q}) OVER (ORDER BY recency_days ASC, o_custkey ASC) AS r_q,
         ntile({_A118_Q}) OVER (ORDER BY frequency DESC, o_custkey ASC) AS f_q,
         ntile({_A118_Q}) OVER (ORDER BY monetary DESC, o_custkey ASC) AS m_q
  FROM rfm
)
SELECT r_q, f_q, m_q, count(*) AS n_customers,
       CAST(sum(monetary) AS DOUBLE) AS segment_monetary,
       r_q <= 2 AND f_q <= 2 AND m_q <= 2 AS is_champion
FROM tiled GROUP BY 1, 2, 3
"""

QUERIES["a118_rfm_segments"] = QuerySpec(a118_rfm_segments, A118_SQL)


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
# a117 -- forward as-of join: first click AT/AFTER each purchase
# ---------------------------------------------------------------------------


def a117_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import asof_join
    from ._util import ts_str

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        purchases,
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload=["click_event_id", "click_ts"],
        direction="forward",
    )
    return out.select(
        "user_id",
        "event_id",
        ts_str("ts").alias("ts"),
        "click_event_id",
        ts_str("click_ts").alias("click_ts"),
    )


A117_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_event_id, ts AS click_ts
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.user_id, p.event_id, p.ts, c.click_event_id, c.click_ts,
         row_number() OVER (PARTITION BY p.user_id, p.event_id
                            ORDER BY c.click_ts ASC, c.click_event_id ASC) AS rn
  FROM p LEFT JOIN c
    ON c.user_id = p.user_id AND c.click_ts >= p.ts
)
SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       click_event_id,
       strftime(click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts
FROM j WHERE rn = 1
"""

QUERIES["a117_asof_forward"] = QuerySpec(a117_asof_forward, A117_SQL)


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
# c49 -- MERGE INTO: predicate-driven matched-update/delete + insert
# ---------------------------------------------------------------------------


def c49_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import merge_into

    o = load_table(spark, sf_dir, "orders")
    target = o.select("o_orderkey", "o_orderstatus", "o_totalprice")
    k = F.col("o_orderkey")
    source = (
        o.where(k % 5 == 0)
        .select(
            "o_orderkey",
            F.lit("M").alias("o_orderstatus"),
            (F.col("o_totalprice") + 500.0).alias("o_totalprice"),
        )
        .unionByName(
            o.where(k % 9 == 0).select(
                (k + 2000000).alias("o_orderkey"),
                F.lit("N").alias("o_orderstatus"),
                F.lit(9.99).alias("o_totalprice"),
            )
        )
    )
    return merge_into(
        target,
        source,
        "o_orderkey",
        delete_cond=lambda t, s: t["o_orderstatus"] == "F",
        update_cond=lambda t, s: s["o_totalprice"] > 1000.0,
        insert_cond=lambda t, s: s["o_totalprice"] < 100.0,
    )


C49_SQL = """
WITH t AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
), s AS (
  SELECT o_orderkey, 'M' AS o_orderstatus, o_totalprice + 500.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 5 = 0
  UNION ALL
  SELECT o_orderkey + 2000000, 'N', 9.99
  FROM orders WHERE o_orderkey % 9 = 0
), j AS (
  SELECT coalesce(t.o_orderkey, s.o_orderkey) AS o_orderkey,
         t.o_orderkey IS NOT NULL AS has_t, s.o_orderkey IS NOT NULL AS has_s,
         t.o_orderstatus AS t_status, t.o_totalprice AS t_price,
         s.o_orderstatus AS s_status, s.o_totalprice AS s_price
  FROM t FULL OUTER JOIN s ON t.o_orderkey = s.o_orderkey
)
SELECT o_orderkey,
       CASE WHEN has_t AND has_s AND s_price > 1000.0 THEN s_status
            WHEN has_t THEN t_status ELSE s_status END AS o_orderstatus,
       CASE WHEN has_t AND has_s AND s_price > 1000.0 THEN s_price
            WHEN has_t THEN t_price ELSE s_price END AS o_totalprice
FROM j
WHERE NOT (has_t AND has_s AND t_status = 'F')
  AND (has_t OR s_price < 100.0)
"""

QUERIES["c49_merge_into"] = QuerySpec(c49_merge_into, C49_SQL)


# ---------------------------------------------------------------------------
# c50 -- k-anonymity generalization ladder (local recoding, 3 rungs)
# ---------------------------------------------------------------------------

_C50_K = 10


def c50_generalize_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "customer")
    na = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name", "n_regionkey"
    )
    re = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"), "r_name"
    )
    c = cu.select("c_custkey", "c_nationkey", "c_mktsegment").join(
        F.broadcast(na), "c_nationkey"
    ).join(F.broadcast(re), "n_regionkey")
    # rung 0: (nation, segment); failing groups promote to (region,
    # segment); still-failing promote to ('*', segment).  Counts at each
    # rung cover only the rows that reached it (local recoding); every
    # rung is a groupBy + broadcast join of a group-sized frame
    l0 = c.groupBy("n_name", "c_mktsegment").agg(F.count(F.lit(1)).alias("n0"))
    c0 = c.join(F.broadcast(l0), ["n_name", "c_mktsegment"])
    out0 = (
        c0.where(F.col("n0") >= _C50_K)
        .groupBy("n_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("n_name").alias("qi_geo"),
            "c_mktsegment",
            F.lit(0).alias("gen_level"),
            "n_rows",
            F.lit(True).alias("k_ok"),
        )
    )
    rem1 = c0.where(F.col("n0") < _C50_K)
    l1 = rem1.groupBy("r_name", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n1")
    )
    c1 = rem1.join(F.broadcast(l1), ["r_name", "c_mktsegment"])
    out1 = (
        c1.where(F.col("n1") >= _C50_K)
        .groupBy("r_name", "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.col("r_name").alias("qi_geo"),
            "c_mktsegment",
            F.lit(1).alias("gen_level"),
            "n_rows",
            F.lit(True).alias("k_ok"),
        )
    )
    out2 = (
        c1.where(F.col("n1") < _C50_K)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.lit("*").alias("qi_geo"),
            "c_mktsegment",
            F.lit(2).alias("gen_level"),
            "n_rows",
            (F.col("n_rows") >= _C50_K).alias("k_ok"),
        )
    )
    return out0.unionByName(out1).unionByName(out2)


C50_SQL = f"""
WITH c AS (
  SELECT c_custkey, n_name, r_name, c_mktsegment
  FROM customer
  JOIN nation ON n_nationkey = c_nationkey
  JOIN region ON r_regionkey = n_regionkey
), l0 AS (
  SELECT n_name, c_mktsegment, count(*) AS n0 FROM c GROUP BY 1, 2
), c0 AS (
  SELECT c.*, l0.n0 FROM c JOIN l0 USING (n_name, c_mktsegment)
), out0 AS (
  SELECT n_name AS qi_geo, c_mktsegment, 0 AS gen_level,
         count(*) AS n_rows, TRUE AS k_ok
  FROM c0 WHERE n0 >= {_C50_K} GROUP BY 1, 2
), rem1 AS (
  SELECT * FROM c0 WHERE n0 < {_C50_K}
), l1 AS (
  SELECT r_name, c_mktsegment, count(*) AS n1 FROM rem1 GROUP BY 1, 2
), c1 AS (
  SELECT rem1.*, l1.n1 FROM rem1 JOIN l1 USING (r_name, c_mktsegment)
), out1 AS (
  SELECT r_name AS qi_geo, c_mktsegment, 1 AS gen_level,
         count(*) AS n_rows, TRUE AS k_ok
  FROM c1 WHERE n1 >= {_C50_K} GROUP BY 1, 2
), out2 AS (
  SELECT '*' AS qi_geo, c_mktsegment, 2 AS gen_level,
         count(*) AS n_rows, count(*) >= {_C50_K} AS k_ok
  FROM c1 WHERE n1 < {_C50_K} GROUP BY c_mktsegment
)
SELECT * FROM out0 UNION ALL SELECT * FROM out1 UNION ALL SELECT * FROM out2
"""

QUERIES["c50_generalize_kanon"] = QuerySpec(c50_generalize_kanon, C50_SQL)


# ---------------------------------------------------------------------------
# c51 -- crawl health report: per-source dedup/quality/language rollup
# ---------------------------------------------------------------------------

_C51_MAX_DUP, _C51_MIN_CHARS = 0.5, 100


def c51_crawl_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("text").alias("n_unique"),
        F.countDistinct("lang").alias("n_langs"),
        F.sum("n_chars").alias("__chars"),
    )
    dup_rate = F.round(1.0 - F.col("n_unique") / F.col("n_docs"), 6)
    avg_chars = F.round(F.col("__chars") / F.col("n_docs"), 6)
    return agg.select(
        "source",
        "n_docs",
        "n_unique",
        dup_rate.alias("dup_rate"),
        "n_langs",
        avg_chars.alias("avg_chars"),
        ((dup_rate < _C51_MAX_DUP) & (avg_chars >= _C51_MIN_CHARS)).alias(
            "healthy"
        ),
    )


C51_SQL = f"""
WITH agg AS (
  SELECT source, count(*) AS n_docs, count(DISTINCT text) AS n_unique,
         count(DISTINCT lang) AS n_langs, sum(n_chars) AS chars
  FROM documents GROUP BY 1
)
SELECT source, n_docs, n_unique,
       round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6) AS dup_rate,
       n_langs,
       round(CAST(chars AS DOUBLE) / n_docs, 6) AS avg_chars,
       round(1.0 - CAST(n_unique AS DOUBLE) / n_docs, 6) < {_C51_MAX_DUP}
         AND round(CAST(chars AS DOUBLE) / n_docs, 6) >= {_C51_MIN_CHARS}
         AS healthy
FROM agg
"""

QUERIES["c51_crawl_health"] = QuerySpec(c51_crawl_health, C51_SQL)


# ---------------------------------------------------------------------------
# a120 -- market-basket association rules over order brand baskets
# ---------------------------------------------------------------------------

_A120_TOPK, _A120_MIN_SUPP = 20, 2


def a120_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    # basket = distinct brands per order: the item universe is tiny (25
    # brands) so every support frame below broadcasts; the only big
    # shuffles are the basket distinct and the okey self-join, both keyed
    # on l_orderkey and bounded by basket size (pairs per order ~ |basket|^2
    # with |basket| <= 25, not corpus-quadratic)
    baskets = (
        li.join(F.broadcast(pa.select("p_partkey", "p_brand")),
                li.l_partkey == pa.p_partkey)
        .select(F.col("l_orderkey").alias("okey"), F.col("p_brand").alias("item"))
        .distinct()
    )
    n_orders = baskets.agg(F.countDistinct("okey").alias("n"))
    item_supp = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("supp"))
    a = baskets.select("okey", F.col("item").alias("item_a"))
    b = baskets.select("okey", F.col("item").alias("item_b"))
    pair_supp = (
        a.join(b, "okey")
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= _A120_MIN_SUPP)
    )
    rules = (
        pair_supp.join(
            F.broadcast(item_supp.select(F.col("item").alias("item_a"),
                                         F.col("supp").alias("a_n"))),
            "item_a",
        )
        .join(
            F.broadcast(item_supp.select(F.col("item").alias("item_b"),
                                         F.col("supp").alias("b_n"))),
            "item_b",
        )
        .crossJoin(F.broadcast(n_orders))
    )
    conf = F.col("pair_n") / F.col("a_n")
    lift = conf * F.col("n") / F.col("b_n")
    out = rules.select(
        "item_a",
        "item_b",
        "pair_n",
        F.round(F.col("pair_n") / F.col("n"), 6).alias("support"),
        F.round(conf, 6).alias("confidence"),
        F.round(lift, 6).alias("lift"),
    )
    top = out.orderBy(
        F.col("pair_n").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    ).limit(_A120_TOPK)
    w = Window.orderBy(
        F.col("pair_n").desc(), F.col("item_a").asc(), F.col("item_b").asc()
    )
    return top.withColumn("pos", F.row_number().over(w))


A120_SQL = f"""
WITH baskets AS (
  SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS item
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), n_orders AS (
  SELECT count(DISTINCT okey) AS n FROM baskets
), item_supp AS (
  SELECT item, count(*) AS supp FROM baskets GROUP BY 1
), pair_supp AS (
  SELECT a.item AS item_a, b.item AS item_b, count(*) AS pair_n
  FROM baskets a JOIN baskets b ON a.okey = b.okey AND a.item < b.item
  GROUP BY 1, 2 HAVING count(*) >= {_A120_MIN_SUPP}
), rules AS (
  SELECT item_a, item_b, pair_n,
         round(CAST(pair_n AS DOUBLE) / n.n, 6) AS support,
         round(CAST(pair_n AS DOUBLE) / sa.supp, 6) AS confidence,
         round(CAST(pair_n AS DOUBLE) / sa.supp * n.n / sb.supp, 6) AS lift,
         row_number() OVER (ORDER BY pair_n DESC, item_a ASC, item_b ASC)
           AS pos
  FROM pair_supp
  JOIN item_supp sa ON sa.item = item_a
  JOIN item_supp sb ON sb.item = item_b
  CROSS JOIN n_orders n
)
SELECT item_a, item_b, pair_n, support, confidence, lift, pos
FROM rules WHERE pos <= {_A120_TOPK}
"""

QUERIES["a120_basket_rules"] = QuerySpec(a120_basket_rules, A120_SQL)


# ---------------------------------------------------------------------------
# a121 -- lang-id evaluation: confusion matrix of a05 vs the labeled lang
# ---------------------------------------------------------------------------


def a121_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import language_id

    d = load_table(spark, sf_dir, "documents")
    pred = language_id(d).select("doc_id", "lang", "predicted_lang")
    conf = pred.groupBy("lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    acc = pred.agg(
        F.round(
            F.sum(F.when(F.col("lang") == F.col("predicted_lang"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("accuracy")
    )
    return conf.crossJoin(F.broadcast(acc)).select(
        "lang", "predicted_lang", "n_docs", "accuracy"
    )


def _a121_sql() -> str:
    from .analytics import _a05_sql

    a05 = _a05_sql().strip().rstrip("\n")
    return f"""
WITH pred AS (
{a05}
), joined AS (
  SELECT d.lang, p.predicted_lang FROM documents d JOIN pred p USING (doc_id)
), acc AS (
  SELECT round(sum(CASE WHEN lang = predicted_lang THEN 1 ELSE 0 END)
               / count(*), 6) AS accuracy
  FROM joined
)
SELECT lang, predicted_lang, count(*) AS n_docs, any_value(acc.accuracy)
         AS accuracy
FROM joined CROSS JOIN acc
GROUP BY lang, predicted_lang, acc.accuracy
"""


QUERIES["a121_langid_eval"] = QuerySpec(a121_langid_eval, _a121_sql())


# ---------------------------------------------------------------------------
# a122 -- daily volume anomaly: trailing-window z-score (current excluded)
# ---------------------------------------------------------------------------

_A122_MIN_PRIOR, _A122_Z = 4, 2.0


def _score_daily_anomaly(daily: DataFrame) -> DataFrame:
    """Trailing 7-day z-score over a (day, event_type, n) daily table.

    Shared verbatim by a122 (batch scan) and s13 (streamed count
    partials); the trailing frame EXCLUDES the current row, so the
    baseline can't absorb the anomaly it is scoring.  Windows run over
    the (days x types) aggregate, never the event scan.
    """
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    stats = daily.select(
        "day",
        "event_type",
        "n",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.sum("n").over(w).alias("s"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n_prior")
    var = (F.col("ss") - F.col("s") * F.col("s") / F.col("n_prior").cast("double")) / (
        F.col("n_prior") - 1
    )
    z = F.when(
        (F.col("n_prior") >= _A122_MIN_PRIOR) & (var > 0),
        F.round((F.col("n") - mean) / F.sqrt(var), 6),
    )
    return stats.select(
        "day",
        "event_type",
        "n",
        "n_prior",
        F.round(mean, 6).alias("trailing_mean"),
        z.alias("z"),
        F.coalesce(F.abs(z) >= _A122_Z, F.lit(False)).alias("is_anomaly"),
    )


def a122_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import day_str

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        day_str("ts").alias("day"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    return _score_daily_anomaly(daily)


A122_SQL = f"""
WITH daily AS (
  SELECT strftime(ts, '%Y%m%d') AS day, event_type, count(*) AS n
  FROM events GROUP BY 1, 2
), stats AS (
  SELECT day, event_type, n,
         count(*) OVER w AS n_prior,
         sum(n) OVER w AS s,
         sum(n * n) OVER w AS ss
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
)
SELECT day, event_type, n, n_prior,
       round(CAST(s AS DOUBLE) / n_prior, 6) AS trailing_mean,
       CASE WHEN n_prior >= {_A122_MIN_PRIOR}
                 AND (ss - s * s / CAST(n_prior AS DOUBLE)) / (n_prior - 1) > 0
            THEN round((n - CAST(s AS DOUBLE) / n_prior)
                       / sqrt((ss - s * s / CAST(n_prior AS DOUBLE))
                              / (n_prior - 1)), 6)
       END AS z,
       coalesce(abs(CASE WHEN n_prior >= {_A122_MIN_PRIOR}
                 AND (ss - s * s / CAST(n_prior AS DOUBLE)) / (n_prior - 1) > 0
            THEN round((n - CAST(s AS DOUBLE) / n_prior)
                       / sqrt((ss - s * s / CAST(n_prior AS DOUBLE))
                              / (n_prior - 1)), 6)
       END) >= {_A122_Z}, FALSE) AS is_anomaly
FROM stats
"""

QUERIES["a122_volume_anomaly"] = QuerySpec(a122_volume_anomaly, A122_SQL)


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
# c52 -- early-arriving facts: inferred dimension members + reconciliation
# ---------------------------------------------------------------------------


def c52_inferred_members(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    # initial dim load is missing every 7th key; facts referencing them
    # must not be dropped or quarantined -- the Kimball fix is to insert
    # placeholder ("inferred") members, then reconcile when the late dim
    # batch lands.  All joins are key equi-joins; the anti-join side is
    # fact-distinct keys (small), so the dim never re-shuffles.
    dim = cu.where(F.col("c_custkey") % 7 != 0).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    fact_keys = o.select(F.col("o_custkey").alias("c_custkey")).distinct()
    missing = fact_keys.join(dim.select("c_custkey"), "c_custkey", "left_anti")
    inferred = missing.select(
        "c_custkey",
        F.lit("UNKNOWN").alias("c_name"),
        F.lit(-1).alias("c_nationkey"),
        F.lit(True).alias("was_inferred"),
    )
    dim2 = dim.withColumn("was_inferred", F.lit(False)).unionByName(inferred)
    late = cu.select(
        "c_custkey",
        F.col("c_name").alias("real_name"),
        F.col("c_nationkey").alias("real_nation"),
    )
    j = dim2.join(late, "c_custkey", "left")
    fix = F.col("was_inferred") & F.col("real_name").isNotNull()
    return j.select(
        "c_custkey",
        F.when(fix, F.col("real_name")).otherwise(F.col("c_name")).alias("c_name"),
        F.when(fix, F.col("real_nation"))
        .otherwise(F.col("c_nationkey"))
        .alias("c_nationkey"),
        "was_inferred",
        fix.alias("reconciled"),
    )


C52_SQL = """
WITH dim AS (
  SELECT c_custkey, c_name, c_nationkey FROM customer WHERE c_custkey % 7 <> 0
), fact_keys AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
), inferred AS (
  SELECT f.c_custkey, 'UNKNOWN' AS c_name, -1 AS c_nationkey,
         TRUE AS was_inferred
  FROM fact_keys f LEFT JOIN dim d USING (c_custkey)
  WHERE d.c_custkey IS NULL
), dim2 AS (
  SELECT c_custkey, c_name, c_nationkey, FALSE AS was_inferred FROM dim
  UNION ALL SELECT * FROM inferred
)
SELECT d.c_custkey,
       CASE WHEN d.was_inferred AND c.c_name IS NOT NULL
            THEN c.c_name ELSE d.c_name END AS c_name,
       CASE WHEN d.was_inferred AND c.c_name IS NOT NULL
            THEN c.c_nationkey ELSE d.c_nationkey END AS c_nationkey,
       d.was_inferred,
       d.was_inferred AND c.c_name IS NOT NULL AS reconciled
FROM dim2 d LEFT JOIN customer c USING (c_custkey)
"""

QUERIES["c52_inferred_members"] = QuerySpec(c52_inferred_members, C52_SQL)


# ---------------------------------------------------------------------------
# a124 -- excess-inventory suppliers (TPC-H Q20 shape: decorrelated
# correlated aggregate -- per-(part,supp) totals vs 1.5x the part average)
# ---------------------------------------------------------------------------

_A124_FACTOR = 1.5


def a124_excess_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    su = load_table(spark, sf_dir, "supplier")
    # the correlated "quantity > 1.5 * avg for that part" must decorrelate
    # to agg + equi-join: ps and pavg share the l_partkey hash
    # partitioning, so the join reuses the grouping exchange
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sq")
    )
    pavg = ps.groupBy("l_partkey").agg(
        (F.sum("sq").cast("double") / F.count(F.lit(1))).alias("avg_sq")
    )
    qual = ps.join(pavg, "l_partkey").where(
        F.col("sq").cast("double") > _A124_FACTOR * F.col("avg_sq")
    )
    per_supp = qual.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_excess_parts"),
        F.sum("sq").cast("double").alias("excess_qty"),
    )
    return per_supp.join(
        F.broadcast(su.select(F.col("s_suppkey").alias("l_suppkey"), "s_name")),
        "l_suppkey",
    ).select(
        F.col("l_suppkey").alias("s_suppkey"),
        "s_name",
        "n_excess_parts",
        "excess_qty",
    )


A124_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq
  FROM lineitem GROUP BY 1, 2
), pavg AS (
  SELECT l_partkey, CAST(sum(sq) AS DOUBLE) / count(*) AS avg_sq
  FROM ps GROUP BY 1
), qual AS (
  SELECT ps.* FROM ps JOIN pavg USING (l_partkey)
  WHERE CAST(sq AS DOUBLE) > {_A124_FACTOR} * avg_sq
), per_supp AS (
  SELECT l_suppkey, count(*) AS n_excess_parts,
         CAST(sum(sq) AS DOUBLE) AS excess_qty
  FROM qual GROUP BY 1
)
SELECT l_suppkey AS s_suppkey, s_name, n_excess_parts, excess_qty
FROM per_supp JOIN supplier ON s_suppkey = l_suppkey
"""

QUERIES["a124_excess_inventory"] = QuerySpec(a124_excess_inventory, A124_SQL)


# ---------------------------------------------------------------------------
# a125 -- ABC (Pareto) analysis: brand revenue classes per supplier region
# ---------------------------------------------------------------------------

_A125_A, _A125_B = 0.8, 0.95


def a125_abc_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    su = load_table(spark, sf_dir, "supplier")
    na = load_table(spark, sf_dir, "nation")
    re = load_table(spark, sf_dir, "region")
    dims = (
        su.join(na, su.s_nationkey == na.n_nationkey)
        .join(re, na.n_regionkey == re.r_regionkey)
        .select(F.col("s_suppkey").alias("l_suppkey"), "r_name")
    )
    rev = (
        li.join(F.broadcast(pa.select("p_partkey", "p_brand")),
                li.l_partkey == pa.p_partkey)
        .join(F.broadcast(dims), "l_suppkey")
        .groupBy("r_name", "p_brand")
        .agg(
            # exact decimal product (operands cast BEFORE multiplying --
            # casting the double product would round half-up vs DuckDB's
            # half-even)
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (
                    F.lit(1).cast("decimal(18,2)")
                    - F.col("l_discount").cast("decimal(18,2)")
                )
            ).alias("rev")
        )
    )
    # cumulative share runs over the (regions x brands) aggregate -- a
    # bounded frame; the corpus never enters a window
    w = Window.partitionBy("r_name").orderBy(
        F.col("rev").desc(), F.col("p_brand").asc()
    )
    tot = Window.partitionBy("r_name")
    share = F.sum("rev").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ).cast("double") / F.sum("rev").over(tot).cast("double")
    cls = (
        F.when(share <= _A125_A, "A")
        .when(share <= _A125_B, "B")
        .otherwise("C")
    )
    return rev.select(
        "r_name",
        "p_brand",
        F.col("rev").cast("double").alias("revenue"),
        F.round(share, 6).alias("cum_share"),
        cls.alias("abc_class"),
    )


A125_SQL = f"""
WITH rev AS (
  SELECT r_name, p_brand,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS rev
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  GROUP BY 1, 2
), shares AS (
  SELECT r_name, p_brand, CAST(rev AS DOUBLE) AS revenue,
         CAST(sum(rev) OVER (PARTITION BY r_name
                             ORDER BY rev DESC, p_brand ASC
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE)
           / CAST(sum(rev) OVER (PARTITION BY r_name) AS DOUBLE) AS share
  FROM rev
)
SELECT r_name, p_brand, revenue, round(share, 6) AS cum_share,
       CASE WHEN share <= {_A125_A} THEN 'A'
            WHEN share <= {_A125_B} THEN 'B' ELSE 'C' END AS abc_class
FROM shares
"""

QUERIES["a125_abc_analysis"] = QuerySpec(a125_abc_analysis, A125_SQL)


# ---------------------------------------------------------------------------
# s13 -- streaming volume-anomaly maintenance: daily count partials kept
# current by the stream; the trailing z-score reads the merged counts
# ---------------------------------------------------------------------------


def s13_stream_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..streaming.jobs import stream_count_partials
    from ._util import day_str

    e = load_table(spark, sf_dir, "events")
    scratch = tempfile.mkdtemp(prefix="ods_spark_s13_")
    try:
        src = f"{scratch}/src"
        e.select(day_str("ts").alias("day"), "event_type").repartition(4)\
            .write.parquet(src)
        stream = spark.readStream.schema(
            "day string, event_type string"
        ).option("maxFilesPerTrigger", "1").parquet(src)
        store = f"{scratch}/partials"
        q = (
            stream_count_partials(stream, store, ["day", "event_type"])
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{scratch}/ckpt")
            .start()
        )
        q.awaitTermination()
        daily = (
            spark.read.parquet(store)
            .groupBy("day", "event_type")
            .agg(F.sum("cnt").alias("n"))
        )
        # identical scoring to a122, fed by the streamed partials instead
        # of a batch scan -- one shared helper, one shared oracle
        out = _score_daily_anomaly(daily)
        rows = out.collect()  # materialize before rmtree (documented)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


QUERIES["s13_stream_anomaly"] = QuerySpec(s13_stream_anomaly, A122_SQL)


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
# a128 -- exact-k deterministic stratified sample (eval-set construction)
# ---------------------------------------------------------------------------

_A128_K = 10


def a128_exact_k_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # hash-ordered row_number: exactly k per stratum, deterministic across
    # engines and runs (no rand()); the window partitions by stratum so
    # each group sorts independently
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), F.lit("a128"))),
        F.col("doc_id").asc(),
    )
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("draw_rank"))
        .where(F.col("draw_rank") <= _A128_K)
    )


A128_SQL = f"""
SELECT doc_id, lang, draw_rank FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
                            ORDER BY md5(concat_ws('|', CAST(doc_id AS VARCHAR),
                                                   'a128')), doc_id ASC)
           AS draw_rank
  FROM documents
) WHERE draw_rank <= {_A128_K}
"""

QUERIES["a128_exact_k_sample"] = QuerySpec(a128_exact_k_sample, A128_SQL)


# ---------------------------------------------------------------------------
# c53 -- write-audit-publish: staging batches gated by expectations
# ---------------------------------------------------------------------------

_C53_MIN_ROWS = 100


def c53_write_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # batch 1: the clean daily load; batch 2: a poisoned load (negated
    # prices for every 11th key) that the gate must hold back.  The
    # "publish" is modeled as the gated union -- only batches with every
    # expectation green contribute rows downstream.
    b1 = o.select("o_orderkey", "o_totalprice").withColumn("batch_id", F.lit(1))
    b2 = (
        o.select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 11 == 0, -F.col("o_totalprice"))
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
        .withColumn("batch_id", F.lit(2))
    )
    both = b1.unionByName(b2)
    audit = both.groupBy("batch_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias(
            "n_null_keys"
        ),
        F.sum(F.when(F.col("o_totalprice") < 0, 1).otherwise(0)).alias(
            "n_negative_prices"
        ),
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("n_dup_keys"),
    )
    passed = (
        (F.col("n_rows") >= _C53_MIN_ROWS)
        & (F.col("n_null_keys") == 0)
        & (F.col("n_negative_prices") == 0)
        & (F.col("n_dup_keys") == 0)
    )
    # publishing is all-or-nothing per batch, so published_rows is
    # derivable from the audit frame (the oracle's CASE does the same) --
    # no second scan of the staging batches, no extra join
    return audit.select(
        "batch_id",
        "n_rows",
        "n_null_keys",
        "n_negative_prices",
        "n_dup_keys",
        passed.alias("published"),
        F.when(passed, F.col("n_rows")).otherwise(F.lit(0)).alias(
            "published_rows"
        ),
    )


C53_SQL = f"""
WITH batches AS (
  SELECT 1 AS batch_id, o_orderkey, o_totalprice FROM orders
  UNION ALL
  SELECT 2, o_orderkey,
         CASE WHEN o_orderkey % 11 = 0 THEN -o_totalprice
              ELSE o_totalprice END
  FROM orders
), audit AS (
  SELECT batch_id, count(*) AS n_rows,
         sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS n_null_keys,
         sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END)
           AS n_negative_prices,
         count(*) - count(DISTINCT o_orderkey) AS n_dup_keys
  FROM batches GROUP BY 1
)
SELECT batch_id, n_rows, n_null_keys, n_negative_prices, n_dup_keys,
       (n_rows >= {_C53_MIN_ROWS} AND n_null_keys = 0
        AND n_negative_prices = 0 AND n_dup_keys = 0) AS published,
       CASE WHEN n_rows >= {_C53_MIN_ROWS} AND n_null_keys = 0
                 AND n_negative_prices = 0 AND n_dup_keys = 0
            THEN n_rows ELSE 0 END AS published_rows
FROM audit
"""

QUERIES["c53_write_audit_publish"] = QuerySpec(
    c53_write_audit_publish, C53_SQL
)


# ---------------------------------------------------------------------------
# a129 -- stop-gram statistics: corpus-frequent shingles (the max_gram_df
# tuning input for containment/inverted-index dedup)
# ---------------------------------------------------------------------------

_A129_N, _A129_TOPK = 3, 20


def a129_stop_gram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    n = d.agg(F.count(F.lit(1)).alias("__n_docs"))
    sh = shingles(d, "doc_id", "text", _A129_N)
    df_counts = sh.groupBy("gram").agg(F.count(F.lit(1)).alias("doc_freq"))
    top = df_counts.orderBy(
        F.col("doc_freq").desc(), F.col("gram").asc()
    ).limit(_A129_TOPK)
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("gram").asc())
    # corpus size folds into the plan as a 1-row broadcast (no separate
    # d.count() job scanning documents twice)
    return top.withColumn("pos", F.row_number().over(w)).crossJoin(
        F.broadcast(n)
    ).select(
        "gram",
        "doc_freq",
        "pos",
        F.round(F.col("doc_freq") / F.col("__n_docs"), 6).alias("doc_share"),
        # a gram in d docs emits d^2 candidate rows in an inverted-index
        # self-join: surface the blowup the stop-gram cap would remove
        (F.col("doc_freq") * F.col("doc_freq")).alias("pair_blowup"),
    )


A129_SQL = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - {_A129_N - 1}, 1)),
                   i -> array_to_string(t[i:i+{_A129_N - 1}], ' ')))) AS gram
  FROM toks
), df_counts AS (
  SELECT gram, count(*) AS doc_freq FROM grams GROUP BY 1
), n AS (
  SELECT count(*) AS n_docs FROM documents
), ranked AS (
  SELECT gram, doc_freq,
         row_number() OVER (ORDER BY doc_freq DESC, gram ASC) AS pos
  FROM df_counts
)
SELECT gram, doc_freq, pos,
       round(CAST(doc_freq AS DOUBLE) / n.n_docs, 6) AS doc_share,
       doc_freq * doc_freq AS pair_blowup
FROM ranked CROSS JOIN n WHERE pos <= {_A129_TOPK}
"""

QUERIES["a129_stop_gram_stats"] = QuerySpec(a129_stop_gram_stats, A129_SQL)


# ---------------------------------------------------------------------------
# a130 -- weekday-seasonal baseline backtest: volume forecast = mean of the
# trailing 4 same-weekday observations, scored against actuals
# ---------------------------------------------------------------------------

_A130_LOOKBACK = 4


def a130_weekday_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import day_str

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(day_str("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    dow = F.dayofweek(F.to_date("day", "yyyyMMdd"))
    # seasonal window partitions by weekday: the frame is the trailing 4
    # SAME-weekday days, excluding the scored day -- windows run over the
    # daily aggregate, never the event scan
    w = (
        Window.partitionBy("dow").orderBy("day").rowsBetween(-_A130_LOOKBACK, -1)
    )
    scored = daily.withColumn("dow", dow).select(
        "day",
        "dow",
        "n",
        F.count(F.lit(1)).over(w).alias("n_obs"),
        F.sum("n").over(w).alias("s"),
    )
    # round only at OUTPUT: error terms use the unrounded quotient exactly
    # as the SQL does, so 6-decimal boundary cases cannot diverge
    q = F.col("s").cast("double") / F.col("n_obs")
    return scored.where(F.col("n_obs") >= 1).select(
        "day",
        "dow",
        "n",
        "n_obs",
        F.round(q, 6).alias("forecast"),
        F.round(F.abs(F.col("n") - q), 6).alias("abs_error"),
        F.round(F.abs(F.col("n") - q) / F.col("n"), 6).alias("ape"),
    )


A130_SQL = f"""
WITH daily AS (
  SELECT strftime(ts, '%Y%m%d') AS day, count(*) AS n
  FROM events GROUP BY 1
), scored AS (
  SELECT day, dayofweek(strptime(day, '%Y%m%d')) + 1 AS dow, n,
         count(*) OVER w AS n_obs,
         sum(n) OVER w AS s
  FROM daily
  WINDOW w AS (PARTITION BY dayofweek(strptime(day, '%Y%m%d'))
               ORDER BY day
               ROWS BETWEEN {_A130_LOOKBACK} PRECEDING AND 1 PRECEDING)
)
SELECT day, dow, n, n_obs,
       round(CAST(s AS DOUBLE) / n_obs, 6) AS forecast,
       round(abs(n - CAST(s AS DOUBLE) / n_obs), 6) AS abs_error,
       round(abs(n - CAST(s AS DOUBLE) / n_obs) / n, 6) AS ape
FROM scored WHERE n_obs >= 1
"""

QUERIES["a130_weekday_baseline"] = QuerySpec(a130_weekday_baseline, A130_SQL)


# ---------------------------------------------------------------------------
# c54 -- GDPR subject-access export: every row held about one user, tagged
# with provenance (the read-side complement of c35's retraction/delete)
# ---------------------------------------------------------------------------

_C54_USER = 42


def c54_subject_access_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import ts_str

    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    # each source filters on the subject key BEFORE projecting to the
    # common export schema -- predicate pushdown reaches every scan, so
    # the export reads only the subject's row groups at any table size
    lit_user = F.lit(_C54_USER)
    profile = cu.where(F.col("c_custkey") == _C54_USER).select(
        F.lit("customer").alias("source_table"),
        F.col("c_custkey").cast("string").alias("record_key"),
        F.concat_ws(
            "|", F.col("c_name"), F.col("c_mktsegment"),
            F.col("c_acctbal").cast("string"),
        ).alias("payload"),
        F.lit(None).cast("string").alias("event_time"),
    )
    orders_rows = o.where(F.col("o_custkey") == _C54_USER).select(
        F.lit("orders").alias("source_table"),
        F.col("o_orderkey").cast("string").alias("record_key"),
        F.concat_ws(
            "|", F.col("o_orderstatus"), F.col("o_totalprice").cast("string")
        ).alias("payload"),
        ts_str("o_orderdate").alias("event_time"),
    )
    event_rows = e.where(F.col("user_id") == lit_user).select(
        F.lit("events").alias("source_table"),
        F.col("event_id").cast("string").alias("record_key"),
        F.concat_ws("|", F.col("event_type"), F.col("value").cast("string")).alias(
            "payload"
        ),
        ts_str("ts").alias("event_time"),
    )
    return profile.unionByName(orders_rows).unionByName(event_rows)


C54_SQL = f"""
SELECT 'customer' AS source_table, CAST(c_custkey AS VARCHAR) AS record_key,
       concat_ws('|', c_name, c_mktsegment, CAST(c_acctbal AS VARCHAR))
         AS payload,
       CAST(NULL AS VARCHAR) AS event_time
FROM customer WHERE c_custkey = {_C54_USER}
UNION ALL
SELECT 'orders', CAST(o_orderkey AS VARCHAR),
       concat_ws('|', o_orderstatus, CAST(o_totalprice AS VARCHAR)),
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
FROM orders WHERE o_custkey = {_C54_USER}
UNION ALL
SELECT 'events', CAST(event_id AS VARCHAR),
       concat_ws('|', event_type, CAST(value AS VARCHAR)),
       strftime(ts, '%Y-%m-%d %H:%M:%S')
FROM events WHERE user_id = {_C54_USER}
"""

QUERIES["c54_subject_access_export"] = QuerySpec(
    c54_subject_access_export, C54_SQL
)


# ---------------------------------------------------------------------------
# a131 -- cross-source duplicate overlap: which sources mirror each other
# ---------------------------------------------------------------------------


_A131_N = 3


def a131_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles

    d = load_table(spark, sf_dir, "documents")
    # (gram, source) pairs dedup BEFORE the self-join, so a shingle
    # repeated within one source counts once; join fan-out is bounded by
    # |sources|^2 per gram (sources are few), never corpus-quadratic
    # shingle keyed on doc_id so spread_narrow_scan widens the gram
    # explode across the cluster (partitioning by the handful of sources
    # would collapse it onto <=|sources| tasks), then project to
    # (gram, source) and dedup
    sh = shingles(
        d.select("doc_id", "source", "text"), "doc_id", "text", _A131_N
    )
    ds = (
        sh.join(d.select("doc_id", "source"), "doc_id")
        .select(F.col("gram").alias("dg"), "source")
        .distinct()
    )
    a = ds.select("dg", F.col("source").alias("source_a"))
    b = ds.select("dg", F.col("source").alias("source_b"))
    shared = (
        a.join(b, "dg")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
    )
    totals = ds.groupBy("source").agg(F.count(F.lit(1)).alias("n_texts"))
    return (
        shared.join(
            F.broadcast(totals.select(F.col("source").alias("source_a"),
                                      F.col("n_texts").alias("n_a"))),
            "source_a",
        )
        .join(
            F.broadcast(totals.select(F.col("source").alias("source_b"),
                                      F.col("n_texts").alias("n_b"))),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_shared_grams",
            "n_a",
            "n_b",
            F.round(
                F.col("n_shared_grams")
                / F.least(F.col("n_a"), F.col("n_b")),
                6,
            ).alias("overlap_coef"),
        )
    )


A131_SQL = f"""
WITH toks AS (
  SELECT source, string_split(text, ' ') AS t FROM documents
), ds AS (
  SELECT DISTINCT dg, source FROM (
    SELECT source, unnest(list_distinct(
      list_transform(generate_series(1, greatest(len(t) - {_A131_N - 1}, 1)),
                     i -> array_to_string(t[i:i+{_A131_N - 1}], ' ')))) AS dg
    FROM toks
  )
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared_grams
  FROM ds a JOIN ds b ON a.dg = b.dg AND a.source < b.source
  GROUP BY 1, 2
), totals AS (
  SELECT source, count(*) AS n_texts FROM ds GROUP BY 1
)
SELECT source_a, source_b, n_shared_grams,
       ta.n_texts AS n_a, tb.n_texts AS n_b,
       round(CAST(n_shared_grams AS DOUBLE)
             / least(ta.n_texts, tb.n_texts), 6) AS overlap_coef
FROM shared
JOIN totals ta ON ta.source = source_a
JOIN totals tb ON tb.source = source_b
"""

QUERIES["a131_source_overlap"] = QuerySpec(a131_source_overlap, A131_SQL)


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
# a134 -- linear multi-touch attribution: every click in the 30 minutes
# BEFORE a purchase shares the purchase value equally (a91 is last-touch;
# linear is the other standard model).  Same bucketed range join as q15.
# ---------------------------------------------------------------------------


def a134_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.temporal import range_join_bucketed

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id")
    )
    windows = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 30 MINUTES")).alias("win_start"),
        F.col("ts").alias("win_end"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("value").alias("purchase_value"),
    )
    touched = range_join_bucketed(
        clicks,
        windows,
        on="user_id",
        left_ts="ts",
        range_start="win_start",
        range_end="win_end",
        payload=["purchase_event_id", "purchase_value"],
    )
    # clicks strictly before the purchase ([ts-30min, ts)); equal credit =
    # value / n_touches -- one double division of a double by an exact int,
    # per-term rounded then decimal-summed per click (order-independent)
    per_purchase = touched.groupBy("purchase_event_id").agg(
        F.count(F.lit(1)).alias("n_touches")
    )
    credited = touched.join(F.broadcast(per_purchase), "purchase_event_id")
    return (
        credited.groupBy("click_event_id", "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_purchases_touched"),
            F.sum(
                F.round(F.col("purchase_value") / F.col("n_touches"), 9).cast(_DEC)
            )
            .cast("double")
            .alias("total_credit"),
        )
        .select(
            "click_event_id",
            "user_id",
            "n_purchases_touched",
            F.round("total_credit", 6).alias("total_credit"),
        )
    )


A134_SQL = """
WITH clicks AS (
  SELECT user_id, ts, event_id AS click_event_id
  FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, event_id AS purchase_event_id, value AS purchase_value
  FROM events WHERE event_type = 'purchase'
), touched AS (
  SELECT c.click_event_id, c.user_id, p.purchase_event_id, p.purchase_value
  FROM clicks c JOIN purchases p
    ON p.user_id = c.user_id
   AND c.ts >= p.ts - INTERVAL 30 MINUTES
   AND c.ts < p.ts
), per_purchase AS (
  SELECT purchase_event_id, count(*) AS n_touches
  FROM touched GROUP BY 1
)
SELECT click_event_id, user_id,
       count(*) AS n_purchases_touched,
       round(CAST(sum(CAST(round(purchase_value / n_touches, 9)
                           AS DECIMAL(28,9))) AS DOUBLE), 6) AS total_credit
FROM touched JOIN per_purchase USING (purchase_event_id)
GROUP BY 1, 2
"""

QUERIES["a134_linear_attribution"] = QuerySpec(
    a134_linear_attribution, A134_SQL
)


# ---------------------------------------------------------------------------
# a135 -- vocabulary coverage curve: corpus token coverage at candidate
# vocab sizes (the tokenizer-sizing diagnostic behind a63/a79)
# ---------------------------------------------------------------------------

_A135_SIZES = (10, 20, 40, 80, 160)


def a135_vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import ranked_value_counts

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    # coverage at size s = share of corpus tokens covered by the top-s
    # vocab entries (rank order: n DESC, tok ASC).  Round-7 rewrite
    # (VERDICT r6 finding #3): no per-token rank at all -- tokens of one
    # frequency occupy CONSECUTIVE ranks and contribute equal mass, so
    # covered(s) = sum over frequency groups of n * least(ntok, s - rb)
    # for groups with rank_before rb < s.  The only ranked frame is the
    # distinct-frequency table (O(sqrt corpus) rows, two-level-ranked);
    # the vocab is floored at min_freq >= 2 (the hapax tail is unbounded
    # at web scale and adds one final near-flat segment to the curve),
    # while `total` keeps counting ALL tokens so coverage stays the share
    # of the full corpus mass.
    freq2 = freq.where(F.col("n") >= _A111_MIN_FREQ)
    fcounts = freq2.groupBy("n").agg(F.count(F.lit(1)).alias("ntok"))
    rk = ranked_value_counts(
        fcounts.select((-F.col("n")).alias("__ord"), "ntok"),
        value_col="__ord",
        count_col="ntok",
    ).select(
        (-F.col("__ord")).alias("n"),
        "ntok",
        F.col("rank_before").alias("rb"),
    )
    total = freq.agg(F.sum("n").alias("total"))
    sizes = spark.createDataFrame(
        [(s,) for s in _A135_SIZES], "vocab_size int"
    )
    at_size = (
        rk.join(F.broadcast(sizes), F.col("rb") < F.col("vocab_size"))
        .groupBy("vocab_size")
        .agg(
            F.sum(
                F.col("n")
                * F.least(F.col("ntok"), F.col("vocab_size") - F.col("rb"))
            ).alias("covered")
        )
    )
    return (
        at_size.crossJoin(F.broadcast(total))
        .select(
            "vocab_size",
            "covered",
            F.round(F.col("covered") / F.col("total"), 6).alias("coverage"),
        )
    )


A135_SQL = f"""
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS n FROM toks WHERE tok <> '' GROUP BY 1
), ranked AS (
  SELECT n,
         row_number() OVER (ORDER BY n DESC, tok ASC) AS rank,
         sum(n) OVER (ORDER BY n DESC, tok ASC ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM freq WHERE n >= {_A111_MIN_FREQ}
), total AS (
  SELECT sum(n) AS total FROM freq
), sizes AS (
  SELECT unnest({list(_A135_SIZES)}) AS vocab_size
)
SELECT vocab_size, max(cum) AS covered,
       round(CAST(max(cum) AS DOUBLE) / any_value(t.total), 6) AS coverage
FROM ranked JOIN sizes ON rank <= vocab_size CROSS JOIN total t
GROUP BY vocab_size
"""

QUERIES["a135_vocab_coverage_curve"] = QuerySpec(
    a135_vocab_coverage_curve, A135_SQL
)


# ---------------------------------------------------------------------------
# c55 -- shuffle-partition advisor: recommended partition counts per table
# from row counts and estimated row widths (target 128 MB per partition)
# ---------------------------------------------------------------------------

_C55_TARGET_MB = 128


def c55_shuffle_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    d = load_table(spark, sf_dir, "documents")

    def profile(df: DataFrame, name: str, width_expr) -> DataFrame:
        return df.agg(
            F.lit(name).alias("table_name"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(width_expr.cast("bigint")).alias("est_bytes"),
        )

    # width estimates: fixed numeric/ts columns + measured string lengths
    # (one agg per table -- the advisor reads stats, it never re-shuffles)
    prof = (
        profile(li, "lineitem", F.lit(80) + F.length("l_returnflag")
                + F.length("l_linestatus"))
        .unionByName(profile(o, "orders", F.lit(48)
                             + F.length("o_orderstatus")
                             + F.length("o_orderpriority")))
        .unionByName(profile(e, "events", F.lit(40) + F.length("event_type")
                             + F.length("props")))
        .unionByName(profile(d, "documents", F.lit(16) + F.length("text")
                             + F.length("lang") + F.length("source")))
    )
    target = _C55_TARGET_MB * 1024 * 1024
    rec = F.greatest(
        F.lit(1), F.ceil(F.col("est_bytes") / F.lit(target)).cast("bigint")
    )
    return prof.select(
        "table_name",
        "n_rows",
        "est_bytes",
        rec.alias("recommended_partitions"),
        F.round(F.col("est_bytes") / F.col("n_rows"), 6).alias("est_row_bytes"),
    )


C55_SQL = f"""
WITH prof AS (
  SELECT 'lineitem' AS table_name, count(*) AS n_rows,
         sum(80 + length(l_returnflag) + length(l_linestatus)) AS est_bytes
  FROM lineitem
  UNION ALL
  SELECT 'orders', count(*),
         sum(48 + length(o_orderstatus) + length(o_orderpriority))
  FROM orders
  UNION ALL
  SELECT 'events', count(*), sum(40 + length(event_type) + length(props))
  FROM events
  UNION ALL
  SELECT 'documents', count(*),
         sum(16 + length(text) + length(lang) + length(source))
  FROM documents
)
SELECT table_name, n_rows, est_bytes,
       greatest(1, CAST(ceil(CAST(est_bytes AS DOUBLE)
                             / {_C55_TARGET_MB * 1024 * 1024}) AS BIGINT))
         AS recommended_partitions,
       round(CAST(est_bytes AS DOUBLE) / n_rows, 6) AS est_row_bytes
FROM prof
"""

QUERIES["c55_shuffle_advisor"] = QuerySpec(c55_shuffle_advisor, C55_SQL)


# ---------------------------------------------------------------------------
# a136 -- label balance weights: inverse-frequency resampling weights per
# class (the balance-target complement of a49's given-target mixture)
# ---------------------------------------------------------------------------


def a136_label_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    mx = counts.agg(F.max("n").alias("max_n"))
    return (
        counts.crossJoin(F.broadcast(mx))
        .select(
            "label",
            "n",
            "max_n",
            F.round(F.col("max_n") / F.col("n"), 6).alias("weight"),
            (F.col("n") * 2 < F.col("max_n")).alias("underrepresented"),
        )
    )


A136_SQL = """
WITH counts AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY 1
), mx AS (
  SELECT max(n) AS max_n FROM counts
)
SELECT label, n, max_n,
       round(CAST(max_n AS DOUBLE) / n, 6) AS weight,
       n * 2 < max_n AS underrepresented
FROM counts CROSS JOIN mx
"""

QUERIES["a136_label_balance_weights"] = QuerySpec(
    a136_label_balance_weights, A136_SQL
)


# ---------------------------------------------------------------------------
# a137 -- trigram LM with stupid backoff (train/heldout split): the
# next-rung LM quality signal above a55's bigram (tri -> 0.4*bigram ->
# 0.16*Laplace-unigram), scored on docs the model never saw
# ---------------------------------------------------------------------------

_A137_ALPHA_N, _A137_ALPHA_D = 4, 10  # backoff alpha = 0.4, exact rational


def a137_trigram_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    train = d.where(F.col("doc_id") % 10 != 0)
    held = d.where(F.col("doc_id") % 10 == 0)

    def grams(src: DataFrame, n: int) -> DataFrame:
        return (
            src.where(F.size(toks) >= n)
            .select("doc_id", F.explode(word_ngrams(toks, n)).alias("gram"))
        )

    c3 = grams(train, 3).groupBy("gram").agg(F.count(F.lit(1)).alias("c3"))
    c2 = grams(train, 2).groupBy("gram").agg(F.count(F.lit(1)).alias("c2"))
    uni = train.select(F.explode(toks).alias("w")).where(F.col("w") != "")
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    nv = uni.agg(
        F.count(F.lit(1)).alias("n_tokens"), F.countDistinct("w").alias("v")
    )
    occ = grams(held, 3).select(
        "doc_id",
        "gram",
        F.substring_index("gram", " ", 2).alias("prefix2"),
        F.substring_index("gram", " ", -2).alias("last2"),
        F.substring_index("gram", " ", -1).alias("w3"),
        F.substring_index(F.substring_index("gram", " ", 2), " ", -1).alias("w2"),
    )
    # every count table keys on train n-grams (broadcast-or-shuffle
    # equi-joins); the CASE backoff ladder is a projection, never a join
    j = (
        occ.join(c3.withColumnRenamed("gram", "gram3"),
                 occ.gram == F.col("gram3"), "left")
        .join(c2.select(F.col("gram").alias("prefix2"), F.col("c2").alias("cp")),
              "prefix2", "left")
        .join(c2.select(F.col("gram").alias("last2"), F.col("c2").alias("cl2")),
              "last2", "left")
        .join(c1.select(F.col("w").alias("w2"), F.col("c1").alias("cw2")),
              "w2", "left")
        .join(c1.select(F.col("w").alias("w3"), F.col("c1").alias("cw3")),
              "w3", "left")
        .crossJoin(F.broadcast(nv))
    )
    alpha = F.lit(_A137_ALPHA_N) / F.lit(_A137_ALPHA_D)
    p = (
        F.when(F.col("c3").isNotNull(), F.col("c3") / F.col("cp"))
        .when(
            F.col("cl2").isNotNull(), alpha * F.col("cl2") / F.col("cw2")
        )
        .otherwise(
            alpha
            * alpha
            * (F.coalesce(F.col("cw3"), F.lit(0)) + 1)
            / (F.col("n_tokens") + F.col("v"))
        )
    )
    scored = j.select("doc_id", F.round(F.log(p), 9).alias("logp"))
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_trigrams"),
        (F.sum(F.col("logp").cast(_DEC)).cast("double") / F.count(F.lit(1))).alias(
            "avg_logprob"
        ),
    )
    return agg.select(
        "doc_id",
        "n_trigrams",
        "avg_logprob",
        F.round(F.exp(-F.col("avg_logprob")), 6).alias("ppl"),
    )


A137_SQL = f"""
WITH train AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % 10 <> 0
), held AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE doc_id % 10 = 0
), c3 AS (
  SELECT gram, count(*) AS c3 FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - 2),
                                 i -> array_to_string(t[i:i+2], ' '))) AS gram
    FROM train WHERE len(t) >= 3
  ) GROUP BY gram
), c2 AS (
  SELECT gram, count(*) AS c2 FROM (
    SELECT unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> array_to_string(t[i:i+1], ' '))) AS gram
    FROM train WHERE len(t) >= 2
  ) GROUP BY gram
), uni AS (
  SELECT unnest(t) AS w FROM train
), c1 AS (
  SELECT w, count(*) AS c1 FROM uni WHERE w <> '' GROUP BY w
), nv AS (
  SELECT count(*) AS n_tokens, count(DISTINCT w) AS v FROM uni WHERE w <> ''
), occ AS (
  SELECT doc_id, gram,
         array_to_string(string_split(gram, ' ')[1:2], ' ') AS prefix2,
         array_to_string(string_split(gram, ' ')[2:3], ' ') AS last2,
         string_split(gram, ' ')[3] AS w3,
         string_split(gram, ' ')[2] AS w2
  FROM (
    SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
                          i -> array_to_string(t[i:i+2], ' '))) AS gram
    FROM held WHERE len(t) >= 3
  )
), scored AS (
  SELECT o.doc_id,
         round(ln(CASE
           WHEN g3.c3 IS NOT NULL THEN CAST(g3.c3 AS DOUBLE) / cp.c2
           WHEN gl.c2 IS NOT NULL THEN
             0.4 * CAST(gl.c2 AS DOUBLE) / w2c.c1
           ELSE 0.4 * 0.4 * (coalesce(w3c.c1, 0) + 1)
                / CAST(nv.n_tokens + nv.v AS DOUBLE)
         END), 9) AS logp
  FROM occ o
  LEFT JOIN c3 g3 ON g3.gram = o.gram
  LEFT JOIN c2 cp ON cp.gram = o.prefix2
  LEFT JOIN c2 gl ON gl.gram = o.last2
  LEFT JOIN c1 w2c ON w2c.w = o.w2
  LEFT JOIN c1 w3c ON w3c.w = o.w3
  CROSS JOIN nv
)
SELECT doc_id, count(*) AS n_trigrams,
       CAST(sum(CAST(logp AS DECIMAL(28,9))) AS DOUBLE) / count(*)
         AS avg_logprob,
       round(exp(-(CAST(sum(CAST(logp AS DECIMAL(28,9))) AS DOUBLE)
                   / count(*))), 6) AS ppl
FROM scored GROUP BY doc_id
"""

QUERIES["a137_trigram_backoff"] = QuerySpec(a137_trigram_backoff, A137_SQL)


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


# ---------------------------------------------------------------------------
# c56 -- table checksum + write-path verification: order-independent
# XOR-of-row-digests checksum, recomputed after a parquet round trip
# ---------------------------------------------------------------------------


def _row_digest(cols) -> "F.Column":
    """Order-independent row digest: first 8 md5 hex chars -> BIGINT.

    XOR-aggregating these is commutative/associative, so the table
    checksum is partitioning-independent -- the migration-verification
    primitive (c24 checks values row-by-row; this is the O(1)-output
    form that scales to tables too big to diff).

    Each column is coalesced to a NUL-prefixed sentinel BEFORE concat_ws
    (round-7, per round-6 advice): concat_ws silently SKIPS nulls, so
    ('a', NULL, 'b') and ('a', 'b', NULL) would otherwise collide.  The
    c56 columns happen to be non-null TPC-H fields, but the primitive is
    reusable on nullable columns; the DuckDB oracle mirrors the sentinel
    (chr(0) || 'NULL')."""
    canon = F.concat_ws(
        "|",
        *[F.coalesce(c.cast("string"), F.lit("\x00NULL")) for c in cols],
    )
    return F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("bigint")


def c56_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ._util import day_str

    o = load_table(spark, sf_dir, "orders")
    canon_cols = [
        F.col("o_orderkey").cast("string"),
        F.col("o_custkey").cast("string"),
        F.col("o_orderstatus"),
        day_str("o_orderdate"),
    ]
    src = o.select(
        _row_digest(canon_cols).alias("dg"),
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        day_str("o_orderdate").alias("o_day"),
    )
    scratch = tempfile.mkdtemp(prefix="ods_spark_c56_")
    try:
        src.drop("dg").write.parquet(f"{scratch}/copy")
        back = spark.read.parquet(f"{scratch}/copy")
        back_cs = back.agg(
            F.bit_xor(
                _row_digest(
                    [
                        F.col("o_orderkey").cast("string"),
                        F.col("o_custkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.col("o_day"),
                    ]
                )
            ).alias("copy_checksum"),
            F.count(F.lit(1)).alias("copy_rows"),
        )
        orig_cs = src.agg(
            F.bit_xor("dg").alias("checksum"), F.count(F.lit(1)).alias("n_rows")
        )
        out = (
            orig_cs.crossJoin(back_cs)
            .select(
                F.lit("orders").alias("table_name"),
                "n_rows",
                "checksum",
                (F.col("checksum") == F.col("copy_checksum")).alias(
                    "roundtrip_checksum_ok"
                ),
                (F.col("n_rows") == F.col("copy_rows")).alias(
                    "roundtrip_count_ok"
                ),
            )
        )
        rows = out.collect()  # materialize before rmtree (documented)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


C56_SQL = """
WITH dg AS (
  SELECT CAST(('0x' || substr(md5(concat_ws('|',
           coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || 'NULL'),
           coalesce(CAST(o_custkey AS VARCHAR), chr(0) || 'NULL'),
           coalesce(o_orderstatus, chr(0) || 'NULL'),
           coalesce(strftime(o_orderdate, '%Y%m%d'), chr(0) || 'NULL'))),
           1, 8)) AS BIGINT)
           AS dg
  FROM orders
)
SELECT 'orders' AS table_name, count(*) AS n_rows,
       bit_xor(dg) AS checksum,
       TRUE AS roundtrip_checksum_ok,
       TRUE AS roundtrip_count_ok
FROM dg
"""

QUERIES["c56_table_checksum"] = QuerySpec(c56_table_checksum, C56_SQL)


# ---------------------------------------------------------------------------
# a139 -- PSI drift on price deciles: the model-monitoring standard for a
# continuous column (c34's KL covers categorical histograms)
# ---------------------------------------------------------------------------

_A139_BUCKETS = 10


def a139_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    cur = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice"
    )
    # decile bounds from the BASELINE half: exact ntile over (price, key)
    # -- a total order, so both engines cut identical deciles; bounds are
    # the per-decile max, a 10-row broadcast frame.  Round-7 fix (VERDICT
    # r6 finding #2): the tile assignment runs through distributed_ntile
    # (two-level value rank, straddler-only tie-break) instead of an
    # unpartitioned ntile window over the raw baseline rows.
    from ..operators.ordering import distributed_ntile

    tiled = distributed_ntile(
        base, _A139_BUCKETS, "o_totalprice", tie_cols=["o_orderkey"],
        tile_col="bucket",
    ).select("o_totalprice", "bucket")
    bounds = tiled.groupBy("bucket").agg(
        F.max("o_totalprice").alias("hi")
    )
    n_base = tiled.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_base"))

    # assign the current half by counting bounds strictly below the price
    # (bucket = 1 + #bounds < price, capped at the last decile)
    assigned = (
        cur.join(F.broadcast(bounds.where(F.col("bucket") < _A139_BUCKETS)),
                 F.col("o_totalprice") > F.col("hi"), "left")
        .groupBy("o_orderkey")
        .agg(
            (F.least(
                F.sum(F.when(F.col("hi").isNotNull(), 1).otherwise(0)) + 1,
                F.lit(_A139_BUCKETS),
            )).alias("bucket")
        )
    )
    n_cur = assigned.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_cur"))
    tot = base.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
        cur.agg(F.count(F.lit(1)).alias("nc"))
    )
    return _psi_report(n_base, n_cur, tot)


def _psi_report(n_base: DataFrame, n_cur: DataFrame, tot: DataFrame) -> DataFrame:
    """PSI cells + total from per-bucket count frames.

    Shared by a139 (batch) and s14 (streamed current-half counts): inputs
    are ``(bucket, n_base)``, ``(bucket, n_cur)`` and a 1-row ``(nb, nc)``
    totals frame; output is the canonical a139 report, so both queries
    verify against the same oracle.
    """
    j = (
        n_base.join(n_cur, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("n_base", F.lit(0)).alias("n_base"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(F.broadcast(tot))
    )
    # Laplace-smoothed shares: zero buckets can't blow up ln(); every term
    # is a deterministic double of exact ints, rounded -> decimal-summed
    p1 = (F.col("n_base") + 1).cast("double") / (F.col("nb") + _A139_BUCKETS)
    p2 = (F.col("n_cur") + 1).cast("double") / (F.col("nc") + _A139_BUCKETS)
    term = F.round((p2 - p1) * F.log(p2 / p1), 9)
    cells = j.select(
        "bucket", "n_base", "n_cur", term.alias("__t")
    )
    psi = cells.agg(
        F.sum(F.col("__t").cast(_DEC)).cast("double").alias("__psi")
    )
    return cells.crossJoin(F.broadcast(psi)).select(
        "bucket",
        "n_base",
        "n_cur",
        F.round("__t", 6).alias("psi_term"),
        F.round("__psi", 6).alias("psi_total"),
        (F.round(F.col("__psi"), 6) < 0.1).alias("stable"),
    )


A139_SQL = f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0
), cur AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 1
), tiled AS (
  SELECT o_totalprice,
         ntile({_A139_BUCKETS}) OVER (ORDER BY o_totalprice ASC,
                                      o_orderkey ASC) AS bucket
  FROM base
), bounds AS (
  SELECT bucket, max(o_totalprice) AS hi FROM tiled
  WHERE bucket < {_A139_BUCKETS} GROUP BY 1
), n_base AS (
  SELECT bucket, count(*) AS n_base FROM tiled GROUP BY 1
), assigned AS (
  SELECT c.o_orderkey,
         least(1 + sum(CASE WHEN b.hi IS NOT NULL THEN 1 ELSE 0 END),
               {_A139_BUCKETS}) AS bucket
  FROM cur c LEFT JOIN bounds b ON c.o_totalprice > b.hi
  GROUP BY 1
), n_cur AS (
  SELECT bucket, count(*) AS n_cur FROM assigned GROUP BY 1
), tot AS (
  SELECT (SELECT count(*) FROM base) AS nb, (SELECT count(*) FROM cur) AS nc
), cells AS (
  SELECT coalesce(nb.bucket, ncr.bucket) AS bucket,
         coalesce(nb.n_base, 0) AS n_base, coalesce(ncr.n_cur, 0) AS n_cur,
         round(((coalesce(ncr.n_cur, 0) + 1)
                  / CAST(t.nc + {_A139_BUCKETS} AS DOUBLE)
                - (coalesce(nb.n_base, 0) + 1)
                  / CAST(t.nb + {_A139_BUCKETS} AS DOUBLE))
               * ln(((coalesce(ncr.n_cur, 0) + 1)
                     / CAST(t.nc + {_A139_BUCKETS} AS DOUBLE))
                    / ((coalesce(nb.n_base, 0) + 1)
                       / CAST(t.nb + {_A139_BUCKETS} AS DOUBLE))), 9) AS t
  FROM n_base nb FULL OUTER JOIN n_cur ncr USING (bucket) CROSS JOIN tot t
), psi AS (
  SELECT CAST(sum(CAST(t AS DECIMAL(28,9))) AS DOUBLE) AS psi FROM cells
)
SELECT bucket, n_base, n_cur, round(t, 6) AS psi_term,
       round(psi, 6) AS psi_total, round(psi, 6) < 0.1 AS stable
FROM cells CROSS JOIN psi
"""

QUERIES["a139_psi_drift"] = QuerySpec(a139_psi_drift, A139_SQL)


# ---------------------------------------------------------------------------
# a140 -- week-over-week top movers: largest absolute brand-revenue deltas
# ---------------------------------------------------------------------------

_A140_TOPK = 10


def a140_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pa = load_table(spark, sf_dir, "part")
    weekly = (
        li.join(F.broadcast(pa.select("p_partkey", "p_brand")),
                li.l_partkey == pa.p_partkey)
        .groupBy(
            F.date_format(F.date_trunc("week", "l_shipdate"), "yyyy-MM-dd")
            .alias("week"),
            "p_brand",
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("rev")
        )
    )
    # lag runs over the (weeks x brands) aggregate; deltas are exact
    # decimals, so ordering ties resolve identically in both engines
    w = Window.partitionBy("p_brand").orderBy("week")
    deltas = weekly.select(
        "week",
        "p_brand",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev") - F.lag("rev").over(w)).alias("__d"),
    ).where(F.col("__d").isNotNull())
    top = deltas.orderBy(
        F.abs("__d").desc(), F.col("week").asc(), F.col("p_brand").asc()
    ).limit(_A140_TOPK)
    rw = Window.orderBy(
        F.abs("__d").desc(), F.col("week").asc(), F.col("p_brand").asc()
    )
    return top.withColumn("pos", F.row_number().over(rw)).select(
        "week",
        "p_brand",
        "revenue",
        F.col("__d").cast("double").alias("wow_delta"),
        "pos",
    )


A140_SQL = f"""
WITH weekly AS (
  SELECT strftime(date_trunc('week', l_shipdate), '%Y-%m-%d') AS week,
         p_brand,
         sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
  FROM lineitem JOIN part ON p_partkey = l_partkey
  GROUP BY 1, 2
), deltas AS (
  SELECT week, p_brand, CAST(rev AS DOUBLE) AS revenue,
         rev - lag(rev) OVER (PARTITION BY p_brand ORDER BY week) AS d
  FROM weekly
), ranked AS (
  SELECT week, p_brand, revenue, CAST(d AS DOUBLE) AS wow_delta,
         row_number() OVER (ORDER BY abs(d) DESC, week ASC, p_brand ASC)
           AS pos
  FROM deltas WHERE d IS NOT NULL
)
SELECT week, p_brand, revenue, wow_delta, pos
FROM ranked WHERE pos <= {_A140_TOPK}
"""

QUERIES["a140_topk_movers"] = QuerySpec(a140_topk_movers, A140_SQL)
