"""Round-6 batch: corpus-statistics, drift, and warehouse-merge queries.

- a110 character entropy: the Shannon-entropy gibberish detector every
  web-scale curation pipeline runs (CCNet/Gopher-style); per-term
  ``round(.,9) -> DECIMAL`` sums keep the float path order-independent.
- a111 Zipf fit: log-log OLS slope of the token rank/frequency curve --
  a corpus-health diagnostic (natural text tracks slope ~ -1).
- a113 n-gram novelty: per-document fraction of 3-grams first seen in
  that document (corpus ordered by doc_id) -- the "new information"
  curve used to decide when a crawl snapshot stops adding value.
- a116 chi-squared independence: returnflag x linestatus contingency
  table with per-cell contributions and the decimal-summed statistic.
- a118 RFM segmentation: recency/frequency/monetary quintiles -- the
  classic behavioral-cohort labeling job, reduced to segment rollups.

All floats follow the repo rule (``_util`` docstring): per-term
``round(expr, 9)`` -> exact ``DECIMAL(28,9)`` sums (order-independent)
-> final ``round(., 6)`` on deterministic double arithmetic.
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


def a111_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
    # rank ties broken by token (total order -> identical ranks in DuckDB);
    # the vocabulary table is tiny (distinct tokens), so the global window
    # runs over an already-aggregated frame, not the corpus
    w = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
    xy = freq.select(
        F.round(F.log(F.row_number().over(w).cast("double")), 9).alias("x"),
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


A111_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), freq AS (
  SELECT tok, count(*) AS freq FROM toks WHERE tok <> '' GROUP BY 1
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
    # ntile over the per-customer frame (already aggregated); each window
    # carries a o_custkey tie-break so both engines assign identical tiles
    rw = Window.orderBy(F.col("recency_days").asc(), F.col("o_custkey").asc())
    fw = Window.orderBy(F.col("frequency").desc(), F.col("o_custkey").asc())
    mw = Window.orderBy(F.col("monetary").desc(), F.col("o_custkey").asc())
    tiled = per_cust.select(
        "o_custkey",
        "monetary",
        F.ntile(_A118_Q).over(rw).alias("r_q"),
        F.ntile(_A118_Q).over(fw).alias("f_q"),
        F.ntile(_A118_Q).over(mw).alias("m_q"),
    )
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
