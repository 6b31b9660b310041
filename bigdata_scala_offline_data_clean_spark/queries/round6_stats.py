"""Round-6 queries, corpus-statistics / drift / monitoring family.

Split out of ``round6.py`` in round 10 (VERDICT r9 task #7: no module
over 1500 LoC); ``round6.py`` remains the registration shim that
preserves the original registry order.  Families here: a110 char
entropy, a111 Zipf fit, a113 n-gram novelty, a116 chi-squared
independence, c51 crawl health, a121 lang-id confusion matrix, a122
trailing z-score volume anomaly (+ s13, its streaming maintenance
twin), a128 exact-k stratified sample, a129 stop-gram stats, a130
weekday-seasonal baseline, a131 cross-source overlap, a135 vocab
coverage curve, a137 trigram backoff LM, a139 PSI drift.

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
from ._util import freeze_result, load_table

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
        e.select(day_str("ts").alias("day"), "event_type").repartition(2)\
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
        return freeze_result(out)  # pre-rmtree, executor-side
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


QUERIES["s13_stream_anomaly"] = QuerySpec(s13_stream_anomaly, A122_SQL)


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
    # ONE pass over the tiled baseline for per-bucket count + interior
    # bound (r17, guide §1.2 -- the s14 pattern: the former separate
    # bounds/n_base groupBys each re-ran the whole ntile pipeline);
    # <= 10 rows come back (the documented bounded driver fetch), so
    # n_base, the baseline total, and the bound literals all derive
    # from the same collect
    bstats = (
        tiled.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_base"),
            F.max("o_totalprice").alias("hi"),
        )
        .collect()
    )
    n_base = spark.createDataFrame(
        [(int(r["bucket"]), int(r["n_base"])) for r in bstats],
        "bucket int, n_base bigint",
    )
    blits = sorted(r["hi"] for r in bstats if r["bucket"] < _A139_BUCKETS)

    # assign the current half with a pure projection over the bound
    # literals (bucket = 1 + #bounds < price, capped -- the s14 form;
    # replaces a theta-join + per-order groupBy)
    bucket_expr = F.least(
        F.lit(1)
        + sum(
            (F.col("o_totalprice") > F.lit(b)).cast("int") for b in blits
        ),
        F.lit(_A139_BUCKETS),
    )
    n_cur = (
        cur.select(bucket_expr.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_cur"))
    )
    nb = sum(int(r["n_base"]) for r in bstats)
    tot = cur.agg(F.count(F.lit(1)).alias("nc")).select(
        F.lit(nb).cast("bigint").alias("nb"), "nc"
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


