"""Round-7 queries: distributed-tile reports, curation quality rules,
cohort/funnel analytics, exact grouped quantiles, and a streamed PSI.

a141 price decile report (distributed_ntile over the DATA-SIZED lineitem
frame -- the operator the round-7 a118/a139 fix introduced, exercised as
a first-class query), a142 intra-document repetition (Gopher/C4-style
duplicate-3-gram quality rule, computed entirely map-side), a143 monthly
cohort retention, a144 view->click->purchase funnel conversion, a145
ship-latency grouped exact percentiles (operators/ordering
grouped_exact_percentiles vs DuckDB quantile_cont), a146 supplier
revenue concentration (Herfindahl-Hirschman index per nation), a147
weekday seasonality indices, s14 streamed PSI (a139's report fed by
streamed current-half partials; shares a139's oracle verbatim, the
s13/a122 pattern), a148 quality-score calibration deciles
(distributed_ntile under heavy value ties), a149 inter-event dwell-time
p50/p90 per event type (user-keyed lag + grouped exact percentiles),
a150 growth accounting (new/retained/resurrected/churned stock-and-flow),
a151 train/test split leakage (md5 hash split + digest & long-gram
contamination probes), a152 per-source unigram KL drift (Laplace KL over
the floor vocabulary without a vocab x sources materialization), c57
bitemporal as-of lookup (transaction-time + valid-time point query),
a153 corpus distinct-n diversity, a154 int8 scalar-quantization error
(per-dim ranges broadcast, floor bucketing for cross-engine exactness),
c58 partition retention/expiry plan, a155 deterministic weighted
Bernoulli sample (salted-hash threshold), a156 bigram conditional
entropy / perplexity per language, c59 CDC replay-idempotence audit
(same batch applied twice must land on the same checksum).

All floats follow the repo rule (``_util`` docstring): per-term
``round(expr, 9)`` -> exact ``DECIMAL(28,9)`` sums (order-independent)
-> final ``round(., 6)``; decimal PRODUCTS cast operands before
multiplying.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import dsum, load_table

QUERIES: dict[str, QuerySpec] = {}

_DEC = "decimal(28,9)"


# ---------------------------------------------------------------------------
# a141 -- price decile report: distributed_ntile over the raw lineitem
# frame (data-sized -- exactly the shape the unpartitioned-window plan
# gate forbids; the two-level value rank makes it scale-safe)
# ---------------------------------------------------------------------------


def a141_price_decile_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import distributed_ntile

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    tiled = distributed_ntile(
        li,
        10,
        "l_extendedprice",
        tie_cols=["l_orderkey", "l_linenumber"],
        tile_col="decile",
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
        dsum("l_extendedprice").alias("sum_price"),
    )


A141_SQL = """
WITH tiled AS (
  SELECT l_extendedprice,
         ntile(10) OVER (ORDER BY l_extendedprice ASC, l_orderkey ASC,
                         l_linenumber ASC) AS decile
  FROM lineitem
)
SELECT decile, count(*) AS n_rows,
       min(l_extendedprice) AS lo, max(l_extendedprice) AS hi,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
         AS sum_price
FROM tiled GROUP BY decile
"""

QUERIES["a141_price_decile_report"] = QuerySpec(
    a141_price_decile_report, A141_SQL
)


# ---------------------------------------------------------------------------
# a142 -- intra-document repetition: duplicate-3-gram fraction per doc
# (the Gopher/C4 repetition quality rule), rolled up per language.  The
# gram arrays never explode: total and distinct gram counts are two
# ``size()`` calls in ONE projection, so the whole rule is map-side and
# the only shuffle is the per-language rollup.
# ---------------------------------------------------------------------------

_A142_N = 3
_A142_FLAG = 0.2  # dup fraction above which a doc is repetition-flagged


def a142_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    grams = word_ngrams(toks, _A142_N)
    n_g = F.size(grams)
    d_g = F.size(F.array_distinct(grams))
    dup = F.round(
        F.lit(1.0) - d_g.cast("double") / n_g.cast("double"), 9
    )
    per_doc = d.select("lang", dup.alias("dup_frac"))
    return per_doc.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.col("dup_frac").cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_dup_frac"),
        F.sum(
            F.when(F.col("dup_frac") > _A142_FLAG, 1).otherwise(0)
        ).alias("n_flagged"),
    )


A142_SQL = f"""
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT lang,
         list_transform(generate_series(1, greatest(len(t) - {_A142_N - 1}, 1)),
                        i -> array_to_string(t[i:i+{_A142_N - 1}], ' ')) AS g
  FROM toks
), per_doc AS (
  SELECT lang,
         round(1.0 - CAST(len(list_distinct(g)) AS DOUBLE)
                     / CAST(len(g) AS DOUBLE), 9) AS dup_frac
  FROM grams
)
SELECT lang, count(*) AS n_docs,
       round(CAST(sum(CAST(dup_frac AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS mean_dup_frac,
       sum(CASE WHEN dup_frac > {_A142_FLAG} THEN 1 ELSE 0 END) AS n_flagged
FROM per_doc GROUP BY lang
"""

QUERIES["a142_doc_repetition"] = QuerySpec(a142_doc_repetition, A142_SQL)


# ---------------------------------------------------------------------------
# a143 -- monthly cohort retention: customers grouped by first-order
# month; share still ordering k months later.  Month arithmetic is pure
# integers (year*12 + month-1) so both engines cut identical cohorts.
# ---------------------------------------------------------------------------

_A143_MAX_K = 6


def a143_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
    ).distinct()  # one row per (customer, active month)
    first = om.groupBy("o_custkey").agg(F.min("m").alias("m0"))
    sizes = first.groupBy("m0").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    act = (
        om.join(first, "o_custkey")
        .select("m0", (F.col("m") - F.col("m0")).alias("months_since"))
        .where(F.col("months_since") <= _A143_MAX_K)
        .groupBy("m0", "months_since")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    return act.join(F.broadcast(sizes), "m0").select(
        F.format_string(
            "%04d-%02d", (F.col("m0") / 12).cast("int"), F.col("m0") % 12 + 1
        ).alias("cohort_month"),
        "months_since",
        "n_active",
        "cohort_size",
        F.round(F.col("n_active") / F.col("cohort_size"), 6).alias(
            "retention"
        ),
    )


A143_SQL = f"""
WITH om AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
), first AS (
  SELECT o_custkey, min(m) AS m0 FROM om GROUP BY 1
), sizes AS (
  SELECT m0, count(*) AS cohort_size FROM first GROUP BY 1
), act AS (
  SELECT f.m0, om.m - f.m0 AS months_since, count(*) AS n_active
  FROM om JOIN first f USING (o_custkey)
  WHERE om.m - f.m0 <= {_A143_MAX_K}
  GROUP BY 1, 2
)
SELECT printf('%04d-%02d', a.m0 // 12, a.m0 % 12 + 1) AS cohort_month,
       a.months_since, a.n_active, s.cohort_size,
       round(CAST(a.n_active AS DOUBLE) / s.cohort_size, 6) AS retention
FROM act a JOIN sizes s USING (m0)
"""

QUERIES["a143_cohort_retention"] = QuerySpec(a143_cohort_retention, A143_SQL)


# ---------------------------------------------------------------------------
# a144 -- ordered funnel conversion: users whose first view precedes
# their first click precedes their first purchase.  ONE groupBy(user)
# with conditional min-timestamps, then a 1-row fold -- no joins, no
# windows, no per-step passes.
# ---------------------------------------------------------------------------


def a144_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    per_user = (
        e.where(F.col("event_type").isin("view", "click", "purchase"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("t_v"),
            F.min(
                F.when(F.col("event_type") == "click", F.col("ts"))
            ).alias("t_c"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_p"),
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("t_v").isNotNull(), 1).otherwise(0)).alias(
            "n_viewers"
        ),
        F.sum(
            F.when(F.col("t_v") < F.col("t_c"), 1).otherwise(0)
        ).alias("n_view_click"),
        F.sum(
            F.when(
                (F.col("t_v") < F.col("t_c")) & (F.col("t_c") < F.col("t_p")),
                1,
            ).otherwise(0)
        ).alias("n_full_funnel"),
    )
    return agg.select(
        "n_viewers",
        "n_view_click",
        "n_full_funnel",
        F.round(F.col("n_view_click") / F.col("n_viewers"), 6).alias(
            "click_rate"
        ),
        F.round(F.col("n_full_funnel") / F.col("n_viewers"), 6).alias(
            "funnel_rate"
        ),
    )


A144_SQL = """
WITH per_user AS (
  SELECT user_id,
         min(CASE WHEN event_type = 'view' THEN ts END) AS t_v,
         min(CASE WHEN event_type = 'click' THEN ts END) AS t_c,
         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_p
  FROM events
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
), agg AS (
  SELECT sum(CASE WHEN t_v IS NOT NULL THEN 1 ELSE 0 END) AS n_viewers,
         sum(CASE WHEN t_v < t_c THEN 1 ELSE 0 END) AS n_view_click,
         sum(CASE WHEN t_v < t_c AND t_c < t_p THEN 1 ELSE 0 END)
           AS n_full_funnel
  FROM per_user
)
SELECT n_viewers, n_view_click, n_full_funnel,
       round(CAST(n_view_click AS DOUBLE) / n_viewers, 6) AS click_rate,
       round(CAST(n_full_funnel AS DOUBLE) / n_viewers, 6) AS funnel_rate
FROM agg
"""

QUERIES["a144_funnel_conversion"] = QuerySpec(a144_funnel_conversion, A144_SQL)


# ---------------------------------------------------------------------------
# a145 -- ship-latency exact grouped percentiles: p25/p50/p90 of
# (shipdate - orderdate) days per linestatus, via the declarative
# grouped_exact_percentiles construction (no per-group value buffers) --
# bit-identical to DuckDB's quantile_cont.
# ---------------------------------------------------------------------------

_A145_QS = [0.25, 0.5, 0.9]


def a145_ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import grouped_exact_percentiles

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = li.join(
        o.select(F.col("o_orderkey").alias("l_orderkey"), "o_orderdate"),
        "l_orderkey",
    ).select(
        "l_linestatus",
        F.datediff(
            F.to_date("l_shipdate"), F.to_date("o_orderdate")
        ).alias("lat_days"),
    )
    out = grouped_exact_percentiles(lat, ["l_linestatus"], "lat_days", _A145_QS)
    return out.select(
        "l_linestatus",
        "q",
        F.round("value", 6).alias("lat_days_q"),
    )


A145_SQL = """
WITH lat AS (
  SELECT l_linestatus,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE))
           AS lat_days
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
SELECT l_linestatus, CAST(0.25 AS DOUBLE) AS q,
       round(quantile_cont(lat_days, 0.25), 6) AS lat_days_q
FROM lat GROUP BY 1
UNION ALL
SELECT l_linestatus, CAST(0.5 AS DOUBLE) AS q,
       round(quantile_cont(lat_days, 0.5), 6) AS lat_days_q
FROM lat GROUP BY 1
UNION ALL
SELECT l_linestatus, CAST(0.9 AS DOUBLE) AS q,
       round(quantile_cont(lat_days, 0.9), 6) AS lat_days_q
FROM lat GROUP BY 1
"""

QUERIES["a145_ship_latency_quantiles"] = QuerySpec(
    a145_ship_latency_quantiles, A145_SQL
)


# ---------------------------------------------------------------------------
# a146 -- supplier revenue concentration per nation: Herfindahl-Hirschman
# index over supplier revenue shares.  Two chained aggregations (supplier
# rollup -> nation rollup); the share terms follow the decimal-product +
# round-9 decimal-sum discipline.
# ---------------------------------------------------------------------------


def a146_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.join(
            F.broadcast(
                s.select(
                    F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
                )
            ),
            "l_suppkey",
        )
        .join(
            F.broadcast(
                n.select(F.col("n_nationkey").alias("s_nationkey"), "n_name")
            ),
            "s_nationkey",
        )
        .groupBy("n_name", "l_suppkey")
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
            ).alias("sup_rev")
        )
    )
    nat = rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("sup_rev").alias("nat_rev"),
        F.max("sup_rev").alias("top_rev"),
    )
    shares = rev.join(F.broadcast(nat.select("n_name", "nat_rev")), "n_name")
    hhi = shares.groupBy("n_name").agg(
        F.sum(
            F.round(
                (
                    F.col("sup_rev").cast("double")
                    / F.col("nat_rev").cast("double")
                )
                * (
                    F.col("sup_rev").cast("double")
                    / F.col("nat_rev").cast("double")
                ),
                9,
            ).cast(_DEC)
        )
        .cast("double")
        .alias("hhi_raw")
    )
    return nat.join(F.broadcast(hhi), "n_name").select(
        "n_name",
        "n_suppliers",
        F.round(
            F.col("top_rev").cast("double") / F.col("nat_rev").cast("double"),
            6,
        ).alias("top_share"),
        F.round("hhi_raw", 6).alias("hhi"),
    )


A146_SQL = """
WITH rev AS (
  SELECT n.n_name, l.l_suppkey,
         sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
             * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS sup_rev
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  GROUP BY 1, 2
), nat AS (
  SELECT n_name, count(*) AS n_suppliers, sum(sup_rev) AS nat_rev,
         max(sup_rev) AS top_rev
  FROM rev GROUP BY 1
), hhi AS (
  SELECT r.n_name,
         CAST(sum(CAST(round((CAST(r.sup_rev AS DOUBLE)
                              / CAST(t.nat_rev AS DOUBLE))
                             * (CAST(r.sup_rev AS DOUBLE)
                                / CAST(t.nat_rev AS DOUBLE)), 9)
                       AS DECIMAL(28,9))) AS DOUBLE) AS hhi_raw
  FROM rev r JOIN nat t USING (n_name)
  GROUP BY 1
)
SELECT n.n_name, n.n_suppliers,
       round(CAST(n.top_rev AS DOUBLE) / CAST(n.nat_rev AS DOUBLE), 6)
         AS top_share,
       round(h.hhi_raw, 6) AS hhi
FROM nat n JOIN hhi h USING (n_name)
"""

QUERIES["a146_hhi_concentration"] = QuerySpec(a146_hhi_concentration, A146_SQL)


# ---------------------------------------------------------------------------
# a147 -- weekday seasonality indices: average daily event volume per
# weekday relative to the overall daily average.  One day-grain
# aggregation; everything after runs on the <=7-row weekday frame.
# ---------------------------------------------------------------------------


def a147_weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import day_str

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(day_str("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wk = daily.select(
        F.date_format(F.to_date("day", "yyyyMMdd"), "EEEE").alias("weekday"),
        "n",
    )
    per_wd = wk.groupBy("weekday").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("n_events"),
    )
    overall = daily.agg(
        F.sum("n").alias("tot_events"), F.count(F.lit(1)).alias("tot_days")
    )
    return per_wd.crossJoin(F.broadcast(overall)).select(
        "weekday",
        "n_days",
        "n_events",
        F.round(F.col("n_events") / F.col("n_days"), 6).alias("daily_avg"),
        F.round(
            (F.col("n_events") / F.col("n_days"))
            / (F.col("tot_events") / F.col("tot_days")),
            6,
        ).alias("seasonal_index"),
    )


A147_SQL = """
WITH daily AS (
  SELECT strftime(ts, '%Y%m%d') AS day, count(*) AS n
  FROM events GROUP BY 1
), wk AS (
  SELECT strftime(strptime(day, '%Y%m%d'), '%A') AS weekday, n FROM daily
), per_wd AS (
  SELECT weekday, count(*) AS n_days, sum(n) AS n_events
  FROM wk GROUP BY 1
), overall AS (
  SELECT sum(n) AS tot_events, count(*) AS tot_days FROM daily
)
SELECT weekday, n_days, n_events,
       round(CAST(n_events AS DOUBLE) / n_days, 6) AS daily_avg,
       round((CAST(n_events AS DOUBLE) / n_days)
             / (CAST(tot_events AS DOUBLE) / tot_days), 6) AS seasonal_index
FROM per_wd CROSS JOIN overall
"""

QUERIES["a147_weekday_seasonality"] = QuerySpec(
    a147_weekday_seasonality, A147_SQL
)


# ---------------------------------------------------------------------------
# s14 -- streamed PSI: a139's drift report with the CURRENT half's bucket
# counts maintained by a streaming count-partials job (the s13/a122
# pattern: identical scoring, one shared oracle).  Decile bounds come
# from the batch baseline via distributed_ntile; the stream assigns
# buckets with a pure projection over the <=9 broadcast bound literals
# (a documented bounded collect), so the stream side never joins.
# ---------------------------------------------------------------------------


def s14_stream_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from ..operators.ordering import distributed_ntile
    from ..streaming.jobs import stream_count_partials
    from .round6 import _A139_BUCKETS, _psi_report

    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice"
    )
    cur = o.where(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice"
    )
    tiled = distributed_ntile(
        base, _A139_BUCKETS, "o_totalprice", tie_cols=["o_orderkey"],
        tile_col="bucket",
    ).select("o_totalprice", "bucket")
    n_base = tiled.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_base"))
    # <=9 interior bounds: a bounded driver fetch (documented), turned
    # into literals so the streaming side is a pure projection
    bounds = sorted(
        r["hi"]
        for r in tiled.where(F.col("bucket") < _A139_BUCKETS)
        .groupBy("bucket")
        .agg(F.max("o_totalprice").alias("hi"))
        .collect()
    )
    bucket_expr = F.least(
        F.lit(1)
        + sum(
            (F.col("o_totalprice") > F.lit(b)).cast("int") for b in bounds
        ),
        F.lit(_A139_BUCKETS),
    )
    scratch = tempfile.mkdtemp(prefix="ods_spark_s14_")
    try:
        src = f"{scratch}/src"
        cur.repartition(4).write.parquet(src)
        stream = (
            spark.readStream.schema("o_orderkey long, o_totalprice double")
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .select(bucket_expr.alias("bucket"))
        )
        store = f"{scratch}/partials"
        q = (
            stream_count_partials(stream, store, ["bucket"])
            .trigger(availableNow=True)
            .option("checkpointLocation", f"{scratch}/ckpt")
            .start()
        )
        q.awaitTermination()
        n_cur = (
            spark.read.parquet(store)
            .groupBy("bucket")
            .agg(F.sum("cnt").alias("n_cur"))
        )
        tot = base.agg(F.count(F.lit(1)).alias("nb")).crossJoin(
            cur.agg(F.count(F.lit(1)).alias("nc"))
        )
        out = _psi_report(n_base, n_cur, tot)
        rows = out.collect()  # materialize before rmtree (documented)
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)


from .round6 import A139_SQL as _A139_SQL_SHARED  # noqa: E402

QUERIES["s14_stream_psi"] = QuerySpec(s14_stream_psi, _A139_SQL_SHARED)


# ---------------------------------------------------------------------------
# a148 -- quality-score calibration: docs bucketed into score deciles
# (distributed_ntile again, this time with HEAVY ties -- uniq_ratio is a
# ratio of small ints, so whole value groups straddle tile boundaries),
# then per-decile English rate vs mean score.
# ---------------------------------------------------------------------------


def a148_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import distributed_ntile

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double")
    )
    scored = d.select(
        "doc_id", score.alias("score"), (F.col("lang") == "en").alias("is_en")
    )
    tiled = distributed_ntile(
        scored, 10, "score", tie_cols=["doc_id"], tile_col="decile"
    )
    return tiled.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(
            F.sum(F.round("score", 9).cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_score"),
        F.round(
            F.sum(F.when(F.col("is_en"), 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("en_rate"),
    )


A148_SQL = """
WITH scored AS (
  SELECT doc_id,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS score,
         lang = 'en' AS is_en
  FROM documents
), tiled AS (
  SELECT score, is_en,
         ntile(10) OVER (ORDER BY score ASC, doc_id ASC) AS decile
  FROM scored
)
SELECT decile, count(*) AS n_docs,
       round(CAST(sum(CAST(round(score, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS mean_score,
       round(CAST(sum(CASE WHEN is_en THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS en_rate
FROM tiled GROUP BY decile
"""

QUERIES["a148_quality_calibration"] = QuerySpec(
    a148_quality_calibration, A148_SQL
)


# ---------------------------------------------------------------------------
# a149 -- inter-event dwell time: per-user gap to the previous event
# (lag over the user partition -- the window is keyed, never global),
# then exact p50/p90 of the gap per event type via
# grouped_exact_percentiles.  Millisecond integers in both engines
# (unix_millis / epoch_ms both truncate microseconds identically).
# ---------------------------------------------------------------------------

_A149_QS = [0.5, 0.9]


def a149_dwell_time_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.ordering import grouped_exact_percentiles

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = (
        e.select(
            "event_type",
            (
                F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w))
            ).alias("gap_ms"),
        )
        .where(F.col("gap_ms").isNotNull())
    )
    out = grouped_exact_percentiles(gaps, ["event_type"], "gap_ms", _A149_QS)
    return out.select(
        "event_type", "q", F.round("value", 6).alias("gap_ms_q")
    )


A149_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch_ms(ts) - epoch_ms(lag(ts) OVER (PARTITION BY user_id
                                               ORDER BY ts ASC,
                                               event_id ASC)) AS gap_ms
  FROM events
)
SELECT event_type, CAST(0.5 AS DOUBLE) AS q,
       round(quantile_cont(gap_ms, 0.5), 6) AS gap_ms_q
FROM gaps WHERE gap_ms IS NOT NULL GROUP BY 1
UNION ALL
SELECT event_type, CAST(0.9 AS DOUBLE) AS q,
       round(quantile_cont(gap_ms, 0.9), 6) AS gap_ms_q
FROM gaps WHERE gap_ms IS NOT NULL GROUP BY 1
"""

QUERIES["a149_dwell_time_quantiles"] = QuerySpec(
    a149_dwell_time_quantiles, A149_SQL
)


# ---------------------------------------------------------------------------
# a150 -- growth accounting: each (customer, active month) classified as
# new / retained / resurrected from the customer's previous active month
# (user-keyed lag window); churned(m) = active(m-1) - retained(m), via a
# month-on-month equi-join of the monthly aggregate (no calendar-frame
# window).  The standard stock-and-flow decomposition of an active base.
# ---------------------------------------------------------------------------


def a150_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    om = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("m"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("m")
    staged = om.select(
        "m",
        F.lag("m").over(w).alias("prev"),
    ).select(
        "m",
        F.when(F.col("prev").isNull(), F.lit("new"))
        .when(F.col("m") - F.col("prev") == 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("state"),
    )
    monthly = staged.groupBy("m").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("state") == "new", 1).otherwise(0)).alias("n_new"),
        F.sum(
            F.when(F.col("state") == "retained", 1).otherwise(0)
        ).alias("n_retained"),
        F.sum(
            F.when(F.col("state") == "resurrected", 1).otherwise(0)
        ).alias("n_resurrected"),
    )
    prev = monthly.select(
        (F.col("m") + 1).alias("m"), F.col("n_active").alias("prev_active")
    )
    return monthly.join(prev, "m", "left").select(
        F.format_string(
            "%04d-%02d", (F.col("m") / 12).cast("int"), F.col("m") % 12 + 1
        ).alias("month"),
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        (
            F.coalesce("prev_active", F.lit(0)) - F.col("n_retained")
        ).alias("n_churned"),
    )


A150_SQL = """
WITH om AS (
  SELECT DISTINCT o_custkey,
         year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
  FROM orders
), staged AS (
  SELECT m,
         CASE WHEN prev IS NULL THEN 'new'
              WHEN m - prev = 1 THEN 'retained'
              ELSE 'resurrected' END AS state
  FROM (SELECT m, lag(m) OVER (PARTITION BY o_custkey ORDER BY m) AS prev
        FROM om)
), monthly AS (
  SELECT m, count(*) AS n_active,
         sum(CASE WHEN state = 'new' THEN 1 ELSE 0 END) AS n_new,
         sum(CASE WHEN state = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         sum(CASE WHEN state = 'resurrected' THEN 1 ELSE 0 END)
           AS n_resurrected
  FROM staged GROUP BY m
)
SELECT printf('%04d-%02d', c.m // 12, c.m % 12 + 1) AS month,
       c.n_active, c.n_new, c.n_retained, c.n_resurrected,
       coalesce(p.n_active, 0) - c.n_retained AS n_churned
FROM monthly c LEFT JOIN monthly p ON p.m = c.m - 1
"""

QUERIES["a150_growth_accounting"] = QuerySpec(a150_growth_accounting, A150_SQL)


# ---------------------------------------------------------------------------
# a151 -- train/test split leakage: after the production md5 hash split
# (c11's bucketing, not a modulo), how much test data leaks from train?
# Two signals: exact text-digest collisions and shared long (8-token)
# n-grams -- the near-verbatim overlap a contamination scan looks for.
# Gram frames are doc-distinct shingles; both membership probes are
# left_semi equi-joins on gram/digest, never row pairs.
# ---------------------------------------------------------------------------

_A151_N = 8


def a151_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.split import hash_split

    d = load_table(spark, sf_dir, "documents")
    # the split frame feeds 5 consumers and the 8-gram explode feeds 2 --
    # checkpoint both so the scan+md5 and the shingle Generate run once
    # (the a118/distributed_ntile shared-frame discipline)
    s = hash_split(d, {"train": 0.9, "test": 0.1}).localCheckpoint(
        eager=False
    )
    dig = s.select("doc_id", "split", F.md5("text").alias("dg"))
    tr_dg = dig.where(F.col("split") == "train").select("dg").distinct()
    te_dg = dig.where(F.col("split") == "test")
    exact = (
        te_dg.join(tr_dg, "dg", "left_semi")
        .agg(F.count(F.lit(1)).alias("n_test_exact_dup"))
    )
    sh = shingles(s, "doc_id", "text", _A151_N)
    sh = sh.join(s.select("doc_id", "split"), "doc_id").localCheckpoint(
        eager=False
    )
    tr_g = sh.where(F.col("split") == "train").select("gram").distinct()
    te_hit = (
        sh.where(F.col("split") == "test")
        .join(tr_g, "gram", "left_semi")
        .select("doc_id")
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_test_gram_hit"))
    )
    counts = s.groupBy().agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias(
            "n_train"
        ),
        F.sum(F.when(F.col("split") == "test", 1).otherwise(0)).alias(
            "n_test"
        ),
    )
    return (
        counts.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(te_hit))
        .select(
            "n_train",
            "n_test",
            "n_test_exact_dup",
            "n_test_gram_hit",
            F.round(F.col("n_test_gram_hit") / F.col("n_test"), 6).alias(
                "gram_leak_rate"
            ),
        )
    )


_A151_NIB = (
    "(CASE WHEN ascii(substr(hh,{i},1)) >= 97 THEN ascii(substr(hh,{i},1))-87 "
    "ELSE ascii(substr(hh,{i},1))-48 END)"
)

A151_SQL = f"""
WITH h AS (
  SELECT doc_id, text,
         md5('split|' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
), s AS (
  SELECT doc_id, text,
         CASE WHEN {_A151_NIB.format(i=1)} * 16 + {_A151_NIB.format(i=2)}
                   < 230.4
              THEN 'train' ELSE 'test' END AS split
  FROM h
), dig AS (
  SELECT doc_id, split, md5(text) AS dg FROM s
), exact AS (
  SELECT count(*) AS n_test_exact_dup
  FROM dig t
  WHERE split = 'test'
    AND dg IN (SELECT dg FROM dig WHERE split = 'train')
), grams AS (
  SELECT doc_id, split, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - {_A151_N - 1}, 1)),
                   i -> array_to_string(t[i:i+{_A151_N - 1}], ' ')))) AS gram
  FROM (SELECT doc_id, split, string_split(text, ' ') AS t FROM s)
), te_hit AS (
  SELECT count(DISTINCT g.doc_id) AS n_test_gram_hit
  FROM grams g
  WHERE g.split = 'test'
    AND g.gram IN (SELECT gram FROM grams WHERE split = 'train')
), counts AS (
  SELECT sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS n_train,
         sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS n_test
  FROM s
)
SELECT n_train, n_test, n_test_exact_dup, n_test_gram_hit,
       round(CAST(n_test_gram_hit AS DOUBLE) / n_test, 6) AS gram_leak_rate
FROM counts CROSS JOIN exact CROSS JOIN te_hit
"""

QUERIES["a151_split_leakage"] = QuerySpec(a151_split_leakage, A151_SQL)


# ---------------------------------------------------------------------------
# a152 -- per-source unigram KL drift vs the corpus: Laplace-smoothed
# KL(P_source || Q_corpus) over the min_freq>=2 vocabulary, WITHOUT
# materializing |vocab| x |sources| rows.  The trick: missing tokens
# share ONE smoothed probability p0 per source, so their contribution is
# p0 * ((V - V_s) * ln(p0) - (L_all - L_s)) where L_all / L_s are
# (corpus / present-token) sums of round(ln q, 9) -- everything reduces
# to per-source aggregates plus one corpus-constant frame.
# ---------------------------------------------------------------------------


def a152_source_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "source", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    vocab = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
    )
    corpus = vocab.agg(
        F.sum("c").alias("n_corpus"), F.count(F.lit(1)).alias("v")
    )
    vq = vocab.crossJoin(F.broadcast(corpus)).select(
        "tok",
        F.round(
            F.log(
                (F.col("c") + 1).cast("double")
                / (F.col("n_corpus") + F.col("v")).cast("double")
            ),
            9,
        ).alias("lnq"),
    )
    l_all = vq.agg(
        F.sum(F.col("lnq").cast(_DEC)).cast("double").alias("l_all")
    )
    st = (
        toks.groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cs"))
        .join(vq, "tok")  # vocab membership + ln q in one equi-join
    )
    totals = st.groupBy("source").agg(
        F.sum("cs").alias("n_s"), F.count(F.lit(1)).alias("v_s")
    )
    terms = st.join(F.broadcast(totals), "source").crossJoin(
        F.broadcast(corpus)
    )
    p_s = (F.col("cs") + 1).cast("double") / (
        F.col("n_s") + F.col("v")
    ).cast("double")
    present = terms.groupBy("source").agg(
        F.sum(
            F.round(p_s * (F.log(p_s) - F.col("lnq")), 9).cast(_DEC)
        )
        .cast("double")
        .alias("present_sum"),
        F.sum(F.col("lnq").cast(_DEC)).cast("double").alias("l_s"),
    )
    out = (
        totals.join(present, "source")
        .crossJoin(F.broadcast(corpus))
        .crossJoin(F.broadcast(l_all))
    )
    p0 = F.lit(1.0) / (F.col("n_s") + F.col("v")).cast("double")
    missing = p0 * (
        (F.col("v") - F.col("v_s")).cast("double") * F.log(p0)
        - (F.col("l_all") - F.col("l_s"))
    )
    return out.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        F.col("v_s").alias("vocab_used"),
        F.round(F.col("present_sum") + missing, 6).alias("kl_vs_corpus"),
    )


A152_SQL = """
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
), toks2 AS (
  SELECT source, tok FROM toks WHERE tok <> ''
), vocab AS (
  SELECT tok, count(*) AS c FROM toks2 GROUP BY 1 HAVING count(*) >= 2
), corpus AS (
  SELECT sum(c) AS n_corpus, count(*) AS v FROM vocab
), vq AS (
  SELECT tok,
         round(ln(CAST(c + 1 AS DOUBLE) / CAST(n_corpus + v AS DOUBLE)), 9)
           AS lnq
  FROM vocab CROSS JOIN corpus
), l_all AS (
  SELECT CAST(sum(CAST(lnq AS DECIMAL(28,9))) AS DOUBLE) AS l_all FROM vq
), st AS (
  SELECT t.source, t.tok, count(*) AS cs
  FROM toks2 t JOIN vocab USING (tok)
  GROUP BY 1, 2
), st2 AS (
  SELECT st.source, st.cs, vq.lnq FROM st JOIN vq USING (tok)
), totals AS (
  SELECT source, sum(cs) AS n_s, count(*) AS v_s FROM st2 GROUP BY 1
), present AS (
  SELECT s.source,
         CAST(sum(CAST(round(
             (CAST(s.cs + 1 AS DOUBLE) / CAST(t.n_s + c.v AS DOUBLE))
             * (ln(CAST(s.cs + 1 AS DOUBLE) / CAST(t.n_s + c.v AS DOUBLE))
                - s.lnq), 9) AS DECIMAL(28,9))) AS DOUBLE) AS present_sum,
         CAST(sum(CAST(s.lnq AS DECIMAL(28,9))) AS DOUBLE) AS l_s
  FROM st2 s JOIN totals t USING (source) CROSS JOIN corpus c
  GROUP BY 1
)
SELECT t.source, t.n_s AS n_tokens, t.v_s AS vocab_used,
       round(p.present_sum
             + (1.0 / CAST(t.n_s + c.v AS DOUBLE))
               * (CAST(c.v - t.v_s AS DOUBLE)
                  * ln(1.0 / CAST(t.n_s + c.v AS DOUBLE))
                  - (la.l_all - p.l_s)), 6) AS kl_vs_corpus
FROM totals t
JOIN present p USING (source)
CROSS JOIN corpus c CROSS JOIN l_all la
"""

QUERIES["a152_source_kl_drift"] = QuerySpec(a152_source_kl_drift, A152_SQL)


# ---------------------------------------------------------------------------
# c57 -- bitemporal as-of lookup: "as KNOWN at T0, what version was VALID
# at V0" over a two-time-dimension version table (transaction time =
# record date, valid time = backdated effective date).  One filter + one
# customer-keyed argmax window -- the standard bitemporal point lookup,
# reconstructible for ANY (T0, V0) pair without mutating history.
# ---------------------------------------------------------------------------

_C57_T0 = "1997-06-30"  # as-known-at (transaction-time cutoff)
_C57_V0 = "1997-05-31"  # valid-at (effective-date cutoff)


def c57_bitemporal_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    versions = o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.to_date("o_orderdate").alias("tx_date"),
        F.date_sub(
            F.to_date("o_orderdate"), (F.col("o_orderkey") % 30).cast("int")
        ).alias("valid_from"),
    )
    eligible = versions.where(
        (F.col("tx_date") <= F.lit(_C57_T0))
        & (F.col("valid_from") <= F.lit(_C57_V0))
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("valid_from").desc(), F.col("o_orderkey").desc()
    )
    return (
        eligible.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("version_key"),
            F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
            "o_totalprice",
        )
    )


C57_SQL = f"""
WITH versions AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(o_orderdate AS DATE) AS tx_date,
         CAST(o_orderdate AS DATE) - CAST(o_orderkey % 30 AS INTEGER)
           AS valid_from
  FROM orders
), eligible AS (
  SELECT * FROM versions
  WHERE tx_date <= DATE '{_C57_T0}' AND valid_from <= DATE '{_C57_V0}'
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
                               ORDER BY valid_from DESC,
                               o_orderkey DESC) AS rn
  FROM eligible
)
SELECT o_custkey, o_orderkey AS version_key,
       strftime(valid_from, '%Y-%m-%d') AS valid_from, o_totalprice
FROM ranked WHERE rn = 1
"""

QUERIES["c57_bitemporal_asof"] = QuerySpec(c57_bitemporal_asof, C57_SQL)


# ---------------------------------------------------------------------------
# a153 -- corpus distinct-n diversity: distinct / total n-gram ratios at
# n = 1, 2, 3 (the standard generation-diversity metrics).  One explode +
# one exact-distinct aggregate per n over the whole corpus.
# ---------------------------------------------------------------------------


def a153_distinct_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    parts = []
    for n in (1, 2, 3):
        g = d.select(
            F.explode(word_ngrams(toks, n)).alias("gram")
        )
        parts.append(
            g.agg(
                F.lit(n).alias("n"),
                F.count(F.lit(1)).alias("total_grams"),
                F.countDistinct("gram").alias("distinct_grams"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "n",
        "total_grams",
        "distinct_grams",
        F.round(
            F.col("distinct_grams") / F.col("total_grams"), 6
        ).alias("distinct_ratio"),
    )


def _a153_cte(n: int) -> str:
    return f"""
  SELECT {n} AS n, count(*) AS total_grams,
         count(DISTINCT gram) AS distinct_grams
  FROM (
    SELECT unnest(list_transform(
      generate_series(1, greatest(len(t) - {n - 1}, 1)),
      i -> array_to_string(t[i:i+{n - 1}], ' '))) AS gram
    FROM (SELECT string_split(text, ' ') AS t FROM documents)
  )"""


A153_SQL = f"""
WITH u AS (
{_a153_cte(1)}
  UNION ALL
{_a153_cte(2)}
  UNION ALL
{_a153_cte(3)}
)
SELECT n, total_grams, distinct_grams,
       round(CAST(distinct_grams AS DOUBLE) / total_grams, 6)
         AS distinct_ratio
FROM u
"""

QUERIES["a153_distinct_ngram_diversity"] = QuerySpec(
    a153_distinct_ngram_diversity, A153_SQL
)


# ---------------------------------------------------------------------------
# a154 -- int8 scalar-quantization error: per-dimension min/max ranges
# (the 64-row frame broadcasts), 256-level floor bucketing with midpoint
# reconstruction, per-label MSE + max squared error.  floor() (not
# round(): Spark rounds half-up, DuckDB half-even) keeps the bucket
# assignment bit-identical across engines.
# ---------------------------------------------------------------------------


def a154_quantization_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    em = load_table(spark, sf_dir, "embeddings")
    dims = em.select(
        "label", F.posexplode("embedding").alias("dim", "v0")
    ).select("label", "dim", F.col("v0").cast("double").alias("x"))
    mm = dims.groupBy("dim").agg(
        F.min("x").alias("lo"), F.max("x").alias("hi")
    )
    j = dims.join(F.broadcast(mm), "dim")
    width = F.col("hi") - F.col("lo")
    q = F.when(width == 0, F.lit(0)).otherwise(
        F.least(
            F.lit(255),
            F.floor((F.col("x") - F.col("lo")) / width * 256).cast("int"),
        )
    )
    deq = F.when(width == 0, F.col("lo")).otherwise(
        F.col("lo") + (q.cast("double") + 0.5) * width / 256
    )
    err = F.round((F.col("x") - deq) * (F.col("x") - deq), 9)
    return (
        j.select("label", err.alias("e"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_values"),
            F.round(
                F.sum(F.col("e").cast(_DEC)).cast("double")
                / F.count(F.lit(1)),
                9,
            ).alias("mse"),
            F.round(F.max("e"), 9).alias("max_sq_err"),
        )
    )


A154_SQL = """
WITH dims AS (
  SELECT label, i - 1 AS dim, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
), mm AS (
  SELECT dim, min(x) AS lo, max(x) AS hi FROM dims GROUP BY dim
), e AS (
  SELECT label,
         round((x - CASE WHEN hi = lo THEN lo
                         ELSE lo + (least(255, CAST(floor((x - lo)
                                / (hi - lo) * 256) AS INTEGER)) + 0.5)
                              * (hi - lo) / 256 END)
               * (x - CASE WHEN hi = lo THEN lo
                           ELSE lo + (least(255, CAST(floor((x - lo)
                                  / (hi - lo) * 256) AS INTEGER)) + 0.5)
                                * (hi - lo) / 256 END), 9) AS e
  FROM dims JOIN mm USING (dim)
)
SELECT label, count(*) AS n_values,
       round(CAST(sum(CAST(e AS DECIMAL(28,9))) AS DOUBLE) / count(*), 9)
         AS mse,
       round(max(e), 9) AS max_sq_err
FROM e GROUP BY label
"""

QUERIES["a154_quantization_error"] = QuerySpec(
    a154_quantization_error, A154_SQL
)


# ---------------------------------------------------------------------------
# c58 -- partition retention/expiry plan: day partitions of orders under
# a "keep the last 90 days; keep first-of-month snapshots; expire the
# rest" policy.  One day-grain aggregate + a broadcast 1-row max-day
# frame -- the plan a table-maintenance service executes.
# ---------------------------------------------------------------------------

_C58_KEEP_DAYS = 90


def c58_retention_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._util import day_str

    o = load_table(spark, sf_dir, "orders")
    days = o.groupBy(day_str("o_orderdate").alias("day")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    anchor = days.agg(F.max("day").alias("max_day"))
    j = days.crossJoin(F.broadcast(anchor))
    recent = F.to_date("day", "yyyyMMdd") >= F.date_sub(
        F.to_date("max_day", "yyyyMMdd"), _C58_KEEP_DAYS
    )
    monthly = F.substring("day", 7, 2) == "01"
    action = (
        F.when(recent, F.lit("keep_recent"))
        .when(monthly, F.lit("keep_monthly"))
        .otherwise(F.lit("expire"))
    )
    return j.select("day", "n_rows", action.alias("action"))


C58_SQL = f"""
WITH days AS (
  SELECT strftime(o_orderdate, '%Y%m%d') AS day, count(*) AS n_rows
  FROM orders GROUP BY 1
), anchor AS (
  SELECT max(day) AS max_day FROM days
)
SELECT day, n_rows,
       CASE WHEN strptime(day, '%Y%m%d') >= strptime(max_day, '%Y%m%d')
                 - INTERVAL {_C58_KEEP_DAYS} DAY THEN 'keep_recent'
            WHEN substr(day, 7, 2) = '01' THEN 'keep_monthly'
            ELSE 'expire' END AS action
FROM days CROSS JOIN anchor
"""

QUERIES["c58_retention_expiry"] = QuerySpec(c58_retention_expiry, C58_SQL)


# ---------------------------------------------------------------------------
# a155 -- deterministic weighted Bernoulli sample: each doc kept with
# probability equal to its quality score, decided by a salted md5
# threshold (no RNG state, reproducible on any cluster layout, ~2e-10
# rate resolution).  Report realized vs expected keep rate per language.
# ---------------------------------------------------------------------------

_A155_SALT = "wsample"
_A155_SCALE = 4294967296.0  # 2^32: _u32's range


def a155_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import _u32

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.size(toks).cast("double")
    )
    scored = d.select("doc_id", "lang", score.alias("w"))
    kept = _u32(F.col("doc_id"), _A155_SALT) < F.floor(
        F.col("w") * _A155_SCALE
    ).cast("bigint")
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(kept.cast("int")).alias("n_sampled"),
        F.round(
            F.sum(kept.cast("int")) / F.count(F.lit(1)), 6
        ).alias("realized_rate"),
        F.round(
            F.sum(F.round("w", 9).cast(_DEC)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("expected_rate"),
    )


A155_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / CAST(len(string_split(text, ' ')) AS DOUBLE) AS w
  FROM documents
), flagged AS (
  SELECT lang, w,
         CASE WHEN CAST(('0x' || substr(md5('{_A155_SALT}|'
                    || CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                   < CAST(floor(w * {_A155_SCALE}) AS BIGINT)
              THEN 1 ELSE 0 END AS kept
  FROM scored
)
SELECT lang, count(*) AS n_docs, sum(kept) AS n_sampled,
       round(CAST(sum(kept) AS DOUBLE) / count(*), 6) AS realized_rate,
       round(CAST(sum(CAST(round(w, 9) AS DECIMAL(28,9))) AS DOUBLE)
             / count(*), 6) AS expected_rate
FROM flagged GROUP BY lang
"""

QUERIES["a155_weighted_sample"] = QuerySpec(a155_weighted_sample, A155_SQL)


# ---------------------------------------------------------------------------
# a156 -- bigram conditional entropy per language: H(next | cur) =
# -sum p(cur,next) ln(c(cur,next) / c(cur)), the text-predictability
# rung between a110's char entropy and a137's trigram LM.  Bigram and
# marginal counts share the (lang, cur) key prefix, so the conditional
# join co-locates with the count exchange.
# ---------------------------------------------------------------------------


def a156_bigram_cond_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import word_ngrams

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bi = (
        d.select("lang", F.explode(word_ngrams(toks, 2)).alias("gram"))
        .where(F.col("gram").contains(" "))  # drop short-doc partials
        .select(
            "lang",
            F.substring_index("gram", " ", 1).alias("cur"),
            F.substring_index("gram", " ", -1).alias("nxt"),
        )
    )
    pair = bi.groupBy("lang", "cur", "nxt").agg(
        F.count(F.lit(1)).alias("c2")
    )
    marg = pair.groupBy("lang", "cur").agg(F.sum("c2").alias("c1"))
    tot = pair.groupBy("lang").agg(F.sum("c2").alias("n"))
    terms = pair.join(marg, ["lang", "cur"]).join(F.broadcast(tot), "lang")
    term = F.round(
        (F.col("c2").cast("double") / F.col("n"))
        * F.log(F.col("c2").cast("double") / F.col("c1")),
        9,
    )
    return (
        terms.groupBy("lang")
        .agg(
            F.max("n").alias("n_bigrams"),
            (-F.sum(term.cast(_DEC)).cast("double")).alias("__h"),
        )
        .select(
            "lang",
            "n_bigrams",
            F.round("__h", 6).alias("h_cond"),
            F.round(F.exp("__h"), 6).alias("perplexity"),
        )
    )


A156_SQL = """
WITH toks AS (
  SELECT lang, string_split(text, ' ') AS t FROM documents
), bi AS (
  SELECT lang,
         string_split(gram, ' ')[1] AS cur,
         string_split(gram, ' ')[-1] AS nxt
  FROM (
    SELECT lang, unnest(list_transform(
      generate_series(1, greatest(len(t) - 1, 1)),
      i -> array_to_string(t[i:i+1], ' '))) AS gram
    FROM toks
  )
  WHERE contains(gram, ' ')
), pair AS (
  SELECT lang, cur, nxt, count(*) AS c2 FROM bi GROUP BY 1, 2, 3
), marg AS (
  SELECT lang, cur, sum(c2) AS c1 FROM pair GROUP BY 1, 2
), tot AS (
  SELECT lang, sum(c2) AS n FROM pair GROUP BY 1
), terms AS (
  SELECT p.lang,
         round((CAST(p.c2 AS DOUBLE) / t.n)
               * ln(CAST(p.c2 AS DOUBLE) / m.c1), 9) AS term,
         t.n
  FROM pair p
  JOIN marg m ON p.lang = m.lang AND p.cur = m.cur
  JOIN tot t ON p.lang = t.lang
)
SELECT lang, max(n) AS n_bigrams,
       round(-CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6)
         AS h_cond,
       round(exp(-CAST(sum(CAST(term AS DECIMAL(28,9))) AS DOUBLE)), 6)
         AS perplexity
FROM terms GROUP BY lang
"""

QUERIES["a156_bigram_cond_entropy"] = QuerySpec(
    a156_bigram_cond_entropy, A156_SQL
)


# ---------------------------------------------------------------------------
# c59 -- CDC replay idempotence audit: applying the SAME change batch
# twice must land on the SAME state (the at-least-once delivery
# invariant behind every foreachBatch merge sink).  Both applications
# run through operators/diff.apply_cdc; states compare by the
# order-independent XOR-of-row-digests checksum (c56's primitive).
# ---------------------------------------------------------------------------


def c59_cdc_replay_idempotence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.diff import apply_cdc
    from .round6 import _row_digest

    o = load_table(spark, sf_dir, "orders")
    base = o.where(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    changes = o.where(F.col("o_orderkey") % 3 == 0).select(
        "o_orderkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice").cast("decimal(18,2)") + 1)
        .cast("double")
        .alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 7 == 0, F.lit("D"))
        .otherwise(F.lit("U"))
        .alias("op"),
    )
    s1 = apply_cdc(base, changes, "o_orderkey")
    s2 = apply_cdc(s1, changes, "o_orderkey")

    def cs(df):
        return df.agg(
            F.bit_xor(
                _row_digest(
                    [
                        F.col("o_orderkey").cast("string"),
                        F.col("o_orderstatus"),
                        F.col("o_totalprice").cast("decimal(18,2)").cast(
                            "string"
                        ),
                    ]
                )
            ).alias("checksum"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    a = cs(s1).select(
        F.col("checksum").alias("checksum_once"),
        F.col("n_rows").alias("rows_once"),
    )
    b = cs(s2).select(
        F.col("checksum").alias("checksum_twice"),
        F.col("n_rows").alias("rows_twice"),
    )
    return a.crossJoin(F.broadcast(b)).select(
        "rows_once",
        "rows_twice",
        "checksum_once",
        (F.col("checksum_once") == F.col("checksum_twice")).alias(
            "idempotent"
        ),
        (F.col("rows_once") == F.col("rows_twice")).alias("counts_match"),
    )


C59_SQL = """
WITH state AS (
  SELECT o_orderkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey % 3 != 0
  UNION ALL
  SELECT o_orderkey, 'X' AS o_orderstatus,
         CAST(CAST(o_totalprice AS DECIMAL(18,2)) + 1 AS DOUBLE)
           AS o_totalprice
  FROM orders WHERE o_orderkey % 3 = 0 AND o_orderkey % 7 != 0
), cs AS (
  SELECT bit_xor(CAST(('0x' || substr(md5(concat_ws('|',
           coalesce(CAST(o_orderkey AS VARCHAR), chr(0) || 'NULL'),
           coalesce(o_orderstatus, chr(0) || 'NULL'),
           coalesce(CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR),
                    chr(0) || 'NULL'))), 1, 8)) AS BIGINT)) AS checksum,
         count(*) AS n_rows
  FROM state
)
SELECT n_rows AS rows_once, n_rows AS rows_twice,
       checksum AS checksum_once,
       TRUE AS idempotent, TRUE AS counts_match
FROM cs
"""

QUERIES["c59_cdc_replay_idempotence"] = QuerySpec(
    c59_cdc_replay_idempotence, C59_SQL
)
