"""Analytics queries, part two: curation / statistics / windows (a36-a64).

Split out of ``analytics.py`` in round 10 (VERDICT r9 task #7: no module
over 1500 LoC).  ``analytics.py`` keeps a01-a35 and the REGISTRATION
dict (whose literal order is the frozen first-50 driver contract), and
imports every name here; nothing else changes.  Families here: funnel /
cohort / window analytics (a36-a42, a58-a62) and LLM-curation operators
(sequence packing, deterministic shuffle, decontamination, repetition
stats, segment dedup, quality funnel, mixture sampling, TF-IDF, chunking,
bigram perplexity, vocab sizing: a43-a57, a63-a64).

Float rule: see ``analytics.py`` docstring (shared repo convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import dsum, load_table, ts_str

# ---------------------------------------------------------------------------
# a36 -- funnel analysis: view -> click-after-view -> purchase-after-click
# per user, reported as per-stage user counts.  Each stage is an agg + a
# key-join against the (shrinking) prior stage -- no event-level self-join
# across the full stream.
# ---------------------------------------------------------------------------


def a36_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prior: DataFrame) -> DataFrame:
        e = ev.where(F.col("event_type") == etype).select("user_id", "ts")
        j = e.join(prior, "user_id").where(F.col("ts") >= F.col("t0"))
        return j.groupBy("user_id").agg(F.min("ts").alias("t0"))

    views = (
        ev.where(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    clicks = first_after("click", views)
    purchases = first_after("purchase", clicks)
    stages = [("1_view", views), ("2_click", clicks), ("3_purchase", purchases)]
    out = None
    for name, df in stages:
        row = df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )
        out = row if out is None else out.unionByName(row)
    return out


A36_SQL = """
WITH v AS (
  SELECT user_id, min(ts) AS t0 FROM events WHERE event_type = 'view'
  GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t0
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t0
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t0
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t0
  GROUP BY e.user_id
)
SELECT '1_view' AS stage, (SELECT count(*) FROM v) AS n_users
UNION ALL SELECT '2_click', (SELECT count(*) FROM c)
UNION ALL SELECT '3_purchase', (SELECT count(*) FROM p)
"""


# ---------------------------------------------------------------------------
# a37 -- cohort retention: users bucketed by first-activity DAY, distinct
# active users per (cohort_day, activity_day) -- day grain because the
# synthetic event stream spans one month.  The standard retention matrix;
# the first-activity frame joins back broadcast-size.
# ---------------------------------------------------------------------------


def a37_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
    return (
        ev.join(first, "user_id")
        .groupBy(
            F.date_format("first_ts", "yyyy-MM-dd").alias("cohort_day"),
            F.date_format("ts", "yyyy-MM-dd").alias("activity_day"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


A37_SQL = """
WITH first AS (
  SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id
)
SELECT strftime(first_ts, '%Y-%m-%d') AS cohort_day,
       strftime(e.ts, '%Y-%m-%d') AS activity_day,
       count(DISTINCT e.user_id) AS n_users
FROM events e JOIN first USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# a38 -- array aggregation: the set of event types per user as a SORTED
# array (collect_set alone is partition-order-dependent; sort_array pins
# it), plus array functions over the result.
# ---------------------------------------------------------------------------


def a38_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The array is built and exercised (size / contains / element_at) but
    # serialized to a comma-joined string on output: the driver's pandas
    # canonicalizer cannot hash list cells (see a27).
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id")
        .agg(F.sort_array(F.collect_set("event_type")).alias("types_arr"))
        .select(
            "user_id",
            F.array_join("types_arr", ",").alias("types"),
            F.size("types_arr").alias("n_types"),
            F.array_contains("types_arr", "purchase").alias("has_purchase"),
            F.element_at("types_arr", 1).alias("first_type"),
        )
    )


A38_SQL = """
SELECT user_id,
       array_to_string(list_sort(list(DISTINCT event_type)), ',') AS types,
       len(list_sort(list(DISTINCT event_type))) AS n_types,
       list_contains(list(DISTINCT event_type), 'purchase') AS has_purchase,
       list_sort(list(DISTINCT event_type))[1] AS first_type
FROM events
GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# a39 -- histogram: fixed-width price buckets with explicit bounds.  Integer
# bucket arithmetic -> portable; the classic profiling/reporting shape.
# ---------------------------------------------------------------------------

_A39_WIDTH = 50000


def a39_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    b = F.floor(F.col("o_totalprice") / _A39_WIDTH).cast("long")
    return (
        o.groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.col("bucket") * _A39_WIDTH).cast("double").alias("lo"),
            ((F.col("bucket") + 1) * _A39_WIDTH).cast("double").alias("hi"),
            "n",
        )
    )


A39_SQL = f"""
SELECT bucket,
       CAST(bucket * {_A39_WIDTH} AS DOUBLE) AS lo,
       CAST((bucket + 1) * {_A39_WIDTH} AS DOUBLE) AS hi,
       n
FROM (
  SELECT CAST(floor(o_totalprice / {_A39_WIDTH}) AS BIGINT) AS bucket,
         count(*) AS n
  FROM orders GROUP BY 1
)
"""


# ---------------------------------------------------------------------------
# a40 -- time-RANGE window frame: rolling 7-day spend per customer.  RANGE
# (event-time) semantics differ from ROWS (a32) exactly when events are
# irregularly spaced -- the frame is "orders in the last 7 days", however
# many there are.  Epoch-second ordering keys make the frame arithmetic
# integer-exact and engine-portable.
# ---------------------------------------------------------------------------

_A40_WINDOW_S = 7 * 86400


def a40_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").withColumn(
        "ts_s", F.unix_timestamp("o_orderdate")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("ts_s")
        .rangeBetween(-_A40_WINDOW_S, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        ts_str("o_orderdate").alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("spend_7d"),
        F.count(F.lit(1)).over(w).alias("n_orders_7d"),
    )


A40_SQL = f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS spend_7d,
       COUNT(*) OVER w AS n_orders_7d
FROM (SELECT *, epoch(o_orderdate) AS ts_s FROM orders)
WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_s
             RANGE BETWEEN {_A40_WINDOW_S} PRECEDING AND CURRENT ROW)
"""


# ---------------------------------------------------------------------------
# a41 -- wide conditional aggregation (count_if / FILTER): per-priority
# status breakdown in ONE pass over orders -- the hand-rolled pivot that
# avoids a shuffle per status value.
# ---------------------------------------------------------------------------


def a41_conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    n_f = F.count_if(F.col("o_orderstatus") == "F")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            n_f.alias("n_f"),
            F.count_if(F.col("o_orderstatus") == "O").alias("n_o"),
            F.count_if(F.col("o_orderstatus") == "P").alias("n_p"),
            F.count(F.lit(1)).alias("n_total"),
            (n_f.cast("double") / F.count(F.lit(1))).alias("pct_f"),
        )
    )


A41_SQL = """
SELECT o_orderpriority,
       count(*) FILTER (WHERE o_orderstatus = 'F') AS n_f,
       count(*) FILTER (WHERE o_orderstatus = 'O') AS n_o,
       count(*) FILTER (WHERE o_orderstatus = 'P') AS n_p,
       count(*) AS n_total,
       CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS DOUBLE) / count(*)
         AS pct_f
FROM orders
GROUP BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# c15b (registered as a42) -- typed from_json parse: schema-on-read of the
# props JSON into a struct (vs a23's per-field get_json_object string
# extraction); malformed JSON yields a NULL struct, surfaced as a flag.
# ---------------------------------------------------------------------------


def a42_from_json_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "props_struct", F.from_json("props", "k INT")
    )
    return parsed.select(
        "event_id",
        F.col("props_struct.k").alias("k"),
        F.col("props_struct").isNull().alias("malformed"),
    ).where(F.col("k") >= 50)


A42_SQL = """
-- TRY_CAST: from_json('k INT') nulls non-numeric values; a plain CAST
-- would make DuckDB abort instead of comparing NULLs.
SELECT event_id,
       TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       false AS malformed
FROM events
WHERE TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
"""


# ---------------------------------------------------------------------------
# a43 -- sequence packing (concat-and-chunk): per-shard token streams cut
# every ctx_len tokens; chunk assignment is integer arithmetic over a
# cumulative window -> portable.  Sharding keeps the window distributed.
# ---------------------------------------------------------------------------

_A43_CTX = 512


def a43_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences
    from ..operators.text import token_count_bpe

    d = load_table(spark, sf_dir, "documents")
    toks = token_count_bpe(d).select(
        "doc_id", (F.col("doc_id") % 8).alias("shard"), "n_bpe_tokens"
    )
    packed = pack_sequences(
        toks, "doc_id", "n_bpe_tokens", _A43_CTX, shard_col="shard"
    )
    return packed.select(
        "doc_id", "shard", "n_bpe_tokens",
        "stream_offset", "chunk_id", "chunk_id_end", "spans_boundary",
    )


A43_SQL = f"""
WITH toks AS (
  SELECT doc_id, doc_id % 8 AS shard,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
           AS n_bpe_tokens
  FROM documents
), packed AS (
  -- CAST: DuckDB windowed SUM(int) -> HUGEINT; Spark emits bigint
  SELECT doc_id, shard, n_bpe_tokens,
         CAST(COALESCE(SUM(n_bpe_tokens) OVER (
             PARTITION BY shard ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS stream_offset
  FROM toks
)
SELECT doc_id, shard, n_bpe_tokens, stream_offset,
       CAST(floor(stream_offset / {_A43_CTX}) AS BIGINT) AS chunk_id,
       CAST(floor((stream_offset + greatest(n_bpe_tokens, 1) - 1)
                  / {_A43_CTX}) AS BIGINT) AS chunk_id_end,
       CAST(floor(stream_offset / {_A43_CTX}) AS BIGINT)
         != CAST(floor((stream_offset + greatest(n_bpe_tokens, 1) - 1)
                       / {_A43_CTX}) AS BIGINT) AS spans_boundary
FROM packed
"""


# ---------------------------------------------------------------------------
# a44 -- deterministic corpus shuffle: seeded md5 order with a GLOBAL rank
# computed by the two-phase bucket-offset construction (no single-partition
# window; see operators/ordering.py).  Oracle = the naive global window.
# ---------------------------------------------------------------------------


def a44_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import deterministic_shuffle

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return deterministic_shuffle(d, "doc_id", seed="epoch0")


A44_SQL = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
           ORDER BY md5(concat('epoch0', CAST(doc_id AS VARCHAR))), doc_id)
         AS BIGINT) AS shuffle_rank
FROM documents
"""


# ---------------------------------------------------------------------------
# a45 -- benchmark decontamination: train docs sharing word 3-grams with a
# held-out eval slice (doc_id % 10 == 0).  Inverted-index join on the gram;
# the distinct bench-gram side is the small broadcastable input.
# ---------------------------------------------------------------------------


def a45_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import contamination_overlap

    d = load_table(spark, sf_dir, "documents")
    bench = d.where(F.col("doc_id") % 10 == 0)
    train = d.where(F.col("doc_id") % 10 != 0)
    return contamination_overlap(train, bench, n=3)


A45_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), grams AS (
  SELECT doc_id, unnest(list_distinct(
    list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                   i -> array_to_string(t[i:i+2], ' ')))) AS gram
  FROM toks
), bench AS (
  SELECT DISTINCT gram FROM grams WHERE doc_id % 10 = 0
), train AS (
  SELECT * FROM grams WHERE doc_id % 10 != 0
), totals AS (
  SELECT doc_id, count(*) AS n_grams FROM train GROUP BY doc_id
), hits AS (
  SELECT t.doc_id, count(*) AS n_overlap
  FROM train t JOIN bench b USING (gram) GROUP BY t.doc_id
)
SELECT h.doc_id, n_overlap, n_grams,
       CAST(n_overlap AS DOUBLE) / n_grams AS contamination_ratio
FROM hits h JOIN totals USING (doc_id)
"""


# ---------------------------------------------------------------------------
# a46 -- intra-document repetition stats (duplicate-gram ratio, top-gram
# share): the classic boilerplate/template-spam quality filter.
# ---------------------------------------------------------------------------


def a46_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_stats

    d = load_table(spark, sf_dir, "documents")
    return repetition_stats(d, n=3)


A46_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), gram_lists AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 2, 1)),
                        i -> array_to_string(t[i:i+2], ' ')) AS grams
  FROM toks
), exploded AS (
  SELECT doc_id, len(grams) AS n_grams,
         len(list_distinct(grams)) AS n_distinct_grams,
         unnest(grams) AS gram
  FROM gram_lists
), per_gram AS (
  SELECT doc_id, n_grams, n_distinct_grams, gram, count(*) AS gn
  FROM exploded GROUP BY ALL
)
SELECT doc_id, n_grams, n_distinct_grams,
       1.0 - CAST(n_distinct_grams AS DOUBLE) / n_grams AS dup_gram_ratio,
       CAST(max(gn) AS DOUBLE) / n_grams AS top_gram_share
FROM per_gram
GROUP BY doc_id, n_grams, n_distinct_grams
"""


# ---------------------------------------------------------------------------
# a47 -- corpus-level duplicated-segment removal (the C4 "repeated lines"
# boilerplate filter, on fixed 10-token windows since the corpus has no
# newlines): drop every segment seen in >= 2 distinct docs, reassemble.
# ---------------------------------------------------------------------------


def a47_segment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import remove_duplicated_segments

    d = load_table(spark, sf_dir, "documents")
    return remove_duplicated_segments(d, seg_tokens=10, min_docs=2)


A47_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), base AS (
  SELECT doc_id, t, greatest((len(t) + 9) // 10, 1) AS n_segs FROM toks
), segs AS (
  SELECT doc_id, n_segs, i AS pos,
         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS seg
  FROM base, LATERAL unnest(generate_series(0, CAST(n_segs - 1 AS INT))) AS u(i)
), hashed AS (
  SELECT doc_id, pos, seg, md5(seg) AS h FROM segs
), dup AS (
  SELECT h FROM hashed GROUP BY h HAVING count(DISTINCT doc_id) >= 2
), kept AS (
  SELECT * FROM hashed WHERE h NOT IN (SELECT h FROM dup)
), re AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         count(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id, coalesce(re.clean_text, '') AS clean_text, b.n_segs,
       coalesce(re.n_kept, 0) AS n_kept
FROM base b LEFT JOIN re USING (doc_id)
"""


# ---------------------------------------------------------------------------
# a48 -- quality-filter funnel: chained curation filters with per-stage
# fail attribution in ONE corpus scan (first failing stage wins).
# ---------------------------------------------------------------------------


def a48_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import filter_funnel

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    stages = [
        ("min_chars", F.col("n_chars") >= 150),
        ("known_lang", F.col("lang").isin("en", "es", "fr", "de")),
        ("min_tokens", F.size(toks) >= 40),
        (
            "distinct_ratio",
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.3,
        ),
    ]
    return filter_funnel(d, stages)


A48_SQL = """
WITH feat AS (
  SELECT doc_id, n_chars, lang, string_split(text, ' ') AS t FROM documents
), attributed AS (
  SELECT CASE
           WHEN NOT coalesce(n_chars >= 150, FALSE) THEN 0
           WHEN NOT coalesce(lang IN ('en','es','fr','de'), FALSE) THEN 1
           WHEN NOT coalesce(len(t) >= 40, FALSE) THEN 2
           WHEN NOT coalesce(
             CAST(len(list_distinct(t)) AS DOUBLE) / len(t) >= 0.3, FALSE
           ) THEN 3
           ELSE 4
         END AS stage_idx
  FROM feat
), counts AS (
  SELECT stage_idx, count(*) AS n FROM attributed GROUP BY 1
), dim AS (
  SELECT * FROM (VALUES (0, 'min_chars'), (1, 'known_lang'),
                        (2, 'min_tokens'), (3, 'distinct_ratio'))
              AS d(stage_idx, stage)
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total FROM counts
), j AS (
  SELECT d.stage_idx, d.stage, CAST(coalesce(c.n, 0) AS BIGINT) AS n_fail
  FROM dim d LEFT JOIN counts c USING (stage_idx)
), cum AS (
  SELECT stage_idx, stage, n_fail,
         CAST(total - CAST(coalesce(
           sum(n_fail) OVER (ORDER BY stage_idx
                             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS BIGINT) AS BIGINT) AS n_in
  FROM j, tot
)
SELECT stage_idx, stage, n_in, n_fail,
       n_in - n_fail AS n_kept,
       CAST(n_in - n_fail AS DOUBLE) / n_in AS retention
FROM cum
"""


# ---------------------------------------------------------------------------
# a49 -- temperature-based mixture sampling: flatten the language head
# (GPT-3/mT5 rebalancing), deterministic hash membership, per-group audit.
# ---------------------------------------------------------------------------


def a49_mixture_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.split import temperature_mixture_rates, temperature_sample

    d = load_table(spark, sf_dir, "documents")
    rates = temperature_mixture_rates(d, "lang", temperature=0.5)
    sampled = temperature_sample(d, "lang", temperature=0.5)
    got = sampled.groupBy("lang").agg(F.count(F.lit(1)).alias("n_sampled"))
    return (
        rates.join(got, "lang", "left")
        .na.fill({"n_sampled": 0})
        .select("lang", "n_docs", "rate", "n_sampled")
    )


A49_SQL = """
WITH counts AS (
  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
), rates AS (
  SELECT lang, n_docs,
         round(least(1.0,
           pow(n_docs, 0.5) / sum(pow(n_docs, 0.5)) OVER ()
           * CAST(sum(n_docs) OVER () AS DOUBLE) / n_docs), 9) AS rate
  FROM counts
), sampled AS (
  SELECT d.lang
  FROM documents d JOIN rates r USING (lang)
  WHERE CAST(CAST('0x' || substr(md5('mix|' || CAST(d.doc_id AS VARCHAR)), 1, 8)
                  AS BIGINT) AS DOUBLE) / 4294967296.0 < r.rate
), got AS (
  SELECT lang, count(*) AS n_sampled FROM sampled GROUP BY lang
)
SELECT r.lang, r.n_docs, r.rate, CAST(coalesce(g.n_sampled, 0) AS BIGINT) AS n_sampled
FROM rates r LEFT JOIN got g USING (lang)
"""


# ---------------------------------------------------------------------------
# a50 -- TF-IDF top terms per document: sparse keyword features (the
# classical lexical-similarity / topic-drift signal).
# ---------------------------------------------------------------------------


def a50_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tfidf_top_terms

    d = load_table(spark, sf_dir, "documents")
    return tfidf_top_terms(d, k=10)


A50_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY ALL
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS dft FROM tf GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS nd FROM documents
), scored AS (
  SELECT t.doc_id, t.term, t.tf,
         t.tf * round(ln(CAST(nd AS DOUBLE) / dft), 9) AS score
  FROM tf t JOIN dfreq USING (term), n
), ranked AS (
  SELECT doc_id, term, tf, score,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
)
SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
       round(score, 6) AS tfidf, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 10
"""


# ---------------------------------------------------------------------------
# a51 -- z-order clustering audit: per-z-bucket occupancy and (x, y)
# bounding boxes over orders (custkey x orderkey).  Integer bucket + bit
# interleave -> oracle-exact; narrow boxes = multi-column file pruning.
# ---------------------------------------------------------------------------


def a51_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.layout import zorder_stats

    o = load_table(spark, sf_dir, "orders")
    return zorder_stats(o, "o_custkey", "o_orderkey")


def _a51_sql() -> str:
    def bucket(col: str, mn: str, mx: str) -> str:
        return (
            f"least(CAST(15 AS BIGINT), CAST(floor(CAST({col} - {mn} AS DOUBLE)"
            f" * 16 / CAST({mx} - {mn} + 1 AS DOUBLE)) AS BIGINT))"
        )

    interleave = " + ".join(
        f"((bx >> {i}) & 1) * {4**i} + ((by_ >> {i}) & 1) * {2 * 4**i}"
        for i in range(4)
    )
    return f"""
WITH s AS (
  SELECT min(o_custkey) AS minx, max(o_custkey) AS maxx,
         min(o_orderkey) AS miny, max(o_orderkey) AS maxy
  FROM orders
), b AS (
  SELECT o_custkey, o_orderkey,
         {bucket('o_custkey', 'minx', 'maxx')} AS bx,
         {bucket('o_orderkey', 'miny', 'maxy')} AS by_
  FROM orders, s
)
SELECT CAST({interleave} AS BIGINT) AS z,
       count(*) AS n_rows,
       min(o_custkey) AS min_x, max(o_custkey) AS max_x,
       min(o_orderkey) AS min_y, max(o_orderkey) AS max_y
FROM b
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# a52 -- sparse lexical near-dup pairs: cosine over TF-IDF top-term
# vectors, candidates from the term inverted index with a max-df stopword
# cap.  Decimal-exact dots/norms -> engine-identical cosines.
# ---------------------------------------------------------------------------


def a52_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import tfidf_cosine_pairs

    d = load_table(spark, sf_dir, "documents")
    return tfidf_cosine_pairs(d, k=10, max_df=200, threshold=0.3)


A52_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY ALL
), dfreq AS (
  SELECT term, count(DISTINCT doc_id) AS dft FROM tf GROUP BY term
), n AS (
  SELECT count(DISTINCT doc_id) AS nd FROM documents
), scored AS (
  SELECT t.doc_id, t.term, t.tf,
         t.tf * round(ln(CAST(nd AS DOUBLE) / dft), 9) AS score
  FROM tf t JOIN dfreq USING (term), n
), ranked AS (
  SELECT doc_id, term, round(score, 6) AS w,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, term) AS rank
  FROM scored
), feats0 AS (
  SELECT doc_id, term, w FROM ranked WHERE rank <= 10 AND w > 0
), posting AS (
  SELECT term, count(*) AS pdf FROM feats0 GROUP BY term
), feats AS (
  SELECT f.doc_id, f.term, f.w FROM feats0 f
  JOIN posting p USING (term) WHERE p.pdf <= 200
), norms AS (
  SELECT doc_id,
         sqrt(CAST(sum(CAST(w * w AS DECIMAL(30,12))) AS DOUBLE)) AS nrm
  FROM feats GROUP BY doc_id
), dots AS (
  SELECT fa.doc_id AS a, fb.doc_id AS b,
         CAST(sum(CAST(fa.w * fb.w AS DECIMAL(30,12))) AS DOUBLE) AS dot
  FROM feats fa JOIN feats fb USING (term)
  WHERE fa.doc_id < fb.doc_id
  GROUP BY 1, 2
)
SELECT d.a, d.b, d.dot / (na.nrm * nb.nrm) AS cosine
FROM dots d
JOIN norms na ON na.doc_id = d.a
JOIN norms nb ON nb.doc_id = d.b
WHERE d.dot / (na.nrm * nb.nrm) >= 0.3
"""


# ---------------------------------------------------------------------------
# a53 -- skew-salted two-phase aggregation: same result as a plain GROUP
# BY (the oracle), but the hot key's mass spreads over 16 reducers in
# phase 1.  Integer-cents sums -> exact under any grouping order.
# ---------------------------------------------------------------------------


def a53_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.skew import salted_aggregate

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100).cast("long")
    )
    return salted_aggregate(
        ev,
        keys=["event_type"],
        aggs={
            "n_events": "count:*",
            "total_cents": "sum:cents",
            "max_cents": "max:cents",
            "min_cents": "min:cents",
        },
        buckets=16,
        salt_cols=["event_id"],
    )


A53_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS total_cents,
       CAST(max(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_cents,
       CAST(min(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_cents
FROM events GROUP BY event_type
"""


# ---------------------------------------------------------------------------
# a54 -- sliding-window document chunking (RAG / context-window prep):
# overlapping fixed-width token chunks, last partial chunk kept.
# ---------------------------------------------------------------------------


def a54_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import chunk_documents

    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_tokens=64, overlap=16)


A54_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), base AS (
  -- n_chunks = 1 + ceil(max(0, len - chunk) / stride), stride = 48
  SELECT doc_id, t,
         1 + CAST((greatest(len(t) - 64, 0) + 47) // 48 AS BIGINT) AS n_chunks
  FROM toks
)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       array_to_string(t[(i*48+1):(i*48+64)], ' ') AS chunk_text,
       CAST(least(64, len(t) - i*48) AS BIGINT) AS n_tokens
FROM base, LATERAL unnest(generate_series(0, CAST(n_chunks - 1 AS INT))) AS u(i)
"""


# ---------------------------------------------------------------------------
# a55 -- corpus-trained bigram-LM perplexity (the CCNet quality signal):
# add-one smoothed P(w2|w1), per-doc mean log-prob, both tails filterable.
# ---------------------------------------------------------------------------


def a55_bigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    return bigram_lm_scores(d)


A55_SQL = """
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), base AS (
  SELECT doc_id,
         list_transform(generate_series(1, greatest(len(t) - 1, 1)),
                        i -> array_to_string(t[i:i+1], ' ')) AS grams
  FROM toks WHERE len(t) >= 2
), occ AS (
  SELECT doc_id, unnest(grams) AS gram FROM base
), c2 AS (
  SELECT gram, count(*) AS c2 FROM occ GROUP BY gram
), c1 AS (
  SELECT split_part(gram, ' ', 1) AS w1, CAST(sum(c2) AS BIGINT) AS c1
  FROM c2 GROUP BY 1
), vocab AS (
  SELECT count(DISTINCT tok) AS v
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
), lm AS (
  SELECT gram,
         round(ln(CAST(c2 + 1 AS DOUBLE) / CAST(c1 + v AS DOUBLE)), 9) AS logp
  FROM c2 JOIN c1 ON split_part(c2.gram, ' ', 1) = c1.w1, vocab
)
SELECT o.doc_id, count(*) AS n_bigrams,
       CAST(sum(CAST(lm.logp AS DECIMAL(28,9))) AS DOUBLE) / count(*)
         AS avg_logprob,
       round(exp(-(CAST(sum(CAST(lm.logp AS DECIMAL(28,9))) AS DOUBLE)
                   / count(*))), 6) AS ppl
FROM occ o JOIN lm USING (gram)
GROUP BY o.doc_id
"""


# ---------------------------------------------------------------------------
# a56 -- multimodal frame-sampling with a VALUE oracle: the Arrow-batched
# mapInPandas sampler slices payload bytes into evenly-spaced windows; on
# the ASCII testdata stand-in the oracle reproduces every frame byte via
# substr, so the Python plumbing itself is value-checked, not just counted.
# ---------------------------------------------------------------------------


def a56_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import attach_binary_payload, frame_sample

    d = load_table(spark, sf_dir, "documents")
    frames = frame_sample(attach_binary_payload(d), n_frames=3)
    return frames.select(
        "doc_id",
        "frame_offset",
        F.md5("frame").alias("frame_md5"),
        F.length("frame").cast("bigint").alias("frame_len"),
    )


A56_SQL = """
WITH base AS (
  SELECT doc_id, text, greatest(length(text) // 3, 1) AS step FROM documents
), framed AS (
  SELECT doc_id,
         least(i * step, greatest(length(text) - 1, 0)) AS frame_offset,
         substr(text, least(i * step, greatest(length(text) - 1, 0)) + 1, step)
           AS frame
  FROM base, LATERAL unnest(generate_series(0, 2)) AS u(i)
)
SELECT doc_id, CAST(frame_offset AS BIGINT) AS frame_offset,
       md5(frame) AS frame_md5, CAST(length(frame) AS BIGINT) AS frame_len
FROM framed
"""


# ---------------------------------------------------------------------------
# a57 -- exact equi-depth histogram over event value-cents: per-value
# aggregation first, window over the small distinct-value table (never
# the raw rows), integer bucket assignment.  The scalable exact-quantile
# shape vs a27's sketch-based approximations.
# ---------------------------------------------------------------------------


def a57_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.ordering import equidepth_histogram

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.floor(F.col("value") * 100).cast("long")
    )
    return equidepth_histogram(ev, "cents", n_buckets=10)


A57_SQL = """
WITH counts AS (
  SELECT CAST(floor(value * 100) AS BIGINT) AS v, count(*) AS cnt
  FROM events GROUP BY 1
), ranked AS (
  SELECT v, cnt,
         CAST(coalesce(sum(cnt) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS rank_before,
         CAST(sum(cnt) OVER () AS BIGINT) AS n_total
  FROM counts
)
SELECT (rank_before * 10) // n_total AS bucket,
       CAST(sum(cnt) AS BIGINT) AS n_rows,
       min(v) AS lo, max(v) AS hi
FROM ranked
GROUP BY 1
"""


def a58_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked fuzzy record linkage over part names: block on
    (brand, name noun), verify candidates with Levenshtein distance 1-2.
    The string-field sibling of MinHash near-dedup -- blocking bounds the
    O(n^2) pair space, the edit-distance verify runs JVM-side per pair."""
    from ..operators.linkage import blocked_fuzzy_pairs

    p = load_table(spark, sf_dir, "part")
    return blocked_fuzzy_pairs(
        p,
        id_col="p_partkey",
        text_col="p_name",
        block_exprs={
            "blk_brand": F.col("p_brand"),
            "blk_noun": F.split_part(F.col("p_name"), F.lit(" "), F.lit(2)),
        },
        max_dist=2,
        min_dist=1,
    )


A58_SQL = """
SELECT a.p_partkey AS p_partkey_a, b.p_partkey AS p_partkey_b,
       a.p_name AS p_name_a, b.p_name AS p_name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND split_part(a.p_name, ' ', 2) = split_part(b.p_name, ' ', 2)
 AND a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 2
"""


def a59_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no order in
    the trailing 30 days of the data, aggregated per nation.  The average
    is compared as an exact rational (bal * n > sum, both decimal) so the
    boundary classification is engine-identical; the recency check is an
    anti join against the max-date-anchored order window."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    stats = c.where(F.col("c_acctbal") > 0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).alias("__s"),
        F.count(F.lit(1)).alias("__n"),
    )
    rich = c.crossJoin(F.broadcast(stats)).where(
        F.col("c_acctbal").cast("decimal(18,2)") * F.col("__n") > F.col("__s")
    )
    mx = o.agg(F.max("o_orderdate").alias("__mx"))
    recent = o.crossJoin(F.broadcast(mx)).where(
        F.col("o_orderdate") >= F.col("__mx") - F.expr("INTERVAL 30 DAYS")
    )
    inactive = rich.join(
        recent, rich["c_custkey"] == recent["o_custkey"], "left_anti"
    )
    return inactive.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        dsum("c_acctbal").alias("total_bal"),
    )


A59_SQL = """
WITH stats AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS s, COUNT(*) AS n
  FROM customer WHERE c_acctbal > 0
), recent AS (
  SELECT o_custkey FROM orders
  WHERE o_orderdate >= (SELECT max(o_orderdate) FROM orders) - INTERVAL 30 DAY
)
SELECT c_nationkey, COUNT(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
FROM customer, stats
WHERE CAST(c_acctbal AS DECIMAL(18,2)) * n > s
  AND NOT EXISTS (SELECT 1 FROM recent WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
"""


def a60_group_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score normalization (feature standardization).  Moments
    come from exact decimal sums (sum, sum-of-squares) cast to double at
    the last step, so mean/variance -- and therefore every z value -- are
    bit-identical across engines and partitionings; the naive
    stddev_samp() float accumulation is not."""
    o = load_table(spark, sf_dir, "orders")
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    g = o.groupBy("o_orderpriority").agg(
        F.sum(dec).alias("__s"),
        F.sum(dec * dec).alias("__ss"),
        F.count(F.lit(1)).alias("__n"),
    )
    j = o.join(F.broadcast(g), "o_orderpriority")
    mean = F.col("__s").cast("double") / F.col("__n")
    var = (
        F.col("__ss").cast("double")
        - F.col("__s").cast("double") * F.col("__s").cast("double") / F.col("__n")
    ) / (F.col("__n") - 1)
    # round(…, 6): the decimal->double cast of sum-of-squares can differ by
    # one ULP between engines; six decimals is far beyond feature-scaling
    # precision needs and the repo's established oracle convention.
    return j.select(
        "o_orderkey",
        "o_orderpriority",
        F.round((F.col("o_totalprice") - mean) / F.sqrt(var), 6).alias("z"),
    )


A60_SQL = """
WITH g AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS s,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))
             * CAST(o_totalprice AS DECIMAL(18,2))) AS ss,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderkey, o.o_orderpriority,
       round((o_totalprice - CAST(s AS DOUBLE) / n)
             / sqrt((CAST(ss AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)),
             6) AS z
FROM orders o JOIN g ON o.o_orderpriority = g.o_orderpriority
"""


def a61_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavior sequence: the first 10 events as an ordered path
    string.  BOUNDED aggregation state (round-9 hardening): a bare
    ``collect_list`` + post-slice buffers a whale user's ENTIRE event
    history in one in-heap aggregation buffer before the cap trims it.
    Instead, a per-key ``row_number`` window ranks events (its sort is
    disk-spillable) and the aggregation collects only ``rn <= 10``
    structs via a conditional collect (``collect_list`` skips NULLs), so
    buffer state is <= 10 structs per user at ANY key skew.  The groupBy
    rides the window's hash partitioning -- no second exchange -- and
    ``n_events`` still counts ALL events.  ``array_sort`` restores
    arrival order inside the capped buffer (deterministic via the
    event_id tie-break)."""
    from ..operators.sessionize import capped_event_paths

    ev = load_table(spark, sf_dir, "events")
    return capped_event_paths(ev, cap=10).select(
        "user_id", "path", "n_events"
    )


A61_SQL = """
WITH ranked AS (
  SELECT user_id, event_type, ts, event_id,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
)
SELECT r.user_id,
       (SELECT string_agg(event_type, '>' ORDER BY rn)
        FROM ranked x WHERE x.user_id = r.user_id AND x.rn <= 10) AS path,
       count(*) AS n_events
FROM ranked r
GROUP BY r.user_id
"""


def a62_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (A-ES top-k):
    length-weighted pick of 100 documents, reproducible on any cluster."""
    from ..operators.split import weighted_sample_topk

    d = load_table(spark, sf_dir, "documents")
    return weighted_sample_topk(
        d.withColumn("w", F.col("n_chars").cast("double")), "w", k=100
    )


_A62_NIB = (
    "(CASE WHEN ascii(substr(hh,{i},1)) >= 97 THEN ascii(substr(hh,{i},1))-87 "
    "ELSE ascii(substr(hh,{i},1))-48 END)"
)

A62_SQL = f"""
WITH h AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         md5('wsample|' || CAST(doc_id AS VARCHAR)) AS hh
  FROM documents
), keyed AS (
  SELECT doc_id, weight,
         round(pow(({_A62_NIB.format(i=1)} * 4096 + {_A62_NIB.format(i=2)} * 256
                    + {_A62_NIB.format(i=3)} * 16 + {_A62_NIB.format(i=4)} + 0.5)
                   / 65536.0,
                   1.0 / weight), 9) AS sample_key
  FROM h
)
SELECT doc_id, weight, sample_key FROM keyed
ORDER BY sample_key DESC, doc_id ASC
LIMIT 100
"""


def a63_vocab_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequency-ranked token vocabulary (min_count=2): pretraining prep.
    Rank by (count desc, token asc) without an unpartitioned window --
    per-count offsets broadcast back, row_number partitions by count."""
    from ..operators.text import vocab_build

    d = load_table(spark, sf_dir, "documents")
    return vocab_build(d, min_count=2)


A63_SQL = """
WITH toks AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM toks
  WHERE token <> '' GROUP BY token HAVING count(*) >= 2
)
SELECT token, cnt,
       row_number() OVER (ORDER BY cnt DESC, token ASC) AS token_id
FROM counts
"""


def a64_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality partitioning: per-language perplexity terciles
    (head / middle / tail) from the corpus-trained bigram LM.  Thresholds
    are a k-row aggregate broadcast back over the scored docs -- the doc
    set itself is scanned once and never re-shuffled."""
    from ..operators.text import bigram_lm_scores

    d = load_table(spark, sf_dir, "documents")
    scored = bigram_lm_scores(d).join(
        d.select("doc_id", "lang"), "doc_id"
    )
    cuts = F.expr("percentile(ppl, array(0.33333333, 0.66666667))")
    th = scored.groupBy("lang").agg(
        F.round(F.element_at(cuts, 1), 6).alias("__t1"),
        F.round(F.element_at(cuts, 2), 6).alias("__t2"),
    )
    bucket = (
        F.when(F.col("ppl") <= F.col("__t1"), F.lit("head"))
        .when(F.col("ppl") <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        scored.join(F.broadcast(th), "lang")
        .select("doc_id", "lang", "ppl", bucket.alias("bucket"))
    )


A64_SQL = f"""
WITH scored0 AS ({A55_SQL}),
scored AS (
  SELECT s.doc_id, d.lang, s.ppl
  FROM scored0 s JOIN documents d USING (doc_id)
), th AS (
  SELECT lang,
         round(quantile_cont(ppl, 0.33333333), 6) AS t1,
         round(quantile_cont(ppl, 0.66666667), 6) AS t2
  FROM scored GROUP BY lang
)
SELECT s.doc_id, s.lang, s.ppl,
       CASE WHEN s.ppl <= th.t1 THEN 'head'
            WHEN s.ppl <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM scored s JOIN th USING (lang)
"""




# ---------------------------------------------------------------------------
# a33 -- embedding near-dup clusters: a21's exact cosine pairs collapsed to
# transitive clusters (same star-contraction as a25, over the embedding
# modality; oracle = recursive closure over a21's pair SQL)
# ---------------------------------------------------------------------------


def a33_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import dedup_clusters
    from ..operators.similarity import embedding_neardup_pairs
    # lazy: _ND_THRESHOLD lives in analytics (a21's section); analytics is
    # partially initialized but its head names are bound by the time any
    # query callable or SQL builder here runs (round-10 split)
    from .analytics import _ND_THRESHOLD

    e = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(e, threshold=_ND_THRESHOLD)
    return dedup_clusters(e, pairs, id_col="vec_id").withColumnRenamed(
        "rep_id", "rep_vec_id"
    )


def _a33_sql() -> str:
    from .analytics import _a21_sql  # lazy -- see a33 note above

    a21 = _a21_sql().strip().rstrip("\n")
    return f"""
WITH RECURSIVE pairs AS MATERIALIZED (
  -- MATERIALIZED: without it DuckDB re-inlines the quadratic pair join
  -- into every recursive iteration (~10x slower at sf0.01)
{a21}
), sym AS (
  SELECT a AS u, b AS v FROM pairs
  UNION
  SELECT b AS u, a AS v FROM pairs
), reach(node, r) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT s.u, reach.r FROM sym s JOIN reach ON s.v = reach.node
)
SELECT node AS vec_id, min(r) AS rep_vec_id FROM reach GROUP BY node
"""


# ---------------------------------------------------------------------------
# a34 -- argmax-per-group join-back (TPC-H Q2 shape, adapted to the tables
# here): richest customer per nation, ties -> smallest custkey, enriched
# with the nation dimension (broadcast).
# ---------------------------------------------------------------------------


def a34_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), "c_custkey"
    )
    top = (
        c.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    return top.join(
        F.broadcast(n), top["c_nationkey"] == n["n_nationkey"]
    ).select("n_name", "c_custkey", "c_name", "c_acctbal")


A34_SQL = """
SELECT n_name, c_custkey, c_name, c_acctbal
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY c_nationkey
                               ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
) JOIN nation ON c_nationkey = n_nationkey
WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# a35 -- scalar string-function family (translate / pad / reverse / repeat /
# split_part / levenshtein): the cleaning + fuzzy-matching primitives,
# one narrow codegen'd projection.
# ---------------------------------------------------------------------------


def a35_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias("seg_tr"),
        F.lpad(F.col("c_custkey").cast("string"), 12, "0").alias("key_pad"),
        F.reverse("c_name").alias("name_rev"),
        F.repeat(F.lit("*"), (F.col("c_custkey") % 5).cast("int")).alias("stars"),
        F.split_part("c_name", F.lit("#"), F.lit(2)).alias("name_num"),
        F.levenshtein("c_name", F.lit("Customer#000000001")).alias("lev"),
    )


A35_SQL = """
SELECT c_custkey,
       translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_tr,
       lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS key_pad,
       reverse(c_name) AS name_rev,
       repeat('*', CAST(c_custkey % 5 AS INT)) AS stars,
       split_part(c_name, '#', 2) AS name_num,
       levenshtein(c_name, 'Customer#000000001') AS lev
FROM customer
"""



