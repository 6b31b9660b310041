"""Round-9 extension queries: curation-pipeline health + contrastive mining.

Six operators a large-scale training-data pipeline runs between crawl and
training, each over the synthetic ``documents`` / ``embeddings`` tables:

a164 hard-negative mining (per query vector, the top-k most cosine-similar
vectors with a DIFFERENT label -- the standard mining step before
contrastive / metric-learning fine-tuning; ``operators/similarity.
hard_negative_topk`` broadcasts the labeled query batch and scans the
corpus once, exactly the a10 shape), a165 character-class census per
source (ASCII-letter / digit / space / other shares plus digit-heavy doc
counts -- the script/encoding health screen before tokenization;
integer-exact by construction), a166 tokenizer fertility by language
(BPE-ish tokens per whitespace word and chars per token -- the metric
that decides per-language token budgets; integer sums, one final
division), a167 source reputation (m-estimate-smoothed mean quality per
source, the shrinkage that stops tiny sources from winning the ranking on
three lucky docs -- the standard Bayesian-average fix), a168 cross-source
exact-dup leakage (share of each source's docs whose md5 digest also
appears in ANOTHER source -- mirror-site / syndication contamination, the
measurement before choosing a canonical source), a169 embedding-norm
outliers per label (median + MAD of the L2 norm, count of 3-MAD
outliers -- the vector-health screen before indexing; rides the same
``grouped_exact_percentiles`` machinery as a157 on a brand-new domain).

Scale notes: a164 broadcasts only the tiny query batch (corpus never
shuffles until the per-query top-k window, k rows per query after AQE
partial top-k); a165/a166 are single-projection aggregations (integer
counts, no float accumulation); a167's global prior is a 1-row broadcast
frame; a168 shuffles 16-byte digests + source strings, never document
bodies, and the digest->source join reuses the digest-group exchange;
a169's per-label stat frames are tiny broadcasts over the norm
projection.

Floats follow the repo rule (``_util`` docstring): per-term
``round(expr, 9)`` -> exact ``DECIMAL(28,9)`` sums -> final
``round(., 6)``; shares that can be one exact integer division are
computed that way instead (no accumulation at all).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import QuerySpec
from ._util import load_table

QUERIES: dict[str, QuerySpec] = {}

_DEC = "decimal(28,9)"


# ---------------------------------------------------------------------------
# a164 -- contrastive hard-negative mining: per query vector (a small
# deterministic batch), the k most-similar vectors with a different label.
# The query batch broadcasts with its labels; the label-mismatch predicate
# rides the broadcast join so same-label pairs never reach scoring.
# ---------------------------------------------------------------------------

_HN_NQ, _HN_K = 8, 5


def a164_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import hard_negative_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") < _HN_NQ)
    return hard_negative_topk(e, q, k=_HN_K)


def _a164_sql() -> str:
    dot = (
        "list_reduce(list_transform(generate_series(1, len({a})), "
        "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (s, v) -> s + v)"
    )
    qq, cc = dot.format(a="qv", b="qv"), dot.format(a="cv", b="cv")
    qc = dot.format(a="qv", b="cv")
    return f"""
WITH q AS (
  SELECT vec_id AS q_id, label AS q_label, embedding AS qv
  FROM embeddings WHERE vec_id < {_HN_NQ}
), c AS (
  SELECT vec_id AS n_id, label AS n_label, embedding AS cv FROM embeddings
), scored AS (
  SELECT q_id, q_label, n_id, n_label,
         round({qc} / (sqrt({qq}) * sqrt({cc})), 6) AS cosine
  FROM c, q WHERE q_id <> n_id AND q_label <> n_label
), ranked AS (
  SELECT q_id, q_label, n_id, n_label, cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC)
           AS rank
  FROM scored
)
SELECT q_id, q_label, n_id, n_label, cosine, rank
FROM ranked WHERE rank <= {_HN_K}
"""


QUERIES["a164_hard_negative_mining"] = QuerySpec(
    a164_hard_negative_mining, _a164_sql()
)


# ---------------------------------------------------------------------------
# a165 -- character-class census per source.  Per-doc integer counts from
# char_class_profile; corpus-level shares are ONE integer division each
# (exact, engine-portable); "digit-heavy" is the integer comparison
# 5 * n_digit > n_chars (i.e. digit share > 20%) -- no float thresholds.
# ---------------------------------------------------------------------------


def a165_char_class_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import char_class_profile

    d = load_table(spark, sf_dir, "documents")
    p = char_class_profile(d)
    return (
        p.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars_cls").alias("total_chars"),
            F.sum("n_alpha").alias("__a"),
            F.sum("n_digit").alias("__d"),
            F.sum("n_space").alias("__s"),
            F.sum("n_other").alias("__o"),
            F.sum(
                F.when(5 * F.col("n_digit") > F.col("n_chars_cls"), 1)
                .otherwise(0)
            ).alias("n_digit_heavy"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            F.round(F.col("__a") / F.col("total_chars"), 6).alias("alpha_share"),
            F.round(F.col("__d") / F.col("total_chars"), 6).alias("digit_share"),
            F.round(F.col("__s") / F.col("total_chars"), 6).alias("space_share"),
            F.round(F.col("__o") / F.col("total_chars"), 6).alias("other_share"),
            "n_digit_heavy",
        )
    )


A165_SQL = """
WITH cls AS (
  SELECT source,
         length(text) AS n_chars,
         length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g'))
           AS n_alpha,
         length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
           AS n_digit,
         length(text) - length(regexp_replace(text, ' ', '', 'g'))
           AS n_space
  FROM documents
)
SELECT source,
       COUNT(*) AS n_docs,
       SUM(n_chars) AS total_chars,
       round(CAST(SUM(n_alpha) AS DOUBLE) / SUM(n_chars), 6) AS alpha_share,
       round(CAST(SUM(n_digit) AS DOUBLE) / SUM(n_chars), 6) AS digit_share,
       round(CAST(SUM(n_space) AS DOUBLE) / SUM(n_chars), 6) AS space_share,
       round(CAST(SUM(n_chars - n_alpha - n_digit - n_space) AS DOUBLE)
             / SUM(n_chars), 6) AS other_share,
       SUM(CASE WHEN 5 * n_digit > n_chars THEN 1 ELSE 0 END)
         AS n_digit_heavy
FROM cls
GROUP BY source
"""

QUERIES["a165_char_class_census"] = QuerySpec(a165_char_class_census, A165_SQL)


# ---------------------------------------------------------------------------
# a166 -- tokenizer fertility by language: BPE-ish tokens per whitespace
# word (the "fertility" a tokenizer team tracks per language) and chars
# per BPE token.  All sums are integers; each output metric is one IEEE
# division of exact operands.
# ---------------------------------------------------------------------------


def a166_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import token_count_bpe

    d = load_table(spark, sf_dir, "documents")
    t = token_count_bpe(d).select(
        "lang",
        "n_bpe_tokens",
        F.size(F.split(F.col("text"), " ")).alias("n_words"),
        F.length("text").alias("n_chars_f"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("total_bpe_tokens"),
            F.sum("n_words").alias("total_words"),
            F.sum("n_chars_f").alias("total_chars"),
        )
        .select(
            "lang",
            "n_docs",
            "total_bpe_tokens",
            "total_words",
            F.round(
                F.col("total_bpe_tokens") / F.col("total_words"), 6
            ).alias("fertility"),
            F.round(
                F.col("total_chars") / F.col("total_bpe_tokens"), 6
            ).alias("chars_per_token"),
        )
    )


A166_SQL = """
WITH t AS (
  SELECT lang,
         len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]'))
           AS n_bpe_tokens,
         len(string_split(text, ' ')) AS n_words,
         length(text) AS n_chars
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_docs,
       SUM(n_bpe_tokens) AS total_bpe_tokens,
       SUM(n_words) AS total_words,
       round(CAST(SUM(n_bpe_tokens) AS DOUBLE) / SUM(n_words), 6)
         AS fertility,
       round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_bpe_tokens), 6)
         AS chars_per_token
FROM t
GROUP BY lang
"""

QUERIES["a166_token_fertility"] = QuerySpec(a166_token_fertility, A166_SQL)


# ---------------------------------------------------------------------------
# a167 -- source reputation: m-estimate-smoothed mean quality per source,
# smoothed = (sum_q + m * prior) / (n + m) with the global mean as prior.
# Per-doc quality (the a15 uniq_ratio) is one IEEE division; the sums
# follow the decimal rule so both engines add identical terms exactly;
# the final smoothing arithmetic is a fixed sequence of IEEE ops on
# decimal-exact operands.  The global prior is a 1-row broadcast frame.
# ---------------------------------------------------------------------------

_REP_M, _REP_TOPK = 50, 25


def a167_source_reputation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    q = d.select(
        "source",
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 9
        ).cast(_DEC).alias("q"),
    )
    per_src = q.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("q").alias("__sum_q")
    )
    glob = q.agg(
        (F.sum("q").cast("double") / F.count(F.lit(1))).alias("__prior")
    )
    scored = per_src.crossJoin(F.broadcast(glob)).select(
        "source",
        "n_docs",
        F.round(F.col("__sum_q").cast("double") / F.col("n_docs"), 6)
        .alias("raw_quality"),
        F.round(
            (F.col("__sum_q").cast("double") + _REP_M * F.col("__prior"))
            / (F.col("n_docs") + _REP_M),
            6,
        ).alias("smoothed_quality"),
    )
    # top-K leaderboard: TakeOrderedAndProject bounds the frame (per-
    # partition top-k + driver merge -- source cardinality is unbounded at
    # web scale, so the rank window must only ever see K rows; the a140
    # pattern)
    top = scored.orderBy(
        F.desc("smoothed_quality"), F.asc("source")
    ).limit(_REP_TOPK)
    w = Window.orderBy(F.desc("smoothed_quality"), F.asc("source"))
    return top.withColumn(
        "reputation_rank", F.row_number().over(w).cast("int")
    )


A167_SQL = f"""
WITH q AS (
  SELECT source,
         CAST(round(CAST(len(list_distinct(string_split(text, ' ')))
                         AS DOUBLE) / len(string_split(text, ' ')), 9)
              AS DECIMAL(28,9)) AS q
  FROM documents
), per_src AS (
  SELECT source, COUNT(*) AS n_docs, SUM(q) AS sum_q FROM q GROUP BY source
), gstat AS (
  SELECT CAST(SUM(q) AS DOUBLE) / COUNT(*) AS prior FROM q
)
SELECT source, n_docs,
       round(CAST(sum_q AS DOUBLE) / n_docs, 6) AS raw_quality,
       round((CAST(sum_q AS DOUBLE) + {_REP_M} * prior) / (n_docs + {_REP_M}),
             6) AS smoothed_quality,
       CAST(row_number() OVER (
         ORDER BY round((CAST(sum_q AS DOUBLE) + {_REP_M} * prior)
                        / (n_docs + {_REP_M}), 6) DESC, source ASC)
         AS INT) AS reputation_rank
FROM per_src, gstat
ORDER BY smoothed_quality DESC, source ASC
LIMIT {_REP_TOPK}
"""

QUERIES["a167_source_reputation"] = QuerySpec(a167_source_reputation, A167_SQL)


# ---------------------------------------------------------------------------
# a168 -- cross-source exact-dup leakage: a digest is "leaked" when it
# occurs in >= 2 distinct sources; per source, how many of its docs carry
# a leaked digest.  Only 16-byte digests + source strings shuffle; the
# digest->doc join reuses the digest-group exchange (same key).
# ---------------------------------------------------------------------------


def a168_cross_source_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text")).alias("__h")
    )
    spread = d.groupBy("__h").agg(
        F.countDistinct("source").alias("__n_sources")
    )
    return (
        d.join(spread, "__h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("__n_sources") >= 2, 1).otherwise(0)
            ).alias("n_leaked_docs"),
            F.countDistinct(
                F.when(F.col("__n_sources") >= 2, F.col("__h"))
            ).alias("n_leaked_digests"),
        )
        .withColumn(
            "leak_share",
            F.round(F.col("n_leaked_docs") / F.col("n_docs"), 6),
        )
    )


A168_SQL = """
WITH d AS (
  SELECT source, md5(text) AS h FROM documents
), spread AS (
  SELECT h, COUNT(DISTINCT source) AS n_sources FROM d GROUP BY h
)
SELECT d.source AS source,
       COUNT(*) AS n_docs,
       SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END) AS n_leaked_docs,
       COUNT(DISTINCT CASE WHEN n_sources >= 2 THEN d.h END)
         AS n_leaked_digests,
       round(CAST(SUM(CASE WHEN n_sources >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS leak_share
FROM d JOIN spread ON d.h = spread.h
GROUP BY d.source
"""

QUERIES["a168_cross_source_leakage"] = QuerySpec(
    a168_cross_source_leakage, A168_SQL
)


# ---------------------------------------------------------------------------
# a169 -- embedding-norm outliers per label: median + MAD of the L2 norm,
# 3-MAD outlier counts.  The a157 robust-stats shape on the vector-health
# domain: norms are a one-pass projection (sequential fold, rounded to 9
# so both engines feed identical IEEE values into the percentile
# machinery); the per-label stat frames are tiny broadcasts.
# ---------------------------------------------------------------------------


def a169_embedding_norm_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.ordering import grouped_exact_percentiles
    from ..operators.similarity import l2_norm

    e = load_table(spark, sf_dir, "embeddings").select(
        "label", F.round(l2_norm(F.col("embedding")), 9).alias("norm")
    )
    med = grouped_exact_percentiles(e, ["label"], "norm", [0.5]).select(
        "label", F.col("value").alias("med")
    )
    dev = e.join(F.broadcast(med), "label").withColumn(
        "d", F.abs(F.col("norm") - F.col("med"))
    )
    mad = grouped_exact_percentiles(dev, ["label"], "d", [0.5]).select(
        "label", F.col("value").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "label")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0)
            ).alias("n_norm_outliers"),
            F.round(F.min("med"), 6).alias("median_norm"),
            F.round(F.min("mad"), 6).alias("mad_norm"),
        )
    )


A169_SQL = """
WITH e AS (
  SELECT label,
         round(sqrt(list_reduce(list_transform(
           generate_series(1, len(embedding)),
           i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
           (s, v) -> s + v)), 9) AS norm
  FROM embeddings
), med AS (
  SELECT label, quantile_cont(norm, 0.5) AS med FROM e GROUP BY 1
), dev AS (
  SELECT e.label, norm, med, abs(norm - med) AS d
  FROM e JOIN med USING (label)
), mad AS (
  SELECT label, quantile_cont(d, 0.5) AS mad FROM dev GROUP BY 1
)
SELECT dev.label AS label,
       COUNT(*) AS n_vecs,
       SUM(CASE WHEN d > 3 * mad THEN 1 ELSE 0 END) AS n_norm_outliers,
       round(MIN(med), 6) AS median_norm,
       round(MIN(mad), 6) AS mad_norm
FROM dev JOIN mad USING (label)
GROUP BY 1
"""

QUERIES["a169_embedding_norm_outliers"] = QuerySpec(
    a169_embedding_norm_outliers, A169_SQL
)
