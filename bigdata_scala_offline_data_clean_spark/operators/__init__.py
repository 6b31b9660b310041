from .etl import (
    dedup_latest,
    merge_full_outer,
    rename_prefix,
    scd1_upsert,
    stamp_audit,
    star_denormalize,
)
from .dedup import (
    candidate_pairs,
    exact_dedup,
    exact_dedup_groups,
    jaccard_verify,
    lsh_bands,
    minhash_dedup_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from .similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    ivf_ann_topk,
    lsh_ann_topk,
    train_ivf_centroids,
)
from .skew import salted_aggregate, salted_join
from .quality import orphan_rows, profile_columns, uniqueness_violations
from .sessionize import session_stats, sessionize
from .temporal import asof_join, range_join_bucketed
from .text import (
    doc_fingerprint,
    language_id,
    shingle_fingerprint,
    token_count_bpe,
    with_text_stats,
)

__all__ = [
    "asof_join",
    "candidate_pairs",
    "cosine_topk",
    "dedup_latest",
    "doc_fingerprint",
    "embedding_neardup_pairs",
    "exact_dedup",
    "exact_dedup_groups",
    "ivf_ann_topk",
    "jaccard_verify",
    "language_id",
    "lsh_ann_topk",
    "lsh_bands",
    "merge_full_outer",
    "minhash_dedup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "orphan_rows",
    "profile_columns",
    "range_join_bucketed",
    "rename_prefix",
    "salted_aggregate",
    "salted_join",
    "scd1_upsert",
    "session_stats",
    "sessionize",
    "shingle_fingerprint",
    "shingles",
    "simhash",
    "stamp_audit",
    "star_denormalize",
    "token_count_bpe",
    "train_ivf_centroids",
    "uniqueness_violations",
    "with_text_stats",
]
