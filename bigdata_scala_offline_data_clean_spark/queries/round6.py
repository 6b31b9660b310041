"""Round-6 query registration shim.

The 3173-line round-6 module was split in round 10 (VERDICT r9 task
#7) into three family modules -- :mod:`.round6_stats` (corpus
statistics / drift / monitoring), :mod:`.round6_sim` (dedup /
similarity / embedding / graph), :mod:`.round6_wh` (warehouse /
retail analytics / pipeline).  This shim re-exports every top-level
name (tests and round7 import helpers from here) and rebuilds
``QUERIES`` in the ORIGINAL registration order, so ``all_queries()``
and the frozen first-50 driver slots are byte-identical to the
pre-split registry (pinned by ``test_round6_split_preserves_registry``).
"""

from __future__ import annotations

from . import QuerySpec

from .round6_stats import (  # noqa: F401
    _A110_LOW,
    a110_char_entropy,
    A110_SQL,
    _A111_MIN_FREQ,
    a111_zipf_fit,
    A111_SQL,
    _A113_N,
    a113_ngram_novelty,
    A113_SQL,
    a116_chi2_independence,
    A116_SQL,
    c51_crawl_health,
    C51_SQL,
    a121_langid_eval,
    _a121_sql,
    _score_daily_anomaly,
    a122_volume_anomaly,
    A122_SQL,
    s13_stream_anomaly,
    _A128_K,
    a128_exact_k_sample,
    A128_SQL,
    a129_stop_gram_stats,
    A129_SQL,
    _A130_LOOKBACK,
    a130_weekday_baseline,
    A130_SQL,
    _A131_N,
    a131_source_overlap,
    A131_SQL,
    _A135_SIZES,
    a135_vocab_coverage_curve,
    A135_SQL,
    a137_trigram_backoff,
    A137_SQL,
    _A139_BUCKETS,
    a139_psi_drift,
    _psi_report,
    A139_SQL,
)
from .round6_stats import QUERIES as _Q_STATS
from .round6_sim import (  # noqa: F401
    a114_canonical_selection,
    _a114_sql,
    _A115_DRIFT,
    a115_centroid_shift,
    A115_SQL,
    a119_knn_classify,
    _a119_sql,
    a123_jaccard_threshold_curve,
    _a123_sql,
    a126_lsh_recall_eval,
    _a126_sql,
    a127_dedup_impact,
    _a127_sql,
    _A112_REL,
    a112_sketch_overlap,
    A112_SQL,
    _A132_K,
    a132_kmeans_fixed,
    A132_SQL,
    a133_bfs_hops,
    A133_SQL,
    a138_cluster_sizes,
    _a138_sql,
)
from .round6_sim import QUERIES as _Q_SIM
from .round6_wh import (  # noqa: F401
    _A118_Q,
    a118_rfm_segments,
    A118_SQL,
    a117_asof_forward,
    A117_SQL,
    c49_merge_into,
    C49_SQL,
    _C50_K,
    c50_generalize_kanon,
    C50_SQL,
    a120_basket_rules,
    A120_SQL,
    c52_inferred_members,
    C52_SQL,
    _A124_FACTOR,
    a124_excess_inventory,
    A124_SQL,
    a125_abc_analysis,
    A125_SQL,
    _C53_MIN_ROWS,
    c53_write_audit_publish,
    C53_SQL,
    _C54_USER,
    c54_subject_access_export,
    C54_SQL,
    a134_linear_attribution,
    A134_SQL,
    _C55_TARGET_MB,
    c55_shuffle_advisor,
    C55_SQL,
    a136_label_balance_weights,
    A136_SQL,
    _row_digest,
    c56_table_checksum,
    C56_SQL,
    _A140_TOPK,
    a140_topk_movers,
    A140_SQL,
)
from .round6_wh import QUERIES as _Q_WH

_MERGED = {**_Q_STATS, **_Q_SIM, **_Q_WH}

# original round-6 registration order -- the registry contract
_ORDER = [
    "a110_char_entropy",
    "a111_zipf_fit",
    "a113_ngram_novelty",
    "a116_chi2_independence",
    "a118_rfm_segments",
    "a114_canonical_selection",
    "a115_centroid_shift",
    "a117_asof_forward",
    "a119_knn_classify",
    "c49_merge_into",
    "c50_generalize_kanon",
    "c51_crawl_health",
    "a120_basket_rules",
    "a121_langid_eval",
    "a122_volume_anomaly",
    "a123_jaccard_threshold_curve",
    "c52_inferred_members",
    "a124_excess_inventory",
    "a125_abc_analysis",
    "s13_stream_anomaly",
    "a126_lsh_recall_eval",
    "a127_dedup_impact",
    "a128_exact_k_sample",
    "c53_write_audit_publish",
    "a129_stop_gram_stats",
    "a130_weekday_baseline",
    "c54_subject_access_export",
    "a131_source_overlap",
    "a112_sketch_overlap",
    "a132_kmeans_fixed",
    "a133_bfs_hops",
    "a134_linear_attribution",
    "a135_vocab_coverage_curve",
    "c55_shuffle_advisor",
    "a136_label_balance_weights",
    "a137_trigram_backoff",
    "a138_cluster_sizes",
    "c56_table_checksum",
    "a139_psi_drift",
    "a140_topk_movers",
]

QUERIES: dict[str, QuerySpec] = {n: _MERGED[n] for n in _ORDER}
