from .etl import (
    dedup_latest,
    merge_full_outer,
    rename_prefix,
    scd1_upsert,
    stamp_audit,
    star_denormalize,
)

__all__ = [
    "dedup_latest",
    "merge_full_outer",
    "rename_prefix",
    "scd1_upsert",
    "stamp_audit",
    "star_denormalize",
]
