"""Composite operators (SURVEY §2.2-§2.7 + [EXT] layers)."""

from dissertation_data_pipeline_spark.operators.relational import (  # noqa: F401
    union_conform,
    frequency,
    top_k_frequency,
    anti_report,
    duplicate_groups,
    conflict_report,
    summary_stats,
)
from dissertation_data_pipeline_spark.operators.dedup import (  # noqa: F401
    dedup_priority,
    dedup_latest_per_key,
    flag_both_sources,
    merge_duplicates_coalesce_fill,
)
