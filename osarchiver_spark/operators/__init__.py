from osarchiver_spark.operators.retention import (
    frozen_now,
    retention_cutoff,
    retention_filter,
    remaining_after_archive,
)

__all__ = [
    "frozen_now",
    "retention_cutoff",
    "retention_filter",
    "remaining_after_archive",
]
