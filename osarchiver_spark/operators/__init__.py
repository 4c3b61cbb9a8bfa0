from osarchiver_spark.operators.retention import (
    frozen_now,
    retention_cutoff,
    retention_filter,
    remaining_after_archive,
)
from osarchiver_spark.operators.archive import Archiver, ArchivingFailed, archive_and_remaining
from osarchiver_spark.operators.asof import asof_join_pandas, asof_join_union
from osarchiver_spark.operators.dedup import (
    embedding_neardup_pairs,
    exact_dedup,
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_candidates,
)
from osarchiver_spark.operators.ivf import ivf_topk, kmeans_fit
from osarchiver_spark.operators.merge import merge_insert_if_absent, merge_upsert
from osarchiver_spark.operators.multimodal import (
    attach_binary,
    extract_metadata,
    extract_metadata_codec,
    sample_frames,
)
from osarchiver_spark.operators.scd import scd2_apply, scd2_as_of, scd2_current, scd2_init
from osarchiver_spark.operators.similarity import brute_force_topk, lsh_topk
from osarchiver_spark.operators.skew import key_skew_profile, salted_count_sum, salted_join

__all__ = [
    "frozen_now",
    "retention_cutoff",
    "retention_filter",
    "remaining_after_archive",
    "Archiver",
    "ArchivingFailed",
    "archive_and_remaining",
    "asof_join_pandas",
    "asof_join_union",
    "embedding_neardup_pairs",
    "exact_dedup",
    "exact_dedup_groups",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash_candidates",
    "ivf_topk",
    "kmeans_fit",
    "merge_insert_if_absent",
    "merge_upsert",
    "attach_binary",
    "extract_metadata",
    "extract_metadata_codec",
    "sample_frames",
    "scd2_apply",
    "scd2_as_of",
    "scd2_current",
    "scd2_init",
    "brute_force_topk",
    "lsh_topk",
    "key_skew_profile",
    "salted_count_sum",
    "salted_join",
]
