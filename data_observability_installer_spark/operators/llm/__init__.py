from .text import language_id, quality_score, token_counts, fingerprint
from .dedup import dedup_exact, ngram_jaccard_pairs, minhash_pairs, simhash_buckets
from .similarity import topk_bruteforce, topk_lsh, embedding_near_dups
from .curation import (
    curation_filter,
    deterministic_split,
    pii_screen,
    stratified_sample,
)

__all__ = [
    "curation_filter",
    "deterministic_split",
    "pii_screen",
    "stratified_sample",
    "language_id",
    "quality_score",
    "token_counts",
    "fingerprint",
    "dedup_exact",
    "ngram_jaccard_pairs",
    "minhash_pairs",
    "simhash_buckets",
    "topk_bruteforce",
    "topk_lsh",
    "embedding_near_dups",
]
