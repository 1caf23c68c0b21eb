"""LLM-training-data pipeline operators (beyond-reference surface,
BASELINE.json north_star): deduplication, similarity search, text
analysis, multimodal column plumbing — all designed for 100 TB scale
(no driver materialization, shuffle only where semantically required).
"""

from .cluster import connected_components, near_dedup
from .sampling import hash_sample, pack_shards, stratified_hash_sample
from .dedup import (
    exact_dedup, minhash_signatures, minhash_lsh_pairs, ngram_jaccard,
    simhash, simhash_pairs,
)
from .similarity import cosine_topk, lsh_ann_topk, embedding_near_dupes
from .text import (
    token_count, quality_score, lang_id, fingerprint, shingles,
)

__all__ = [
    "exact_dedup", "minhash_signatures", "minhash_lsh_pairs",
    "ngram_jaccard", "simhash", "simhash_pairs",
    "connected_components", "near_dedup",
    "hash_sample", "stratified_hash_sample", "pack_shards",
    "cosine_topk", "lsh_ann_topk", "embedding_near_dupes",
    "token_count", "quality_score", "lang_id", "fingerprint", "shingles",
]
