from .dedup import (
    exact_dedup,
    keep_first,
    minhash_signature,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from .joins import broadcast_lookup_join, integrity_check, left_join_with_log
from .similarity import cosine_topk_bruteforce, cosine_topk_lsh

__all__ = [
    "exact_dedup",
    "keep_first",
    "minhash_signature",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "broadcast_lookup_join",
    "integrity_check",
    "left_join_with_log",
    "cosine_topk_bruteforce",
    "cosine_topk_lsh",
]
