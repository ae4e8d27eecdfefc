from .dedup import (  # noqa: F401
    exact_dedup,
    minhash_signatures,
    minhash_lsh_pairs,
    simhash_signatures,
    simhash_dup_pairs,
    ngram_jaccard,
    embedding_dup_pairs,
)
from .similarity import brute_force_topk, lsh_topk  # noqa: F401
from .textstats import token_counts, quality_scores, language_id, fingerprints  # noqa: F401
