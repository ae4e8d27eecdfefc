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
from .dedup import cluster_keepers  # noqa: F401
from .cleanse import clean_corpus  # noqa: F401
from .window import per_key_window  # noqa: F401
from .pack import pack_sequences  # noqa: F401
from .asof import asof_join, interval_join  # noqa: F401
from .graph import pagerank_int, triangle_count, sum_per_key  # noqa: F401
from .retrieval import build_postings, bm25_topk  # noqa: F401
from .redact import redact_text, PII_RULES  # noqa: F401
from .decontaminate import decontaminate, ngram_set  # noqa: F401
from .shuffle import deterministic_shuffle, split_assign, mixture_sample  # noqa: F401
from .chunk import chunk_documents  # noqa: F401
from .dedup import duplicate_span_stats  # noqa: F401
from .textstats import repetition_stats  # noqa: F401
from .textstats import normalize_text, unigram_nll  # noqa: F401
from .classify import classifier_scores, default_weights  # noqa: F401
from .graph import kcore  # noqa: F401
from .bpe import bpe_merges  # noqa: F401
from .stats import cms_sketch, cms_estimate  # noqa: F401
from .urls import url_blocklist_filter  # noqa: F401
from .shuffle import token_budget_cut  # noqa: F401
from .feature import hashing_features, target_encode  # noqa: F401
from .joins import band_join  # noqa: F401
from .window import ohlc_bars  # noqa: F401
from .stats import benford_audit, contingency_table, mann_whitney_u2  # noqa: F401
from .graph import local_clustering, weighted_sssp  # noqa: F401
from .privacy import mondrian_partition  # noqa: F401
from .textstats import rake_scores  # noqa: F401
from .multimodal import extract_tiles, downmix_audio_stats  # noqa: F401
