"""Round-4 wave-17 operators with DuckDB oracles — the model-audit and
split-hygiene family: dedup-aware train/val splitting (near-dup clusters
never straddle the split boundary), exact tie-corrected Mann-Whitney AUC per
group, and a Gopher-style document quality rule suite. Every query
value-gated hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .queries import QueryDef, load

EXTRAS7_REGISTRY: dict[str, QueryDef] = {}


# --------------------------------------------------------------------------
# dedup-aware train/val split
# --------------------------------------------------------------------------

DEDUP_SPLIT_SALT = 1014
DEDUP_SPLIT_FRACTIONS = {"train": 0.8, "val": 0.2}


def q_corpus_split_dedup_aware(sf_dir: str):
    """Train/val split that can never leak near-duplicates across the
    boundary: minhash near-dup pairs -> connected components -> every doc
    hashed into its split by its CLUSTER KEEPER id, not its own id, so a
    whole duplicate cluster lands on one side (the split-hygiene rule that
    makes held-out perplexity honest). Composition of the registry's dedup
    resolution (`extras/dedup.cluster_keepers`) with the SplitMix64
    integer-threshold assignment (`extras/shuffle`)."""
    from .extras.dedup import cluster_keepers, minhash_lsh_pairs
    from .extras.shuffle import sm64_key
    from .queries_extras import _corpus_with_dups

    corpus = _corpus_with_dups(sf_dir)
    pairs = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=32, verify_threshold=0.5
    ).select_columns(["id_a", "id_b"])
    keepers = cluster_keepers(corpus, pairs, id_col="doc_id")

    names = list(DEDUP_SPLIT_FRACTIONS)
    edges = []
    cum = 0.0
    for n in names[:-1]:
        cum += DEDUP_SPLIT_FRACTIONS[n]
        edges.append(np.uint64(min(int(cum * 2**64), 2**64 - 1)))

    def _assign(batch: pa.Table) -> pa.Table:
        keeper = batch.column("keeper_id").to_numpy(zero_copy_only=False)
        h = sm64_key(keeper, DEDUP_SPLIT_SALT)
        out = np.full(len(h), names[-1], dtype=object)
        prev = np.zeros(len(h), dtype=bool)
        for name, edge in zip(names, edges):
            m = (h < edge) & ~prev
            out[m] = name
            prev |= m
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks(),
                "split": pa.array(out, pa.string()),
            }
        )

    return keepers.map_batches(_assign, batch_format="pyarrow")


def _sql_split_dedup_aware() -> str:
    from .extras.shuffle import sql_sm64_chain
    from .queries_extras import _SQL_DUP_CTES

    names = list(DEDUP_SPLIT_FRACTIONS)
    cum, whens = 0.0, []
    for n in names[:-1]:
        cum += DEDUP_SPLIT_FRACTIONS[n]
        whens.append(f"WHEN h < {int(cum * 2**64)} THEN '{n}'")
    chain = sql_sm64_chain("keep", "keeper", DEDUP_SPLIT_SALT)
    return f"""
WITH RECURSIVE {_SQL_DUP_CTES},
edges AS (SELECT id_a AS a, id_b AS b FROM dup
          UNION ALL SELECT id_b, id_a FROM dup),
reach(id, r) AS (
  SELECT id, id FROM corpus
  UNION
  SELECT e.a, reach.r FROM edges e JOIN reach ON reach.id = e.b
),
keep AS (SELECT id AS doc_id, min(r) AS keeper FROM reach GROUP BY id),
{chain}
SELECT doc_id, CASE {' '.join(whens)} ELSE '{names[-1]}' END AS split FROM h3
"""


# --------------------------------------------------------------------------
# exact grouped Mann-Whitney AUC
# --------------------------------------------------------------------------

def q_stats_group_auc(sf_dir: str):
    """Per-returnflag AUC of extended price (cents) predicting a high-
    quantity order line (l_quantity >= 26): exact tie-corrected rank-sum via
    `extras/stats.group_rank_auc` — distinct (group, score) counts folded
    through one narrow sort, 2U accumulated per block with driver-folded
    per-group carries; ONE float division per group at the end."""
    from .extras.stats import group_rank_auc

    li = load(sf_dir, "lineitem", ["l_returnflag", "l_quantity", "l_extendedprice"])

    def _prep(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "g": b.column("l_returnflag").combine_chunks(),
                "v": pc.cast(
                    pc.round(pc.multiply(b.column("l_extendedprice"), 100.0)),
                    pa.int64(),
                ),
                "lab": pc.cast(
                    pc.greater_equal(b.column("l_quantity"), 26.0), pa.int64()
                ),
            }
        )

    out = group_rank_auc(
        li.map_batches(_prep, batch_format="pyarrow"), "g", "v", "lab"
    )
    return out.rename_columns(["l_returnflag", "n_pos", "n_neg", "auc"])


# 2*avg_rank = 2*rank() + ties - 1 stays integer; AUC = (sum over positives
# of 2*avg_rank - n1*(n1+1)) / (2*n1*n0), one float division
SQL_GROUP_AUC = """
WITH b AS (SELECT l_returnflag AS g,
                  CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
                  CASE WHEN l_quantity >= 26 THEN 1 ELSE 0 END AS lab
           FROM lineitem),
r AS (SELECT g, lab,
             2 * rank() OVER (PARTITION BY g ORDER BY v)
               + count(*) OVER (PARTITION BY g, v) - 1 AS r2
      FROM b),
s AS (SELECT g, sum(CASE WHEN lab = 1 THEN r2 ELSE 0 END) AS r2sum,
             sum(lab) AS n1, count(*) - sum(lab) AS n0
      FROM r GROUP BY g)
SELECT g AS l_returnflag, CAST(n1 AS BIGINT) AS n_pos,
       CAST(n0 AS BIGINT) AS n_neg,
       CAST(r2sum - n1 * (n1 + 1) AS DOUBLE) / (2.0 * n1 * n0) AS auc
FROM s
"""


# --------------------------------------------------------------------------
# Gopher-style quality rule suite
# --------------------------------------------------------------------------

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 15, 100_000


def q_text_gopher_rules(sf_dir: str):
    """Gopher-rule document quality suite (Rae et al. 2021 §A1.1 shape) in
    integer arithmetic — per doc: word-count bounds, mean word length in
    [3, 10] (3n <= chars <= 10n, no float), >= 80 % words containing an
    alphabetic char (5·n_alpha >= 4·n), >= 2 stop-word occurrences, and
    symbol-to-word ratio <= 0.1 ('#' chars + '...' runs; 10·sym <= n).
    All flags per doc plus the conjunctive keep bit; one streaming
    Arrow-kernel pass, no Python per row."""
    docs = load(sf_dir, "documents", ["doc_id", "text"])
    stop_arr = pa.array(GOPHER_STOPWORDS, pa.string())

    def _rules(b: pa.Table) -> pa.Table:
        text = b.column("text").combine_chunks()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, r"\s+")
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        nonempty = pc.greater(pc.utf8_length(flat), 0)
        ndocs = len(text)
        ne = nonempty.to_numpy(zero_copy_only=False)
        n_words = np.bincount(parent[ne], minlength=ndocs).astype(np.int64)
        alpha = pc.match_substring_regex(flat, "[a-zA-Z]").to_numpy(
            zero_copy_only=False
        )
        n_alpha = np.bincount(parent[alpha & ne], minlength=ndocs).astype(np.int64)
        stop = pc.is_in(
            pc.utf8_lower(flat), value_set=stop_arr
        ).to_numpy(zero_copy_only=False)
        n_stop = np.bincount(parent[stop & ne], minlength=ndocs).astype(np.int64)
        # mean word length bounds: total non-whitespace chars vs word count
        n_chars = pc.utf8_length(text).to_numpy(zero_copy_only=False).astype(np.int64)
        n_ws = (
            pc.count_substring_regex(text, r"\s")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        wchars = n_chars - n_ws
        n_hash = (
            pc.count_substring(text, "#").to_numpy(zero_copy_only=False).astype(np.int64)
        )
        n_ell = (
            pc.count_substring(text, "...")
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sym = n_hash + n_ell
        p_len = (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS)
        p_wlen = (3 * n_words <= wchars) & (wchars <= 10 * n_words)
        p_alpha = 5 * n_alpha >= 4 * n_words
        p_stop = n_stop >= 2
        p_sym = 10 * sym <= n_words
        keep = p_len & p_wlen & p_alpha & p_stop & p_sym
        i64 = lambda a: pa.array(a.astype(np.int64), pa.int64())
        return pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "n_words": pa.array(n_words, pa.int64()),
                "pass_len": i64(p_len),
                "pass_wordlen": i64(p_wlen),
                "pass_alpha": i64(p_alpha),
                "pass_stop": i64(p_stop),
                "pass_symbol": i64(p_sym),
                "keep": i64(keep),
            }
        )

    return docs.map_batches(_rules, batch_format="pyarrow")


_STOP_SQL = ", ".join(f"'{w}'" for w in GOPHER_STOPWORDS)

SQL_GOPHER = rf"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(trim(text), '\s+'),
                     x -> x <> '') AS toks
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         length(regexp_replace(text, '\s', '', 'g')) AS wchars,
         len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS n_alpha,
         len(list_filter(toks, x -> list_contains([{_STOP_SQL}], lower(x))))
           AS n_stop,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\.\.\.')) AS sym
  FROM t),
f AS (
  SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
         CASE WHEN n_words >= {GOPHER_MIN_WORDS}
               AND n_words <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END AS pass_len,
         CASE WHEN 3 * n_words <= wchars AND wchars <= 10 * n_words
              THEN 1 ELSE 0 END AS pass_wordlen,
         CASE WHEN 5 * n_alpha >= 4 * n_words THEN 1 ELSE 0 END AS pass_alpha,
         CASE WHEN n_stop >= 2 THEN 1 ELSE 0 END AS pass_stop,
         CASE WHEN 10 * sym <= n_words THEN 1 ELSE 0 END AS pass_symbol
  FROM m)
SELECT doc_id, n_words,
       CAST(pass_len AS BIGINT) AS pass_len,
       CAST(pass_wordlen AS BIGINT) AS pass_wordlen,
       CAST(pass_alpha AS BIGINT) AS pass_alpha,
       CAST(pass_stop AS BIGINT) AS pass_stop,
       CAST(pass_symbol AS BIGINT) AS pass_symbol,
       CAST(pass_len * pass_wordlen * pass_alpha * pass_stop * pass_symbol
            AS BIGINT) AS keep
FROM f
"""


EXTRAS7_REGISTRY.update(
    {
        "corpus_split_dedup_aware": QueryDef(
            q_corpus_split_dedup_aware, _sql_split_dedup_aware()
        ),
        "stats_group_auc": QueryDef(q_stats_group_auc, SQL_GROUP_AUC),
        "text_gopher_rules": QueryDef(q_text_gopher_rules, SQL_GOPHER),
    }
)
