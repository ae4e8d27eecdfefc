"""BPE tokenizer TRAINING: learn the first R merge rules from a corpus.

The missing half of the tokenization story (``textstats.token_counts`` /
the BPE-ish split APPLY tokens; this learns the vocabulary): classic
byte-pair encoding (Sennrich et al. 2016) — repeatedly find the most
frequent adjacent symbol pair across the corpus and merge it, greedy
left-to-right non-overlapping within each word.

Shape, Ray-Data-first and 100-TB-safe — the same split HuggingFace
``tokenizers`` uses: the CORPUS-sized work is one distributed word-count
(tokenize ``map_batches`` -> ``exact_value_counts`` sort+boundary-scan),
optionally capped to the top ``max_vocab`` words by one (count, word) sort;
the merge loop then runs on the BOUNDED word-frequency table on the driver
(vocab-sized like the k-means centroid step — a 100-TB corpus still has a
capped vocabulary, and merge rounds never touch the corpus again).

Determinism contract (what makes the unrolled-SQL oracle value-exact):
- pair counts include OVERLAPPING adjacent occurrences ('aaa' counts (a,a)
  twice), weighted by word frequency;
- the winning pair each round is (count DESC, pair-string ASC);
- merging is greedy leftmost non-overlapping (equivalently: within each
  maximal run of consecutive match positions, every odd-ranked position
  merges) — the SQL replays exactly that with two window functions.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# largest whole-vocabulary driver gather bpe training will accept before
# demanding an explicit max_vocab (a 1M-word table is ~tens of MB)
BPE_VOCAB_GATHER_CAP = 1_000_000


def _word_counts(
    ds: rd.Dataset, text_col: str, max_vocab: int | None
) -> list[tuple[str, int]]:
    from .stats import exact_value_counts

    def _words(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column(text_col).combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = toks.flatten()
        return pa.table({"w": flat.filter(pc.not_equal(flat, ""))})

    wc = exact_value_counts(ds.map_batches(_words, batch_format="pyarrow"), "w")
    if max_vocab is not None:
        wc = wc.sort(["n", "w"], descending=[True, False]).limit(max_vocab)
    else:
        # max_vocab=None gathers the WHOLE vocabulary to the driver for the
        # merge loop — fine at test scale, unbounded on a web corpus whose
        # vocab is ~billions. Refuse loudly above a cap (the node_cap
        # discipline of extras/graph.py BFS) instead of silently OOMing;
        # wc is materialized (sort+boundary-scan output), so count is free.
        n_vocab = wc.count()
        if n_vocab > BPE_VOCAB_GATHER_CAP:
            raise ValueError(
                f"corpus vocabulary has {n_vocab} distinct words, above the "
                f"driver-gather cap ({BPE_VOCAB_GATHER_CAP}); pass max_vocab "
                "to train on the top-frequency subset"
            )
    out = wc.to_pandas()
    if out.empty or "w" not in out.columns:
        # fully-empty corpora can drop the schema on the empty output
        return []
    return list(zip(out["w"], out["n"].astype(int)))


def _greedy_merge(seq: list[str], l: str, r: str) -> list[str]:
    out, i, m = [], 0, len(seq)
    while i < m:
        if i + 1 < m and seq[i] == l and seq[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def bpe_merges(
    ds: rd.Dataset,
    text_col: str = "text",
    *,
    rounds: int = 4,
    max_vocab: int | None = None,
) -> pa.Table:
    """Learn the first ``rounds`` BPE merge rules; returns the bounded table
    (rank, pair, merged, c) with rank 1-based, ``pair`` the space-joined
    symbol pair, ``merged`` its concatenation, ``c`` its corpus-weighted
    adjacent-occurrence count at selection time. Stops early when no
    adjacent pair remains."""
    vocab = _word_counts(ds, text_col, max_vocab)
    seqs: list[tuple[list[str], int]] = [(list(w), n) for w, n in vocab]
    ranks, pairs, merged, counts = [], [], [], []
    for rnd in range(rounds):
        cnt: Counter[tuple[str, str]] = Counter()
        for seq, n in seqs:
            for i in range(len(seq) - 1):
                cnt[(seq[i], seq[i + 1])] += n
        if not cnt:
            break
        (l, r), c = min(cnt.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))
        ranks.append(rnd + 1)
        pairs.append(f"{l} {r}")
        merged.append(l + r)
        counts.append(int(c))
        seqs = [
            (_greedy_merge(seq, l, r) if len(seq) > 1 else seq, n) for seq, n in seqs
        ]
    return pa.table(
        {
            "rank": pa.array(ranks, pa.int64()),
            "pair": pa.array(pairs, pa.string()),
            "merged": pa.array(merged, pa.string()),
            "c": pa.array(counts, pa.int64()),
        }
    )
