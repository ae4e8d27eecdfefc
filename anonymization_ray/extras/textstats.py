"""Text analysis: token counting, quality scoring, language ID, fingerprints.

All stateless vectorized ``map_batches`` stages (pyarrow.compute / numpy);
the quality/token operators are SQL-mirrored for the oracle gate.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

STOPWORDS = ("the", "a", "of", "and", "is", "in", "to")

# tiny per-language marker lexicons for the n-gram/stopword heuristic
_LANG_MARKERS = {
    "en": {"the", "and", "is", "of", "to"},
    "de": {"der", "die", "und", "ist", "das"},
    "fr": {"le", "la", "et", "est", "les"},
    "es": {"el", "la", "y", "es", "los"},
    "zh": set(),  # fallback: non-ascii ratio
}


def token_counts(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, n_tokens): whitespace tokenization, vectorized regex count."""

    def _count(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        n = pc.count_substring_regex(txt, r"\S+")
        return pa.table(
            {id_col: batch.column(id_col).combine_chunks(), "n_tokens": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(_count, batch_format="pyarrow")


BPE_SPLIT = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_counts(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, n_bpe): BPE-style pre-tokenization count — letter runs, digit
    runs, and individual punctuation as separate tokens (the GPT-2
    pre-tokenizer shape restricted to an RE2 subset shared with the SQL
    oracle). Vectorized Arrow regex count; no Python per row."""

    def _count(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column(text_col), BPE_SPLIT)
        return pa.table(
            {id_col: batch.column(id_col).combine_chunks(), "n_bpe": pc.cast(n, pa.int64())}
        )

    return ds.map_batches(_count, batch_format="pyarrow")


def quality_scores(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, n_chars, n_tokens, stopword_ratio, alpha_ratio) quality signals.

    Mirrored exactly in SQL (queries_extras.py) for the oracle check."""
    sw = pa.array(sorted(STOPWORDS))

    def _score(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col)
        n_chars = pc.cast(pc.utf8_length(txt), pa.int64())
        n_tokens = pc.cast(pc.count_substring_regex(txt, r"\S+"), pa.int64())
        n_alpha = pc.cast(pc.count_substring_regex(txt, r"[A-Za-z]"), pa.int64())
        # stopword count: vectorized via split + isin per batch
        toks = pc.split_pattern_regex(txt, r"\s+")
        flat = pc.list_flatten(toks)
        is_sw = pc.is_in(flat, value_set=sw)
        # re-aggregate per row via list offsets
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flags = pc.cast(is_sw, pa.int64()).to_numpy(zero_copy_only=False)
        offsets = np.concatenate([[0], np.cumsum(lens)])
        sw_counts = np.add.reduceat(
            np.concatenate([flags, [0]]), offsets[:-1]
        ) * (lens > 0)
        nt = n_tokens.to_numpy(zero_copy_only=False).astype(np.float64)
        nc = n_chars.to_numpy(zero_copy_only=False).astype(np.float64)
        sw_ratio = np.where(nt > 0, sw_counts / np.maximum(nt, 1), 0.0)
        alpha_ratio = np.where(
            nc > 0, n_alpha.to_numpy(zero_copy_only=False) / np.maximum(nc, 1), 0.0
        )
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "n_chars": n_chars,
                "n_tokens": n_tokens,
                "stopword_ratio": pa.array(sw_ratio, pa.float64()),
                "alpha_ratio": pa.array(alpha_ratio, pa.float64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def language_id(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, lang_pred): deterministic marker-word/charset heuristic. Accuracy
    depends on the corpus (the synthetic docs' lang labels are decorative);
    determinism is the contract tested."""

    def _lid(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        preds = []
        for t in texts:
            t = t or ""
            toks = set(t.lower().split())
            nonascii = sum(1 for ch in t if ord(ch) > 127)
            if len(t) and nonascii / len(t) > 0.3:
                preds.append("zh")
                continue
            best, best_n = "en", -1
            for lang, markers in _LANG_MARKERS.items():
                n = len(toks & markers)
                if n > best_n:
                    best, best_n = lang, n
            preds.append(best)
        return pa.table(
            {id_col: batch.column(id_col).combine_chunks(), "lang_pred": pa.array(preds)}
        )

    return ds.map_batches(_lid, batch_format="pyarrow")


def fingerprints(
    ds: rd.Dataset, text_col: str, id_col: str, *, window: int = 8, k: int = 5
) -> rd.Dataset:
    """(id, md5, winnow_fp list<int64>): content md5 + winnowing rolling-hash
    fingerprints (min crc32 shingle per sliding window — robust to local
    edits)."""

    def _fp(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        md5s, fps = [], []
        for t in texts:
            t = t or ""
            md5s.append(hashlib.md5(t.encode()).hexdigest())
            enc = t.encode()
            if len(enc) < k:
                fps.append([zlib.crc32(enc)])
                continue
            hs = np.fromiter(
                (zlib.crc32(enc[i : i + k]) for i in range(len(enc) - k + 1)), dtype=np.int64
            )
            if len(hs) <= window:
                fps.append([int(hs.min())])
            else:
                from numpy.lib.stride_tricks import sliding_window_view

                mins = sliding_window_view(hs, window).min(axis=1)
                fps.append(sorted(set(int(x) for x in mins)))
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "md5": pa.array(md5s, pa.string()),
                "winnow_fp": pa.array(fps, pa.list_(pa.int64())),
            }
        )

    return ds.map_batches(_fp, batch_format="pyarrow")


def repetition_stats(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, n_bigrams, n_distinct, n_dup): within-document word-bigram
    repetition — the Gopher-style "fraction of duplicate n-grams" quality
    gate in exact integer form (n_dup = n_bigrams - n_distinct; the consumer
    divides). Docs with fewer than two tokens emit no row (no bigrams).

    All Arrow C kernels per batch: regex split → flatten with parent
    indices → adjacent-pair join (``binary_join_element_wise``) masked to
    same-document positions → within-batch ``group_by`` for total and
    distinct counts. A document never spans batches, so per-batch grouping
    is exact; nothing shuffles and the stage streams at input-byte rate.
    """

    def _rep(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        ids = batch.column(id_col).combine_chunks()
        if len(flat) < 2:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "n_bigrams": pa.array([], pa.int64()),
                    "n_distinct": pa.array([], pa.int64()),
                    "n_dup": pa.array([], pa.int64()),
                }
            )
        d = parent.to_numpy(zero_copy_only=False)
        same = pa.array(d[:-1] == d[1:])
        a = flat.slice(0, len(flat) - 1).filter(same)
        b = flat.slice(1).filter(same)
        bg = pc.binary_join_element_wise(a, b, " ")
        doc = pa.array(d[:-1][d[:-1] == d[1:]], pa.int64())
        t = pa.table({"doc": doc, "bg": bg})
        tot = t.group_by(["doc"]).aggregate([([], "count_all")])
        dis = (
            t.group_by(["doc", "bg"])
            .aggregate([])
            .group_by(["doc"])
            .aggregate([([], "count_all")])
        )
        j = tot.rename_columns(["doc", "n_bigrams"]).join(
            dis.rename_columns(["doc", "n_distinct"]), keys=["doc"]
        )
        n_bg = pc.cast(j.column("n_bigrams"), pa.int64())
        n_di = pc.cast(j.column("n_distinct"), pa.int64())
        return pa.table(
            {
                id_col: ids.take(j.column("doc")),
                "n_bigrams": n_bg,
                "n_distinct": n_di,
                "n_dup": pc.subtract(n_bg, n_di),
            }
        )

    return ds.map_batches(_rep, batch_format="pyarrow")


def normalize_text(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, text_norm, changed): canonical text normalization — Unicode NFC,
    control characters (except \\t \\n) stripped, whitespace runs collapsed
    to single spaces, edges trimmed. One stateless pass of Arrow kernels;
    ``changed`` is an exact int flag so the oracle value-checks the
    normalization itself, not just row counts."""

    def _norm(batch: pa.Table) -> pa.Table:
        import unicodedata

        txt = pc.cast(batch.column(text_col).combine_chunks(), pa.string())
        # NFC: this environment's Arrow utf8_normalize does NOT compose
        # (verified: NFD input passes through), so composition runs through
        # unicodedata — but ONLY on the non-ASCII minority, flagged by the
        # vectorized string_is_ascii kernel; ASCII rows never touch Python
        non_ascii = np.nonzero(
            pc.invert(pc.string_is_ascii(txt)).to_numpy(zero_copy_only=False)
        )[0]
        if len(non_ascii):
            vals = txt.to_numpy(zero_copy_only=False)
            for i in non_ascii:
                vals[i] = unicodedata.normalize("NFC", vals[i])
            txt_n = pa.array(vals, pa.string())
        else:
            txt_n = txt
        out = pc.replace_substring_regex(txt_n, r"[\x00-\x08\x0B-\x1F\x7F]", "")
        out = pc.utf8_trim_whitespace(
            pc.replace_substring_regex(out, r"\s+", " ")
        )
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "text_norm": out,
                "changed": pc.cast(pc.not_equal(out, txt), pa.int64()),
            }
        )

    return ds.map_batches(_norm, batch_format="pyarrow")


def unigram_nll(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """(id, n_tokens, nll_micro): unigram language-model negative
    log-likelihood per document — the CCNet-style perplexity quality filter
    in cross-engine-exact integer form. A token with corpus count ``c`` out
    of ``N`` total contributes ``floor(scale·(ln N − ln c))`` micro-nats;
    the per-doc score is the INTEGER sum of token contributions, so
    summation order can never change the value (float Σ then floor would
    tie the result to each engine's reduction order).

    Shape: corpus token counts via the sort+boundary-scan
    ``exact_value_counts`` (never a Ray groupby at vocabulary cardinality),
    gathered ONCE to sorted key/value arrays and broadcast via ``ray.put``;
    scoring is a stateless second pass (searchsorted lookup + ``bincount``
    per batch). At web scale the gather is the LM step — swap the exact
    full-vocabulary table for a fixed top-V model with an OOV bucket (the
    realistic deployment); the oracle pins the exact-vocabulary variant.
    """
    import ray

    from .stats import exact_value_counts

    def _tokens(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        return pa.table({"term": flat.filter(pc.not_equal(flat, ""))})

    tok = ds.select_columns([id_col, text_col]).map_batches(
        _tokens, batch_format="pyarrow"
    )
    counts = exact_value_counts(tok, "term").materialize()
    parts = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    if parts:
        vocab = pa.concat_tables(parts)
        terms = np.asarray(vocab.column("term").to_pylist())
        cnts = vocab.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(terms)
        terms, cnts = terms[order], cnts[order]
        total = int(cnts.sum())
        # per-term integer micro-nats, computed ONCE per distinct term
        nll_term = np.floor(
            scale * (np.log(float(total)) - np.log(cnts.astype(np.float64)))
        ).astype(np.int64)
    else:  # zero-token corpus: every doc emits no row downstream
        terms, nll_term = np.array([], dtype=str), np.array([], np.int64)
    ref = ray.put((terms, nll_term))

    def _score(batch: pa.Table) -> pa.Table:
        ts, nt = ray.get(ref)
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        d = parent.filter(keep).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "n_tokens": pa.array([], pa.int64()),
                    "nll_micro": pa.array([], pa.int64()),
                }
            )
        w = flat.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ts, w)
        np.clip(idx, 0, len(ts) - 1, out=idx)
        # every token is in the vocabulary by construction (same corpus)
        tok_nll = nt[idx]
        n_rows = len(batch)
        n_tok = np.bincount(d, minlength=n_rows)
        nll = np.bincount(d, weights=tok_nll, minlength=n_rows).astype(np.int64)
        nz = np.nonzero(n_tok)[0]
        return pa.table(
            {
                id_col: ids.take(pa.array(nz, pa.int64())),
                "n_tokens": pa.array(n_tok[nz], pa.int64()),
                "nll_micro": pa.array(nll[nz], pa.int64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def dsir_logweights(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    target_col: str,
    target_val: str,
    *,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """(id, n_tokens, logw_micro): DSIR-style importance weights (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling") in
    cross-engine-exact integer form.

    The target distribution is the subset of the corpus where
    ``target_col == target_val`` (e.g. ``lang == 'en'`` stands in for the
    high-quality target corpus); the raw distribution is the whole corpus.
    Each token contributes the add-one-smoothed log-ratio

        floor(scale * (ln(c_tgt+1) - ln(N_tgt+V) - ln(c_raw+1) + ln(N_raw+V)))

    (V = raw vocabulary size), computed ONCE per distinct term and summed as
    INTEGERS per document, so summation order can never change the value.
    Selection = top-k by ``logw_micro`` (the paper resamples with Gumbel
    noise; the deterministic rank is what an oracle can pin). The paper's
    hashed-bigram feature space drops in by swapping the tokenizer for a
    hashed-ngram kernel — the two-pass count/broadcast/score shape below is
    feature-agnostic.

    Shape: ONE tokenize pass feeds BOTH counts (the target counts are the
    same stream filtered on the carried ``target_col``), each via the
    sort+boundary-scan ``exact_value_counts`` — never a Ray groupby at
    vocabulary cardinality; the per-term weight table is built once on the
    driver (bounded by vocabulary, the same gather ``unigram_nll`` makes)
    and broadcast via ``ray.put``; scoring is a stateless second pass."""
    import ray

    from .stats import exact_value_counts

    def _tokens(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        is_tgt = pc.equal(batch.column(target_col), target_val)
        is_tgt = pc.fill_null(is_tgt, False).combine_chunks()
        return pa.table(
            {
                "term": flat.filter(keep),
                "is_tgt": is_tgt.take(parent.filter(keep)),
            }
        )

    tok = ds.select_columns([id_col, text_col, target_col]).map_batches(
        _tokens, batch_format="pyarrow"
    ).materialize()
    raw_counts = exact_value_counts(tok.select_columns(["term"]), "term").materialize()
    tgt_counts = exact_value_counts(
        tok.filter(expr="is_tgt == True").select_columns(["term"]), "term"
    )

    def _gather(counts) -> tuple[np.ndarray, np.ndarray]:
        parts = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
        if not parts:
            return np.array([], dtype=str), np.array([], np.int64)
        t = pa.concat_tables(parts)
        terms = np.asarray(t.column("term").to_pylist())
        cnts = t.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(terms)
        return terms[order], cnts[order]

    r_terms, r_cnts = _gather(raw_counts)
    t_terms, t_cnts = _gather(tgt_counts)
    vocab = len(r_terms)
    n_raw = int(r_cnts.sum())
    n_tgt = int(t_cnts.sum())
    # map target counts onto the raw vocabulary (raw is a superset: the
    # target subset's tokens all appear in the whole-corpus stream)
    ct = np.zeros(vocab, np.int64)
    if len(t_terms):
        pos = np.searchsorted(r_terms, t_terms)
        ct[pos] = t_cnts
    if vocab:
        # identical term order to the SQL oracle's expression
        w_term = np.floor(
            scale
            * (
                np.log(ct.astype(np.float64) + 1.0)
                - np.log(float(n_tgt + vocab))
                - np.log(r_cnts.astype(np.float64) + 1.0)
                + np.log(float(n_raw + vocab))
            )
        ).astype(np.int64)
    else:
        w_term = np.array([], np.int64)
    ref = ray.put((r_terms, w_term))

    def _score(batch: pa.Table) -> pa.Table:
        ts, wt = ray.get(ref)
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        d = parent.filter(keep).to_numpy(zero_copy_only=False)
        ids = batch.column(id_col).combine_chunks()
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "n_tokens": pa.array([], pa.int64()),
                    "logw_micro": pa.array([], pa.int64()),
                }
            )
        w = flat.to_numpy(zero_copy_only=False)
        idx = np.searchsorted(ts, w)
        np.clip(idx, 0, len(ts) - 1, out=idx)
        tok_w = wt[idx]
        n_rows = len(batch)
        n_tok = np.bincount(d, minlength=n_rows)
        lw = np.bincount(d, weights=tok_w, minlength=n_rows).astype(np.int64)
        nz = np.nonzero(n_tok)[0]
        return pa.table(
            {
                id_col: ids.take(pa.array(nz, pa.int64())),
                "n_tokens": pa.array(n_tok[nz], pa.int64()),
                "logw_micro": pa.array(lw[nz], pa.int64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")


def winnowing_fingerprints(
    ds: rd.Dataset, text_col: str, id_col: str, *, k: int = 8, w: int = 4
) -> rd.Dataset:
    """Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    SIGMOD 2003): hash every character k-gram, slide a w-gram window, and
    select each window's minimum hash, breaking ties by the RIGHTMOST
    position — the guarantee-bearing local fingerprinting scheme for
    plagiarism/overlap detection. Output: distinct (id, pos, fp) with pos
    the 0-based gram start and fp the selected hash masked to 63 bits
    (int64-safe on both engines; selection itself compares full 64-bit
    values).

    Hashes are md5-64 (little-endian first 8 bytes == DuckDB
    ``md5_number_upper``), memoized over the batch's unique gram vocabulary
    — the md5-per-unique-gram cost is the price of the value-exact SQL
    oracle, as in simhash. Window minima + rightmost-tie selection are
    vectorized per document with a stride-tricks sliding window (argmin of
    the reversed window). Docs with fewer than w grams emit nothing (no
    full window exists)."""
    import pandas as pd

    from .dedup import _md5_64

    def _win(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        grams: list[str] = []
        spans: list[tuple[int, int, int]] = []  # (row, start_in_flat, n_grams)
        for r, t in enumerate(texts):
            t = t or ""
            ng = len(t) - k + 1
            if ng < w:
                continue
            spans.append((r, len(grams), ng))
            grams.extend(t[i : i + k] for i in range(ng))
        if not spans:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pos": pa.array([], pa.int64()),
                    "fp": pa.array([], pa.int64()),
                }
            )
        codes, vocab = pd.factorize(np.array(grams, dtype=object))
        vh = np.fromiter(
            (_md5_64(g) for g in vocab), dtype=np.uint64, count=len(vocab)
        )
        flat_h = vh[codes]
        out_id, out_pos, out_fp = [], [], []
        for r, start, ng in spans:
            h = flat_h[start : start + ng]
            sw = np.lib.stride_tricks.sliding_window_view(h, w)
            # rightmost minimal gram per window: argmin of the reversed
            # window finds the LAST minimum of the original
            pos_in_win = w - 1 - sw[:, ::-1].argmin(axis=1)
            sel = np.unique(np.arange(sw.shape[0]) + pos_in_win)
            out_id.append(np.full(len(sel), ids[r], np.int64))
            out_pos.append(sel.astype(np.int64))
            out_fp.append((flat_h[start + sel] & np.uint64((1 << 63) - 1)).astype(np.int64))
        return pa.table(
            {
                id_col: pa.array(np.concatenate(out_id), pa.int64()),
                "pos": pa.array(np.concatenate(out_pos), pa.int64()),
                "fp": pa.array(np.concatenate(out_fp), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _win, batch_format="pyarrow"
    )


def bigram_nll(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """(id, n_bigrams, nll_micro): bigram conditional-LM negative
    log-likelihood per document — the order-2 sibling of :func:`unigram_nll`
    (a sharper CCNet-style quality signal: repeated-phrase spam scores LOW,
    incoherent token salad scores HIGH). Each in-document adjacent pair
    (w1, w2) contributes ``floor(scale·(ln h(w1) − ln c(w1,w2)))`` micro-nats
    where h(w1) = Σ_w c(w1, w) (history counts, so P(·|w1) sums to 1);
    per-doc scores are INTEGER sums — reduction order can never move them.

    Shape: bigram counts via ``exact_value_counts`` over a tab-packed pair
    key (sort+boundary-scan, never a Ray groupby at bigram cardinality);
    history counts derive from the BIGRAM table (vocab-sized, not
    corpus-sized) in one ``sum_per_key``; both gather once and broadcast.
    At web scale swap the exact tables for a fixed top-V model with an OOV
    bucket — the oracle pins the exact variant.
    """
    import ray

    from .graph import sum_per_key
    from .stats import exact_value_counts

    def _pairs(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.to_numpy(zero_copy_only=False)[keep]
        d = parent[keep]
        if len(w) < 2:
            return pa.table({"bg": pa.array([], pa.string())})
        adj = d[:-1] == d[1:]
        bg = np.char.add(np.char.add(w[:-1].astype("U"), "\t"), w[1:].astype("U"))[adj]
        return pa.table({"bg": pa.array(bg, pa.string())})

    pair_stream = ds.select_columns([id_col, text_col]).map_batches(
        _pairs, batch_format="pyarrow"
    )
    c2 = exact_value_counts(pair_stream, "bg").materialize()

    def _left(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("bg"), "\t")
        return pa.table(
            {"w1": pc.list_element(parts, 0), "n": batch.column("n")}
        )

    hist = sum_per_key(
        c2.map_batches(_left, batch_format="pyarrow"), "w1", "n"
    ).materialize()

    bparts = [t for t in ray.get(c2.to_arrow_refs()) if t.num_rows]
    hparts = [t for t in ray.get(hist.to_arrow_refs()) if t.num_rows]
    if bparts:
        bt = pa.concat_tables(bparts)
        bgs = np.asarray(bt.column("bg").to_pylist())
        c2n = bt.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        o = np.argsort(bgs)
        bgs, c2n = bgs[o], c2n[o]
        ht = pa.concat_tables(hparts)
        h1 = np.asarray(ht.column("w1").to_pylist())
        hn = ht.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        ho = np.argsort(h1)
        h1, hn = h1[ho], hn[ho]
        left = np.asarray([b.split("\t", 1)[0] for b in bgs])
        hmatch = hn[np.searchsorted(h1, left)]
        # per-bigram integer micro-nats, once per distinct bigram
        nll_bg = np.floor(
            scale * (np.log(hmatch.astype(np.float64)) - np.log(c2n.astype(np.float64)))
        ).astype(np.int64)
    else:
        bgs, nll_bg = np.array([], dtype=str), np.array([], np.int64)
    ref = ray.put((bgs, nll_bg))

    def _score(batch: pa.Table) -> pa.Table:
        bs, nb = ray.get(ref)
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keep = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        w = flat.to_numpy(zero_copy_only=False)[keep]
        d = parent[keep]
        ids = batch.column(id_col).combine_chunks()
        n_rows = len(batch)
        if len(w) < 2:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "n_bigrams": pa.array([], pa.int64()),
                    "nll_micro": pa.array([], pa.int64()),
                }
            )
        adj = d[:-1] == d[1:]
        bg = np.char.add(np.char.add(w[:-1].astype("U"), "\t"), w[1:].astype("U"))[adj]
        dd = d[:-1][adj]
        idx = np.searchsorted(bs, bg)
        np.clip(idx, 0, max(len(bs) - 1, 0), out=idx)
        nll = np.bincount(dd, weights=nb[idx], minlength=n_rows).astype(np.int64)
        n_bg = np.bincount(dd, minlength=n_rows)
        nz = np.nonzero(n_bg)[0]
        return pa.table(
            {
                id_col: ids.take(pa.array(nz, pa.int64())),
                "n_bigrams": pa.array(n_bg[nz], pa.int64()),
                "nll_micro": pa.array(nll[nz], pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _score, batch_format="pyarrow"
    )


def sentence_stats(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-doc sentence segmentation stats: segments split on RE2
    ``[.!?]+`` terminator runs, trimmed of ascii whitespace, empties
    dropped — (id, n_sentences, sum_chars) with unicode char counts.
    Mean sentence length (a Gopher-style quality feature the word-level
    rules don't see) is ``sum_chars / n_sentences`` downstream; both
    components stay exact integers. One vectorized pass:
    split_pattern_regex -> list_parent_indices + flatten -> trim/mask ->
    two bincounts; no Python row loop. Arrow and DuckDB both speak RE2,
    so the oracle replicates the split verbatim."""

    def _stats(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b.column(text_col), "")
        parts = pc.split_pattern_regex(text, "[.!?]+")
        parent = pc.list_parent_indices(parts).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(parts)
        trimmed = pc.utf8_trim(flat, " \t\n\r")
        keep = pc.not_equal(trimmed, "").to_numpy(zero_copy_only=False)
        lens = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False)
        n_rows = b.num_rows
        n = np.bincount(parent[keep], minlength=n_rows)[:n_rows]
        s = np.bincount(
            parent[keep], weights=lens[keep], minlength=n_rows
        )[:n_rows]
        return pa.table(
            {
                id_col: b.column(id_col),
                "n_sentences": pa.array(n.astype(np.int64), pa.int64()),
                "sum_chars": pa.array(s.astype(np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _stats, batch_format="pyarrow"
    )


def readability_fk(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Flesch-Kincaid grade level in integer micro-units: 0.39·W/S +
    11.8·Y/W − 15.59, computed as ONE integer ratio
    (390000·W² + 11800000·Y·S − 15590000·S·W) / (S·W) so no float ever
    appears. Words = RE2 non-space runs, sentences = terminator runs,
    syllables ≈ vowel-group runs (the standard dictionary-free proxy).
    Division truncates toward zero to match SQL's `//` on the (rare)
    negative grades; docs with no words or no sentences yield NULL.
    Three count_substring_regex kernels per batch — no Python row loop."""

    def _fk(b: pa.Table) -> pa.Table:
        text = pc.fill_null(b.column(text_col), "")
        w = pc.count_substring_regex(text, r"[^\s]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        y = pc.count_substring_regex(text, r"[aeiouyAEIOUY]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        s = pc.count_substring_regex(text, r"[.!?]+").to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        den = s * w
        num = 390_000 * w * w + 11_800_000 * y * s - 15_590_000 * den
        safe = den > 0
        d = np.where(safe, den, 1)
        q = np.where(num >= 0, num // d, -((-num) // d))
        return pa.table(
            {
                id_col: b.column(id_col),
                "words": pa.array(w, pa.int64()),
                "syllables": pa.array(y, pa.int64()),
                "sentences": pa.array(s, pa.int64()),
                "fk_grade_micro": pa.array(
                    np.where(safe, q, 0), pa.int64(),
                    mask=~safe,
                ),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _fk, batch_format="pyarrow"
    )


def compression_stats(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> rd.Dataset:
    """Per-doc zlib compression ratio — the classic cheap repetition /
    boilerplate signal (highly compressible text is usually low-quality
    template spam; near-incompressible text is often binary junk or
    high-entropy noise; both tails get filtered in CCNet-style pipelines).
    Returns (id, raw_len, comp_len, ratio_micro, roundtrip_ok) with
    ratio_micro = 10^6·comp_len // raw_len (0 for empty docs) and
    roundtrip_ok certifying decompress(compress(text)) == text.

    zlib is not SQL-expressible, so the registry scoreboard pins only the
    invariants zlib GUARANTEES (lossless round trip; comp_len bounded by
    raw_len + header slack) — the ratio VALUES are pinned by unit tests
    on fixed strings instead. The per-doc Python loop is inherent to a
    byte-codec (same contract as the WARC record parser); cost is one
    memoryview pass per doc."""
    import zlib

    def _comp(b: pa.Table) -> pa.Table:
        texts = pc.fill_null(b.column(text_col), "").to_pylist()
        raw_l, comp_l, ok = [], [], []
        for t in texts:
            raw = t.encode("utf-8", "surrogatepass")
            z = zlib.compress(raw, level)
            raw_l.append(len(raw))
            comp_l.append(len(z))
            ok.append(int(zlib.decompress(z) == raw))
        raw_a = np.array(raw_l, np.int64)
        comp_a = np.array(comp_l, np.int64)
        ratio = np.where(
            raw_a > 0, (1_000_000 * comp_a) // np.maximum(raw_a, 1), 0
        )
        return pa.table(
            {
                id_col: b.column(id_col),
                "raw_len": pa.array(raw_a, pa.int64()),
                "comp_len": pa.array(comp_a, pa.int64()),
                "ratio_micro": pa.array(ratio, pa.int64()),
                "roundtrip_ok": pa.array(np.array(ok, np.int64), pa.int64()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        _comp, batch_format="pyarrow"
    )


def rake_scores(ds: rd.Dataset, text_col: str, *, stopwords=STOPWORDS) -> rd.Dataset:
    """RAKE keyword statistics (Rose et al. 2010) in exact integers:
    candidate phrases are maximal stopword-free token runs; per WORD,
    ``freq`` = occurrences inside candidates and ``degree`` = sum of the
    containing phrase's length over those occurrences (the RAKE score is
    the rational degree/freq — left as the integer pair). Corpus-wide.

    Shape: one vectorized pass per batch — phrase ids are the running
    stopword count (a cumsum, so runs between stopwords share an id),
    per-phrase lengths come from one np.unique on (doc-offset, phrase)
    keys — followed by TWO `sum_per_key` folds at vocabulary cardinality.
    No Python loop over tokens, nothing gathers."""
    from .graph import sum_per_key

    sw = pa.array(sorted(set(stopwords)))

    def _pass(b: pa.Table) -> pa.Table:
        txt = pc.fill_null(b.column(text_col).combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = toks.flatten()
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        words = flat.to_numpy(zero_copy_only=False)
        nonempty = words != ""
        words, doc_idx = words[nonempty], doc_idx[nonempty]
        is_stop = (
            pc.is_in(pa.array(words), value_set=sw)
            .to_numpy(zero_copy_only=False)
            .astype(bool)
        )
        # phrase id = running stopword count; a new doc also breaks runs
        # (offset each doc's ids far apart)
        stop_cum = np.cumsum(is_stop)
        phrase = doc_idx * (len(words) + 1) + stop_cum
        keep = ~is_stop
        w_k, p_k = words[keep], phrase[keep]
        # per-phrase length via np.unique inverse
        uniq_p, inv, cnt = np.unique(p_k, return_inverse=True, return_counts=True)
        deg = cnt[inv].astype(np.int64)
        t = pa.table(
            {
                "word": pa.array(w_k),
                "freq": pa.array(np.ones(len(w_k), np.int64)),
                "degree": pa.array(deg),
            }
        )
        g = t.group_by(["word"]).aggregate([("freq", "sum"), ("degree", "sum")])
        return g.rename_columns(["word", "freq", "degree"])

    part = ds.map_batches(_pass, batch_format="pyarrow").materialize()
    f = sum_per_key(part.select_columns(["word", "freq"]), "word", "freq").materialize()
    d = sum_per_key(
        part.select_columns(["word", "degree"]), "word", "degree"
    ).materialize()
    from ..util import hash_join

    j = hash_join(f, d, on="word", join_type="inner")
    return j.map_batches(
        lambda b: pa.table(
            {
                "word": b.column("word").combine_chunks(),
                "freq": pc.cast(b.column("freq"), pa.int64()).combine_chunks(),
                "degree": pc.cast(b.column("degree"), pa.int64()).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
