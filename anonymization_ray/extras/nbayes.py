"""Multinomial Naive Bayes text classifier — integer micro-nat exact.

The classic corpus-bootstrap classifier (fastText-style language ID,
quality/domain routing): train per-class token statistics from labeled
rows, score every document as ``prior + Σ token log-likelihoods``,
predict the argmax class. CCNet trains exactly this family of models
to route crawl text before the LM-perplexity gate.

Cross-engine exactness uses the repo's micro-nat convention
(`textstats.unigram_nll`): every log-term is computed ONCE per distinct
(class, term) on integer inputs — ``floor(scale·(ln(c+1) − ln(T+V)))``
with add-one smoothing — so per-document scores are INTEGER sums and
reduction order can never move a prediction; the DuckDB oracle
replicates the same doubles from the same integers.

Ray shape: (class, term) counts via ONE packed-key sort-scan
`exact_value_counts` (no Ray groupby at vocabulary cardinality); the
model (per-class sorted term array + int64 log-lik values + OOV
fallback + prior) gathers once and broadcasts via ``ray.put``; scoring
is a stateless second pass — per batch one tokenize, then per class a
searchsorted gather + bincount. At web scale swap the exact vocabulary
for a top-V table with the same OOV bucket; the oracle pins the exact
variant.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_SEP = "\x1f"


def _token_stream(ds: rd.Dataset, text_col: str, label_col: str):
    def _tok(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks)
        keep = pc.not_equal(flat, "")
        flat = flat.filter(keep)
        parent = parent.filter(keep)
        labels = pc.take(batch.column(label_col).combine_chunks(), parent)
        return pa.table(
            {
                "lt": pc.binary_join_element_wise(labels, flat, _SEP),
            }
        )

    return ds.map_batches(_tok, batch_format="pyarrow")


def naive_bayes_predict(
    ds: rd.Dataset,
    *,
    text_col: str,
    label_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Train on (text, label), predict the SAME stream ->
    Dataset[(id, pred_label, score_micro)] (docs with zero tokens are
    absent — no evidence, no row; mirror of unigram_nll's contract)."""
    from .stats import exact_value_counts

    counts = exact_value_counts(
        _token_stream(ds, text_col, label_col), "lt"
    ).materialize()
    parts = [t for t in ray.get(counts.to_arrow_refs()) if t.num_rows]
    if not parts:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "pred_label": pa.array([], pa.string()),
                    "score_micro": pa.array([], pa.int64()),
                }
            )
        )
    lt = pa.concat_tables(parts)
    keys = np.asarray(lt.column("lt").to_pylist())
    cnts = lt.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    split = np.char.partition(keys, _SEP)
    labels_k, terms_k = split[:, 0], split[:, 2]

    # doc priors from label row counts (tiny: one value_counts on labels)
    lab_counts = exact_value_counts(
        ds.select_columns([label_col]), label_col
    )
    lab_tbl = pa.concat_tables(
        [t for t in ray.get(lab_counts.to_arrow_refs()) if t.num_rows]
    )
    classes = np.asarray(lab_tbl.column(label_col).to_pylist())
    dn = lab_tbl.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.argsort(classes)  # deterministic class order = tie order
    classes, dn = classes[order], dn[order]
    dd = int(dn.sum())

    vocab_size = len(np.unique(terms_k))
    model = {}
    for ci, c in enumerate(classes):
        m = labels_k == c
        t_l = int(cnts[m].sum())
        terms = terms_k[m]
        o = np.argsort(terms)
        terms = terms[o]
        # identical float path to the SQL oracle: ln on exact ints,
        # subtract, one multiply, floor
        nv = np.floor(
            scale
            * (np.log(cnts[m][o] + 1.0) - np.log(float(t_l + vocab_size)))
        ).astype(np.int64)
        oov = int(np.floor(scale * (0.0 - np.log(float(t_l + vocab_size)))))
        prior = int(
            np.floor(scale * (np.log(float(dn[ci])) - np.log(float(dd))))
        )
        model[str(c)] = (terms, nv, oov, prior)
    ref = ray.put((list(map(str, classes)), model))

    def _score(batch: pa.Table) -> pa.Table:
        cls, mdl = ray.get(ref)
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
        n_rows = len(batch)
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "pred_label": pa.array([], pa.string()),
                    "score_micro": pa.array([], pa.int64()),
                }
            )
        w = np.asarray(flat.to_pylist())
        n_tok = np.bincount(d, minlength=n_rows)
        best_score = np.full(n_rows, np.iinfo(np.int64).min, np.int64)
        best_cls = np.zeros(n_rows, np.int64)
        for ci, c in enumerate(cls):  # classes pre-sorted: first max wins
            terms, nv, oov, prior = mdl[c]
            idx = np.searchsorted(terms, w)
            np.clip(idx, 0, max(len(terms) - 1, 0), out=idx)
            hit = (terms[idx] == w) if len(terms) else np.zeros(len(w), bool)
            tv = np.where(hit, nv[idx] if len(terms) else 0, oov)
            s = prior + np.bincount(d, weights=tv, minlength=n_rows).astype(
                np.int64
            )
            better = s > best_score
            best_score[better] = s[better]
            best_cls[better] = ci
        nz = np.nonzero(n_tok)[0]
        return pa.table(
            {
                id_col: ids.take(pa.array(nz, pa.int64())),
                "pred_label": pa.array(
                    np.asarray(cls, dtype=object)[best_cls[nz]], pa.string()
                ),
                "score_micro": pa.array(best_score[nz], pa.int64()),
            }
        )

    return ds.map_batches(_score, batch_format="pyarrow")
