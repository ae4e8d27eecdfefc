"""FastText-shape linear text classifier scoring (quality filtering).

The CCNet / fastText quality-filter stage of a web-corpus pipeline
(Wenzek et al. 2020; Joulin et al. 2017 model shape): every token hashes
into one of ``dim`` buckets, a document's score is the sum of its tokens'
bucket weights (occurrences, not distinct) plus a bias, and documents
scoring below the threshold are dropped. The reference engine has no
model-scoring surface; this is the corpus-side sibling of its
classification-driven anonymization gates (reference ``Anonymization.java``
branches per-attribute on a config classification; here the "config" is a
broadcast weight vector and the branch is a vectorized score threshold).

Shape, Ray-Data-first and 100-TB-safe:

- the model is a ``dim``-float weight vector — tiny — broadcast ONCE via
  ``ray.put`` and fetched per actor in ``__init__`` (the warm-model
  inference shape: never re-shipped per batch, never a join);
- scoring is a stateful ``map_batches`` actor pool doing pure vectorized
  work per batch: Arrow lowercase/trim/regex-split, flatten with parent
  indices, ``pd.factorize`` to the batch vocabulary, md5-64 ONLY the unique
  vocabulary, one weight gather, one ``np.bincount`` segment sum per doc.
  No shuffle; streams at input-byte rate and the corpus text never
  materializes;
- the token hash (md5 first 8 bytes little-endian == DuckDB
  ``md5_number_upper``, the same contract as the simhash kernel) and the
  integer weight table make scoring replayable bit-exactly in SQL, so the
  oracle is value-hash exact. A trained fastText model drops in as the same
  int64 weight vector with no shape change.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import actor_pool_size
from .dedup import _md5_64

#: closed-form deterministic weight table: w_j = (j * KNUTH) % 1001 - 500,
#: an integer pseudo-random spread over [-500, 500] that DuckDB replays in
#: one expression. A real model replaces this vector; nothing else changes.
_KNUTH = 2654435761
_WMOD = 1001
_WOFF = 500


def default_weights(dim: int) -> np.ndarray:
    j = np.arange(dim, dtype=np.int64)
    return (j * _KNUTH) % _WMOD - _WOFF


class _LinearScorer:
    """Actor: weight vector fetched once, per-batch vectorized scoring."""

    def __init__(self, weights_ref, text_col: str, id_col: str, bias: int):
        w = ray.get(weights_ref) if not isinstance(weights_ref, np.ndarray) else weights_ref
        self.w = np.asarray(w, np.int64)
        self.dim = np.uint64(len(self.w))
        self.text_col = text_col
        self.id_col = id_col
        self.bias = int(bias)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = batch.column(self.id_col).combine_chunks()
        txt = pc.fill_null(batch.column(self.text_col).combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = toks.flatten()
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        keepm = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        scores = np.zeros(n, np.int64)
        if keepm.any():
            tok_np = flat.to_numpy(zero_copy_only=False)[keepm]
            doc = parent[keepm]
            codes, vocab = pd.factorize(tok_np)
            vh = np.fromiter(
                (_md5_64(w) for w in vocab), dtype=np.uint64, count=len(vocab)
            )
            bk = (vh % self.dim).astype(np.int64)
            wv = self.w[bk][codes]
            # float64 bincount is exact here: |score| <= 500 * n_tokens << 2^53
            scores = np.bincount(doc, weights=wv, minlength=n).astype(np.int64)
        scores += self.bias
        return pa.table(
            {
                self.id_col: ids,
                "score": pa.array(scores, pa.int64()),
                "keep": pa.array((scores >= 0).astype(np.int64), pa.int64()),
            }
        )


def classifier_scores(
    ds: rd.Dataset,
    weights: np.ndarray | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 4096,
    bias: int = 0,
) -> rd.Dataset:
    """Dataset[(id_col, score, keep)] — linear hashed-bag-of-words score per
    document and the ``score >= 0`` keep decision. ``weights`` defaults to
    the deterministic :func:`default_weights` table (SQL-replayable); pass a
    trained vector for real filtering."""
    w = default_weights(dim) if weights is None else np.asarray(weights, np.int64)
    ref = ray.put(w)
    lo, hi = actor_pool_size()
    return ds.map_batches(
        _LinearScorer,
        fn_constructor_args=(ref, text_col, id_col, bias),
        batch_format="pyarrow",
        concurrency=(lo, hi),
    )
