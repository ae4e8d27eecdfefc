"""Inverted-index build + BM25 top-k retrieval over a document Dataset.

The classic web-scale retrieval stack, Ray-Data-first: postings are produced
by one vectorized ``map_batches`` pass (Arrow regex split → flatten with
parent indices → per-batch C group_by for term frequencies) and are ready to
sink as a term-sorted parquet inverted index; scoring touches only the query
terms' postings (``pc.is_in`` prefilter — the corpus never shuffles), sums
per doc with the sort+boundary-carry ``sum_per_key``, and top-k is a narrow
sort+limit.

Scoring is an INTEGER BM25 variant (k1=1.2, b=0.75, Lucene idf
ln(1 + (N-df+0.5)/(df+0.5))): idf is floored to millionths once per term, and
the tf normalization is evaluated in scaled int64 floor arithmetic —

    X     = 250 + (750 * dl * N) // L          # 1000*(1-b+b*dl/avgdl)
    score += (idf6 * 2200 * tf) // (1000 * tf + (1200 * X) // 1000)

— so every contribution and the per-doc sum are exactly reproducible in SQL
BIGINT math (value-hash-checkable oracle, no float-sum ordering hazard). The
ranking is the standard BM25 ordering up to the 1e-3-relative quantization.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .graph import sum_per_key

K1_NUM = 1200  # k1 = 1.2, scaled by 1000
B_NUM = 750  # b = 0.75, scaled by 1000
IDF_SCALE = 1_000_000

_TOKEN_SPLIT = r"\s+"


def build_postings(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Dataset[(term, doc_id, tf, dl)] — the inverted-index row form.

    Tokenization matches the SQL oracle: lowercase, trim, split on runs of
    whitespace, drop empties. Sort by ``term`` and ``write_parquet`` to
    materialize a queryable on-disk inverted index."""

    def _post(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(batch.column(text_col).combine_chunks())),
            _TOKEN_SPLIT,
        )
        parent = pc.list_parent_indices(toks)
        flat = pc.list_flatten(toks)
        ids = batch.column(id_col).combine_chunks().take(parent)
        t = pa.table({"doc_id": ids, "term": flat}).filter(pc.not_equal(flat, ""))
        dl = pa.table(
            {
                "doc_id": batch.column(id_col).combine_chunks(),
                "dl": pc.cast(pc.list_value_length(toks), pa.int64()),
            }
        )
        g = t.group_by(["term", "doc_id"]).aggregate([([], "count_all")])
        g = g.rename_columns(["term", "doc_id", "tf"])
        j = g.join(dl, keys=["doc_id"])
        return j.select(["term", "doc_id", "tf", "dl"]).set_column(
            2, "tf", pc.cast(j.column("tf"), pa.int64())
        )

    return ds.map_batches(_post, batch_format="pyarrow")


def bm25_topk(
    ds: rd.Dataset,
    query_terms: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
) -> rd.Dataset:
    """Top-k docs for a bag of query terms -> Dataset[(doc_id, score)].

    One postings pass over the corpus; only query-term postings leave the
    batch (is_in prefilter). df/N/L are tiny scalar aggregates; idf6 per
    query term is broadcast in the scoring closure. Deterministic ties:
    (score desc, doc_id asc)."""
    postings = build_postings(ds, text_col, id_col).materialize()

    # corpus stats: N docs, L total tokens (distinct doc rows carry dl once per term,
    # so derive L from a doc-level pass instead)
    doc_stats = postings.map_batches(
        lambda b: pa.table(
            {
                "doc_id": b.column("doc_id").combine_chunks(),
                "dl": b.column("dl").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    from ..util import distinct_rows

    docs = distinct_rows(doc_stats, ["doc_id", "dl"]).materialize()
    n_docs = docs.count()
    total_len = int(docs.sum("dl"))

    hits = postings.map_batches(
        lambda b: b.filter(pc.is_in(b.column("term"), value_set=pa.array(query_terms))),
        batch_format="pyarrow",
    ).materialize()

    # df per query term: distributed counts (postings per term can be huge at
    # crawl scale), result bounded by len(query_terms) -> driver-side dict
    from .stats import exact_value_counts

    df_rows = exact_value_counts(hits.select_columns(["term"]), "term").take_all()
    df = {r["term"]: int(r["n"]) for r in df_rows}
    # Lucene-style idf: ln(1 + (N-df+0.5)/(df+0.5)) — always positive
    idf6 = {
        t: int(math.floor(IDF_SCALE * math.log(1.0 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))))
        for t in df
    }

    def _score(b: pa.Table) -> pa.Table:
        tf = b.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
        dl = b.column("dl").to_numpy(zero_copy_only=False).astype(np.int64)
        terms = b.column("term").to_pylist()
        w = np.array([idf6[t] for t in terms], np.int64)
        x = 250 + (B_NUM * dl * n_docs) // total_len
        c = (w * 2200 * tf) // (1000 * tf + (K1_NUM * x) // 1000)
        return pa.table({"doc_id": b.column("doc_id").combine_chunks(), "c": pa.array(c)})

    scores = sum_per_key(hits.map_batches(_score, batch_format="pyarrow"), "doc_id", "c")
    top = scores.sort(["c", "doc_id"], descending=[True, False]).limit(k)
    return top.rename_columns({"c": "score"})


def phrase_match_counts(
    ds: rd.Dataset, text_col: str, id_col: str, phrase: tuple[str, ...]
) -> rd.Dataset:
    """(id, n_matches) for documents containing the exact token phrase —
    OVERLAPPING occurrences counted (token positions i where
    tok[i+j] == phrase[j] for all j), which substring regex counting gets
    wrong on self-overlapping phrases.

    Per-document positional matching is batch-local (a phrase never spans
    documents): one ``split_pattern_regex`` per batch, numpy shift-AND over
    the flattened token array masked to same-document runs — the grep
    engine shape; no shuffle, streams at input-byte rate."""
    k = len(phrase)
    assert k >= 1

    def _count(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(
                pc.utf8_lower(pc.fill_null(batch.column(text_col).combine_chunks(), ""))
            ),
            _TOKEN_SPLIT,
        )
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        n = len(flat)
        m = np.ones(max(n - k + 1, 0), dtype=bool)
        for j, w in enumerate(phrase):
            mj = pc.equal(flat, w).to_numpy(zero_copy_only=False)
            m &= mj[j : j + len(m)]
        if k > 1 and len(m):
            # all k tokens must sit in the SAME document
            m &= parent[: len(m)] == parent[k - 1 : k - 1 + len(m)]
        hits = np.bincount(parent[: len(m)][m], minlength=batch.num_rows).astype(
            np.int64
        )
        keep = hits > 0
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks().filter(
                    pa.array(keep)
                ),
                "n_matches": pa.array(hits[keep], pa.int64()),
            }
        )

    return ds.map_batches(_count, batch_format="pyarrow")
