"""Composite corpus-cleaning pipeline — the flagship training-data prep
shape: quality gate -> near-dup detection -> cluster resolution -> keeper
filter, composed entirely from the engine's streaming operators.

Scale shape: the quality gate is one vectorized map_batches (Arrow regex
kernels, no Python per row) and runs FIRST so every downstream stage sees
only survivors; near-dup pairs come from the banded minhash self-join;
cluster resolution is ``dedup.cluster_keepers`` (driver union-find under its
edge cap, distributed min-label contraction above); the final keeper filter
broadcasts the LOSER id set (duplicates to drop — a small fraction of any
real corpus) and applies it as a vectorized anti-filter, falling back to a
hash semi-join on keepers when the loser set exceeds ``broadcast_limit`` —
the same shape as ``kg.fingerprint.dedup_pages_exact``.

The corpus TEXT is never pinned in the object store: only the narrow
(id, n_tokens) slice materializes. The gated text stream stays lazy and is
re-scanned by the signature kernel and the candidate-text attach inside
``minhash_lsh_pairs`` — pruned columnar re-reads instead of spilling the
full corpus text through the object store.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def clean_corpus_decisions(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 30,
    bands: int = 32,
    verify_threshold: float = 0.5,
    broadcast_limit: int = 2_000_000,
) -> tuple[rd.Dataset, rd.Dataset]:
    """(kept, losers): ``kept`` is (id, n_tokens) for documents passing the
    token-count gate with one representative (min id) per near-duplicate
    cluster; ``losers`` is the (id) set of dedup drops — small by
    construction, reusable as a broadcast anti-filter over the text stream
    (callers composing larger pipelines recompute the cheap gate inline and
    anti-filter on ``losers`` instead of joining against ``kept``)."""
    import ray

    from .dedup import cluster_keepers, minhash_lsh_pairs

    def _gate(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b.column(text_col), r"\S+"), pa.int64())
        t = pa.table(
            {
                id_col: b.column(id_col).combine_chunks(),
                text_col: b.column(text_col).combine_chunks(),
                "n_tokens": n,
            }
        )
        return t.filter(pc.greater_equal(t.column("n_tokens"), min_tokens))

    # gated survivors, text-carrying, LAZY — consumed by the signature scan
    # and the candidate-text attach inside minhash_lsh_pairs
    gated = docs.select_columns([id_col, text_col]).map_batches(
        _gate, batch_format="pyarrow"
    )
    # the NARROW slice is what gets reused (keeper resolution, output,
    # loser extraction) — 16 B/doc in the object store, never the text
    narrow = gated.select_columns([id_col, "n_tokens"]).materialize()

    pairs = minhash_lsh_pairs(
        gated, text_col, id_col, bands=bands, verify_threshold=verify_threshold
    ).select_columns(["id_a", "id_b"])
    # materialized: both the loser extraction and (on the fallback path) the
    # keeper extraction read it — without this the keeper lineage would
    # execute twice
    keep = cluster_keepers(narrow, pairs, id_col=id_col).materialize()

    losers = keep.filter(
        expr=f"{id_col} != keeper_id"
    ).select_columns([id_col]).materialize()
    out_cols = [id_col, "n_tokens"]
    if losers.count() == 0:
        return narrow.select_columns(out_cols), losers
    if losers.count() <= broadcast_limit:
        loser_tables = [t for t in ray.get(losers.to_arrow_refs()) if t.num_rows]
        loser_arr = pa.concat_tables(loser_tables).column(id_col).combine_chunks()
        loser_ref = ray.put(loser_arr)

        def _drop(b: pa.Table) -> pa.Table:
            arr = ray.get(loser_ref)
            keepm = pc.invert(
                pc.fill_null(pc.is_in(b.column(id_col), value_set=arr), False)
            )
            return b.select(out_cols).filter(keepm)

        return narrow.map_batches(_drop, batch_format="pyarrow"), losers

    # loser set too large to broadcast: semi-join on keeper ids
    from ..util import hash_join

    keepers = keep.filter(expr=f"{id_col} == keeper_id").select_columns([id_col])
    kept = hash_join(
        narrow.select_columns(out_cols), keepers, on=id_col, join_type="inner"
    ).select_columns(out_cols)
    return kept, losers


def clean_corpus(
    docs: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_tokens: int = 30,
    bands: int = 32,
    verify_threshold: float = 0.5,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """(id, text) -> kept (id, n_tokens): documents passing the token-count
    gate, with one representative (min id) per near-duplicate cluster."""
    kept, _ = clean_corpus_decisions(
        docs,
        text_col,
        id_col,
        min_tokens=min_tokens,
        bands=bands,
        verify_threshold=verify_threshold,
        broadcast_limit=broadcast_limit,
    )
    return kept
