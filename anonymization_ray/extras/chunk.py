"""Context-length chunking: split documents into fixed-token-count windows.

The step between corpus cleaning and sequence packing in a training
pipeline: long documents become ``size``-token chunks (optionally with
``stride < size`` overlap for continuity), short documents pass through as a
single chunk. Pure streaming shape — tokenization, window arithmetic and
chunk-text reassembly are all Arrow/numpy kernels inside one stateless
``map_batches``; a document never spans input batches so nothing shuffles
and the stage scales with input bytes.

Tokenization (trim/lower/whitespace split, empties dropped) matches the
repetition/decontamination kernels, so the non-overlapping case has an exact
DuckDB oracle (``(pos-1)//size`` grouping + ordered ``string_agg``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def chunk_documents(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int | None = None,
) -> rd.Dataset:
    """Dataset[(id_col, chunk_id, n_tokens, chunk_text)].

    ``stride`` defaults to ``size`` (non-overlapping). With overlap, chunk
    ``j`` covers tokens ``[j*stride, j*stride + size)``; the last chunk is
    the first one reaching the document's end (no degenerate tail windows
    fully contained in their predecessor). Documents with no tokens emit no
    row."""
    step = size if stride is None else stride
    if not (0 < step <= size):
        raise ValueError(f"stride must be in (0, size], got {step}")

    def _chunk(batch: pa.Table) -> pa.Table:
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
        if len(flat) == 0:
            return pa.table(
                {
                    id_col: pa.array([], ids.type),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        d = parent.to_numpy(zero_copy_only=False).astype(np.int64)
        # per-doc token counts and start offsets (docs are contiguous runs)
        uniq, first, n_tok = np.unique(d, return_index=True, return_counts=True)
        # chunks per doc: first window plus one per full stride after it
        n_chunks = 1 + np.maximum(0, (n_tok - size + step - 1) // step)
        doc_of_chunk = np.repeat(np.arange(len(uniq)), n_chunks)
        # j-index of each chunk within its doc
        c0 = np.concatenate([[0], np.cumsum(n_chunks)[:-1]])
        j = np.arange(n_chunks.sum(), dtype=np.int64) - c0[doc_of_chunk]
        start = j * step
        length = np.minimum(size, n_tok[doc_of_chunk] - start)
        # flat token indices of every chunk: chunk-start + intra-arange
        g0 = first[doc_of_chunk] + start
        off = np.concatenate([[0], np.cumsum(length)])
        intra = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], length)
        take = np.repeat(g0, length) + intra
        chunks = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), flat.take(pa.array(take, pa.int64()))
        )
        return pa.table(
            {
                id_col: ids.take(pa.array(uniq[doc_of_chunk], pa.int64())),
                "chunk_id": pa.array(j, pa.int64()),
                "n_tokens": pa.array(length, pa.int64()),
                "chunk_text": pc.binary_join(chunks, " "),
            }
        )

    return ds.map_batches(_chunk, batch_format="pyarrow")


def cdc_chunk_stats(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    mod: int = 13,
) -> rd.Dataset:
    """Content-defined chunking (rolling-hash boundaries) ->
    Dataset[(id, chunk_id, n_tokens)] — the dedup-friendly alternative to
    fixed windows: a boundary falls AFTER token i when the window hash
    ``(7·len(t_{i-2}) + 31·len(t_{i-1}) + 101·len(t_i)) % mod == 0``
    (needs a full 3-token window), so inserting text shifts only the
    chunks it touches, not every window downstream — fixed-size chunking
    reshuffles everything after an insertion, CDC re-aligns.

    Fully vectorized and shuffle-free: a document is one row, so chunk ids
    are a batch-local cumsum of boundary flags reset at document starts."""

    def _cdc(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).combine_chunks()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        flat = pc.list_flatten(toks)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        ln = pc.utf8_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(ln)
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_id": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                }
            )
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        # boundary after position i (needs i-2, i-1, i in the SAME doc)
        b = np.zeros(n, bool)
        if n >= 3:
            h = 7 * ln[:-2] + 31 * ln[1:-1] + 101 * ln[2:]
            same = (parent[2:] == parent[1:-1]) & (parent[1:-1] == parent[:-2])
            b[2:] = (h % mod == 0) & same
        # chunk id = count of boundaries strictly BEFORE this token, reset
        # per doc: global cumsum minus the cumsum at each doc's first token
        before = np.concatenate([[0], np.cumsum(b)[:-1]])
        starts = np.concatenate([[True], parent[1:] != parent[:-1]])
        start_idx = np.flatnonzero(starts)
        base = np.repeat(before[start_idx], np.diff(np.append(start_idx, n)))
        chunk = (before - base).astype(np.int64)
        # fold (doc, chunk) -> count, batch-local (a doc never spans rows)
        key = parent.astype(np.int64) * (chunk.max() + 1) + chunk
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        first = np.zeros(len(uk), np.int64)
        first[inv[::-1]] = np.arange(n)[::-1]
        return pa.table(
            {
                id_col: pa.array(ids[parent[first]], pa.int64()),
                "chunk_id": pa.array(chunk[first], pa.int64()),
                "n_tokens": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(_cdc, batch_format="pyarrow")
