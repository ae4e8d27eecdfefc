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
