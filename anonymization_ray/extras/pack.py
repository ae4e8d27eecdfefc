"""Sequence packing — greedy no-straddle packing of documents into fixed
token-budget bins, the terminal prep step of an LLM pretraining pipeline.

Distribution shape: packing is inherently sequential (each bin's contents
depend on every prior document in its stream), so the parallel unit is the
TRAINING SHARD: documents are hash-assigned to S shards (deterministic,
partition-independent) and each shard packs independently in doc-id order.
``groupby(shard).map_groups`` is safe here precisely because S is BOUNDED
(a knob, e.g. 64-4096) — the per-group cost that rules out Ray groupbys at
O(corpus) key cardinality is irrelevant at O(shards); each group carries
only the narrow (id, len) columns (~16 B/doc), so even 10^12 docs at S=4096
is ~4 GB of packing state per group. The in-group bin loop is O(bins) via
searchsorted on the length cumsum, not O(docs) Python.

A document longer than the budget gets a bin of its own (greedy: it never
fits an open bin and nothing joins a bin already over budget).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_MINSTD_MOD = 2147483647
_MINSTD_MUL = 48271


def minstd_shard(ids: np.ndarray, num_shards: int) -> np.ndarray:
    """Deterministic, SQL-expressible shard assignment (same MINSTD form as
    the stratified sampler)."""
    return (((ids % _MINSTD_MOD) * _MINSTD_MUL) % _MINSTD_MOD) % num_shards


def pack_sequences(
    ds: rd.Dataset,
    id_col: str,
    len_col: str,
    *,
    budget: int,
    num_shards: int,
) -> rd.Dataset:
    """(id, len) -> (id, shard, bin, pos): greedy packing of each shard's
    documents (ascending id order) into bins of at most ``budget`` total
    length; ``pos`` is the document's position within its bin."""

    def _assign(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "len": pa.array(
                    b.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64),
                    pa.int64(),
                ),
                "shard": pa.array(minstd_shard(ids, num_shards), pa.int64()),
            }
        )

    narrow = ds.select_columns([id_col, len_col]).map_batches(
        _assign, batch_format="pyarrow"
    )

    def _pack(g: pa.Table) -> pa.Table:
        g = g.take(pc.sort_indices(g.column(id_col)))
        lens = g.column("len").to_numpy(zero_copy_only=False)
        n = len(lens)
        cum = np.cumsum(lens)
        bin_starts = [0]
        start = 0
        while True:
            # largest j with cum[j] - (cum[start-1]) <= base + budget;
            # an oversized doc yields j == start (its own bin)
            base = cum[start - 1] if start else 0
            j = int(np.searchsorted(cum, base + budget, side="right"))
            j = max(j, start + 1)
            if j >= n:
                break
            bin_starts.append(j)
            start = j
        starts = np.array(bin_starts, dtype=np.int64)
        bins = np.searchsorted(starts, np.arange(n), side="right") - 1
        pos = np.arange(n) - starts[bins]
        return pa.table(
            {
                id_col: g.column(id_col),
                "shard": g.column("shard"),
                "bin": pa.array(bins, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    return narrow.groupby("shard").map_groups(_pack, batch_format="pyarrow")
