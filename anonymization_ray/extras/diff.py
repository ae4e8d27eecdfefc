"""Corpus version diff — the recrawl delta.

A production web corpus is re-crawled continuously; every ingest wants the
delta against the previous snapshot: which documents were ADDED, which
REMOVED, which CHANGED content, which are UNCHANGED (and can skip every
downstream stage — the dedup/extract/link work is already checkpointed for
them). At 10^12 documents that classification must never move text: both
sides collapse to (id, 16 B content hash) immediately, and the comparison
is ONE hash-partitioned full-outer join on the id — the only all-to-all the
operator needs, on 24 B rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def corpus_version_diff(
    v1: rd.Dataset, v2: rd.Dataset, id_col: str, text_col: str
) -> pa.Table:
    """Classify every document id across two corpus versions and return the
    class counts: one row per class in (added, removed, changed, unchanged).

    Shape: per-side (id, siphash(text)) projection (stateless, streaming),
    full-outer hash join on the id (both sides are fact-scale — the one
    legitimate fact×fact join), then a vectorized classify + tiny partial
    count fold. Text never shuffles; the join payload is 24 B/row.
    """
    from ..util import default_num_partitions, hash_join

    def _side(hcol: str):
        def _hash(batch: pa.Table) -> pa.Table:
            txt = batch.column(text_col).to_numpy(zero_copy_only=False)
            h = pd.util.hash_array(txt.astype(object)).astype(np.int64)
            return pa.table(
                {
                    id_col: batch.column(id_col).combine_chunks(),
                    hcol: pa.array(h, pa.int64()),
                }
            )

        return _hash

    a = v1.select_columns([id_col, text_col]).map_batches(
        _side("h1"), batch_format="pyarrow"
    )
    b = v2.select_columns([id_col, text_col]).map_batches(
        _side("h2"), batch_format="pyarrow"
    )
    n1, n2 = a.count(), b.count()
    nparts = max(2, min(default_num_partitions() // 2, (n1 + n2) // 4000 + 1))
    joined = hash_join(a, b, on=id_col, join_type="full_outer", num_partitions=nparts)

    def _classify(batch: pa.Table) -> pa.Table:
        h1 = batch.column("h1")
        h2 = batch.column("h2")
        in1 = ~np.asarray(h1.is_null())
        in2 = ~np.asarray(h2.is_null())
        same = np.zeros(len(in1), dtype=bool)
        both = in1 & in2
        if both.any():
            a1 = h1.to_numpy(zero_copy_only=False)
            a2 = h2.to_numpy(zero_copy_only=False)
            same[both] = a1[both] == a2[both]
        counts = np.array(
            [
                int((~in1 & in2).sum()),  # added
                int((in1 & ~in2).sum()),  # removed
                int((both & ~same).sum()),  # changed
                int(same.sum()),  # unchanged
            ],
            dtype=np.int64,
        )
        return pa.table({"c": pa.array([counts.tobytes()], pa.binary())})

    total = np.zeros(4, dtype=np.int64)
    for blk in joined.map_batches(_classify, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for payload in blk.column("c").to_pylist():
            total += np.frombuffer(payload, dtype=np.int64)
    return pa.table(
        {
            "change_type": pa.array(["added", "removed", "changed", "unchanged"]),
            "n": pa.array(total, pa.int64()),
        }
    )
