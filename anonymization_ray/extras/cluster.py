"""Integer k-means clustering over an embedding column (Lloyd's algorithm).

Semantic-clustering stage for training-data mixing / curriculum bucketing
(the cluster step of SemDeDup-style pipelines, Abbas et al. 2023 shape).
Everything is INTEGER arithmetic so the result is engine-independent and the
DuckDB oracle can replay it exactly (same trick as the integer PageRank in
``extras/graph.py``):

- vectors quantize once to micro-units ``q = floor(scale * x)`` (int64);
- distances are exact int64 sums of squared diffs (|q| <= ~2e6, dim <= 4096:
  no overflow);
- centroid updates use floor(sum / count) where the division happens in
  float64 on both engines — sums stay far below 2**53, so the floor is exact.

Scale shape: centroids are a K x dim int64 matrix BROADCAST to every task;
each iteration is ONE streaming pass over the corpus emitting K-row partial
(count, sum-vector) tables per batch, reduced on the driver (bounded: K x dim
per block — the corpus never shuffles and no per-group UDF runs). Ties and
empty clusters are deterministic: nearest centroid with the lowest cluster id
wins, and a cluster that loses all members keeps no centroid (it simply stops
attracting points), exactly as the oracle's join semantics do.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def _quantized(batch: pa.Table, vec_col: str, id_col: str, scale: float):
    ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
    col = batch.column(vec_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(ids)
    if n == 0:
        return ids, np.empty((0, 0), np.int64)
    dim = len(flat) // n
    q = np.floor(flat * scale).astype(np.int64).reshape(n, dim)
    return ids, q


def _assign(q: np.ndarray, cl_ids: np.ndarray, cent: np.ndarray):
    """Nearest-centroid assignment; ties -> lowest cluster id (cent rows are
    sorted by cl_ids ascending, argmin picks the first minimum)."""
    n = q.shape[0]
    best_d = np.full(n, np.iinfo(np.int64).max, np.int64)
    best_c = np.zeros(n, np.int64)
    for j in range(cent.shape[0]):
        diff = q - cent[j]
        d = np.einsum("ij,ij->i", diff, diff)
        take = d < best_d
        best_d[take] = d[take]
        best_c[take] = cl_ids[j]
    return best_c, best_d


def kmeans_int(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    *,
    k: int = 4,
    iters: int = 3,
    scale: float = 1_000_000.0,
) -> rd.Dataset:
    """Run ``iters`` Lloyd's iterations (assign + floor-mean update) from the
    deterministic init "the k vectors with the smallest ids", then emit the
    final assignment ``(id, cluster, dist_sq)``.

    The quantized (id, q) stream is materialized once so the per-iteration
    passes re-scan object-store blocks instead of re-reading + re-quantizing
    the source; at 100 TB this pins only the quantized vectors (spillable),
    which every iteration genuinely needs.
    """
    import ray

    def _q(b: pa.Table) -> pa.Table:
        ids, q = _quantized(b, vec_col, id_col, scale)
        la = pa.FixedSizeListArray.from_arrays(
            pa.array(q.reshape(-1), pa.int64()), q.shape[1] if q.size else 0
        )
        return pa.table({id_col: pa.array(ids, pa.int64()), "q": la})

    qds = (
        ds.select_columns([id_col, vec_col])
        .map_batches(_q, batch_format="pyarrow")
        .materialize()
    )

    # deterministic init: k smallest ids (tiny bounded gather)
    seed_rows = qds.sort(id_col).limit(k).take_all()
    seed_rows.sort(key=lambda r: r[id_col])
    cl_ids = np.arange(len(seed_rows), dtype=np.int64)
    cent = np.stack([np.asarray(r["q"], np.int64) for r in seed_rows])

    for _ in range(iters):
        cent_ref = ray.put((cl_ids, cent))

        def _partials(b: pa.Table, ref=cent_ref) -> pa.Table:
            cids, c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
            ids, q = _quantized(b, "q", id_col, 1.0)  # q already int64 micro
            if len(ids) == 0 or q.size == 0:
                return pa.table(
                    {
                        "cl": pa.array([], pa.int64()),
                        "n": pa.array([], pa.int64()),
                        "s": pa.array([], pa.list_(pa.int64())),
                    }
                )
            a, _ = _assign(q, cids, c)
            out_cl, out_n, out_s = [], [], []
            for j in np.unique(a):
                m = a == j
                out_cl.append(int(j))
                out_n.append(int(m.sum()))
                out_s.append(q[m].sum(axis=0, dtype=np.int64).tolist())
            return pa.table(
                {
                    "cl": pa.array(out_cl, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                    "s": pa.array(out_s, pa.list_(pa.int64())),
                }
            )

        parts = qds.map_batches(_partials, batch_format="pyarrow").take_all()
        agg: dict[int, tuple[int, np.ndarray]] = {}
        for r in parts:
            n0, s0 = agg.get(r["cl"], (0, 0))
            agg[r["cl"]] = (n0 + r["n"], s0 + np.asarray(r["s"], np.int64))
        new_ids = sorted(agg)
        cl_ids = np.array(new_ids, np.int64)
        # floor(sum / count) with the division in float64 — sums are << 2**53
        cent = np.stack(
            [np.floor(agg[j][1].astype(np.float64) / agg[j][0]).astype(np.int64)
             for j in new_ids]
        )

    final_ref = ray.put((cl_ids, cent))

    def _final(b: pa.Table, ref=final_ref) -> pa.Table:
        cids, c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        ids, q = _quantized(b, "q", id_col, 1.0)
        if len(ids) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cluster": pa.array([], pa.int64()),
                    "dist_sq": pa.array([], pa.int64()),
                }
            )
        a, d = _assign(q, cids, c)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "cluster": pa.array(a, pa.int64()),
                "dist_sq": pa.array(d, pa.int64()),
            }
        )

    return qds.map_batches(_final, batch_format="pyarrow")
