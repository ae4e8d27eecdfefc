"""Hierarchy flattening — (node, root, depth) over parent-pointer forests.

Category trees, org charts, site taxonomies, thread/reply forests: the
relational shape is a (child, parent) edge table, and every analytical
consumer wants it FLAT — which root, how deep, so rollups become plain
groupbys instead of recursive queries. SQL needs a recursive CTE (one
sequential round per level); the parallel answer is the same pointer
doubling as rdf:List ranking (`kg/rdflist.py`): a forest is a set of
chains from each node to its root, each node having exactly ONE parent
pointer — the doubling core applies verbatim, heads become roots and
accumulated hop counts become depths. O(log depth) rounds regardless of
tree height.

The structure table is node-bounded (two int/string columns, never
payload), so the default path gathers under the loud cap and doubles
vectorized; ``strategy="join"`` is the distributed escape hatch (forest
workloads have many roots, the safe regime for the Ray join — see the
rdflist module header)."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..kg.rdflist import _gather, _rank_by_joins, _rank_vectorized


def tree_root_depth(
    edges: rd.Dataset,
    *,
    child_col: str,
    parent_col: str,
    node_cap: int = 5_000_000,
    max_rounds: int = 40,
    strategy: str = "auto",
) -> rd.Dataset:
    """(child, parent) edges -> Dataset[(node, root, depth)] (depth 1 =
    direct child of a root; roots themselves carry no row — they have no
    parent pointer). Cycles and nodes with two parents refuse loudly."""

    def _ptr(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column(child_col).combine_chunks(),
                "anc": batch.column(parent_col).combine_chunks(),
            }
        )

    ptr = edges.map_batches(_ptr, batch_format="pyarrow").materialize()
    n = ptr.count()
    if strategy == "join" or (strategy == "auto" and n > node_cap):
        resolved = _rank_by_joins(ptr, max_rounds)

        def _out_join(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table(
                {
                    "node": batch.column("node").combine_chunks(),
                    "root": batch.column("head").combine_chunks(),
                    "depth": pc.add(batch.column("pos"), 1).combine_chunks(),
                }
            )

        return resolved.map_batches(_out_join, batch_format="pyarrow")

    if n > node_cap:
        raise ValueError(
            f"structure table has {n} nodes — above node_cap ({node_cap}); "
            "use strategy='join'"
        )
    nodes, roots, pos = _rank_vectorized(ptr, max_rounds)
    return rd.from_arrow(
        pa.table(
            {
                "node": nodes,
                "root": roots,
                "depth": pa.array(pos + 1, pa.int64()),
            }
        )
    )
