"""RDF collection (rdf:List) ranking — ordered-member recovery.

RDF models ordered data as cons chains: each cell carries
``rdf:first`` (the member) and ``rdf:rest`` (the next cell, terminated
by ``rdf:nil``); a list-valued property points at the first cell. Any
pipeline lifting JSON arrays into a graph (the reference's JSON-LD
lifter emits exactly this shape for ``@list``) needs the inverse
operation at query time: every (list head, position, member) row.

This is the classic **list-ranking** problem. The pointer table is
cell-bounded (one row per cons cell — structure only, never document
payload), so the default path mirrors the repo's union-find precedent
(`extras/dedup.cluster_keepers`): gather the 2-column (node, anc)
pointers under a loud ``node_cap`` and pointer-double them in numpy —
O(log length) fully vectorized rounds, one int-gather each — then
broadcast the resolved (node -> head, pos) map once and attach members
with a shuffle-free ``index_in`` scan over the distributed
``rdf:first`` stream. Member payloads never visit the driver; only the
pointer structure does.

Above the cap, ``strategy="join"`` runs the same doubling as
distributed hash-join rounds and attaches members with one more hash
join. Caveat pinned by `tests/test_rdflist.py`: Ray 2.49's hash join
finalizes a schema-less empty table for any partition that receives no
rows, so the convergent tail of a SINGLE long chain (every surviving
key = the one head) deterministically dies with "No match ... for key
field" once key cardinality drops below the partition count. The join
path is therefore only for many-list workloads (key cardinality stays
≥ partition count each round) — which is exactly the above-cap regime
that needs it; a billion-cell single chain is not a dataset, it's a
bug in the upstream lifter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import hash_join

RDF_FIRST = "rdf:first"
RDF_REST = "rdf:rest"
RDF_NIL = "rdf:nil"


def _pointer_edges(
    triples: rd.Dataset, entry_pred: str, rest_pred: str, nil: str
) -> rd.Dataset:
    def _edges(batch: pa.Table) -> pa.Table:
        p = batch.column("pred")
        keep = pc.or_(pc.equal(p, rest_pred), pc.equal(p, entry_pred))
        t = batch.filter(keep)
        t = t.filter(pc.not_equal(t.column("obj"), nil))
        # reversed: the chain points BACK toward the head
        return pa.table(
            {
                "node": t.column("obj").combine_chunks(),
                "anc": t.column("subj").combine_chunks(),
            }
        )

    return triples.map_batches(_edges, batch_format="pyarrow")


def _firsts(triples: rd.Dataset, first_pred: str) -> rd.Dataset:
    def _f(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch.column("pred"), first_pred))
        return pa.table(
            {
                "node": t.column("subj").combine_chunks(),
                "member": t.column("obj").combine_chunks(),
            }
        )

    return triples.map_batches(_f, batch_format="pyarrow")


def rank_rdf_lists(
    triples: rd.Dataset,
    *,
    entry_pred: str,
    first_pred: str = RDF_FIRST,
    rest_pred: str = RDF_REST,
    nil: str = RDF_NIL,
    node_cap: int = 5_000_000,
    max_rounds: int = 40,
    strategy: str = "auto",
) -> rd.Dataset:
    """(subj, pred, obj) triples -> Dataset[(head, pos, member)]."""
    ptr = _pointer_edges(triples, entry_pred, rest_pred, nil).materialize()
    n_cells = ptr.count()
    use_join = strategy == "join" or (
        strategy == "auto" and n_cells > node_cap
    )
    firsts = _firsts(triples, first_pred)

    if use_join:
        resolved = _rank_by_joins(ptr, max_rounds)  # Dataset (node, head, pos)
        out = hash_join(firsts, resolved, on="node", join_type="inner")

        def _proj(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "head": batch.column("head").combine_chunks(),
                    "pos": batch.column("pos").combine_chunks(),
                    "member": batch.column("member").combine_chunks(),
                }
            )

        return out.map_batches(_proj, batch_format="pyarrow")

    nodes, heads, pos = _rank_vectorized(ptr, max_rounds)
    ref = ray.put((nodes, heads, pos))

    def _attach(batch: pa.Table) -> pa.Table:
        nds, hds, ps = ray.get(ref)
        idx = pc.fill_null(
            pc.index_in(batch.column("node").combine_chunks(), nds), -1
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        ok = idx >= 0
        take = pa.array(idx[ok], pa.int64())
        return pa.table(
            {
                "head": pc.take(hds, take),
                "pos": pa.array(ps[idx[ok]], pa.int64()),
                "member": batch.column("member").combine_chunks().filter(
                    pa.array(ok)
                ),
            }
        )

    return firsts.map_batches(_attach, batch_format="pyarrow")


def _gather(ds: rd.Dataset) -> pa.Table:
    return pa.concat_tables(
        [ray.get(r) for r in ds.to_arrow_refs()],
        promote_options="default",
    )


def _rank_vectorized(ptr: rd.Dataset, max_rounds: int):
    """Numpy pointer doubling over the gathered 2-column pointer table.

    anc_idx[i] = position of node i's current ancestor pointer in the
    node array (-1 once it points at a head), d[i] = accumulated hop
    count, term[i] = index of the chain's terminal cell (the one whose
    stored ``anc`` string IS the head) — valid once anc_idx[i] == -1.
    """
    t = _gather(ptr)
    nodes = t.column("node").combine_chunks()
    anc = t.column("anc").combine_chunks()
    n = len(nodes)
    if n == 0:
        return nodes, anc, np.zeros(0, dtype=np.int64)
    n_uniq = len(pc.unique(nodes))
    if n_uniq < n:
        raise ValueError(
            f"{n - n_uniq} node(s) carry multiple rest/entry (parent) "
            "pointers — not a well-formed pointer forest (shared rdf:List "
            "cell, cycle through a head, or a child with two parents)"
        )
    anc_idx = (
        pc.fill_null(pc.index_in(anc, nodes), -1)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    d = np.ones(n, dtype=np.int64)
    term = np.where(anc_idx == -1, np.arange(n, dtype=np.int64), -1)
    for _ in range(max_rounds):
        live = anc_idx >= 0
        if not live.any():
            break
        j = anc_idx[live]
        d[live] = d[live] + d[j]
        jj = anc_idx[j]  # ancestor's ancestor (synchronous snapshot)
        newly = live.copy()
        newly[live] = jj == -1
        term[newly] = term[j[jj == -1]]
        anc_idx[live] = jj
    else:
        raise ValueError(
            f"rdf list longer than 2^{max_rounds} cells (or a cycle); "
            "check the data before raising max_rounds"
        )
    heads = pc.take(anc, pa.array(term, pa.int64()))
    if isinstance(heads, pa.ChunkedArray):
        heads = heads.combine_chunks()
    return nodes, heads, d - 1


def _rank_by_joins(ptr: rd.Dataset, max_rounds: int) -> rd.Dataset:
    """Distributed pointer doubling (above-cap path): each round one
    node-sized hash join. See the module docstring for the Ray 2.49
    single-chain caveat."""

    def _seed(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "d", pa.array([1] * batch.num_rows, pa.int64())
        )

    state = ptr.map_batches(_seed, batch_format="pyarrow").materialize()

    def _as_right(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "anc": batch.column("node").combine_chunks(),
                "anc2": batch.column("anc").combine_chunks(),
                "d2": batch.column("d").combine_chunks(),
            }
        )

    for _ in range(max_rounds):
        hop = hash_join(
            state,
            state.map_batches(_as_right, batch_format="pyarrow"),
            on="anc",
            join_type="left_outer",
        )

        def _jump(batch: pa.Table) -> pa.Table:
            has = pc.is_valid(batch.column("anc2"))
            nxt_anc = pc.if_else(
                has, batch.column("anc2"), batch.column("anc")
            )
            if isinstance(nxt_anc, pa.ChunkedArray):
                nxt_anc = nxt_anc.combine_chunks()
            d2 = pc.fill_null(batch.column("d2"), 0)
            return pa.table(
                {
                    "node": batch.column("node").combine_chunks(),
                    "anc": nxt_anc,
                    "d": pc.add_checked(
                        batch.column("d"), d2
                    ).combine_chunks(),
                    "jumped": pc.cast(has, pa.int64()).combine_chunks(),
                }
            )

        nxt = hop.map_batches(_jump, batch_format="pyarrow").materialize()
        moved = nxt.sum("jumped")
        state = nxt.drop_columns(["jumped"])
        if not moved:
            break
    else:
        raise ValueError(
            f"rdf list longer than 2^{max_rounds} cells (or a cycle); "
            "check the data before raising max_rounds"
        )

    def _final(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch.column("node").combine_chunks(),
                "head": batch.column("anc").combine_chunks(),
                "pos": pc.subtract(batch.column("d"), 1).combine_chunks(),
            }
        )

    return state.map_batches(_final, batch_format="pyarrow")
