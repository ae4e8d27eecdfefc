"""Canonicalization — connected components over alias edges.

Assigns every mention-surface-form a stable canonical IRI: the connected
component of the alias-edge graph, labeled by its entity node (``urn:…``
member; lexicographic min as tie-break / fallback).

Two paths, auto-selected by measured deduped-edge volume:

- **driver union-find** (small-vocab fast path): edges are per-block deduped
  distributed, then streamed to the driver with a hard cap; exact union-find
  labels the components. One pass, no shuffle rounds.
- **distributed min-label contraction** (the 10^12-doc path): when the edge
  stream exceeds ``driver_edge_limit`` (billions of surface forms never fit
  one node), iterative rounds over hash-partitioned data:
  each round computes r(l) = min over {l} ∪ neighbors(l) in *label key
  space* (keys order ``urn:`` entity nodes before surface forms), rewrites
  the active edge set to ``(r(u), r(v))`` dropping self-edges, and composes
  r into the node→label mapping. Path contraction makes rounds behave like
  pointer doubling: O(log diameter) rounds until the active edge set is
  empty. The per-round min is a range sort + vectorized boundary scan
  (``util.min_per_key``), NOT a per-group aggregate — Ray's groupby pays a
  per-group Python cost that dominates at vocabulary scale.

The resulting (node -> canonical) mapping is applied to the triple stream by
broadcast lookup when it is an Arrow table, or by hash join on subj/obj when
it is a Dataset (beyond-driver-memory vocabularies).

The partitioning assumption: edges are hash/range-partitioned by node per
round — documented per SURVEY.md §2.5 custom-operator guidance.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import hash_join, min_per_key


def _local_dedup(batch: pa.Table) -> pa.Table:
    return batch.group_by(["edge_a", "edge_b"]).aggregate([])


def _label_key(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical-preference ordering as one sortable string: '0'+x for
    entity nodes (urn:), '1'+x otherwise — min over a component picks the
    entity node when present, lexicographic min within each class."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    prefix = pc.if_else(pc.starts_with(col, "urn:"), "0", "1")
    return pc.binary_join_element_wise(prefix, col, "")


def _nparts(count: int) -> int:
    """Join partition count clamped by row count: Ray's hash join crashes
    when a partition receives zero LEFT blocks (empty concat loses the
    schema), so small inputs must not over-partition. At scale every
    partition holds thousands of keys and the default applies."""
    from ..util import default_num_partitions

    return max(1, min(default_num_partitions(), count // 2000 + 1))


def _pointer_closure(r: rd.Dataset, count: int, *, max_iter: int = 12) -> rd.Dataset:
    """Transitive closure of the min-pointer function r: _rk -> _rv by
    repeated self-composition (pointer doubling): after j iterations each
    pointer has jumped 2^j hops, so a depth-d chain closes in O(log d)
    node-sized joins — never a vocabulary-sized scan."""
    for _ in range(max_iter):
        j = hash_join(
            r, r.rename_columns({"_rk": "_rv", "_rv": "_rv2"}),
            on="_rv", join_type="left_outer", num_partitions=_nparts(count),
        )

        changed = j.map_batches(
            lambda b: pa.table(
                {
                    "_rk": b.column("_rk").combine_chunks(),
                    "_rv": pc.coalesce(b.column("_rv2"), b.column("_rv")),
                    "_chg": pc.cast(
                        pc.fill_null(
                            pc.not_equal(b.column("_rv2"), b.column("_rv")), False
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        n_changed = changed.sum("_chg") or 0
        r = changed.drop_columns(["_chg"]).materialize()
        if n_changed == 0:
            break
    return r


def canonicalize_components_distributed(
    edges: rd.Dataset, *, max_rounds: int = 16
) -> rd.Dataset:
    """Dataset[(edge_a, edge_b)] -> Dataset[(node, canonical)] without ever
    materializing the vocabulary on the driver."""

    def _to_keys(batch: pa.Table) -> pa.Table:
        t = pa.table(
            {"u": _label_key(batch.column("edge_a")), "v": _label_key(batch.column("edge_b"))}
        )
        return t.group_by(["u", "v"]).aggregate([])

    active = edges.map_batches(_to_keys, batch_format="pyarrow").materialize()

    def _self_map(batch: pa.Table) -> pa.Table:
        nodes = pa.concat_arrays(
            [batch.column("u").combine_chunks(), batch.column("v").combine_chunks()]
        )
        t = pa.table({"node": nodes})
        t = t.group_by(["node"]).aggregate([])
        return t.append_column("label", t.column("node"))

    # mapping: every node -> current best-known label (starts at itself);
    # node-level dedup is finished by min_per_key
    mapping = active.map_batches(_self_map, batch_format="pyarrow").materialize()
    mapping = min_per_key(mapping, "node", "label").materialize()
    vocab = mapping.count()

    for _ in range(max_rounds):
        n_active = active.count()
        if n_active == 0:
            break
        # r(l) = min(l ∪ neighbors(l)) in key space — emitted symmetrically,
        # reduced by range sort + boundary scan (NOT a per-group aggregate),
        # then pointer-closed so each outer round is a full chain collapse
        def _sym(batch: pa.Table) -> pa.Table:
            u = batch.column("u").combine_chunks()
            v = batch.column("v").combine_chunks()
            return pa.table(
                {
                    "node": pa.concat_arrays([u, v, u, v]),
                    "nbr": pa.concat_arrays([v, u, u, v]),
                }
            )

        r = min_per_key(
            active.map_batches(_sym, batch_format="pyarrow"), "node", "nbr"
        ).rename_columns({"node": "_rk", "nbr": "_rv"}).materialize()
        r = _pointer_closure(r, n_active * 2)

        # fold r into the node mapping (labels of settled components are
        # absent from r — left join + coalesce keeps them)
        joined = hash_join(
            mapping, r.rename_columns({"_rk": "label", "_rv": "_new"}),
            on="label", join_type="left_outer", num_partitions=_nparts(vocab),
        )

        def _update(batch: pa.Table) -> pa.Table:
            lbl = pc.coalesce(batch.column("_new"), batch.column("label"))
            return pa.table({"node": batch.column("node").combine_chunks(), "label": lbl})

        mapping = joined.map_batches(_update, batch_format="pyarrow").materialize()

        # contract the active edge graph: (u,v) -> (r(u), r(v)), drop
        # self-edges, per-block dedup before the next round's shuffle
        e = hash_join(active, r.rename_columns({"_rk": "u", "_rv": "_ru"}), on="u",
                      join_type="left_outer", num_partitions=_nparts(n_active))
        # chained lazy joins over renamed shared lineage confuse Ray's join
        # planner (FieldRef collision) — pin the intermediate
        e = e.materialize()
        e = hash_join(e, r.rename_columns({"_rk": "v", "_rv": "_rv2"}), on="v",
                      join_type="left_outer", num_partitions=_nparts(n_active))

        def _rewrite(batch: pa.Table) -> pa.Table:
            u = pc.coalesce(batch.column("_ru"), batch.column("u"))
            v = pc.coalesce(batch.column("_rv2"), batch.column("v"))
            t = pa.table({"u": u, "v": v}).filter(pc.invert(pc.equal(u, v)))
            return t.group_by(["u", "v"]).aggregate([])

        active = e.map_batches(_rewrite, batch_format="pyarrow").materialize()
    else:
        if active.count() > 0:
            raise RuntimeError(
                f"canonicalization did not converge in {max_rounds} rounds"
            )

    def _strip(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.utf8_slice_codeunits(batch.column("node"), 1),
                "canonical": pc.utf8_slice_codeunits(batch.column("label"), 1),
            }
        )

    return mapping.map_batches(_strip, batch_format="pyarrow")


def canonicalize_components(
    edges: rd.Dataset,
    max_rounds: int = 16,
    *,
    driver_edge_limit: int = 2_000_000,
    force_distributed: bool = False,
) -> pa.Table | rd.Dataset:
    """edges: Dataset[(edge_a, edge_b)] -> (node, canonical) mapping.

    Returns an Arrow table (exact driver union-find) while the per-block
    deduped edge set fits ``driver_edge_limit``; beyond that — or with
    ``force_distributed`` — returns a Dataset from the distributed min-label
    contraction. Both paths produce identical mappings (tested).
    """
    if not force_distributed:
        # two-stage dedup: vectorized per-block dedup collapses the hot-key
        # occurrence stream before anything reaches the driver. The deduped
        # blocks materialize IN PARALLEL (no serial iter_batches pull through
        # the driver — that stream was a measured ~2s serial-floor item at
        # any cluster width); the driver only concats the already-tiny
        # tables and finishes the dedup with one Arrow C++ group_by. The
        # per-block-deduped row count is a conservative cap proxy (upper
        # bound on the distinct count) — overflow falls through to the
        # distributed path.
        local = edges.map_batches(_local_dedup, batch_format="pyarrow").materialize()
        if local.count() <= driver_edge_limit:
            import ray

            tables = [tb for tb in ray.get(local.to_arrow_refs()) if tb.num_rows]
            seen: set[tuple[str, str]] = set()
            if tables:
                t = pa.concat_tables(tables).group_by(["edge_a", "edge_b"]).aggregate([])
                seen = set(
                    zip(t.column("edge_a").to_pylist(), t.column("edge_b").to_pylist())
                )
            return _driver_union_find(seen)
    return canonicalize_components_distributed(edges, max_rounds=max_rounds)


def alias_canonical_mapping(alias_index: dict) -> pa.Table:
    """Corpus-independent canonical mapping straight from the alias
    dictionary.

    In this engine alias edges are emitted EXCLUSIVELY from the broadcast
    alias dictionary's pre-walked chains (``link.MentionLinker`` never
    derives edges from page content), so union-find over the full
    dictionary's chains equals the stream-derived mapping restricted to
    mentioned surface forms — the unmentioned extras are unused lookup
    entries. Computing it on the driver (dimension-scale, instant) takes
    canonicalization OFF the corpus critical path entirely: no edge rows in
    the mention stream, no edge-filter scan of the materialized output, no
    serial wait between extraction and mapping application.

    The stream-derived path (``canonicalize_components`` over emitted edges)
    remains for pipelines whose edges ARE corpus-derived (checkpointed runs,
    co-occurrence linking); equality of the two mappings on mentioned forms
    is tested."""
    seen: set[tuple[str, str]] = set()
    for k in alias_index:
        cur = k
        for _ in range(8):  # chain-depth guard (same as the linker pre-walk)
            nxt = alias_index.get(cur)
            if nxt is None:
                break
            edge = (cur, nxt)
            if edge in seen:  # tail already walked from an earlier start
                break
            seen.add(edge)
            cur = nxt
            if nxt.startswith("urn:"):
                break
    return _driver_union_find(seen)


def _driver_union_find(seen: set[tuple[str, str]]) -> pa.Table:
    """Exact union-find over the deduped dimension-scale edge set."""
    if seen:
        ea, eb = zip(*sorted(seen))
        et = pa.table({"edge_a": pa.array(ea, pa.string()), "edge_b": pa.array(eb, pa.string())})
    else:
        et = pa.table({"edge_a": pa.array([], pa.string()), "edge_b": pa.array([], pa.string())})

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
    mapping: pa.Table | rd.Dataset,
    cols: tuple[str, ...] = ("subj", "obj"),
    *,
    broadcast: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Rewrite mention columns to canonical IRIs.

    broadcast=True (default, Arrow-table mappings): the mapping rides the
    object store once and each task rewrites via a vectorized dictionary
    lookup — no shuffle. Dataset mappings (beyond-driver-memory vocabularies,
    from the distributed canonicalizer) always take the join path: one hash
    join per column.
    """
    if isinstance(mapping, rd.Dataset):
        broadcast = False
    if broadcast:
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
    map_ds = mapping if isinstance(mapping, rd.Dataset) else rd.from_arrow(mapping)
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
