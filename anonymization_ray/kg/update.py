"""SPARQL 1.1 UPDATE — ``DELETE { … } INSERT { … } WHERE { … }`` over a
triple-set Dataset (the graph-mutation surface a Jena-served store exposes
via SPARQL Update; the reference's anonymization rewrite IS a
delete/insert at heart — this operator exposes the general form).

Semantics (SPARQL 1.1 Update §3.1.3): evaluate WHERE once, instantiate the
DELETE template against the solutions and remove those triples, then
instantiate the INSERT template against the SAME solutions and add those —
a graph is a set, so removal is set-minus and addition is set-union.

Ray-Data shape:

- WHERE bindings come from the caller (``match_bgp`` + filters — any
  binding stream works);
- template instantiation is a stateless vectorized projection per batch;
- deletion is an anti semi-join of the store against the (distinct)
  delete set on the packed ``subj·pred·obj`` key — the store never
  gathers, only the delete keys move (``extras.joins.semi_anti_join``,
  partition count clamped to the small side);
- insertion is a stream union with the insert set (projected distinct).
  When the inserted predicate cannot pre-exist in the store (the common
  rewrite case, and this module's default assumption is NOT made — pass
  ``dedup_union=True`` to pay one full-store distinct when inserts may
  collide with surviving triples).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import distinct_rows

_SEP = "\x1f"
_POS = ("subj", "pred", "obj")


def instantiate_template(
    bindings: rd.Dataset, template: tuple[str, str, str]
) -> rd.Dataset:
    """One (subj, pred, obj) row per binding: elements starting ``?`` take
    the named binding column, everything else is a constant."""

    def _f(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {}
        for name, el in zip(_POS, template):
            if el.startswith("?"):
                cols[name] = b.column(el[1:]).combine_chunks().cast(pa.string())
            else:
                cols[name] = pa.array([el] * n, pa.string())
        return pa.table(cols)

    return bindings.map_batches(_f, batch_format="pyarrow")


def _with_key(ds: rd.Dataset, key_col: str) -> rd.Dataset:
    def _f(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            b.column("subj").combine_chunks().cast(pa.string()),
            b.column("pred").combine_chunks().cast(pa.string()),
            b.column("obj").combine_chunks().cast(pa.string()),
            _SEP,
        )
        return b.append_column(key_col, k)

    return ds.map_batches(_f, batch_format="pyarrow")


def delete_insert_where(
    triples: rd.Dataset,
    bindings: rd.Dataset,
    *,
    delete: list[tuple[str, str, str]] | None = None,
    insert: list[tuple[str, str, str]] | None = None,
    dedup_union: bool = False,
) -> rd.Dataset:
    """(store − instantiated deletes) ∪ instantiated inserts, as
    (subj, pred, obj). ``bindings`` is the evaluated WHERE clause.

    ``dedup_union=False`` unions without a full-store distinct — correct
    whenever the insert templates cannot re-create triples that survive
    deletion (e.g. a predicate new to the store); set True otherwise."""
    from ..extras.joins import semi_anti_join

    store = triples.select_columns(list(_POS))
    bind_mat = bindings.materialize()
    if delete:
        dels = [instantiate_template(bind_mat, t) for t in delete]
        del_set = dels[0]
        for d in dels[1:]:
            del_set = del_set.union(d)
        del_keys = distinct_rows(_with_key(del_set, "k"), ["k"])
        store = semi_anti_join(
            _with_key(store, "k"), del_keys, on="k", anti=True, broadcast=False
        ).drop_columns(["k"])
    if insert:
        inss = [instantiate_template(bind_mat, t) for t in insert]
        ins_set = inss[0]
        for i in inss[1:]:
            ins_set = ins_set.union(i)
        ins_set = distinct_rows(ins_set, list(_POS))
        store = store.union(ins_set)
        if dedup_union:
            store = distinct_rows(store, list(_POS))
    return store


# -- SPARQL 1.1 Update graph management (ADD / COPY / MOVE / CLEAR) --------
#
# Over the quad-on-triple predicate-fusion encoding (pred = "graph#pred",
# the wave-37 scoping): every op is a composition of stateless prefix
# scans, a retag projection and a stream union — only the DESTINATION
# graph's slice ever pays a distinct (set semantics), the rest of the
# store streams through untouched.


def _graph_mask(b: pa.Table, graph: str):
    return pc.starts_with(b.column("pred"), graph + "#")


def _slice_graph(quads: rd.Dataset, graph: str, keep: bool) -> rd.Dataset:
    def _f(b: pa.Table) -> pa.Table:
        m = _graph_mask(b, graph)
        return b.filter(m if keep else pc.invert(m))

    return quads.map_batches(_f, batch_format="pyarrow")


def _retag(quads: rd.Dataset, src: str, dst: str) -> rd.Dataset:
    def _f(b: pa.Table) -> pa.Table:
        tail = pc.utf8_replace_slice(
            b.column("pred").combine_chunks(), 0, len(src) + 1, ""
        )
        return pa.table(
            {
                "subj": b.column("subj").combine_chunks(),
                "pred": pc.binary_join_element_wise(dst + "#", tail, ""),
                "obj": b.column("obj").combine_chunks(),
            }
        )

    return quads.map_batches(_f, batch_format="pyarrow")


def manage_graph(
    quads: rd.Dataset, op: str, *, src: str | None = None, dst: str | None = None
) -> rd.Dataset:
    """SPARQL 1.1 Update graph management over predicate-fused quads.

    - ``CLEAR``  (src): drop every triple of graph ``src``;
    - ``ADD``    (src, dst): union ``src``'s triples into ``dst`` (set
      semantics — the dst slice dedups, src survives);
    - ``COPY``   (src, dst): dst := src (dst's prior triples dropped);
    - ``MOVE``   (src, dst): COPY then CLEAR src.
    """
    op = op.upper()
    if op == "CLEAR":
        if not src:
            raise ValueError("CLEAR needs src")
        return _slice_graph(quads, src, keep=False)
    if not src or not dst:
        raise ValueError(f"{op} needs src and dst")
    if src == dst:
        return quads  # spec: same-graph ADD/COPY/MOVE is a no-op
    moved = _retag(_slice_graph(quads, src, keep=True), src, dst)
    if op == "ADD":
        rest = _slice_graph(quads, dst, keep=False)
        new_dst = distinct_rows(
            _slice_graph(quads, dst, keep=True).union(moved), list(_POS)
        )
        return rest.union(new_dst)
    if op == "COPY":
        # everything outside dst survives (src included), dst becomes src
        rest = _slice_graph(quads, dst, keep=False)
        return rest.union(moved)
    if op == "MOVE":
        rest = _slice_graph(_slice_graph(quads, dst, keep=False), src, keep=False)
        return rest.union(moved)
    raise ValueError(f"unknown graph-management op {op!r}")
