"""Entity linking against a broadcast alias dictionary.

The alias index (dimension-scale) is built driver-side, put into the object
store ONCE (``ray.put``) and read inside each linker actor's constructor —
never re-shipped per batch (north-star: "Arrow-backed alias dictionary"
broadcast small side).

The index intentionally resolves only ONE hop (variant -> parent variant,
exact name -> entity IRI): transitive resolution is canonicalization's job
(union-find over the emitted alias edges), so the two stages exercise the
real split of responsibilities at scale.

Outputs:
- linked mention rows: obj/subj replaced where a DIRECT entity hit exists
  (rule-based ``Customer#N`` -> ``urn:cust:N``; exact nation/region names)
- alias edge rows ``(a, b)`` for everything the dictionary chains.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

CUST_RE = re.compile(r"^Customer#(\d+)$")


def build_alias_index(sf_dir: str) -> dict:
    """alias -> next hop. Exact names map straight to the entity IRI; variant
    surface forms map one hop toward the exact form (a chain, so components
    need transitive closure downstream)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet").to_pydict()
    region = pq.read_table(f"{sf_dir}/region.parquet").to_pydict()
    idx: dict[str, str] = {}

    def add(key: str, val: str) -> None:
        # earlier entries win: a variant surface form that collapses onto an
        # already-registered key (e.g. 'AFRICA'.replace('_',' ') == 'AFRICA')
        # must not overwrite the entity mapping — that would create a cycle
        if key not in idx:
            idx[key] = val

    for nk, nn in zip(nation["n_nationkey"], nation["n_name"]):
        add(nn, f"urn:nation:{nk}")
        add(nn.lower(), nn)  # variant style 1 -> exact
        add(nn.replace("_", " "), nn.lower())  # variant style 2 -> style 1
    for rk, rn in zip(region["r_regionkey"], region["r_name"]):
        add(rn, f"urn:region:{rk}")
        add(rn.lower(), rn)
        add(rn.replace("_", " "), rn.lower())
    return idx


class MentionLinker:
    """Actor-pool callable: dereferences the broadcast alias index once in the
    constructor and PRE-WALKS every alias chain there — per batch the hot
    path is a vectorized regex + sorted-array lookup; per-row Python runs
    only once per DISTINCT previously-unseen surface form (edge emission).

    Each actor deduplicates the alias edges it emits for its lifetime (the
    combiner/salting pattern): the edge vocabulary is dimension-scale, so
    without this every mention occurrence floods the object store with a
    duplicate edge row."""

    def __init__(self, alias_ref, emit_url: bool = True, emit_edges: bool = True) -> None:
        import numpy as np

        alias = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self._emit_url = emit_url
        self._emit_edges = emit_edges
        self._seen_edges: set[tuple[str, str]] = set()
        self._seen_mentions: set[str] = set()
        self._edge_buf: list[tuple[str, str]] = []
        # pre-walk: surface form -> (direct target or None, chain edges
        # exactly as the reference per-row walk would emit them)
        self._chain: dict[str, tuple[str | None, list[tuple[str, str]]]] = {}
        for k, hop in alias.items():
            if hop.startswith("urn:"):
                self._chain[k] = (hop, [(k, hop)])
                continue
            edges: list[tuple[str, str]] = []
            cur = k
            for _ in range(8):  # chain-depth guard
                nxt = alias.get(cur)
                if nxt is None:
                    break
                edges.append((cur, nxt))
                cur = nxt
                if nxt.startswith("urn:"):
                    break
            self._chain[k] = (None, edges)
        self._keys = np.array(sorted(self._chain), dtype=object)
        self._resolved = np.array(
            [self._chain[k][0] or "" for k in self._keys], dtype=object
        )

    def _emit_mention(self, m: str, direct: str | None) -> None:
        """Record the chain edges of a newly seen surface form (once per
        actor lifetime)."""
        self._seen_mentions.add(m)
        if not self._emit_edges:
            return
        edges = [(m, direct)] if direct is not None else self._chain[m][1]
        for e in edges:
            if e not in self._seen_edges:
                self._seen_edges.add(e)
                self._edge_buf.append(e)

    def _link_array(self, arr: pa.Array, active):
        import numpy as np

        vals = arr.to_numpy(zero_copy_only=False)
        out = vals.copy()
        # rule-based direct hit: Customer#N -> urn:cust:N, vectorized on the
        # matching subset (casting non-digit slices would throw)
        cust = pc.match_substring_regex(arr, r"^Customer#\d+$").to_numpy(
            zero_copy_only=False
        ) & active
        idx = np.nonzero(cust)[0]
        if idx.size:
            sub = pa.array(vals[idx].tolist(), pa.string())
            nums = pc.cast(pc.utf8_slice_codeunits(sub, 9, 1 << 30), pa.int64())
            targets = pc.binary_join_element_wise(
                pa.array(["urn:cust:"] * idx.size, pa.string()),
                pc.cast(nums, pa.string()),
                "",
            ).to_numpy(zero_copy_only=False)
            out[idx] = targets
            for i, t in zip(idx, targets):
                if vals[i] not in self._seen_mentions:
                    self._emit_mention(vals[i], t)
        # alias-table hits: sorted-array membership lookup (broadcast index)
        rest = np.nonzero(active & ~cust)[0]
        if rest.size and len(self._keys):
            sub = vals[rest]
            pos = np.clip(np.searchsorted(self._keys, sub), 0, len(self._keys) - 1)
            hit = self._keys[pos] == sub
            hit_rows = rest[hit]
            res = self._resolved[pos[hit]]
            direct = res != ""
            out[hit_rows[direct]] = res[direct]
            for m in sub[hit]:
                if m not in self._seen_mentions:
                    self._emit_mention(m, None if self._chain[m][0] is None else self._chain[m][0])
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        subs = batch.column("subj").combine_chunks()
        objs = batch.column("obj").combine_chunks()
        kinds = batch.column("obj_kind").combine_chunks()
        self._edge_buf = []
        all_on = np.ones(batch.num_rows, dtype=bool)
        mention = pc.equal(kinds, "mention").to_numpy(zero_copy_only=False)
        new_s = self._link_array(subs, all_on)
        new_o = self._link_array(objs, mention)
        new_k = np.where(mention, "iri", kinds.to_numpy(zero_copy_only=False))
        edge_a = [e[0] for e in self._edge_buf]
        edge_b = [e[1] for e in self._edge_buf]
        # one output table with a row marker so the stage stays single-pass:
        # kind="edge" rows feed canonicalization, others are linked triples
        cols = {}
        if self._emit_url:
            cols["url"] = batch.column("url").combine_chunks()
        cols.update(
            {
                "subj": pa.array(new_s.tolist(), pa.string()),
                "pred": batch.column("pred").combine_chunks(),
                "obj": pa.array(new_o.tolist(), pa.string()),
                "obj_kind": pa.array(new_k.tolist(), pa.string()),
            }
        )
        if self._emit_edges:
            cols["edge_a"] = pa.nulls(batch.num_rows, pa.string())
            cols["edge_b"] = pa.nulls(batch.num_rows, pa.string())
        t = pa.table(cols)
        if edge_a:
            ecols = {}
            if self._emit_url:
                ecols["url"] = pa.nulls(len(edge_a), pa.string())
            ecols.update(
                {
                    "subj": pa.nulls(len(edge_a), pa.string()),
                    "pred": pa.nulls(len(edge_a), pa.string()),
                    "obj": pa.nulls(len(edge_a), pa.string()),
                    "obj_kind": pa.array(["edge"] * len(edge_a), pa.string()),
                    "edge_a": pa.array(edge_a, pa.string()),
                    "edge_b": pa.array(edge_b, pa.string()),
                }
            )
            t = pa.concat_tables([t, pa.table(ecols)])
        return t


def link_mentions(
    mentions: rd.Dataset,
    alias_index: dict,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 4096,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Returns (linked_triples, alias_edges)."""
    if concurrency is None:
        from ..util import actor_pool_size

        concurrency = actor_pool_size()
    alias_ref = ray.put(alias_index)
    out = mentions.map_batches(
        MentionLinker,
        fn_constructor_args=(alias_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    # materialize ONCE so the two consumers below don't re-run extraction +
    # linking; this intermediate is mention-level (orders of magnitude smaller
    # than the page table) and lives in the object store / spills
    out = out.materialize()
    triples = out.filter(expr="obj_kind != 'edge'").drop_columns(["edge_a", "edge_b"])
    edges = out.filter(expr="obj_kind == 'edge'").select_columns(["edge_a", "edge_b"])
    return triples, edges


class ExtractLinker:
    """Fused extraction + linking actor: compiled patterns AND the broadcast
    alias index live for the actor's lifetime; mention rows go straight into
    linking without an intermediate object-store exchange. One pool instead
    of two halves actor pressure on small clusters."""

    def __init__(self, alias_ref, emit_url: bool = True, emit_edges: bool = True) -> None:
        from .extract import MentionExtractor

        self._extract = MentionExtractor()
        self._link = MentionLinker(alias_ref, emit_url=emit_url, emit_edges=emit_edges)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._link(self._extract(batch))


class ExtractLinkCanon:
    """Extraction + linking + canonical-mapping rewrite in ONE actor pass.

    When the canonical mapping is corpus-independent
    (``canonicalize.alias_canonical_mapping`` — alias edges come only from
    the broadcast dictionary), the mention stream needs no edge channel and
    no separate mapping pass: each batch leaves the actor already canonical.
    Cuts one full materialize + rewrite scan of the mention table (measured
    ~12 s at 32 CPUs / ~26 s at 8 CPUs on the 13.4M-page scaling corpus)."""

    def __init__(self, alias_ref, mapping_ref) -> None:
        import numpy as np

        self._el = ExtractLinker(alias_ref, emit_url=False, emit_edges=False)
        mapping = ray.get(mapping_ref) if isinstance(mapping_ref, ray.ObjectRef) else mapping_ref
        keys = np.array(mapping.column("node").to_pylist())
        vals = np.array(mapping.column("canonical").to_pylist())
        order = np.argsort(keys)
        self._keys, self._vals = keys[order], vals[order]

    def _rewrite(self, t: pa.Table, col: str) -> pa.Table:
        import numpy as np

        arr = t.column(col).to_numpy(zero_copy_only=False)
        pos = np.clip(np.searchsorted(self._keys, arr), 0, len(self._keys) - 1)
        hit = self._keys[pos] == arr
        if not hit.any():
            return t
        out = np.where(hit, self._vals[pos], arr)
        return t.set_column(t.column_names.index(col), col, pa.array(out, pa.string()))

    def __call__(self, batch: pa.Table) -> pa.Table:
        t = self._el(batch)
        if len(self._keys) and t.num_rows:
            t = self._rewrite(self._rewrite(t, "subj"), "obj")
        return t


def extract_link_canonical(
    pages: rd.Dataset,
    alias_index: dict,
    mapping,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
) -> rd.Dataset:
    """pages -> CANONICAL triples in one streaming actor pass (no edge
    stream, no separate mapping rewrite). ``mapping`` is the Arrow
    (node, canonical) table from ``alias_canonical_mapping``."""
    if concurrency is None:
        from ..util import actor_pool_size

        concurrency = actor_pool_size()
    alias_ref = ray.put(alias_index)
    mapping_ref = ray.put(mapping)
    return pages.map_batches(
        ExtractLinkCanon,
        fn_constructor_args=(alias_ref, mapping_ref),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def extract_and_link(
    pages: rd.Dataset,
    alias_index: dict,
    *,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 512,
    emit_url: bool = False,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Fused pages -> linked triples + alias edges (single actor pool).

    ``emit_url=False`` (default) drops the provenance url from the mention
    stream — the pipeline discards it before canonicalization anyway, and at
    scale it is the widest column in the materialized intermediate."""
    if concurrency is None:
        from ..util import actor_pool_size

        concurrency = actor_pool_size()
    alias_ref = ray.put(alias_index)
    out = pages.map_batches(
        ExtractLinker,
        fn_constructor_args=(alias_ref, emit_url),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    out = out.materialize()
    triples = out.filter(expr="obj_kind != 'edge'").drop_columns(["edge_a", "edge_b"])
    edges = out.filter(expr="obj_kind == 'edge'").select_columns(["edge_a", "edge_b"])
    return triples, edges
