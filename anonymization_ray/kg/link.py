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
    constructor.

    Each actor deduplicates the alias edges it emits for its lifetime (the
    combiner/salting pattern): the edge vocabulary is dimension-scale, so
    without this every mention occurrence floods the object store with a
    duplicate edge row."""

    def __init__(self, alias_ref, emit_url: bool = True) -> None:
        self._alias = ray.get(alias_ref) if isinstance(alias_ref, ray.ObjectRef) else alias_ref
        self._emit_url = emit_url
        self._seen_edges: set[tuple[str, str]] = set()

    def _resolve_direct(self, m: str) -> str | None:
        cm = CUST_RE.match(m)
        if cm:
            return f"urn:cust:{int(cm.group(1))}"
        hop = self._alias.get(m)
        if hop is not None and hop.startswith("urn:"):
            return hop
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        subs = batch.column("subj").to_pylist()
        objs = batch.column("obj").to_pylist()
        kinds = batch.column("obj_kind").to_pylist()
        new_s, new_o, new_k = [], [], []
        edge_a, edge_b = [], []

        def emit_edge(a: str, b: str) -> None:
            if (a, b) not in self._seen_edges:
                self._seen_edges.add((a, b))
                edge_a.append(a)
                edge_b.append(b)

        def link(m: str) -> str:
            direct = self._resolve_direct(m)
            if direct is not None:
                emit_edge(m, direct)
                return direct
            # walk the alias chain, emitting every hop as an edge so the
            # mention's component always reaches its entity node even when the
            # intermediate surface forms never occur in any page
            cur = m
            for _ in range(8):  # chain-depth guard
                hop = self._alias.get(cur)
                if hop is None:
                    break
                emit_edge(cur, hop)
                cur = hop
                if hop.startswith("urn:"):
                    break
            return m  # surface form stays; canonicalization rewrites it

    # one output table with a row marker so the stage stays single-pass:
    # kind="edge" rows feed canonicalization, others are linked triples
        for s, o, k in zip(subs, objs, kinds):
            ls = link(s)
            lo = link(o) if k == "mention" else o
            new_s.append(ls)
            new_o.append(lo)
            new_k.append("iri" if k == "mention" else k)
        cols = {}
        if self._emit_url:
            cols["url"] = batch.column("url").combine_chunks()
        cols.update(
            {
                "subj": pa.array(new_s, pa.string()),
                "pred": batch.column("pred").combine_chunks(),
                "obj": pa.array(new_o, pa.string()),
                "obj_kind": pa.array(new_k, pa.string()),
                "edge_a": pa.nulls(batch.num_rows, pa.string()),
                "edge_b": pa.nulls(batch.num_rows, pa.string()),
            }
        )
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
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, cpus // 4), max(4, cpus))
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

    def __init__(self, alias_ref, emit_url: bool = True) -> None:
        from .extract import MentionExtractor

        self._extract = MentionExtractor()
        self._link = MentionLinker(alias_ref, emit_url=emit_url)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self._link(self._extract(batch))


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
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (max(1, cpus // 4), max(4, cpus))
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
