"""Distributed graph analytics over edge Datasets (PageRank, triangles).

Graph algorithms are the natural consumers of a constructed KG (the reference
stops at serializing triples; a 100 TB KG is built to be *queried*). Both
operators here follow the repo's scale rules: per-key aggregation is NEVER a
Ray groupby at node/edge cardinality — partial Arrow aggregates + one range
sort + boundary carries (``util.combine_sorted_partials``) — and the joins
are hash-partitioned with partition counts clamped for small inputs.

PageRank uses INTEGER arithmetic end-to-end (ranks are millionths): every
operation (floor-div contribution split, 85/15 damping) is exactly
reproducible in SQL BIGINT math, so the iterative result is value-hash
checkable against an unrolled DuckDB oracle — no cross-engine float-sum
ordering hazard. Semantics (documented variant): r0 = SCALE;
r_{t+1}(v) = (15*SCALE)//100 + (85 * sum_{(u,v) in E} r_t(u)//outdeg(u))//100;
dangling-node mass is not redistributed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import (
    combine_sorted_partials,
    default_num_partitions,
    distinct_rows,
    hash_join,
)

PR_SCALE = 1_000_000  # integer rank units; bounds: sum <= n_nodes * SCALE


def sum_per_key(ds: rd.Dataset, key_col: str, val_col: str) -> rd.Dataset:
    """Exact int64 sum per key at ANY cardinality without a Ray groupby
    (the weighted-sum sibling of ``extras.stats.exact_value_counts``)."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    key_col: batch.column(key_col).combine_chunks(),
                    val_col: batch.column(val_col).combine_chunks(),
                }
            )
            .group_by([key_col])
            .aggregate([(val_col, "sum")])
        )
        return g.rename_columns([key_col, val_col])

    partials = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    s = partials.sort([key_col]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _segsum(t: pa.Table):
        if t.num_rows == 0 or key_col not in t.column_names:
            return None
        g = t.group_by([key_col]).aggregate([(val_col, "sum")])
        return g.select([key_col, f"{val_col}_sum"]).rename_columns([key_col, val_col])

    return combine_sorted_partials([_segsum.remote(r) for r in refs], key_col, val_col)


def _clamp_parts(n_rows: int) -> int:
    return max(2, min(default_num_partitions(), n_rows // 2000 + 1))


def pagerank_int(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 3,
    scale: int = PR_SCALE,
    teleport: list | None = None,
) -> rd.Dataset:
    """Integer PageRank over a (src, dst) edge Dataset -> Dataset[(node, rank)].

    Per iteration: one edge-sized hash join (attach r_t to each edge's src),
    one sort-based ``sum_per_key`` over dst, one node-sized left join — the
    canonical distributed-PageRank cost profile. Node-sized intermediates are
    materialized between iterations (tiny next to the edge stream). With
    scale=1e6 the damped sums stay under int64 even at 1e9 nodes.

    ``teleport`` switches to PERSONALIZED PageRank: ranks start at
    ``scale`` on the teleport nodes (0 elsewhere) and the 15% restart mass
    returns only to them — the seed set is dimension-sized, broadcast as
    one is_in mask per node batch; the per-iteration cost profile is
    unchanged."""
    edges = edges.select_columns([src_col, dst_col]).materialize()
    m = edges.count()
    nparts = _clamp_parts(m)

    # out-degree once, attached to the edge stream for the whole run
    deg = sum_per_key(
        edges.map_batches(
            lambda b: pa.table(
                {src_col: b.column(src_col), "one": pa.array(np.ones(b.num_rows, np.int64))}
            ),
            batch_format="pyarrow",
        ),
        src_col,
        "one",
    ).rename_columns({"one": "outdeg"})
    edges_d = hash_join(edges, deg, on=src_col, join_type="inner", num_partitions=nparts)
    edges_d = edges_d.materialize()

    nodes = distinct_rows(
        edges.map_batches(
            lambda b: pa.table({"node": b.column(src_col).combine_chunks()}),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda b: pa.table({"node": b.column(dst_col).combine_chunks()}),
                batch_format="pyarrow",
            )
        ),
        ["node"],
    ).materialize()
    n_nodes = nodes.count()
    node_parts = _clamp_parts(n_nodes)
    base = (15 * scale) // 100

    seed_arr = pa.array(teleport, nodes.schema().types[0]) if teleport else None

    def _init(b: pa.Table) -> pa.Table:
        if seed_arr is None:
            r = np.full(b.num_rows, scale, np.int64)
        else:
            m = pc.fill_null(
                pc.is_in(b.column("node").combine_chunks(), value_set=seed_arr),
                False,
            ).to_numpy(zero_copy_only=False)
            r = np.where(m, scale, 0).astype(np.int64)
        return b.append_column("rank", pa.array(r, pa.int64()))

    ranks = nodes.map_batches(_init, batch_format="pyarrow").materialize()

    for _ in range(iterations):
        joined = hash_join(
            edges_d,
            ranks.rename_columns({"node": src_col}),
            on=src_col,
            join_type="inner",
            num_partitions=nparts,
        )
        contrib = joined.map_batches(
            lambda b: pa.table(
                {
                    dst_col: b.column(dst_col).combine_chunks(),
                    "c": pa.array(
                        b.column("rank").to_numpy(zero_copy_only=False)
                        // b.column("outdeg").to_numpy(zero_copy_only=False)
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        sums = sum_per_key(contrib, dst_col, "c").rename_columns({dst_col: "node", "c": "s"})
        nxt = hash_join(nodes, sums, on="node", join_type="left_outer", num_partitions=node_parts)

        def _damp(b: pa.Table) -> pa.Table:
            s = (
                pc.fill_null(pc.cast(b.column("s"), pa.int64()), 0)
                .combine_chunks()
                .to_numpy(zero_copy_only=False)
            )
            if seed_arr is None:
                r = base + (85 * s) // 100
            else:
                m = pc.fill_null(
                    pc.is_in(b.column("node").combine_chunks(), value_set=seed_arr),
                    False,
                ).to_numpy(zero_copy_only=False)
                r = np.where(m, base, 0).astype(np.int64) + (85 * s) // 100
            return pa.table({"node": b.column("node").combine_chunks(), "rank": pa.array(r)})

        ranks = nxt.map_batches(_damp, batch_format="pyarrow").materialize()
    return ranks


def triangle_count(
    edges: rd.Dataset, *, a_col: str = "a", b_col: str = "b"
) -> rd.Dataset:
    """Count triangles in an undirected simple graph -> 1-row Dataset[{triangles}].

    ``edges`` must be canonical unique undirected pairs with a < b (int64 ids
    < 2^31; endpoint pairs are folded into one int64 key for the closure
    join, a single-column hash join instead of a composite key). Join plan:
    wedges = edges ⋈ edges on (b == a'), then closure against the folded edge
    set — each triangle x<y<z is counted exactly once via (x,y)+(y,z)+(x,z).
    Wedge cardinality is sum of deg_in*deg_out per mid node; at crawl scale
    orient by (degree, id) before calling to bound it O(E^1.5)."""
    edges = edges.select_columns([a_col, b_col]).materialize()
    nparts = _clamp_parts(edges.count())

    def _fold(b: pa.Table) -> pa.Table:
        key = (
            b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64) << np.int64(32)
        ) | b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ek": pa.array(key)})

    edge_keys = edges.map_batches(_fold, batch_format="pyarrow")

    wedges = hash_join(
        edges.rename_columns({a_col: "x", b_col: "mid"}),
        edges.rename_columns({a_col: "mid", b_col: "z"}).materialize(),
        on="mid",
        join_type="inner",
        num_partitions=nparts,
    )

    def _wedge_key(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        z = b.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ek": pa.array((x << np.int64(32)) | z)})

    closures = hash_join(
        wedges.map_batches(_wedge_key, batch_format="pyarrow"),
        edge_keys.map_batches(
            lambda b: b.append_column("hit", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ).materialize(),
        on="ek",
        join_type="inner",
        num_partitions=nparts,
    )
    n = closures.count()
    return rd.from_arrow(pa.table({"triangles": pa.array([n], pa.int64())}))


def bfs_hops(
    edges: rd.Dataset,
    seeds: list,
    max_hops: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
) -> rd.Dataset:
    """Multi-source unweighted BFS -> Dataset[(node, dist)], dist = minimum
    hop count from any seed (seeds at 0), nodes beyond ``max_hops`` absent.

    Proper frontier BFS, not path enumeration: per hop, the frontier's node
    set SEMI-joins the edge stream (broadcast ``pc.is_in`` scan — the edges
    NEVER shuffle, the dominant cost at crawl scale), the neighbor set is
    deduplicated with the sort-based ``distinct_rows``, and an ANTI join
    against the visited node set (broadcast again — both sides of the probe
    are node-bounded) ensures a node is expanded exactly once, so per-hop
    cost is O(edges scanned + nodes) independent of how many paths reach a
    node (the recursive-CTE oracle enumerates paths; this plan must not).
    Frontiers and the visited set are node-bounded materializations; beyond
    ``joins.BROADCAST_KEY_CAP`` frontier keys the semi/anti helper's shuffle
    path takes over. Symmetrize ``edges`` for undirected reachability."""
    from .joins import semi_anti_join

    edges = edges.select_columns([src_col, dst_col]).materialize()

    seed_tbl = pa.table(
        {"node": pa.array(seeds), "dist": pa.array([0] * len(seeds), pa.int64())}
    )
    visited = rd.from_arrow(seed_tbl).materialize()
    frontier = visited.select_columns(["node"]).materialize()

    for d in range(1, max_hops + 1):
        touched = semi_anti_join(edges, frontier, on=src_col, right_on="node")
        cand = distinct_rows(
            touched.map_batches(
                lambda b: pa.table({"node": b.column(dst_col).combine_chunks()}),
                batch_format="pyarrow",
            ),
            ["node"],
        )
        new = semi_anti_join(cand, visited, on="node", anti=True).map_batches(
            lambda b, dist=d: b.append_column(
                "dist", pa.array(np.full(b.num_rows, dist, np.int64))
            ),
            batch_format="pyarrow",
        ).materialize()
        if new.count() == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new.select_columns(["node"]).materialize()
    return visited


def kcore(
    edges: rd.Dataset,
    k: int,
    *,
    a_col: str = "a",
    b_col: str = "b",
    max_rounds: int = 32,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """k-core decomposition by iterative peeling: repeatedly drop nodes with
    degree < ``k`` (and their edges) until fixpoint; returns the surviving
    (node, deg) rows with degrees measured INSIDE the core.

    ``edges`` must be canonical unique undirected pairs with a < b.

    Scale shape: per round, degrees come from the symmetrized edge stream
    through sort+boundary-scan ``sum_per_key`` (never a per-group UDF), and
    edge removal is an anti semi-join keyed on the REMOVED node set — the
    small side after the first round (broadcast ``pc.is_in`` under
    ``broadcast_limit``, hash-join fallback above it; the edge stream itself
    re-shuffles only through that join). Rounds are bounded by the peel
    depth (O(degeneracy ordering depth), typically ≤ a few dozen on web
    graphs); each round's work shrinks with the surviving edge set. The
    iteration is a pure function of the edge set — identical output at any
    parallelism, and idempotent after fixpoint (the matching unrolled-SQL
    oracle runs a fixed round count).
    """
    from .joins import semi_anti_join

    edges = edges.select_columns([a_col, b_col]).materialize()

    def _sym(bt: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [bt.column(a_col).combine_chunks(), bt.column(b_col).combine_chunks()]
        )
        return pa.table({"n": n, "c": pa.array(np.ones(len(n), np.int64))})

    deg = None
    n_removed = 0
    for _ in range(max_rounds):
        deg = sum_per_key(
            edges.map_batches(_sym, batch_format="pyarrow"), "n", "c"
        ).materialize()

        def _below(bt: pa.Table) -> pa.Table:
            t = bt.filter(pc.less(bt.column("c"), k))
            return pa.table({"n": t.column("n").combine_chunks()})

        removed = deg.map_batches(_below, batch_format="pyarrow").materialize()
        n_removed = removed.count()
        if n_removed == 0:
            break
        edges = semi_anti_join(
            edges, removed, on=a_col, right_on="n", anti=True,
            broadcast=n_removed <= broadcast_limit,
        )
        edges = semi_anti_join(
            edges, removed, on=b_col, right_on="n", anti=True,
            broadcast=n_removed <= broadcast_limit,
        ).materialize()
    if n_removed != 0:
        # max_rounds exhausted mid-peel: deg is stale (pre-final removal);
        # recompute from the final edge set so output == an exactly
        # max_rounds-unrolled peel (what the SQL oracle computes)
        deg = sum_per_key(
            edges.map_batches(_sym, batch_format="pyarrow"), "n", "c"
        ).materialize()

    def _core(bt: pa.Table) -> pa.Table:
        t = bt.filter(pc.greater_equal(bt.column("c"), k))
        return pa.table(
            {
                "node": t.column("n").combine_chunks(),
                "deg": pc.cast(t.column("c").combine_chunks(), pa.int64()),
            }
        )

    return deg.map_batches(_core, batch_format="pyarrow")


def seeded_walk_step(
    edges: rd.Dataset, src_col: str, dst_col: str, *, salt: int = 0
) -> rd.Dataset:
    """(src, next) — ONE seeded uniform random-walk step per source node
    (the node2vec/DeepWalk corpus-generation primitive): the sampled
    neighbor is the argmin of SplitMix64(src·2^32 + dst, salt) over the
    node's out-edges, i.e. a deterministic uniform draw that needs NO
    degree lookup, no rank materialization and no per-group UDF — just one
    ``min_per_key`` (narrow sort + boundary scan) over (src,
    zfill20(h):dst) packed values. Replayable in SQL via the HUGEINT
    SplitMix64 chain + row_number argmin.

    Ids must be non-negative and < 2^31 so the packed edge key fits int64
    losslessly (raised otherwise — the same guard family as
    ``duplicate_span_stats``)."""
    from ..util import min_per_key
    from .shuffle import sm64_key

    def _pack(batch: pa.Table) -> pa.Table:
        s = batch.column(src_col).to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s) and (
            s.min() < 0 or d.min() < 0 or s.max() >= 2**31 or d.max() >= 2**31
        ):
            raise ValueError("seeded_walk_step needs node ids in [0, 2^31)")
        h = sm64_key((s << np.int64(32)) | d, salt)
        # dst zero-padded too: an h collision between two dsts of one src
        # must tie-break numerically, exactly like the oracle's ORDER BY
        # (h, dst)
        val = np.char.add(
            np.char.add(np.char.zfill(h.astype("U20"), 20), ":"),
            np.char.zfill(d.astype("U11"), 11),
        )
        return pa.table(
            {
                "src": pa.array(s, pa.int64()),
                "hv": pa.array(val, pa.string()),
            }
        )

    packed = edges.map_batches(_pack, batch_format="pyarrow")
    chosen = min_per_key(packed, "src", "hv")

    def _unpack(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("hv"), ":")
        return pa.table(
            {
                "src": batch.column("src").combine_chunks(),
                "next": pc.cast(pc.list_element(parts, 1), pa.int64()),
            }
        )

    return chosen.map_batches(_unpack, batch_format="pyarrow")


def wl_colors(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
    salt: int = 101,
) -> rd.Dataset:
    """Weisfeiler-Lehman-style structural color refinement over a directed
    int-id edge Dataset -> Dataset[(node, wl_color)] — the canonical-labeling
    primitive (RDF blank-node canonicalization, structural page dedup,
    graph-isomorphism bucketing): two nodes get the same color only if their
    (rounds)-hop in/out neighborhoods aggregate identically.

    Colors are 32-bit (``sm64(x) >> 32``) so neighbor-color SUMS stay exact
    int64 up to ~2^30 aggregate degree — order-independent commutative sums
    instead of sorted-multiset hashing keeps every op a vectorized
    sort-scan fold and makes the refinement bit-replicable in SQL BIGINT.
    Init color = sm64(outdeg·2^20 + indeg); round r folds
    ``5·c(v) + 3·Σ_out c(u) + 2·Σ_in c(u)`` through the finalizer again.
    Per round: two edge-sized hash joins (attach colors) + two sort-scan
    ``sum_per_key`` folds + one node-sized merge — the PageRank cost profile.
    """
    from .shuffle import sm64_key

    edges = edges.select_columns([src_col, dst_col]).materialize()
    nparts = _clamp_parts(edges.count())

    def _proj(col: str):
        def _f(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "node": b.column(col).combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            )
        return _f

    od = sum_per_key(
        edges.map_batches(_proj(src_col), batch_format="pyarrow"), "node", "one"
    ).rename_columns({"one": "od"})
    idg = sum_per_key(
        edges.map_batches(_proj(dst_col), batch_format="pyarrow"), "node", "one"
    ).rename_columns({"one": "idg"})
    nodes = distinct_rows(
        edges.map_batches(
            lambda b: pa.table({"node": b.column(src_col).combine_chunks()}),
            batch_format="pyarrow",
        ).union(
            edges.map_batches(
                lambda b: pa.table({"node": b.column(dst_col).combine_chunks()}),
                batch_format="pyarrow",
            )
        ),
        ["node"],
    ).materialize()
    node_parts = _clamp_parts(nodes.count())

    both = hash_join(
        hash_join(nodes, od, on="node", join_type="left_outer", num_partitions=node_parts),
        idg,
        on="node",
        join_type="left_outer",
        num_partitions=node_parts,
    )

    def _seed(b: pa.Table) -> pa.Table:
        o = b.column("od").fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        i = b.column("idg").fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        c = (sm64_key(o * (1 << 20) + i, salt) >> np.uint64(32)).astype(np.int64)
        return pa.table({"node": b.column("node").combine_chunks(), "c": pa.array(c)})

    colors = both.map_batches(_seed, batch_format="pyarrow").materialize()

    for r in range(1, rounds + 1):
        outs = sum_per_key(
            hash_join(
                edges,
                colors.rename_columns({"node": dst_col}),
                on=dst_col,
                join_type="inner",
                num_partitions=nparts,
            ).map_batches(
                lambda b: pa.table(
                    {"node": b.column(src_col).combine_chunks(), "s": b.column("c").combine_chunks()}
                ),
                batch_format="pyarrow",
            ),
            "node",
            "s",
        ).rename_columns({"s": "os"})
        ins = sum_per_key(
            hash_join(
                edges,
                colors.rename_columns({"node": src_col}),
                on=src_col,
                join_type="inner",
                num_partitions=nparts,
            ).map_batches(
                lambda b: pa.table(
                    {"node": b.column(dst_col).combine_chunks(), "s": b.column("c").combine_chunks()}
                ),
                batch_format="pyarrow",
            ),
            "node",
            "s",
        ).rename_columns({"s": "is_"})
        merged = hash_join(
            hash_join(colors, outs, on="node", join_type="left_outer", num_partitions=node_parts),
            ins,
            on="node",
            join_type="left_outer",
            num_partitions=node_parts,
        )

        def _refine(b: pa.Table, _r=r) -> pa.Table:
            c = b.column("c").to_numpy(zero_copy_only=False).astype(np.int64)
            os_ = b.column("os").fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            is_ = b.column("is_").fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
            x = 5 * c + 3 * os_ + 2 * is_
            nc = (sm64_key(x, salt + _r) >> np.uint64(32)).astype(np.int64)
            return pa.table({"node": b.column("node").combine_chunks(), "c": pa.array(nc)})

        colors = merged.map_batches(_refine, batch_format="pyarrow").materialize()

    return colors.rename_columns({"c": "wl_color"})


def label_propagation(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    rounds: int = 2,
) -> rd.Dataset:
    """Synchronous label propagation (community detection) over an int-id
    edge Dataset -> Dataset[(node, label)] after ``rounds`` sweeps: labels
    start as node ids; each round every node takes the MODE of its
    neighbors' labels (undirected — edges are symmetrized), ties broken by
    the smallest label, so the sweep is fully deterministic and unrollable
    in SQL. Distinct from min-label contraction (= connected components,
    kg/canonicalize): the mode keeps dense cores together instead of
    flooding the whole component.

    Per round: one edge-sized hash join (attach labels), one packed-key
    sort-scan count fold, one ``topk_per_key(k=1)`` argmax, one node-sized
    left merge — never a Ray groupby at node/edge cardinality. Node and
    label ids must fit 2^31 (the pack guard raises otherwise)."""
    from ..util import topk_per_key

    edges = edges.select_columns([src_col, dst_col]).materialize()
    nparts = _clamp_parts(edges.count())

    def _sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks()
        d = b.column(dst_col).combine_chunks()
        return pa.table(
            {"a": pa.concat_arrays([s, d]), "b": pa.concat_arrays([d, s])}
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    nodes = distinct_rows(
        sym.map_batches(
            lambda b: pa.table({"node": b.column("a").combine_chunks()}),
            batch_format="pyarrow",
        ),
        ["node"],
    ).materialize()
    node_parts = _clamp_parts(nodes.count())

    labels = nodes.map_batches(
        lambda b: pa.table(
            {"node": b.column("node").combine_chunks(), "lab": b.column("node").combine_chunks()}
        ),
        batch_format="pyarrow",
    ).materialize()

    CAP = np.int64(1) << np.int64(31)

    for _ in range(rounds):
        nbr = hash_join(
            sym,
            labels.rename_columns({"node": "a"}),
            on="a",
            join_type="inner",
            num_partitions=nparts,
        )

        def _pack(t: pa.Table) -> pa.Table:
            n = t.column("b").to_numpy(zero_copy_only=False).astype(np.int64)
            l = t.column("lab").to_numpy(zero_copy_only=False).astype(np.int64)
            if len(n) and (
                n.min() < 0 or n.max() >= CAP or l.min() < 0 or l.max() >= CAP
            ):
                raise ValueError("node/label ids must fit 2^31 for packing")
            return pa.table({"k": pa.array(n * CAP + l, pa.int64())})

        counts = exact_value_counts_local(
            nbr.map_batches(_pack, batch_format="pyarrow"), "k"
        )

        def _unpack(t: pa.Table) -> pa.Table:
            k = t.column("k").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "node": pa.array(k // CAP, pa.int64()),
                    "lab": pa.array(k % CAP, pa.int64()),
                    "c": t.column("n").combine_chunks(),
                }
            )

        arg = topk_per_key(
            counts.map_batches(_unpack, batch_format="pyarrow"),
            "node",
            "c",
            1,
            descending=True,
            tie_col="lab",
        ).select_columns(["node", "lab"])
        merged = hash_join(
            nodes, arg, on="node", join_type="left_outer", num_partitions=node_parts
        )

        def _coalesce(b: pa.Table) -> pa.Table:
            lab = pc.coalesce(b.column("lab"), b.column("node"))
            return pa.table(
                {"node": b.column("node").combine_chunks(), "lab": pc.cast(lab, pa.int64())}
            )

        labels = merged.map_batches(_coalesce, batch_format="pyarrow").materialize()

    return labels.rename_columns({"lab": "label"})


def exact_value_counts_local(ds: rd.Dataset, col: str) -> rd.Dataset:
    """(col, n) counts via partial Arrow group_by + one sort-scan fold —
    re-exported here to avoid a circular import with extras.stats."""
    def _partial(b: pa.Table) -> pa.Table:
        g = (
            pa.table({col: b.column(col).combine_chunks()})
            .group_by(col)
            .aggregate([([], "count_all")])
        )
        return g.rename_columns([col, "n"])

    return sum_per_key(ds.map_batches(_partial, batch_format="pyarrow"), col, "n")


def degree_assortativity(
    edges: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> pa.Table:
    """Degree assortativity (Newman): Pearson correlation of endpoint
    degrees over the SYMMETRIZED edge multiset (each edge contributes both
    orientations, so the marginals coincide) -> one row
    (n_pairs, r) with r a double.

    Exactness contract (the stats_corr pattern): all moments accumulate as
    exact int64 partials (degrees are counts; per-batch products guarded
    against overflow), the driver folds them in arbitrary-precision Python
    ints, and the single double division at the end is applied to the SAME
    exact integers the SQL oracle's HUGEINT moments produce — bit-equal
    doubles, no float reduction order anywhere.

    Scale shape: degree table via ``exact_value_counts`` (sort-scan, no Ray
    groupby), two hash-partitioned joins decorate each edge with its
    endpoint degrees, moments stream as 1-row partials. The edge stream
    never gathers."""
    from ..util import default_num_partitions
    from .stats import exact_value_counts

    nparts = num_partitions or max(2, min(default_num_partitions(), 8))

    def _sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks()
        d = b.column(dst_col).combine_chunks()
        return pa.table(
            {"a": pa.concat_arrays([s.cast(pa.int64()), d.cast(pa.int64())]),
             "b": pa.concat_arrays([d.cast(pa.int64()), s.cast(pa.int64())])}
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow")
    deg = exact_value_counts(sym, "a").rename_columns({"n": "da"}).materialize()
    e1 = sym.join(deg, join_type="inner", num_partitions=nparts, on=("a",))
    degb = deg.rename_columns({"a": "b", "da": "db"}).materialize()
    e2 = e1.join(degb, join_type="inner", num_partitions=nparts, on=("b",))

    def _moments(b: pa.Table) -> pa.Table:
        x = b.column("da").to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column("db").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(x) and int(x.max()) > 3_000_000_000:
            raise ValueError("degree exceeds int64 product guard; shard moments")
        return pa.table(
            {
                "n": pa.array([len(x)], pa.int64()),
                "sx": pa.array([int(x.sum())], pa.int64()),
                "sxx": pa.array([int((x * x).sum())], pa.int64()),
                "sxy": pa.array([int((x * y).sum())], pa.int64()),
            }
        )

    parts = e2.map_batches(_moments, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in parts)
    sx = sum(r["sx"] for r in parts)
    sxx = sum(r["sxx"] for r in parts)
    sxy = sum(r["sxy"] for r in parts)
    num = n * sxy - sx * sx
    den = n * sxx - sx * sx
    r = float(num) / float(den) if den else 0.0
    return pa.table({"n_pairs": pa.array([n], pa.int64()), "r": pa.array([r], pa.float64())})


def modularity(
    edges: rd.Dataset,
    labels: rd.Dataset,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    num_partitions: int | None = None,
) -> pa.Table:
    """Newman modularity Q of a node partition over the symmetrized edge
    multiset: Q = intra/m2 − Σ_c (D_c/m2)² with m2 = |sym edges| (= 2m) and
    D_c the summed degree of community c. One row (m2, intra, q).

    ``labels`` is Dataset[(node, label)] (e.g. ``label_propagation``
    output). Two hash joins tag each symmetric edge with its endpoint
    communities (intra = count of agreeing rows); D_c folds through
    ``sum_per_key`` at any community cardinality, and ΣD_c² accumulates as
    exact int64 per-batch partials (guarded) folded in Python ints — the
    final doubles are bit-equal to a HUGEINT SQL replica."""
    from ..util import default_num_partitions
    from .stats import exact_value_counts

    nparts = num_partitions or max(2, min(default_num_partitions(), 8))

    def _sym(b: pa.Table) -> pa.Table:
        s = b.column(src_col).combine_chunks()
        d = b.column(dst_col).combine_chunks()
        return pa.table(
            {"a": pa.concat_arrays([s.cast(pa.int64()), d.cast(pa.int64())]),
             "b": pa.concat_arrays([d.cast(pa.int64()), s.cast(pa.int64())])}
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()
    m2 = sym.count()
    la = labels.rename_columns({"node": "a", "label": "la"}).materialize()
    lb = labels.rename_columns({"node": "b", "label": "lb"}).materialize()
    tagged = sym.join(la, join_type="inner", num_partitions=nparts, on=("a",)).join(
        lb, join_type="inner", num_partitions=nparts, on=("b",)
    )
    def _eq(b: pa.Table) -> pa.Table:
        return b.filter(pc.equal(b.column("la"), b.column("lb")))

    intra = tagged.map_batches(_eq, batch_format="pyarrow").count()

    deg = exact_value_counts(sym, "a").rename_columns({"n": "d"})
    degl = deg.join(la, join_type="inner", num_partitions=nparts, on=("a",))
    dc = sum_per_key(degl.select_columns(["la", "d"]), "la", "d")

    def _sq(b: pa.Table) -> pa.Table:
        v = b.column("d").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and int(v.max()) > 3_000_000_000:
            raise ValueError("community degree exceeds int64 square guard")
        return pa.table({"ssq": pa.array([int((v * v).sum())], pa.int64())})

    ssq = sum(r["ssq"] for r in dc.map_batches(_sq, batch_format="pyarrow").take_all())
    q = float(intra) / m2 - float(ssq) / (float(m2) * m2) if m2 else 0.0
    return pa.table(
        {
            "m2": pa.array([m2], pa.int64()),
            "intra": pa.array([intra], pa.int64()),
            "q": pa.array([q], pa.float64()),
        }
    )


def bellman_ford(
    edges: rd.Dataset,
    seeds: list,
    rounds: int,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    node_cap: int = 5_000_000,
) -> rd.Dataset:
    """Weighted shortest distances after exactly ``rounds`` Bellman-Ford
    relaxation rounds -> Dataset[(node, dist)] (int64 weights; seeds at 0;
    nodes still unreached after ``rounds`` absent).

    Per round, EVERY edge relaxes against the CURRENT distance table —
    the textbook synchronous recurrence, which is what makes an unrolled
    SQL replica value-exact even before convergence. The distance table is
    node-bounded: it broadcasts once per round (``ray.put``) and the edge
    stream probes it with one vectorized ``index_in`` per batch — edges
    NEVER shuffle; the only per-round exchange is the narrow
    ``min_per_key`` fold over (node, candidate) rows. Distance tables
    beyond ``node_cap`` refuse the broadcast loudly (the hash-join variant
    is the escape hatch at that size, not a silent driver OOM)."""
    from ..util import min_per_key

    edges = edges.select_columns([src_col, dst_col, w_col]).materialize()
    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(seeds, pa.int64()),
                "dist": pa.array([0] * len(seeds), pa.int64()),
            }
        )
    ).materialize()
    for _ in range(rounds):
        rows = dist.take_all()
        if len(rows) > node_cap:
            raise ValueError(
                f"distance table has {len(rows)} nodes — above node_cap "
                f"({node_cap}); broadcast relaxation no longer applies"
            )
        nodes = pa.array([r["node"] for r in rows], pa.int64())
        dvals = np.fromiter(
            (r["dist"] for r in rows), dtype=np.int64, count=len(rows)
        )
        ref = ray.put((nodes, dvals))

        def _relax(b: pa.Table) -> pa.Table:
            nds, dd = ray.get(ref)
            idx = pc.fill_null(
                pc.index_in(b.column(src_col).combine_chunks(), nds), -1
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            ok = idx >= 0
            dst = b.column(dst_col).to_numpy(zero_copy_only=False).astype(np.int64)
            w = b.column(w_col).to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "node": pa.array(dst[ok], pa.int64()),
                    "dist": pa.array(dd[idx[ok]] + w[ok], pa.int64()),
                }
            )

        cand = edges.map_batches(_relax, batch_format="pyarrow")
        dist = min_per_key(dist.union(cand), "node", "dist").materialize()
    return dist


def square_count(
    edges: rd.Dataset, *, a_col: str = "a", b_col: str = "b"
) -> rd.Dataset:
    """Count 4-cycles (non-induced C4 subgraphs) -> 1-row Dataset[{squares}].

    ``edges`` must be canonical unique undirected pairs a < b (int64 ids
    < 2^31). Formula: every C4 has exactly two opposite-vertex pairs, so
    squares = (1/2)·Σ_{x<z} C(codeg(x,z), 2) over distance-2 pairs. Plan:
    symmetrize, self-join on the mid node (same wedge join as
    `triangle_count`; orient by degree first at crawl scale to bound the
    blowup), fold (x,z) into one int64 key, co-degree via the sort-scan
    `exact_value_counts` (no Ray groupby at any cardinality), then one
    streaming partial-sum of C(n,2)."""
    from .stats import exact_value_counts

    edges = edges.select_columns([a_col, b_col]).materialize()
    nparts = _clamp_parts(edges.count())

    def _sym(b: pa.Table) -> pa.Table:
        a = b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
        bb = b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(a) and (
            a.max() >= 2**31 or bb.max() >= 2**31 or a.min() < 0
        ):
            raise ValueError(
                "square_count folds (x,z) into int64 — node ids must be "
                "in [0, 2^31); dictionary-encode larger id spaces first"
            )
        return pa.table(
            {
                "u": pa.array(np.concatenate([a, bb])),
                "v": pa.array(np.concatenate([bb, a])),
            }
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    wedges = hash_join(
        sym.rename_columns({"u": "x", "v": "mid"}),
        sym.rename_columns({"u": "mid", "v": "z"}).materialize(),
        on="mid",
        join_type="inner",
        num_partitions=nparts,
    )

    def _pair_key(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        z = b.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = x < z
        return pa.table(
            {"pk": pa.array((x[keep] << np.int64(32)) | z[keep])}
        )

    codeg = exact_value_counts(
        wedges.map_batches(_pair_key, batch_format="pyarrow"), "pk"
    )

    def _choose2(b: pa.Table) -> pa.Table:
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"s": pa.array([int((n * (n - 1) // 2).sum())])})

    total = codeg.map_batches(_choose2, batch_format="pyarrow").sum("s")
    return rd.from_arrow(
        pa.table({"squares": pa.array([int(total or 0) // 2], pa.int64())})
    )


def dag_layers(
    edges: rd.Dataset,
    *,
    rounds: int,
    u_col: str = "u",
    v_col: str = "v",
    nodes: rd.Dataset | None = None,
    node_col: str = "node",
) -> rd.Dataset:
    """Topological layering of a DAG by bounded max-relaxation: after
    exactly ``rounds`` synchronous rounds, ``layer(v)`` = the length of the
    longest directed path ending at v that uses at most ``rounds`` edges —
    the DAG's longest-path layer once ``rounds`` >= graph depth (the
    scheduling level of v: everything in layer L can run after layers
    < L complete). The bounded-round contract mirrors `graph_closeness`:
    exact at ANY scale for the depth it names, never data-dependent
    iteration; on an accidental cycle layers saturate at ``rounds``
    instead of looping forever.

    Scale shape: edges materialize ONCE; each round is one hash join of
    the full layer table onto the edge stream keyed on the source +
    one `fold_per_key` max merge — the max-plus sibling of
    `pagerank_int`'s per-iteration exchange. (A frontier/delta variant
    joins only nodes whose layer rose last round — the win once depth
    is large and late rounds touch few nodes; with the bounded small
    ``rounds`` this operator contracts for, the full join per round is
    the simpler honest cost.)

    ``nodes`` (optional): the node universe; sources and isolated nodes
    appear with layer 0. Defaults to the distinct endpoints of ``edges``.
    """
    from ..util import fold_per_key, hash_join

    edges = edges.select_columns([u_col, v_col]).materialize()

    if nodes is None:
        def _ends(b: pa.Table) -> pa.Table:
            n = pa.concat_arrays(
                [
                    b.column(u_col).combine_chunks(),
                    b.column(v_col).combine_chunks(),
                ]
            )
            return pa.table({node_col: n})

        universe = edges.map_batches(_ends, batch_format="pyarrow")
        universe = fold_per_key(universe, node_col, {"_c": ("count", None)})
        universe = universe.select_columns([node_col])
    else:
        universe = nodes.select_columns([node_col])

    def _zero(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                node_col: b.column(node_col),
                "layer": pa.array(
                    np.zeros(b.num_rows, np.int64), pa.int64()
                ),
            }
        )

    layers = universe.map_batches(_zero, batch_format="pyarrow").materialize()

    for _ in range(rounds):
        src = layers.rename_columns({node_col: u_col})
        cand = hash_join(edges, src, on=u_col, join_type="inner")

        def _step(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    node_col: b.column(v_col),
                    "layer": pc.add(b.column("layer"), pa.scalar(1)),
                }
            )

        stepped = cand.map_batches(_step, batch_format="pyarrow")
        if nodes is not None:
            # an explicit universe is a contract: edge targets OUTSIDE it
            # must neither appear in the output nor relay layers — filter
            # before the fold (hash semi-join; no broadcast cap on the
            # universe size)
            from .joins import semi_anti_join

            stepped = semi_anti_join(
                stepped, universe, on=node_col, broadcast=False
            )
        layers = fold_per_key(
            layers.union(stepped), node_col, {"layer": ("max", "layer")}
        ).materialize()

    return layers


def local_clustering(
    edges: rd.Dataset, *, a_col: str = "a", b_col: str = "b"
) -> rd.Dataset:
    """Per-node triangle participation and degree -> (node, tri, deg):
    the local clustering coefficient is the exact rational
    2·tri / (deg·(deg−1)) — left as the integer pair so no float division
    order can drift (consumers divide; a 0-degree-pair node has tri = 0).

    Same wedge-join + folded-key closure plan as `triangle_count`
    (canonical a < b int64-foldable edges), but the closure keeps the
    triangle's three corners; corners explode 3 rows per triangle into one
    `sum_per_key` at node cardinality, degrees are a second fold, and one
    node-cardinality join stitches them. Wedge volume is the same
    O(sum deg_in·deg_out) bound as the global count."""
    edges = edges.select_columns([a_col, b_col]).materialize()
    nparts = _clamp_parts(edges.count())

    def _fold(b: pa.Table) -> pa.Table:
        key = (
            b.column(a_col).to_numpy(zero_copy_only=False).astype(np.int64)
            << np.int64(32)
        ) | b.column(b_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"ek": pa.array(key)})

    edge_keys = edges.map_batches(_fold, batch_format="pyarrow")

    wedges = hash_join(
        edges.rename_columns({a_col: "x", b_col: "mid"}),
        edges.rename_columns({a_col: "mid", b_col: "z"}).materialize(),
        on="mid",
        join_type="inner",
        num_partitions=nparts,
    )

    def _wedge_key(b: pa.Table) -> pa.Table:
        x = b.column("x").to_numpy(zero_copy_only=False).astype(np.int64)
        z = b.column("z").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "ek": pa.array((x << np.int64(32)) | z),
                "x": pa.array(x),
                "mid": b.column("mid").combine_chunks(),
                "z": pa.array(z),
            }
        )

    hits = hash_join(
        wedges.map_batches(_wedge_key, batch_format="pyarrow").materialize(),
        edge_keys.map_batches(
            lambda b: b.append_column("hit", pa.array(np.ones(b.num_rows, np.int64))),
            batch_format="pyarrow",
        ).materialize(),
        on="ek",
        join_type="inner",
        num_partitions=nparts,
    )

    def _corners(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [
                pc.cast(b.column("x"), pa.int64()).combine_chunks(),
                pc.cast(b.column("mid"), pa.int64()).combine_chunks(),
                pc.cast(b.column("z"), pa.int64()).combine_chunks(),
            ]
        )
        return pa.table(
            {"node": n, "one": pa.array(np.ones(len(n), np.int64))}
        )

    tri = sum_per_key(
        hits.map_batches(_corners, batch_format="pyarrow"), "node", "one"
    ).materialize()

    def _ends(b: pa.Table) -> pa.Table:
        n = pa.concat_arrays(
            [
                pc.cast(b.column(a_col), pa.int64()).combine_chunks(),
                pc.cast(b.column(b_col), pa.int64()).combine_chunks(),
            ]
        )
        return pa.table({"node": n, "one": pa.array(np.ones(len(n), np.int64))})

    deg = sum_per_key(
        edges.map_batches(_ends, batch_format="pyarrow"), "node", "one"
    ).materialize()

    j = hash_join(
        deg.map_batches(
            lambda b: b.rename_columns(["node", "deg"]), batch_format="pyarrow"
        ).materialize(),
        tri.map_batches(
            lambda b: b.rename_columns(["node", "tri"]), batch_format="pyarrow"
        ).materialize(),
        on="node",
        join_type="left_outer",
    )

    def _final(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b.column("node"), pa.int64()).combine_chunks(),
                "tri": pc.fill_null(
                    pc.cast(b.column("tri"), pa.int64()), 0
                ).combine_chunks(),
                "deg": pc.cast(b.column("deg"), pa.int64()).combine_chunks(),
            }
        )

    return j.map_batches(_final, batch_format="pyarrow")


def weighted_sssp(
    edges: rd.Dataset,
    sources: list[int],
    *,
    rounds: int,
    u_col: str = "u",
    v_col: str = "v",
    w_col: str = "w",
    directed: bool = False,
) -> rd.Dataset:
    """Bounded-round Bellman-Ford over integer edge weights -> (node, dist):
    after exactly ``rounds`` synchronous relaxations, dist(v) = the weight
    of the lightest path from any source using at most ``rounds`` edges
    (exact SSSP once rounds >= the hop diameter) — the min-plus sibling of
    `dag_layers`' max-plus layering, same bounded-round contract (never
    data-dependent iteration; negative cycles cannot loop it).

    Per round: one edge-sized hash join attaching dist to the edge's tail,
    one `fold_per_key` min at node cardinality, one node-sized min-merge
    with the previous frontier. Unreached nodes are absent from the output
    (no sentinel infinities to overflow)."""
    from ..util import fold_per_key, hash_join

    edges = edges.select_columns([u_col, v_col, w_col]).materialize()
    if not directed:
        rev = edges.map_batches(
            lambda b: pa.table(
                {
                    u_col: b.column(v_col).combine_chunks(),
                    v_col: b.column(u_col).combine_chunks(),
                    w_col: b.column(w_col).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        edges = edges.union(rev).materialize()
    nparts = _clamp_parts(edges.count())

    dist = rd.from_arrow(
        pa.table(
            {
                "node": pa.array(sorted(set(sources)), pa.int64()),
                "dist": pa.array([0] * len(set(sources)), pa.int64()),
            }
        )
    ).materialize()

    for _ in range(rounds):
        j = hash_join(
            edges.rename_columns({u_col: "node"}),
            dist,
            on="node",
            join_type="inner",
            num_partitions=nparts,
        )
        cand = j.map_batches(
            lambda b: pa.table(
                {
                    "node": pc.cast(b.column(v_col), pa.int64()).combine_chunks(),
                    "dist": pc.add(
                        pc.cast(b.column("dist"), pa.int64()),
                        pc.cast(b.column(w_col), pa.int64()),
                    ).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        )
        dist = fold_per_key(
            dist.union(cand), "node", {"dist": ("min", "dist")}
        ).materialize()
    return dist
