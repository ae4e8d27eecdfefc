"""Distributed helpers shared by the anonymization stages.

The generalization/randomization operators (reference
``service/anonymizer/Generalization.java:30-105``, ``Randomization.java:27-75``)
need *global value order* per attribute. At 100 TB we never materialize a
global rank column; instead we:

1. sort only the narrow ``(value, id)`` projection (two columns, ~16 B/row),
2. keep the sorted blocks in the object store (``to_arrow_refs`` — zero-copy
   refs, driver holds only per-block row counts),
3. probe single rows at the g-1 cut ranks (tiny tasks) to get bucket
   boundaries, and
4. assign buckets via a broadcast ``searchsorted`` inside ``map_batches`` on
   the unsorted wide data — no join, no full shuffle of the wide table.

Randomization additionally runs one task per sorted block with a ±w halo of
neighboring narrow blocks (sliding-window noise scale), then hash-joins the
(id, randomized) column back.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


@ray.remote(num_cpus=0.25)
def _block_num_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote(num_cpus=0.25)
def _block_take(t: pa.Table, idxs: list[int]) -> pa.Table:
    return t.take(idxs)


@ray.remote(num_cpus=0.25)
def _block_slice(t: pa.Table, start: int, length: int) -> pa.Table:
    return t.slice(start, length).combine_chunks()


@dataclass
class SortedColumn:
    """A sorted narrow (value, id) projection held as ordered block refs."""

    refs: list  # ObjectRef[pa.Table], in ascending sorted order
    counts: list[int]  # rows per block
    offsets: np.ndarray  # global start rank per block (len = len(refs)+1)
    total: int  # k = number of non-null rows
    value_col: str
    id_col: str

    def rows_at_ranks(self, ranks: list[int]) -> pa.Table:
        """Fetch rows at specific global ranks (point lookups; grouping is
        vectorized — rank lists reach ~2g entries at web scale)."""
        rank_arr = np.unique(np.asarray(ranks, dtype=np.int64))
        if rank_arr.size == 0:
            return pa.table({})
        if rank_arr[0] < 0 or rank_arr[-1] >= self.total:
            raise IndexError(f"rank out of range [0, {self.total})")
        blocks = np.searchsorted(self.offsets, rank_arr, side="right") - 1
        local = rank_arr - self.offsets[blocks]
        futs = []
        for b in np.unique(blocks):
            idxs = local[blocks == b].tolist()
            futs.append(_block_take.remote(self.refs[int(b)], idxs))
        parts = ray.get(futs)
        return pa.concat_tables(parts) if parts else pa.table({})

    def values_at_ranks(self, ranks: list[int]) -> dict[int, float]:
        ranks_u = sorted(set(int(r) for r in ranks))
        t = self.rows_at_ranks(ranks_u)
        vals = t.column(self.value_col).to_numpy(zero_copy_only=False)
        return dict(zip(ranks_u, vals.tolist()))

    def halo_slice_refs(self, start: int, stop: int) -> list:
        """Refs + slices covering global ranks [start, stop) (clamped)."""
        start = max(0, start)
        stop = min(self.total, stop)
        out = []
        for b, ref in enumerate(self.refs):
            b0, b1 = int(self.offsets[b]), int(self.offsets[b + 1])
            if b1 <= start or b0 >= stop:
                continue
            s = max(start, b0) - b0
            ln = min(stop, b1) - max(start, b0)
            if s == 0 and ln == b1 - b0:
                out.append(ref)
            else:
                out.append(_block_slice.remote(ref, s, ln))
        return out


def sorted_column(
    ds: ray.data.Dataset,
    value_col: str,
    id_col: str,
    to_numeric,
) -> SortedColumn:
    """Drop nulls, convert to a canonical numeric dtype, sort by (value, id).

    ``to_numeric(pa.ChunkedArray) -> pa.Array`` maps the column to a sortable
    numeric representation (identity for doubles, epoch-days for dates,
    epoch-millis for dateTimes).
    """

    def _project(batch: pa.Table) -> pa.Table:
        v = to_numeric(batch.column(value_col))
        t = pa.table({value_col: v, id_col: batch.column(id_col).combine_chunks()})
        return t.filter(valid_mask(t.column(value_col)))

    narrow = ds.map_batches(_project, batch_format="pyarrow").materialize()
    narrow = coalesce_blocks(narrow)
    sorted_ds = narrow.sort([value_col, id_col]).materialize()
    refs = sorted_ds.to_arrow_refs()
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    # drop empty blocks to keep offsets strictly increasing
    refs = [r for r, c in zip(refs, counts) if c > 0]
    counts = [c for c in counts if c > 0]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return SortedColumn(
        refs=refs,
        counts=counts,
        offsets=offsets,
        total=int(offsets[-1]),
        value_col=value_col,
        id_col=id_col,
    )


def coalesce_blocks(
    mat: ray.data.Dataset, target_block_bytes: int = 64 << 20
) -> ray.data.Dataset:
    """Repartition a MATERIALIZED dataset to ~cpus-aligned block count.

    Ray's sort/shuffle cost scales with blocks_in x partitions_out; upstream
    stages often leave hundreds of tiny blocks, multiplying fixed per-block
    overhead (a 480k-row sort drops 4.0s -> 0.5s after coalescing 256 -> 32
    blocks). Keeps blocks at or under ``target_block_bytes``."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    nbytes = mat.size_bytes() or 0
    target = int(max(cpus, min(4000, nbytes // target_block_bytes + 1)))
    nblocks = mat.num_blocks()
    if nblocks > 2 * target:
        return mat.repartition(target).materialize()
    return mat


def chunked_ranges(offsets: np.ndarray, min_rows: int = 65536) -> list[tuple[int, int]]:
    """Coalesce consecutive sorted-block ranges into chunks of >= min_rows so
    per-task overhead amortizes on small inputs while big inputs still fan
    out one task per ~min_rows."""
    total = int(offsets[-1])
    out: list[tuple[int, int]] = []
    start = 0
    for b in range(1, len(offsets)):
        if int(offsets[b]) - start >= min_rows or b == len(offsets) - 1:
            out.append((start, int(offsets[b])))
            start = int(offsets[b])
    if not out and total > 0:
        out.append((0, total))
    return [r for r in out if r[1] > r[0]]


def empty_like(
    mat: ray.data.Dataset, exclude: tuple[str, ...] = ()
) -> ray.data.Dataset:
    """Zero-row dataset with ``mat``'s schema as an explicit Arrow table.

    Ray's sort / repartition — and every LAZY op layered on top — drop the
    schema of an all-empty dataset, so the sort-scan helpers below capture
    the schema from the materialized input (where it still exists) and
    rebuild the empty result explicitly — downstream select/drop/join then
    keep working on legal empty results. ``exclude`` drops helper columns
    in the same breath (a lazy drop_columns would lose the schema again)."""
    sch = mat.schema()
    if sch is None:
        return mat.limit(0)
    cols = {}
    for n, t in zip(sch.names, sch.types):
        if n in exclude:
            continue
        if not isinstance(t, pa.DataType):
            t = pa.from_numpy_dtype(np.dtype(t))
        cols[n] = pa.array([], t)
    return ray.data.from_arrow(pa.table(cols))


def min_per_key(ds: ray.data.Dataset, key_col: str, val_col: str) -> ray.data.Dataset:
    """(key, min(val)) for a narrow two-column dataset WITHOUT a per-group
    aggregate.

    Ray's ``groupby().min()`` pays a per-GROUP Python cost (~8-10s per 500k
    groups regardless of shuffle strategy), ruinous when nearly every key is
    its own group. Instead: one range sort by (key, val), then a vectorized
    per-block scan keeping each block's first row per key; block boundaries
    are fixed by comparing against the previous block's last key (single-row
    metadata, no data exchange). Same pattern as
    ``kg/fingerprint.dedup_pages_exact``.
    """
    mat = ds.select_columns([key_col, val_col]).materialize()
    pre = coalesce_blocks(mat)
    s = pre.sort([key_col, val_col]).materialize()
    refs = [r for r in s.to_arrow_refs()]

    @ray.remote(num_cpus=0.25)
    def _edge_keys(t: pa.Table):
        if t.num_rows == 0:
            return None, None
        k = t.column(key_col)
        return k[0].as_py(), k[-1].as_py()

    bounds = ray.get([_edge_keys.remote(r) for r in refs])
    refs = [r for r, (f, _) in zip(refs, bounds) if f is not None]
    bounds = [b for b in bounds if b[0] is not None]

    @ray.remote(num_cpus=0.5)
    def _first_per_key(t: pa.Table, prev_last) -> pa.Table:
        k = t.column(key_col).combine_chunks()
        n = len(k)
        same_prev = pc.equal(k.slice(1), k.slice(0, n - 1))
        keep = np.empty(n, dtype=bool)
        keep[0] = prev_last is None or k[0].as_py() != prev_last
        if n > 1:
            keep[1:] = np.invert(same_prev.to_numpy(zero_copy_only=False))
        return t.filter(pa.array(keep))

    out_refs = [
        _first_per_key.remote(refs[i], bounds[i - 1][1] if i > 0 else None)
        for i in range(len(refs))
    ]
    if not out_refs:
        # every block empty: Ray's sort/repartition drop an all-empty
        # dataset's schema — rebuild explicitly from the input's schema
        return empty_like(mat)
    return ray.data.from_arrow_refs(out_refs)


def distinct_rows(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """DISTINCT over ``cols`` WITHOUT a per-group aggregate.

    ``cols`` values must be NON-NULL: Ray's sort raises on null keys before
    any scan runs, and null-equality semantics are deliberately not defined
    here (every in-repo caller deduplicates generated ids/band keys, which
    are never null).

    Candidate-pair dedup is the largest intermediate in the LSH pipelines
    (every shared band emits the pair again); ``groupby(cols).count()`` at
    pair cardinality pays the per-group Python cost ``min_per_key`` was built
    to avoid. Same shape instead: one range sort by ``cols``, then a
    vectorized per-block scan keeping rows that differ from their predecessor
    on ANY column; block boundaries compare against the previous block's last
    row (single-row metadata, no data exchange)."""
    mat = ds.select_columns(cols).materialize()
    pre = coalesce_blocks(mat)
    s = pre.sort(cols).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _last_row(t: pa.Table):
        return t.slice(t.num_rows - 1, 1) if t.num_rows else None

    lasts = ray.get([_last_row.remote(r) for r in refs])
    refs = [r for r, le in zip(refs, lasts) if le is not None]
    lasts = [le for le in lasts if le is not None]

    @ray.remote(num_cpus=0.5)
    def _first_per_combo(t: pa.Table, prev_last: pa.Table | None) -> pa.Table:
        n = t.num_rows
        keep = np.zeros(n, dtype=bool)
        same_first = prev_last is not None
        for c in cols:
            col = t.column(c).combine_chunks()
            if n > 1:
                neq = pc.not_equal(col.slice(1), col.slice(0, n - 1))
                keep[1:] |= pc.fill_null(neq, True).to_numpy(zero_copy_only=False)
            if same_first:
                same_first = col[0].as_py() == prev_last.column(c)[0].as_py()
        keep[0] = not same_first
        return t.filter(pa.array(keep))

    out_refs = [
        _first_per_combo.remote(refs[i], lasts[i - 1] if i > 0 else None)
        for i in range(len(refs))
    ]
    if not out_refs:
        # every block empty: Ray's sort/repartition drop an all-empty
        # dataset's schema — rebuild explicitly from the input's schema
        return empty_like(mat)
    return ray.data.from_arrow_refs(out_refs)


def combine_sorted_partials(
    part_refs: list, key_col: str, val_col: str
) -> ray.data.Dataset:
    """Sum per-key partial counts held as ordered block refs whose
    concatenation is SORTED by key (so only adjacent blocks can share a key).

    The all-to-all alternative (``groupby(key).sum``) pays a per-group Python
    cost over the full key cardinality; here the driver only ever sees each
    block's first/last (key, count) row, computes the boundary carries, and
    per-block fix-up tasks apply them — heavy rows never move."""

    @ray.remote(num_cpus=0.25)
    def _edges(t):
        if t is None or t.num_rows == 0:
            return None
        k = t.column(key_col)
        v = t.column(val_col)
        return (k[0].as_py(), k[-1].as_py(), int(v[-1].as_py()), t.num_rows)

    edges = ray.get([_edges.remote(r) for r in part_refs])
    refs = [r for r, e in zip(part_refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    n = len(refs)
    adds = [0] * n
    drop_last = [False] * n
    carry_key, carry_val = None, 0
    for b in range(n):
        fk, lk, lc, rows = edges[b]
        if carry_key is not None and carry_key == fk:
            adds[b] = carry_val
        carry_key, carry_val = None, 0
        if b + 1 < n and lk == edges[b + 1][0]:
            drop_last[b] = True
            carry_val = lc + (adds[b] if rows == 1 else 0)
            carry_key = lk

    @ray.remote(num_cpus=0.25)
    def _fix(t: pa.Table, add_first: int, drop: bool) -> pa.Table:
        if drop and t.num_rows == 1:
            return t.slice(0, 0)
        if add_first:
            v = t.column(val_col).to_numpy(zero_copy_only=False).copy()
            v[0] += add_first
            t = t.set_column(t.column_names.index(val_col), val_col, pa.array(v, t.column(val_col).type))
        if drop:
            t = t.slice(0, t.num_rows - 1)
        return t

    return ray.data.from_arrow_refs(
        [_fix.remote(refs[b], adds[b], drop_last[b]) for b in range(n)]
    )


def topk_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    k: int,
    *,
    descending: bool = True,
    tie_col: str | None = None,
) -> ray.data.Dataset:
    """Top-k rows per key WITHOUT a per-group UDF: one range sort by
    (key, order[, tie]), then per-block within-key ranks with a boundary
    carry (rows of a block's first key already seen in prior blocks). Works
    at any key cardinality — per-group Python never appears; the driver only
    sees per-block edge rows."""
    cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    desc = [False, descending] + ([False] if tie_col else [])
    mat = ds.materialize()
    pre = coalesce_blocks(mat)
    s = pre.sort(cols, descending=desc).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _edges(t: pa.Table):
        if t.num_rows == 0:
            return None
        kc = t.column(key_col)
        first, last = kc[0].as_py(), kc[-1].as_py()
        eq_first = pc.sum(pc.cast(pc.equal(kc, kc[0]), pa.int64())).as_py()
        eq_last = pc.sum(pc.cast(pc.equal(kc, kc[-1]), pa.int64())).as_py()
        return (first, last, int(eq_first), int(eq_last), t.num_rows)

    edges = ray.get([_edges.remote(r) for r in refs])
    refs = [r for r, e in zip(refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    carry_in = [0] * len(refs)
    prev_key, cum = None, 0
    for bidx, (fk, lk, nf, nl, rows) in enumerate(edges):
        carry_in[bidx] = cum if prev_key == fk else 0
        if fk == lk:
            cum = carry_in[bidx] + rows
        else:
            cum = nl
        prev_key = lk

    @ray.remote(num_cpus=0.5)
    def _take(t: pa.Table, carry: int) -> pa.Table:
        kv = t.column(key_col).to_numpy(zero_copy_only=False)
        n = len(kv)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = kv[1:] != kv[:-1]
        seg = np.nonzero(new)[0]
        rank = np.arange(n, dtype=np.int64) - np.repeat(seg, np.diff(np.append(seg, n)))
        rank[: (seg[1] if len(seg) > 1 else n)] += carry
        return t.filter(pa.array(rank < k))

    if not refs:
        # every block empty: Ray's sort/repartition drop an all-empty
        # dataset's schema — rebuild explicitly from the input's schema
        return empty_like(mat)
    return ray.data.from_arrow_refs(
        [_take.remote(refs[b], carry_in[b]) for b in range(len(refs))]
    )


def retry_shuffle_race(fn):
    """Re-run ``fn`` when Ray 2.49's hash-shuffle schema-broadcast race
    fires: join/aggregate schemas reach the shuffle aggregators only from
    the FIRST shuffle task of each input, so under load a partition can
    finalize with a schema-less empty table and the Arrow join dies with
    "No match or multiple matches for key field". The failure is a
    scheduling race, not data-dependent — re-running the (deterministic)
    builder absorbs it. Zero cost on the non-raced path; only functions
    that materialize a hash-shuffle internally need the guard (lazy
    callers are covered by the registry wrapper in ``__ray_entry__``)."""
    import functools
    import time

    @functools.wraps(fn)
    def _run(*args, **kwargs):
        last = None
        for attempt in range(3):
            try:
                return fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 — match on the signature
                s = str(e)
                # Primary signature: the Ray 2.49 schema-broadcast race (the
                # Arrow join dies on the schema-less side). The second
                # pattern (ArrowInvalid inside HashShuffleAggregator's
                # finalize concat) turned out, when chased to root cause, to
                # be DETERMINISTIC under mis-sized partition counts (a
                # collection-time auto-init sized joins for the wrong
                # cluster — fixed in tests/conftest.py); it is kept here as
                # belt-and-suspenders because the same empty-shard concat
                # CAN also fire as a genuine scheduling race, and retrying a
                # deterministic builder is merely slow, never wrong.
                raced = (
                    "No match or multiple matches for key field" in s
                    or ("HashShuffleAggregator" in s and "ArrowInvalid" in s)
                )
                if not raced:
                    raise
                last = e
                time.sleep(1 + attempt)
        raise last

    return _run


def default_num_partitions() -> int:
    """Join/shuffle partition count sized to the cluster: the join's
    aggregator actors each hold a CPU, so too many partitions on a small
    cluster deadlocks against the map tasks."""
    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(2, cpus // 2)


def _compact_join_side(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset | None, ray.data.Dataset, int | None]:
    """Drop zero-row blocks from a MATERIALIZED join input.

    Why: Ray 2.49's hash-shuffle join broadcasts each input's schema to the
    aggregators exactly once — piggybacked on the FIRST block shuffled
    (``hash_shuffle.py:548,584``). But ``_shuffle_block`` early-returns on a
    zero-row block (``:223-225``) WITHOUT broadcasting, while the
    has-broadcasted flag is set regardless — so if an input's first block is
    empty, partitions that receive no rows from that input finalize a
    schema-less table and the Arrow join dies with "No match ... for key
    field". Feeding only non-empty blocks guarantees the broadcast happens.

    Returns ``(compacted_or_None, original, row_count_or_None)`` —
    ``compacted`` is None when the side has zero rows overall (caller must
    take an empty-side fast path; a distributed join would crash), and the
    whole transform is a metadata-only no-op for lazy inputs."""
    from ray.data.dataset import MaterializedDataset

    if not isinstance(ds, MaterializedDataset):
        return ds, ds, None
    try:
        refs: list = []
        total = 0
        unknown = False
        for bundle in ds.iter_internal_ref_bundles():
            for ref, meta in bundle.blocks:
                n = meta.num_rows
                if n is None:
                    unknown = True
                    refs.append(ref)
                elif n > 0:
                    total += n
                    refs.append(ref)
        if unknown:
            return ds, ds, None
        if not refs:
            return None, ds, 0
        return ray.data.from_arrow_refs(refs), ds, total
    except Exception:  # pragma: no cover — compaction is best-effort
        return ds, ds, None


def _empty_side_join(
    left: ray.data.Dataset | None,
    right: ray.data.Dataset | None,
    left_orig: ray.data.Dataset,
    right_orig: ray.data.Dataset,
    keys: tuple[str, ...],
    join_type: str,
) -> ray.data.Dataset:
    """Join result when at least one side has ZERO rows, computed without a
    distributed shuffle (which would crash on the schema-less empty side).
    Assumes non-key column names are disjoint across sides (true everywhere
    in this engine — callers rename before joining)."""

    def _schema(ds: ray.data.Dataset) -> pa.Schema:
        s = ds.schema()
        return pa.schema(list(zip(s.names, s.types)))

    lsch, rsch = _schema(left_orig), _schema(right_orig)
    extra_r = [f for f in rsch if f.name not in keys]
    extra_l = [f for f in lsch if f.name not in keys]
    combined = pa.schema(list(lsch) + extra_r)

    def _pad(cols: list[pa.Field]):
        def _fn(b: pa.Table) -> pa.Table:
            for f in cols:
                b = b.append_column(f.name, pa.nulls(b.num_rows, f.type))
            return b.select(combined.names)

        return _fn

    if join_type == "inner" or (left is None and right is None):
        return ray.data.from_arrow(combined.empty_table())
    if join_type == "left_outer":
        if left is None:
            return ray.data.from_arrow(combined.empty_table())
        return left.map_batches(_pad(extra_r), batch_format="pyarrow")
    if join_type == "right_outer":
        if right is None:
            return ray.data.from_arrow(combined.empty_table())
        return right.map_batches(_pad(extra_l), batch_format="pyarrow")
    if join_type == "full_outer":
        if left is None:
            return right_orig.map_batches(_pad(extra_l), batch_format="pyarrow")
        return left.map_batches(_pad(extra_r), batch_format="pyarrow")
    raise ValueError(f"unsupported join_type for empty side: {join_type}")


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str | tuple[str, ...],
    join_type: str = "left_outer",
    num_partitions: int | None = None,
    key_count_hint: int | None = None,
) -> ray.data.Dataset:
    """Hash-partitioned join (Ray Data native). Both sides shuffle by key —
    use only when a broadcast lookup can't express the op.

    Known Ray quirk: a side whose blocks are ALL empty loses its schema in
    the shuffle aggregator and the Arrow join fails (deterministically) with
    ``ArrowInvalid`` in the aggregator's finalize — which happens whenever
    ``num_partitions`` exceeds the distinct-key count, because keys hash to
    at most key-count partitions and the rest receive zero rows on BOTH
    sides. Partitions beyond the key cardinality buy no parallelism anyway
    (same-key rows co-locate), so we clamp: ``key_count_hint`` if the caller
    knows a bound, else the row count of any already-materialized side
    (rows >= distinct keys; free to read). Lazy sides contribute no bound —
    we never trigger execution for a sizing hint. This is the library-level
    fix for the tiny-data x wide-cluster failure (round-4 verdict item 1:
    ``kpi_t_closeness`` red at sf0.001 x num_cpus in {6,16,32}).

    Second guard, same upstream bug: the schema broadcast rides on the FIRST
    block each input shuffles, and a zero-row first block silently skips it
    (``hash_shuffle.py:223-225``) — so for MATERIALIZED inputs we drop empty
    blocks up front (metadata-only) and, when a side is entirely empty,
    compute the join in pure Arrow instead of crashing the shuffle. Lazy
    big inputs stream through untouched — if a LAZY input can legitimately
    be empty or emit an empty first block (e.g. after a selective filter),
    materialize it first (tiny narrow streams) or prefer semi_anti_join,
    whose empty-side semantics are defined."""
    keys = (on,) if isinstance(on, str) else tuple(on)
    lc, left_orig, ln = _compact_join_side(left)
    rc, right_orig, rn = _compact_join_side(right)
    if lc is None or rc is None:
        return _empty_side_join(lc, rc, left_orig, right_orig, keys, join_type)
    if num_partitions is None:
        num_partitions = default_num_partitions()
    # the row-count clamp applies to EXPLICIT partition counts too: keys
    # hash into at most min-side-row-count partitions, so clamping never
    # loses parallelism and removes the empty-shard crash class entirely
    bounds = [key_count_hint, ln, rn]
    bound = min((b for b in bounds if b is not None), default=None)
    if bound is not None:
        num_partitions = max(1, min(num_partitions, bound))
    return lc.join(
        rc, join_type=join_type, num_partitions=num_partitions, on=keys
    )


def format_double(arr: pa.Array | pa.ChunkedArray) -> pa.Array:
    """Double -> lexical form matching Java Double.toString / Python repr for
    ordinary decimals: integral values get a trailing ".0" (Arrow's cast
    yields "1226", the reference emits "1226.0")."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    s = pc.cast(arr, pa.string())
    has_point = pc.match_substring_regex(s, r"[.eE]|^$")
    fixed = pc.if_else(has_point, s, pc.binary_join_element_wise(s, ".0", ""))
    return fixed.combine_chunks() if isinstance(fixed, pa.ChunkedArray) else fixed


def valid_mask(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Non-missing mask: Arrow null OR floating NaN both count as missing
    (the reference sees absent triples; Parquet NaNs are treated the same).
    Always null-free (plain ``and_`` would propagate nulls from is_nan)."""
    m = pc.is_valid(arr)
    if pa.types.is_floating(arr.type):
        m = pc.and_kleene(m, pc.invert(pc.is_nan(arr)))
        m = pc.fill_null(m, False)
    return m


def java_half(total: int) -> int:
    """Java long division by 2 (truncates toward zero) — midpoint semantics of
    the reference's date/dateTime medians (``GeneralizationDate.java:47``,
    ``GeneralizationDateTime.java:42``)."""
    q, r = divmod(abs(total), 2)
    return q if total >= 0 else -q


def actor_pool_size(divisor: int = 2) -> tuple[int, int]:
    """(min, max) actors for a stateful ``map_batches`` pool.

    Pre-start ``cpus // divisor`` actors — the autoscaling ramp from 1 actor
    serializes the stage for ~10 s regardless of cluster size — but NEVER
    let the pre-started minimum reserve EVERY CPU: at narrow widths a
    full-reservation minimum starves the upstream read/filter tasks and the
    whole pipeline crawls (measured: a 2-CPU run sat at ~2% worker
    utilization for an hour). The cap ``cpus - 1`` always leaves one slot
    for non-actor stages; max actors is the CPU count."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    lo = max(1, min(cpus - 1, max(2, cpus // divisor)))
    hi = max(lo, cpus)
    return lo, hi


def rank_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    order_col: str,
    *,
    descending: bool = False,
    tie_col: str | None = None,
    rank_col: str = "rn",
) -> ray.data.Dataset:
    """Per-key 0-based rank (``row_number() - 1``) as a COLUMN — the
    emit-everything sibling of ``topk_per_key``: one range sort by
    (key, order[, tie]), per-block within-key ranks, boundary carry from
    driver-folded per-block edge summaries. No per-group UDF, works at any
    key cardinality."""
    import ray as _ray

    cols = [key_col, order_col] + ([tie_col] if tie_col else [])
    desc = [False, descending] + ([False] if tie_col else [])
    mat = ds.materialize()
    pre = coalesce_blocks(mat)
    s = pre.sort(cols, descending=desc).materialize()
    refs = s.to_arrow_refs()

    @_ray.remote(num_cpus=0.25)
    def _edges(t: pa.Table):
        if t.num_rows == 0:
            return None
        kc = t.column(key_col)
        first, last = kc[0].as_py(), kc[-1].as_py()
        eq_last = pc.sum(pc.cast(pc.equal(kc, kc[-1]), pa.int64())).as_py()
        return (first, last, int(eq_last), t.num_rows)

    edges = _ray.get([_edges.remote(r) for r in refs])
    refs = [r for r, e in zip(refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    carry_in = [0] * len(refs)
    prev_key, cum = None, 0
    for bidx, (fk, lk, nl, rows) in enumerate(edges):
        carry_in[bidx] = cum if prev_key == fk else 0
        cum = carry_in[bidx] + rows if fk == lk else nl
        prev_key = lk

    @_ray.remote(num_cpus=0.5)
    def _stamp(t: pa.Table, carry: int) -> pa.Table:
        kv = t.column(key_col).to_numpy(zero_copy_only=False)
        n = len(kv)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = kv[1:] != kv[:-1]
        seg = np.nonzero(new)[0]
        rank = np.arange(n, dtype=np.int64) - np.repeat(seg, np.diff(np.append(seg, n)))
        rank[: (seg[1] if len(seg) > 1 else n)] += carry
        return t.append_column(rank_col, pa.array(rank, pa.int64()))

    if not refs:
        # all blocks empty: Ray's sort/repartition drop an all-empty
        # dataset's schema — rebuild it explicitly, then append the rank
        # column statelessly
        return empty_like(mat).map_batches(
            lambda t: t.append_column(
                rank_col, pa.array(np.zeros(t.num_rows, np.int64), pa.int64())
            ),
            batch_format="pyarrow",
        )
    return ray.data.from_arrow_refs(
        [_stamp.remote(refs[b], carry_in[b]) for b in range(len(refs))]
    )


_FOLD_OPS = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}


def fold_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    spec: dict[str, tuple[str, str | None]],
) -> ray.data.Dataset:
    """Multi-aggregate per-key fold WITHOUT a Ray groupby — the n-ary
    sibling of ``sum_per_key`` / ``min_per_key``: one Arrow-C per-batch
    partial, one range sort of the narrow partial stream, per-block Arrow
    folds, and a driver-side merge of ONLY the block-spanning edge keys
    (2 rows per block gather, heavy rows never move).

    ``spec`` maps output column -> (op, src_col); ops: sum, min, max, count
    (count ignores src_col). Sum columns must be exact-integer (derive
    fixed-point upstream) so the fold is reduction-order-proof."""

    def _partial(b: pa.Table) -> pa.Table:
        aggs, renames = [], {key_col: key_col}
        proj = {key_col: b.column(key_col)}
        for out, (op, src) in spec.items():
            if op == "count":
                aggs.append((key_col, "count"))
                renames[f"{key_col}_count"] = out
            else:
                proj[f"__{out}"] = b.column(src)
                aggs.append((f"__{out}", op))
                renames[f"__{out}_{op}"] = out
        g = pa.table(proj).group_by([key_col]).aggregate(aggs)
        cols = {renames.get(n, n): g.column(n) for n in g.column_names}
        return pa.table({key_col: cols[key_col], **{o: cols[o] for o in spec}})

    part = ds.map_batches(_partial, batch_format="pyarrow")
    mat = part.materialize()
    pre = coalesce_blocks(mat)
    s = pre.sort([key_col]).materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _fold_block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        aggs = [(o, _FOLD_OPS[spec[o][0]]) for o in spec]
        g = t.group_by([key_col]).aggregate(aggs)
        g = g.rename_columns(
            [key_col if n == key_col else n.rsplit("_", 1)[0] for n in g.column_names]
        )
        g = g.select([key_col] + list(spec))
        return g.take(pc.sort_indices(g.column(key_col)))

    folded = ray.get([_fold_block.remote(r) for r in refs])
    folded = [t for t in folded if t.num_rows > 0]
    if not folded:
        # empty: the partial pass already produced (key, *spec), but Ray's
        # sort/repartition drop an all-empty dataset's schema — rebuild
        return empty_like(mat)
    # block-spanning keys: sorted blocks can only share keys at their edges
    firsts = [t.column(key_col)[0].as_py() for t in folded]
    lasts = [t.column(key_col)[-1].as_py() for t in folded]
    spanning: set = set()
    for i in range(1, len(folded)):
        if firsts[i] == lasts[i - 1]:
            spanning.add(firsts[i])
    merged_rows: list[pa.Table] = []
    if spanning:
        edge_slices = []
        for t in folded:
            keep = pc.is_in(
                t.column(key_col), value_set=pa.array(sorted(spanning))
            )
            edge_slices.append(t.filter(keep))
        edges = pa.concat_tables(edge_slices)
        if edges.num_rows:
            aggs = [(o, _FOLD_OPS[spec[o][0]]) for o in spec]
            m = edges.group_by([key_col]).aggregate(aggs)
            m = m.rename_columns(
                [key_col if n == key_col else n.rsplit("_", 1)[0] for n in m.column_names]
            )
            merged_rows.append(m.select([key_col] + list(spec)))

    @ray.remote(num_cpus=0.25)
    def _strip(t: pa.Table, span_keys) -> pa.Table:
        if not span_keys:
            return t
        return t.filter(
            pc.invert(pc.is_in(t.column(key_col), value_set=pa.array(span_keys)))
        )

    span_list = sorted(spanning)
    out_refs = [_strip.remote(t, span_list) for t in folded]
    parts = [ray.data.from_arrow_refs(out_refs)]
    if merged_rows:
        parts.append(ray.data.from_arrow(merged_rows[0]))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def string_agg_per_key(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    *,
    sep: str,
    order_cols: list[str] | None = None,
    out_col: str = "agg",
) -> ray.data.Dataset:
    """Ordered per-key string concatenation (``string_agg(val, sep ORDER BY
    order_cols)``) without a per-group UDF: ONE range sort by
    (key, *order_cols); keys complete inside a block concatenate there
    (boundary-scan run detection, one str.join per key); only each block's
    FIRST and LAST key runs travel to the driver (2 fragments per block),
    where spanning keys merge in block order. Per-key output length is
    bounded by that key's row count — the documented hot-key caveat."""
    order_cols = order_cols or [val_col]
    cols = [key_col] + [c for c in order_cols if c != key_col]
    pre = coalesce_blocks(ds.materialize())
    _sch = pre.schema()
    in_key_type = dict(zip(_sch.names, _sch.types))[key_col]
    s = pre.sort(cols).materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _block(t: pa.Table, idx: int):
        if t.num_rows == 0:
            return None, []
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_pylist()
        brk = np.flatnonzero(k[1:] != k[:-1]) + 1
        starts = np.concatenate([[0], brk]).astype(np.int64)
        ends = np.concatenate([brk, [len(k)]]).astype(np.int64)
        frags = []
        inner_keys, inner_aggs = [], []
        for i, (a, b) in enumerate(zip(starts, ends)):
            frag = sep.join(str(v) for v in vals[a:b])
            if i == 0 or i == len(starts) - 1:
                frags.append((k[a].item() if hasattr(k[a], "item") else k[a], frag, idx))
            else:
                inner_keys.append(k[a])
                inner_aggs.append(frag)
        inner = pa.table(
            {
                key_col: pa.array(inner_keys, t.schema.field(key_col).type),
                out_col: pa.array(inner_aggs, pa.string()),
            }
        )
        return inner, frags

    results = ray.get([_block.remote(r, i) for i, r in enumerate(refs)])
    inner_tbls = [t for t, _ in results if t is not None and t.num_rows]
    key_type = (
        inner_tbls[0].schema.field(key_col).type if inner_tbls else in_key_type
    )
    frags = sorted(
        (f for _, fs in results for f in fs), key=lambda x: (x[0], x[2])
    )
    merged_keys, merged_aggs = [], []
    i = 0
    while i < len(frags):
        j = i
        parts = []
        while j < len(frags) and frags[j][0] == frags[i][0]:
            parts.append(frags[j][1])
            j += 1
        merged_keys.append(frags[i][0])
        merged_aggs.append(sep.join(parts))
        i = j
    merged = pa.table(
        {
            key_col: pa.array(merged_keys, key_type if inner_tbls else None),
            out_col: pa.array(merged_aggs, pa.string()),
        }
    )
    all_tbls = inner_tbls + ([merged] if merged.num_rows else [])
    if not all_tbls:
        return ray.data.from_arrow(
            pa.table(
                {key_col: pa.array([], key_type), out_col: pa.array([], pa.string())}
            )
        )
    return ray.data.from_arrow(all_tbls)
