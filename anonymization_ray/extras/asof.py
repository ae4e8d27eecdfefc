"""Distributed temporal joins — two custom operators Ray Data lacks:
``asof_join`` (latest right row at-or-before each left row) and
``interval_join`` (every interval containing each point).

``asof_join(left, right)``: for every left row (key, t), attach the right
row of the same key with the greatest t_r <= t (inclusive), or nulls.

Composition (no per-key UDF, documented partitioning assumption: one range
sort co-locates and orders both streams):

1. tag the two streams (right side orders BEFORE left at equal time, making
   equal-time matches visible) and union them
2. ONE range sort by (key, time, side)
3. per-block vectorized last-right-position scan: segment-encoded cummax
   (position + segment id x stride) finds, for every left row, the latest
   preceding right row within its key segment — O(n) per block, no loops
4. block-boundary carry: a key spanning blocks passes its latest right row
   through the same adjacent-block carry chain used by
   ``util.combine_sorted_partials`` (driver sees one edge row per block).

Matches DuckDB's ``ASOF LEFT JOIN`` semantics (oracle-checked); right-side
(key, time) pairs must be unique for a deterministic result — same
requirement DuckDB imposes for a well-defined ASOF answer.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import coalesce_blocks


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key_col: str,
    time_col: str,
    right_cols: list[str],
    left_cols: list[str],
) -> rd.Dataset:
    """Returns Dataset[left_cols + key + time + right_cols] (right_cols
    null where no right row precedes)."""

    # right payload columns need concrete types for the union — probe schema
    r_schema = right.schema()
    r_types = {c: r_schema.base_schema.field(c).type for c in right_cols}
    l_schema = left.schema()
    l_types = {c: l_schema.base_schema.field(c).type for c in left_cols}

    def _tag_l(b: pa.Table) -> pa.Table:
        cols = {c: b.column(c).combine_chunks() for c in left_cols}
        cols[key_col] = b.column(key_col).combine_chunks()
        cols[time_col] = b.column(time_col).combine_chunks()
        cols["_side"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        for c in right_cols:
            cols[f"_r_{c}"] = pa.nulls(b.num_rows, r_types[c])
        return pa.table(cols)

    def _tag_r(b: pa.Table) -> pa.Table:
        n = b.num_rows
        cols = {c: pa.nulls(n, l_types[c]) for c in left_cols}
        cols[key_col] = b.column(key_col).combine_chunks()
        cols[time_col] = b.column(time_col).combine_chunks()
        cols["_side"] = pa.array(np.zeros(n, dtype=np.int8))
        for c in right_cols:
            cols[f"_r_{c}"] = b.column(c).combine_chunks()
        return pa.table(cols)

    lt = left.map_batches(_tag_l, batch_format="pyarrow")
    rt = right.map_batches(_tag_r, batch_format="pyarrow")
    s = coalesce_blocks(lt.union(rt).materialize()).sort(
        [key_col, time_col, "_side"]
    ).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _edges(t: pa.Table):
        """(first_key, last_key, latest-right-row-values-of-last-key or None)."""
        if t.num_rows == 0:
            return None
        kv = t.column(key_col)
        first, last = kv[0].as_py(), kv[-1].as_py()
        side = t.column("_side").to_numpy(zero_copy_only=False)
        keys = kv.to_numpy(zero_copy_only=False)
        cand = np.nonzero((keys == last) & (side == 0))[0]
        vals = None
        if cand.size:
            i = int(cand[-1])
            vals = tuple(t.column(f"_r_{c}")[i].as_py() for c in right_cols)
        return (first, last, vals)

    edges = ray.get([_edges.remote(r) for r in refs])
    refs = [r for r, e in zip(refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    carry_in: list[tuple | None] = [None] * len(refs)
    carry_key, carry_vals = None, None
    for b, (fk, lk, rv) in enumerate(edges):
        carry_in[b] = carry_vals if carry_key == fk else None
        if rv is not None:
            # block holds a right row for its last key: that's the carry
            carry_key, carry_vals = lk, rv
        elif lk == fk and carry_key == lk:
            pass  # single-key block, no right rows: carry passes through
        else:
            carry_key, carry_vals = lk, None

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry) -> pa.Table:
        n = t.num_rows
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        side = t.column("_side").to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = keys[1:] != keys[:-1]
        seg = np.cumsum(new) - 1  # segment id per row
        stride = np.int64(n + 1)
        pos1 = np.where(side == 0, np.arange(n, dtype=np.int64) + 1, 0)
        enc = seg.astype(np.int64) * stride + pos1
        run = np.maximum.accumulate(enc)
        same_seg = (run // stride) == seg
        last_pos = np.where(same_seg, run % stride, 0) - 1  # -1 = none in block
        is_left = side == 1
        li = np.nonzero(is_left)[0]
        out_cols = {}
        for c in left_cols + [key_col, time_col]:
            out_cols[c] = t.column(c).take(pa.array(li, pa.int64()))
        first_seg_left = is_left & (seg == 0)
        for ci, c in enumerate(right_cols):
            src = t.column(f"_r_{c}")
            lp = last_pos[li]
            have = lp >= 0
            taken = src.take(pa.array(np.where(have, lp, 0), pa.int64()))
            vals = pc.if_else(pa.array(have), taken, pa.nulls(len(li), src.type))
            if carry is not None:
                # first-segment left rows with no in-block right row inherit
                # the boundary carry
                use_carry = pa.array((~have) & first_seg_left[li])
                vals = pc.if_else(use_carry, pa.scalar(carry[ci], src.type), vals)
            out_cols[c] = vals
        return pa.table(out_cols)

    return rd.from_arrow_refs(
        [_scan.remote(refs[b], carry_in[b]) for b in range(len(refs))]
    )

def interval_join(
    points: rd.Dataset,
    intervals: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    start_col: str,
    end_col: str,
    granule_us: int,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Distributed RANGE (interval-containment) join — the second temporal
    join shape Ray Data lacks: every point row (key, ts) matched to every
    interval row of the same key with ``start <= ts < end``.

    Shape: time is cut into fixed granules; each point maps to exactly ONE
    granule, each interval is REPLICATED to every granule it covers, and an
    ordinary hash join on (key, granule) followed by the exact containment
    filter yields each qualifying pair exactly once (the point's single
    granule is covered by every interval that contains it) — no sort, no
    per-key UDF, no dedup pass.

    Partitioning assumption (documented per the custom-operator contract):
    the replication factor is ceil(span / granule_us) + 1, so ``granule_us``
    must be on the order of the TYPICAL interval span — a granule far below
    the span explodes the build side, one far above it degrades the join to
    a coarse time bucket with a heavy post-filter. Timestamps may be Arrow
    timestamps (any unit) or integers; comparisons happen in int64 µs — and
    the OUTPUT carries ``ts_col``/``start_col``/``end_col`` in that int64-µs
    form (the join's canonical representation), not the caller's original
    timestamp types.
    """

    def _ts64(col: pa.ChunkedArray) -> np.ndarray:
        a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if pa.types.is_timestamp(a.type):
            a = a.cast(pa.timestamp("us")).cast(pa.int64())
        else:
            a = a.cast(pa.int64())
        return a.to_numpy(zero_copy_only=False)

    def _pgran(batch: pa.Table) -> pa.Table:
        ts = _ts64(batch.column(ts_col))
        batch = batch.set_column(
            batch.column_names.index(ts_col), ts_col, pa.array(ts, pa.int64())
        )
        return batch.append_column("gran", pa.array(ts // granule_us, pa.int64()))

    def _igran(batch: pa.Table) -> pa.Table:
        s = _ts64(batch.column(start_col))
        e = _ts64(batch.column(end_col))
        ok = e > s  # empty/inverted intervals match nothing
        batch = batch.filter(pa.array(ok))
        s, e = s[ok], e[ok]
        g0 = s // granule_us
        g1 = (e - 1) // granule_us  # end exclusive
        reps = (g1 - g0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(len(s)), reps)
        ramp = np.arange(int(reps.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps
        )
        out = batch.take(pa.array(idx, pa.int64()))
        out = out.set_column(
            out.column_names.index(start_col), start_col, pa.array(s[idx], pa.int64())
        )
        out = out.set_column(
            out.column_names.index(end_col), end_col, pa.array(e[idx], pa.int64())
        )
        return out.append_column("gran", pa.array(g0[idx] + ramp, pa.int64()))

    p = points.map_batches(_pgran, batch_format="pyarrow")
    iv = intervals.map_batches(_igran, batch_format="pyarrow")
    if num_partitions is None:
        from ..util import default_num_partitions

        # clamp by probe count: empty join partitions are a schema hazard
        n_iv = intervals.count()
        num_partitions = max(2, min(default_num_partitions() // 2, n_iv // 2000 + 1))
    joined = p.join(
        iv, join_type="inner", num_partitions=num_partitions, on=(key_col, "gran")
    )

    def _exact(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).to_numpy(zero_copy_only=False)
        s = batch.column(start_col).to_numpy(zero_copy_only=False)
        e = batch.column(end_col).to_numpy(zero_copy_only=False)
        keep = (ts >= s) & (ts < e)
        return batch.filter(pa.array(keep)).drop_columns(["gran"])

    return joined.map_batches(_exact, batch_format="pyarrow")


def nearest_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    key_col: str,
    time_col: str,
    left_id_col: str,
) -> rd.Dataset:
    """Nearest-event join: for each left row, the right row with the SAME
    key whose time is closest in absolute distance; ties (equidistant
    before/after) resolve to the EARLIER right row. Times must be int64
    (epoch units — callers convert timestamps once, vectorized).

    Composition, not a new primitive: the backward leg IS ``asof_join``
    (latest right <= t) and the forward leg is the SAME join on NEGATED
    times (earliest right >= t) run over the backward leg's output — the
    prev time rides through as a left payload column, so the two legs chain
    with NO id join and no extra shuffle. Two narrow sorts total; the
    nearer-of-two pick is one stateless vectorized pass.

    Returns (left_id, key, time, nearest_t) with nearest_t null when the
    key has no right rows at all."""
    lslim = left.select_columns([left_id_col, key_col, time_col])

    def _with_payload(b: pa.Table, neg: bool) -> pa.Table:
        t = b.column(time_col).combine_chunks()
        return pa.table(
            {
                key_col: b.column(key_col).combine_chunks(),
                time_col: pc.negate_checked(t) if neg else t,
                "_rt": t,
            }
        )

    back = asof_join(
        lslim,
        right.map_batches(lambda b: _with_payload(b, False), batch_format="pyarrow"),
        key_col=key_col,
        time_col=time_col,
        right_cols=["_rt"],
        left_cols=[left_id_col],
    ).map_batches(
        lambda b: b.rename_columns([left_id_col, key_col, time_col, "prev_t"]),
        batch_format="pyarrow",
    )

    def _neg(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                left_id_col: b.column(left_id_col).combine_chunks(),
                "prev_t": b.column("prev_t").combine_chunks(),
                key_col: b.column(key_col).combine_chunks(),
                time_col: pc.negate_checked(b.column(time_col).combine_chunks()),
            }
        )

    both = asof_join(
        back.map_batches(_neg, batch_format="pyarrow"),
        right.map_batches(lambda b: _with_payload(b, True), batch_format="pyarrow"),
        key_col=key_col,
        time_col=time_col,
        right_cols=["_rt"],
        left_cols=[left_id_col, "prev_t"],
    )

    def _pick(b: pa.Table) -> pa.Table:
        t = pc.negate_checked(b.column(time_col).combine_chunks())
        prev = b.column("prev_t")
        nxt = b.column("_rt")
        d_prev = pc.subtract_checked(t, prev)  # >= 0, null if no prev
        d_next = pc.subtract_checked(nxt, t)  # >= 0, null if no next
        # prev wins ties; a null distance loses to any non-null
        prev_wins = pc.and_kleene(
            pc.is_valid(prev),
            pc.or_kleene(pc.is_null(nxt), pc.less_equal(d_prev, d_next)),
        )
        nearest = pc.if_else(pc.fill_null(prev_wins, False), prev, nxt)
        return pa.table(
            {
                left_id_col: b.column(left_id_col).combine_chunks(),
                key_col: b.column(key_col).combine_chunks(),
                time_col: t,
                "nearest_t": nearest,
            }
        )

    return both.map_batches(_pick, batch_format="pyarrow")


def interval_coalesce(
    ds: rd.Dataset,
    key_col: str,
    from_col: str,
    to_col: str,
) -> rd.Dataset:
    """Merge overlapping/touching [from, to) intervals per key ->
    (key, c_from, c_to, n_merged) — temporal-KG validity compaction, and
    (fed event-length intervals) overlap-sessionization. An interval opens
    a new island iff its start exceeds the running max END of everything
    before it in its key.

    Shape: ONE range sort by (key, from, to), then the engine's
    carry-chain discipline done RIGHT for max-carries: a summary pass
    gives each block's first/last key segment max-ends, the driver chains
    the incoming max-end carry per block (an island can span many blocks),
    and the scan pass seeds each block's first key segment with that carry
    — so block-local island breaks are globally correct. Each block emits
    its certainly-closed islands directly; only the continuation piece and
    the last open island (2 tuples per block) ride to the driver for
    stitching."""
    s = (
        coalesce_blocks(
            ds.select_columns([key_col, from_col, to_col]).materialize()
        )
        .sort([key_col, from_col, to_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        e = t.column(to_col).to_numpy(zero_copy_only=False).astype(np.int64)
        first_seg_end = int(e[k == k[0]].max())
        last_seg_end = int(e[k == k[-1]].max())
        return (k[0], k[-1], first_seg_end, last_seg_end, bool(k[0] == k[-1]))

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, sm in zip(refs, summaries) if sm is not None]
    summaries = [sm for sm in summaries if sm is not None]

    carry_in: list[int | None] = [None] * len(refs)
    ck, ce = None, None
    for i, (fk, lk, fe, le, single) in enumerate(summaries):
        carry_in[i] = ce if (ck is not None and ck == fk) else None
        if single and carry_in[i] is not None:
            out_e = max(le, carry_in[i])
        else:
            out_e = le
        ck, ce = lk, out_e

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry: int | None):
        """-> (closed islands table, continuation (key,n,end) | None,
        last open island (key,from,end,n) | None)."""
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        f = t.column(from_col).to_numpy(zero_copy_only=False).astype(np.int64)
        e = t.column(to_col).to_numpy(zero_copy_only=False).astype(np.int64)
        islands: list[tuple] = []  # (key, from, end, n, is_continuation)
        starts = np.concatenate(
            [[0], np.nonzero(k[1:] != k[:-1])[0] + 1, [len(k)]]
        )
        for si, (a, b) in enumerate(zip(starts[:-1], starts[1:])):
            seg_e = e[a:b]
            cme = np.maximum.accumulate(seg_e)
            if si == 0 and carry is not None:
                cme = np.maximum(cme, carry)
            new = np.ones(b - a, bool)
            if si == 0 and carry is not None:
                new[0] = f[a] > carry
            new[1:] = f[a + 1 : b] > cme[:-1]
            idx = np.nonzero(new)[0]
            if len(idx) == 0 or idx[0] != 0:
                # entire prefix continues the incoming island
                cut = idx[0] if len(idx) else b - a
                islands.append(
                    (k[a], None, int(cme[cut - 1]), int(cut), True)
                )
                idx = idx if len(idx) else np.array([], np.int64)
            bounds = np.append(idx, b - a)
            for i0, i1 in zip(bounds[:-1], bounds[1:]):
                islands.append(
                    (k[a + i0], int(f[a + i0]), int(cme[i1 - 1]), int(i1 - i0), False)
                )
        cont = None
        if islands and islands[0][4]:
            key0, _, end0, n0, _ = islands.pop(0)
            cont = (key0, n0, end0)
        last_open = islands.pop() if islands else None
        if islands:
            ks, fs, es, ns, _ = zip(*islands)
            closed = pa.table(
                {
                    key_col: pa.array(list(ks)),
                    "c_from": pa.array(list(fs), pa.int64()),
                    "c_to": pa.array(list(es), pa.int64()),
                    "n_merged": pa.array(list(ns), pa.int64()),
                }
            )
        else:
            closed = None
        return closed, cont, (
            None if last_open is None else last_open[:4]
        )

    parts = ray.get(
        [_scan.remote(r, carry_in[i]) for i, r in enumerate(refs)]
    )
    tables = [p[0] for p in parts if p[0] is not None]

    final_rows: list[tuple] = []
    open_isl: list | None = None  # [key, from, end, n]
    for _closed, cont, last_open in parts:
        if cont is not None:
            # continuation of the currently open island (same key, by the
            # carry chain's construction)
            assert open_isl is not None and open_isl[0] == cont[0]
            open_isl[2] = max(open_isl[2], cont[2])
            open_isl[3] += cont[1]
        if last_open is not None:
            # a fresh island started in this block -> the open one closes
            if open_isl is not None:
                final_rows.append(tuple(open_isl))
            open_isl = list(last_open)
    if open_isl is not None:
        final_rows.append(tuple(open_isl))

    if final_rows:
        ks, fs, es, ns = zip(*final_rows)
        tables.append(
            pa.table(
                {
                    key_col: pa.array(list(ks)),
                    "c_from": pa.array(list(fs), pa.int64()),
                    "c_to": pa.array(list(es), pa.int64()),
                    "n_merged": pa.array(list(ns), pa.int64()),
                }
            )
        )
    if not tables:
        return rd.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.string()),
                    "c_from": pa.array([], pa.int64()),
                    "c_to": pa.array([], pa.int64()),
                    "n_merged": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow(pa.concat_tables(tables))
