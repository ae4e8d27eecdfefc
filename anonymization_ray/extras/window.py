"""Per-key window analytics (row_number / lag / running sum) — the SQL
window-function family, computed WITHOUT a per-group UDF.

Shape: one range sort by (key, order, id), then a per-block vectorized scan.
Per-row window state entering each block (the running row count / sum / last
order value of the block's first key) is reconstructed from per-block
SUMMARIES chained on the driver — one tiny dict per block, never row data —
the same adjacent-block carry chain as ``extras.asof``. Only the last key of
a sorted block can continue into the next, so the carry is a single
(key, n, sum, last_order) tuple per block boundary.

Running sums are over integer units (the caller scales floats, e.g. cents)
so the result is exact and order-stable — float window sums are not
bit-reproducible across engines.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _i64(col) -> np.ndarray:
    a = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.datetime64):
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64)


def per_key_window(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    val_col: str,
) -> rd.Dataset:
    """Returns (id, key, rn, lag_us, cum_val): per-key row_number ordered by
    (order, id), microsecond delta to the previous row of the same key (null
    on each key's first row), and the per-key running sum of ``val_col``
    (int64 — pre-scale floats)."""
    import ray

    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, val_col]).materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        o = _i64(t.column(order_col))
        v = _i64(t.column(val_col))
        last = k[-1]
        brk = np.nonzero(k != last)[0]
        start = int(brk[-1]) + 1 if brk.size else 0
        return {
            "first": k[0],
            "last": last,
            "n_last": len(k) - start,
            "sum_last": int(v[start:].sum()),
            "last_order": int(o[-1]),
            "whole": start == 0,
        }

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, summaries) if m is not None]
    summaries = [m for m in summaries if m is not None]

    # chain block summaries: carry entering block b = running state of the
    # trailing key run across blocks < b (None when b starts a new key)
    carries: list[tuple | None] = []
    run_key, run_n, run_sum, run_last = None, 0, 0, 0
    _I64 = 1 << 63
    for m in summaries:
        if not -_I64 <= run_sum < _I64:
            # loud contract enforcement: the in-block numpy cumsum would have
            # wrapped silently, and a Python bigint carry crashes the ufunc
            # add with a cryptic cast error — callers must pre-scale val_col
            # so per-key running sums fit int64
            raise ValueError(
                f"per_key_window running sum of {val_col!r} overflows int64 "
                f"({run_sum}); pre-scale the value column"
            )
        carries.append(
            (run_key, run_n, run_sum, run_last)
            if run_key is not None and m["first"] == run_key
            else None
        )
        if m["whole"] and m["last"] == run_key:
            run_n += m["n_last"]
            run_sum += m["sum_last"]
            run_last = m["last_order"]
        else:
            run_key, run_n, run_sum, run_last = (
                m["last"], m["n_last"], m["sum_last"], m["last_order"],
            )

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        o = _i64(t.column(order_col))
        v = _i64(t.column(val_col))
        n = len(k)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True  # segment machinery; the carry offsets segment 0
        new_key[1:] = k[1:] != k[:-1]
        cont = carry is not None and k[0] == carry[0]
        seg_id = np.cumsum(new_key) - 1
        seg_starts = np.nonzero(new_key)[0]
        start_of_seg = seg_starts[seg_id]
        rn = np.arange(n, dtype=np.int64) - start_of_seg + 1
        cv = np.cumsum(v)
        cum = cv - (cv[start_of_seg] - v[start_of_seg])
        lag = np.empty(n, dtype=np.int64)
        lag[1:] = o[:-1]
        lag[0] = carry[3] if cont else 0
        valid = rn > 1
        if cont:
            head = seg_id == 0
            rn[head] += carry[1]
            cum[head] += carry[2]
            valid[0] = True
        return pa.table(
            {
                id_col: t.column(id_col).combine_chunks(),
                key_col: t.column(key_col).combine_chunks(),
                "rn": pa.array(rn, pa.int64()),
                "lag_us": pa.array(
                    np.where(valid, o - lag, 0), pa.int64(), mask=~valid
                ),
                "cum_val": pa.array(cum, pa.int64()),
            }
        )

    out_refs = [_scan.remote(r, c) for r, c in zip(refs, carries)]
    return rd.from_arrow_refs(out_refs)


def resample_ffill(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    id_col: str,
    val_col: str,
    stride_us: int,
) -> rd.Dataset:
    """Gap-filled time resampling with forward fill: per key, bucket ``ts``
    into ``stride_us`` windows, take each bucket's LAST sample (by ts, then
    id — deterministic), then emit one row per bucket from the key's first
    to last observed bucket, carrying the last value forward across gaps —
    the standard timeseries densify/ffill.

    Shape: ONE narrow range sort by (key, bucket, ts, id), then two fused
    vectorized per-block passes: keep-last-per-(key,bucket) and gap
    expansion. Both need only the NEXT block's first (key, bucket) row
    (single-row metadata, no data exchange), so the whole operator is
    sort + independent block scans — no groupby, no per-key task. Gap
    fanout is bounded by (span / stride) per key; pick the stride so the
    densified grid is the intended output size (it IS the output).

    ``val_col`` must already be integer (pre-scale floats); nulls are not
    filled before bucketing — coalesce upstream."""
    import ray

    from ..util import coalesce_blocks

    def _bucket(b: pa.Table) -> pa.Table:
        ts = _i64(b.column(ts_col))
        return pa.table(
            {
                key_col: b.column(key_col).combine_chunks(),
                "bkt": pa.array(ts // stride_us, pa.int64()),
                ts_col: b.column(ts_col).combine_chunks(),
                id_col: b.column(id_col).combine_chunks(),
                val_col: pc.cast(b.column(val_col), pa.int64()).combine_chunks(),
            }
        )

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, ts_col, id_col, val_col])
            .map_batches(_bucket, batch_format="pyarrow")
            .materialize()
        )
        .sort([key_col, "bkt", ts_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _first_row(t: pa.Table):
        if t.num_rows == 0:
            return None
        return (
            t.column(key_col)[0].as_py(),
            t.column("bkt")[0].as_py(),
        )

    firsts = ray.get([_first_row.remote(r) for r in refs])
    refs = [r for r, f in zip(refs, firsts) if f is not None]
    firsts = [f for f in firsts if f is not None]

    @ray.remote(num_cpus=0.5)
    def _expand(t: pa.Table, nxt) -> pa.Table:
        empty = pa.table(
            {
                key_col: pa.array([], t.schema.field(key_col).type),
                "bkt": pa.array([], pa.int64()),
                val_col: pa.array([], pa.int64()),
            }
        )
        n = t.num_rows
        if n == 0:
            return empty
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        bk = t.column("bkt").to_numpy(zero_copy_only=False).astype(np.int64)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        # keep-last per (key, bucket): row kept iff the following row (next
        # in block, or the next block's first row) differs in (key, bucket)
        keep = np.ones(n, dtype=bool)
        keep[:-1] = (k[:-1] != k[1:]) | (bk[:-1] != bk[1:])
        if nxt is not None:
            keep[-1] = not (k[-1] == nxt[0] and bk[-1] == nxt[1])
        ku, kb, kv = k[keep], bk[keep], v[keep]
        m = len(ku)
        if m == 0:
            return empty
        # expansion: row i covers [bkt_i, next_bkt_i - 1] while the next
        # sample (in-block successor, else next block's first group) is the
        # same key; the key's final sample covers only its own bucket
        nxt_k = np.empty_like(ku)
        nxt_b = np.empty_like(kb)
        nxt_k[:-1], nxt_b[:-1] = ku[1:], kb[1:]
        same_tail = nxt is not None and ku[-1] == nxt[0]
        nxt_k[-1] = nxt[0] if same_tail else ku[-1]
        nxt_b[-1] = nxt[1] if same_tail else kb[-1] + 1
        cnt = np.where(nxt_k == ku, nxt_b - kb, 1).astype(np.int64)
        total = int(cnt.sum())
        starts = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        offs = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
        return pa.table(
            {
                key_col: pa.array(np.repeat(ku, cnt)),
                "bkt": pa.array(np.repeat(kb, cnt) + offs, pa.int64()),
                val_col: pa.array(np.repeat(kv, cnt), pa.int64()),
            }
        )

    out_refs = [
        _expand.remote(refs[i], firsts[i + 1] if i + 1 < len(refs) else None)
        for i in range(len(refs))
    ]
    if not out_refs:
        return s
    return rd.from_arrow_refs(out_refs)


def rolling_sum_rows(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    val_col: str,
    k: int,
) -> rd.Dataset:
    """(id, roll_sum): per-key trailing-k-row sum (current row + k-1
    predecessors, fewer at each key's head) ordered by (order, id) — the
    ROWS-frame window aggregate (rolling volume, trailing token budget).

    Shape: ONE range sort by (key, order, id); emission is a lazy
    map_batches over a tiny (start, stop) range table whose tasks fetch
    their covering sorted blocks PLUS a (k-1)-row halo before each range
    (the randomization-stage halo-chunk pattern), so every window is fully
    local to one task: in-task it is a cumsum difference with key-boundary
    resets — no per-row Python, no driver-blocking gather."""
    import numpy as np
    import ray

    from ..util import _block_num_rows, chunked_ranges, coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, val_col]).materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, counts) if c > 0]
    counts = [c for c in counts if c > 0]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(offsets[-1])
    if total == 0:
        return rd.from_arrow(
            pa.table({id_col: pa.array([], pa.int64()), "roll_sum": pa.array([], pa.int64())})
        )
    ranges = chunked_ranges(offsets)
    range_ds = rd.from_arrow(
        pa.table(
            {
                "start": pa.array([a for a, _ in ranges], pa.int64()),
                "stop": pa.array([b for _, b in ranges], pa.int64()),
            }
        )
    )

    def _emit(batch: pa.Table, kk=k, blk=refs, offs=offsets) -> pa.Table:
        outs = []
        for start, stop in zip(
            batch.column("start").to_pylist(), batch.column("stop").to_pylist()
        ):
            halo_start = max(0, start - (kk - 1))
            b0 = int(np.searchsorted(offs, halo_start, side="right") - 1)
            b1 = int(np.searchsorted(offs, stop, side="left"))
            got = ray.get(blk[b0:b1])
            parts = []
            for bi, t in zip(range(b0, b1), got):
                lo = int(offs[bi])
                sl = max(halo_start, lo) - lo
                ln = min(stop, int(offs[bi + 1])) - max(halo_start, lo)
                parts.append(t.slice(sl, ln))
            t = pa.concat_tables(parts)
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
            n = len(v)
            new = np.empty(n, dtype=bool)
            new[0] = True
            new[1:] = keys[1:] != keys[:-1]
            seg_start = np.maximum.accumulate(np.where(new, np.arange(n), 0))
            cs = np.concatenate([[0], np.cumsum(v)])
            win_start = np.maximum(seg_start, np.arange(n) - (kk - 1))
            roll = cs[1:] - cs[win_start]
            emit_from = start - halo_start
            outs.append(
                pa.table(
                    {
                        id_col: t.column(id_col).slice(emit_from),
                        "roll_sum": pa.array(roll[emit_from:], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return range_ds.map_batches(_emit, batch_format="pyarrow", batch_size=1)


def keyed_lead_delta(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    val_col: str,
) -> rd.Dataset:
    """(key, val, dt): for every row that has a SUCCESSOR within its key
    (ordered by (order, id)), the row's value and the gap to that successor
    in the order column's int64 units — the ``lead() - current`` primitive
    behind time-weighted averages, dwell times, and inter-arrival stats.
    Each key's LAST row (no successor) is dropped, matching SQL's
    ``WHERE lead(...) IS NOT NULL``.

    Shape mirrors ``rolling_sum_rows``: ONE range sort by (key, order, id),
    then lazy (start, stop) range tasks that fetch their covering sorted
    blocks plus a ONE-ROW halo AFTER the range, so every successor lookup is
    task-local and vectorized. Timestamp order columns normalize to
    MICROSECONDS so ``dt`` is unit-stable across source timestamp units."""
    import numpy as np
    import ray

    from ..util import _block_num_rows, chunked_ranges, coalesce_blocks

    def _norm(b: pa.Table) -> pa.Table:
        c = b.column(order_col)
        if pa.types.is_timestamp(c.type):
            b = b.set_column(
                b.column_names.index(order_col),
                order_col,
                c.cast(pa.timestamp("us")),
            )
        return b

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, val_col])
            .map_batches(_norm, batch_format="pyarrow")
            .materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())
    counts = ray.get([_block_num_rows.remote(r) for r in refs])
    refs = [r for r, c in zip(refs, counts) if c > 0]
    counts = [c for c in counts if c > 0]
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    total = int(offsets[-1])
    empty = pa.table(
        {
            key_col: pa.array([], pa.int64()),
            val_col: pa.array([], pa.int64()),
            "dt": pa.array([], pa.int64()),
        }
    )
    if total == 0:
        return rd.from_arrow(empty)
    ranges = chunked_ranges(offsets)
    range_ds = rd.from_arrow(
        pa.table(
            {
                "start": pa.array([a for a, _ in ranges], pa.int64()),
                "stop": pa.array([b for _, b in ranges], pa.int64()),
            }
        )
    )

    def _emit(batch: pa.Table, blk=refs, offs=offsets, tot=total) -> pa.Table:
        outs = [empty]
        for start, stop in zip(
            batch.column("start").to_pylist(), batch.column("stop").to_pylist()
        ):
            halo_stop = min(tot, stop + 1)
            b0 = int(np.searchsorted(offs, start, side="right") - 1)
            b1 = int(np.searchsorted(offs, halo_stop, side="left"))
            got = ray.get(blk[b0:b1])
            parts = []
            for bi, t in zip(range(b0, b1), got):
                lo = int(offs[bi])
                sl = max(start, lo) - lo
                ln = min(halo_stop, int(offs[bi + 1])) - max(start, lo)
                parts.append(t.slice(sl, ln))
            t = pa.concat_tables(parts)
            keys = t.column(key_col).to_numpy(zero_copy_only=False)
            o = t.column(order_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
            v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
            n_emit = stop - start  # rows this range owns (halo row excluded)
            has_next = np.zeros(n_emit, dtype=bool)
            upto = min(n_emit, len(keys) - 1)
            has_next[:upto] = keys[1 : upto + 1] == keys[:upto]
            dt = np.zeros(n_emit, dtype=np.int64)
            dt[:upto] = o[1 : upto + 1] - o[:upto]
            outs.append(
                pa.table(
                    {
                        key_col: pa.array(keys[:n_emit][has_next], pa.int64()),
                        val_col: pa.array(v[:n_emit][has_next], pa.int64()),
                        "dt": pa.array(dt[has_next], pa.int64()),
                    }
                )
            )
        return pa.concat_tables(outs)

    return range_ds.map_batches(_emit, batch_format="pyarrow", batch_size=1)


def last_touch_attribution(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    type_col: str,
    touch_types: list[str],
    target_type: str,
) -> pa.Table:
    """Last-touch attribution: each ``target_type`` row (e.g. a purchase) is
    credited to the most recent STRICTLY-PRECEDING ``touch_types`` row of the
    same key (ordered by (order, id)); targets with no prior touch credit
    'none'. Returns the tiny (touch, n) table.

    Shape: one range sort by (key, order, id); per-block scans forward-fill
    the last-seen touch code with key resets, block boundaries are stitched
    with the same (key, running-code) carry chain as ``per_key_window`` —
    single-row metadata per block, no second exchange. Per-block outputs are
    (|touch_types|+1)-sized count vectors folded on the driver."""
    import ray

    from ..util import coalesce_blocks

    code_of = {t: i + 1 for i, t in enumerate(touch_types)}
    tgt_code = -1

    def _encode(b: pa.Table) -> pa.Table:
        tl = b.column(type_col).to_pylist()
        c = np.array(
            [code_of.get(t, tgt_code if t == target_type else 0) for t in tl],
            dtype=np.int64,
        )
        return pa.table(
            {
                key_col: b.column(key_col).combine_chunks(),
                order_col: b.column(order_col).combine_chunks(),
                id_col: b.column(id_col).combine_chunks(),
                "c": pa.array(c, pa.int64()),
            }
        )

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, type_col])
            .map_batches(_encode, batch_format="pyarrow")
            .materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        last = k[-1]
        brk = np.nonzero(k != last)[0]
        start = int(brk[-1]) + 1 if brk.size else 0
        tail = c[start:]
        touch = tail[tail > 0]
        return {
            "first": k[0],
            "last": last,
            "tail_code": int(touch[-1]) if touch.size else 0,
            "whole": start == 0,
        }

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, summaries) if m is not None]
    summaries = [m for m in summaries if m is not None]

    carries: list[tuple | None] = []
    run_key, run_code = None, 0
    for m in summaries:
        carries.append(
            (run_key, run_code)
            if run_key is not None and m["first"] == run_key
            else None
        )
        if m["whole"] and m["last"] == run_key:
            run_code = m["tail_code"] if m["tail_code"] else run_code
        else:
            run_key, run_code = m["last"], m["tail_code"]

    nt = len(touch_types)

    @ray.remote(num_cpus=0.5)
    def _count(t: pa.Table, carry):
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        c = t.column("c").to_numpy(zero_copy_only=False)
        n = len(k)
        p = np.arange(n, dtype=np.int64)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(new_key) - 1
        seg_start = np.nonzero(new_key)[0][seg_id]
        touch_pos = np.where(c > 0, p, np.int64(-1))
        ff = np.maximum.accumulate(touch_pos)
        before = np.empty(n, dtype=np.int64)
        before[0] = -1
        before[1:] = ff[:-1]
        valid = before >= seg_start
        attr = np.where(valid, c[np.maximum(before, 0)], 0)
        cont = carry is not None and k[0] == carry[0]
        if cont and carry[1]:
            head = (seg_id == 0) & ~valid
            attr = np.where(head, carry[1], attr)
        tgt = c == tgt_code
        return np.bincount(attr[tgt], minlength=nt + 1)

    folds = ray.get([_count.remote(r, c) for r, c in zip(refs, carries)])
    total = np.zeros(nt + 1, dtype=np.int64)
    for f in folds:
        total += f
    labels = ["none"] + list(touch_types)
    keep = total > 0
    return pa.table(
        {
            "touch": pa.array([l for l, kp in zip(labels, keep) if kp], pa.string()),
            "purchases": pa.array(total[keep], pa.int64()),
        }
    )


def keyed_first_broadcast(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
) -> rd.Dataset:
    """(key, val, first_val): every row annotated with its key's MINIMUM
    value — the per-key ``min(...) OVER (PARTITION BY key)`` broadcast
    window (cohort assignment, first-seen stamping). One range sort by
    (key, val); per-block scans attach each run's first value, block
    boundaries stitched with a (key, first_val) carry — since the sort is by
    (key, val), a run's first value is simply its first row, and a run
    continuing from a previous block keeps that block's carry."""
    import ray

    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(ds.select_columns([key_col, val_col]).materialize())
        .sort([key_col, val_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col)
        v = t.column(val_col)
        return {"first": k[0].as_py(), "last": k[-1].as_py(), "fv": v[0].as_py()}

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, summaries) if m is not None]
    summaries = [m for m in summaries if m is not None]

    @ray.remote(num_cpus=0.25)
    def _tail_first(t: pa.Table):
        """First value of the block's TRAILING key run (the run that may
        continue into the next block)."""
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        last = k[-1]
        brk = np.nonzero(k != last)[0]
        start = int(brk[-1]) + 1 if brk.size else 0
        return int(v[start])

    tails = ray.get([_tail_first.remote(r) for r in refs])
    carries: list[tuple | None] = []
    run_key, run_fv = None, None
    for m, tf in zip(summaries, tails):
        carries.append(
            (run_key, run_fv)
            if run_key is not None and m["first"] == run_key
            else None
        )
        if m["last"] != run_key:
            # the trailing run STARTS in this block (keys are sorted, so a
            # block whose last key equals the running key is entirely that
            # key and leaves the carry unchanged)
            run_key, run_fv = m["last"], tf

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        n = len(k)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        seg_id = np.cumsum(new_key) - 1
        seg_start = np.nonzero(new_key)[0][seg_id]
        fv = v[seg_start].astype(np.int64, copy=True)
        if carry is not None and k[0] == carry[0] and carry[1] is not None:
            fv[seg_id == 0] = carry[1]
        return pa.table(
            {
                key_col: t.column(key_col).combine_chunks(),
                val_col: t.column(val_col).combine_chunks(),
                "first_val": pa.array(fv, pa.int64()),
            }
        )

    out_refs = [_scan.remote(r, c) for r, c in zip(refs, carries)]
    if not out_refs:
        return rd.from_arrow(
            pa.table(
                {
                    key_col: pa.array([], pa.int64()),
                    val_col: pa.array([], pa.int64()),
                    "first_val": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow_refs(out_refs)


def scd2_history(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    state_col: str,
) -> rd.Dataset:
    """SCD-type-2 history build: collapse each key's ordered state stream
    into validity intervals — one row per STATE CHANGE with
    ``valid_from = ts`` and ``valid_to = next change's ts`` (null while
    current). The lakehouse dimension-table primitive: an event log in,
    a versioned dimension out.

    Shape: ONE range sort by (key, order, id); per block a vectorized
    change-point mask (row differs from its predecessor's state within the
    same key) with a single (last_key, last_state) carry per boundary; then
    ``valid_to`` closes each interval from the NEXT change row — within the
    block a shift, across blocks a driver-chained (first_change_key,
    first_change_ts) forward halo, because all rows of a key are contiguous
    after the sort so the next change row globally is the same key's next
    change iff the keys match. No per-group UDF, one row of metadata per
    block in each direction."""
    import ray

    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, state_col]).materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        """(first_key, first_state, last_key, last_state, first_change_key,
        first_change_ts) — single rows of metadata."""
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        st = t.column(state_col).to_numpy(zero_copy_only=False)
        o = _i64(t.column(order_col))
        new = np.empty(len(k), dtype=bool)
        new[0] = True
        new[1:] = (k[1:] != k[:-1]) | (st[1:] != st[:-1])
        # the block-local mask is pessimistic for row 0 (fixed by the carry
        # at scan time); for the forward halo we need the first change row
        # ASSUMING row 0 continues the previous block — report row 0
        # separately so the driver can decide
        idx = np.nonzero(new)[0]
        return {
            "first_key": k[0],
            "first_state": st[0],
            "last_key": k[-1],
            "last_state": st[-1],
            "changes": [(k[i], st[i], int(o[i])) for i in idx[:2]],
        }

    sums = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, sums) if m is not None]
    sums = [m for m in sums if m is not None]
    n = len(refs)

    # backward pass: carry into each block = (prev_last_key, prev_last_state);
    # forward halo out of each block = first REAL change row at or after the
    # next block (key, ts), resolved in reverse block order
    prev_carry: list = [None] * n
    for b in range(1, n):
        prev_carry[b] = (sums[b - 1]["last_key"], sums[b - 1]["last_state"])

    def _first_real_change(b: int):
        """First change row of block b given its entry carry. changes[0] is
        always row 0 (the block-local mask is pessimistic there); it only
        counts when it differs from the carry — otherwise the second local
        change (if any) is the first real one."""
        carry = prev_carry[b]
        ch = sums[b]["changes"]
        row0_continues = (
            carry is not None
            and carry[0] == sums[b]["first_key"]
            and carry[1] == sums[b]["first_state"]
        )
        real = ch[1:] if row0_continues else ch
        return (real[0][0], real[0][2]) if real else None

    nxt: list = [None] * n
    after = None
    for b in range(n - 1, -1, -1):
        nxt[b] = after
        fc = _first_real_change(b)
        if fc is not None:
            after = fc

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry, halo) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        st = t.column(state_col).to_numpy(zero_copy_only=False)
        o = _i64(t.column(order_col))
        new = np.empty(len(k), dtype=bool)
        new[0] = (
            carry is None or carry[0] != k[0] or carry[1] != st[0]
        )
        new[1:] = (k[1:] != k[:-1]) | (st[1:] != st[:-1])
        idx = np.nonzero(new)[0]
        if len(idx) == 0:
            return pa.table(
                {
                    key_col: t.column(key_col).slice(0, 0),
                    "state": t.column(state_col).slice(0, 0),
                    "valid_from": pa.array([], pa.int64()),
                    "valid_to": pa.array([], pa.int64()),
                }
            )
        ck, cs, cts = k[idx], st[idx], o[idx]
        vt = np.empty(len(idx), dtype=np.float64)
        vt[:-1] = np.where(ck[1:] == ck[:-1], cts[1:], np.nan)
        if halo is not None and halo[0] == ck[-1]:
            vt[-1] = halo[1]
        else:
            vt[-1] = np.nan
        valid_to = pa.array(
            [None if np.isnan(x) else int(x) for x in vt], pa.int64()
        )
        return pa.table(
            {
                key_col: pa.array(ck),
                "state": pa.array(cs),
                "valid_from": pa.array(cts, pa.int64()),
                "valid_to": valid_to,
            }
        )

    out = [
        _scan.remote(refs[b], prev_carry[b], nxt[b]) for b in range(n)
    ]
    return rd.from_arrow_refs(out)


def ordered_concat_per_key(
    ds: rd.Dataset,
    key_col: str,
    order_cols: list[str],
    val_col: str,
    *,
    sep: str = "|",
    out_col: str = "path",
) -> rd.Dataset:
    """(key, concat(val, sep ORDER BY order_cols)) — the generalized
    ordered-string-agg (the `events_user_path` shape lifted to ANY key
    type): ONE range sort by (key, *order_cols); runs complete inside a
    block concatenate there; only each block's FIRST and LAST key runs ship
    to the driver (2 fragments/block, metadata-sized), where spanning keys
    merge in block order. Per-key output length is bounded by that key's
    row count — the documented hot-key caveat."""
    import ray

    from ..util import coalesce_blocks

    cols = list(dict.fromkeys([key_col] + list(order_cols) + [val_col]))
    s = (
        coalesce_blocks(ds.select_columns(cols).materialize())
        .sort([key_col] + list(order_cols))
        .materialize()
    )
    key_type = s.schema().base_schema.field(key_col).type
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _block(t: pa.Table, idx: int):
        if t.num_rows == 0:
            return None, []
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        vals = t.column(val_col).to_pylist()
        brk = (np.flatnonzero(k[1:] != k[:-1]) + 1).tolist()
        starts = [0] + brk
        ends = brk + [len(k)]
        frags = []
        inner_k, inner_v = [], []
        for i, (a, b) in enumerate(zip(starts, ends)):
            frag = sep.join(str(x) for x in vals[a:b])
            if i == 0 or i == len(starts) - 1:
                frags.append((k[a], frag, idx))
            else:
                inner_k.append(k[a])
                inner_v.append(frag)
        inner = pa.table(
            {key_col: pa.array(inner_k, key_type), out_col: pa.array(inner_v, pa.string())}
        ) if inner_k else None
        return inner, frags

    got = ray.get([_block.remote(r, i) for i, r in enumerate(refs)])
    inner_tables = [g[0] for g in got if g[0] is not None]
    frags = [f for g in got for f in g[1]]
    # merge boundary fragments in block order per key (same key is contiguous
    # across block boundaries after the global sort)
    merged: dict = {}
    for key, frag, idx in sorted(frags, key=lambda x: x[2]):
        merged[key] = merged[key] + sep + frag if key in merged else frag
    edge = pa.table(
        {
            key_col: pa.array(list(merged.keys()), key_type),
            out_col: pa.array(list(merged.values()), pa.string()),
        }
    )
    out = inner_tables + ([edge] if edge.num_rows else [])
    if not out:
        return rd.from_arrow(
            pa.table({key_col: pa.array([], key_type), out_col: pa.array([], pa.string())})
        )
    return rd.from_arrow_refs([ray.put(t) for t in out])


def per_key_prefix_max(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    val_col: str,
) -> rd.Dataset:
    """(key, order, prev_max): per-key running maximum of ``val_col`` over
    STRICTLY earlier rows in (key, order) order — the watermark primitive
    (`max(ts) OVER (PARTITION BY key ORDER BY o ROWS UNBOUNDED PRECEDING
    AND 1 PRECEDING)`). Null on each key's first row. One range sort,
    per-block numpy running max with key resets, driver-chained carries
    (per-block single-row summaries only)."""
    import ray

    from ..util import coalesce_blocks

    NEG = np.iinfo(np.int64).min
    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, val_col]).materialize()
        )
        .sort([key_col, order_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = _i64(t.column(val_col))
        last = k[-1]
        brk = np.nonzero(k != last)[0]
        start = int(brk[-1]) + 1 if brk.size else 0
        return {
            "first": k[0],
            "last": last,
            "max_last": int(v[start:].max()),
            "whole": start == 0,
        }

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, summaries) if m is not None]
    summaries = [m for m in summaries if m is not None]
    carries = []
    prev_key, cum = None, NEG
    for m in summaries:
        carry = cum if prev_key is not None and m["first"] == prev_key else NEG
        carries.append(carry)
        if m["whole"] and m["first"] == prev_key:
            cum = max(carry, m["max_last"])
        else:
            cum = m["max_last"]
        prev_key = m["last"]

    @ray.remote(num_cpus=0.5)
    def _stamp(t: pa.Table, carry: int) -> pa.Table:
        import pandas as pd

        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = _i64(t.column(val_col))
        n = len(k)
        new_seg = np.concatenate([[False], k[1:] != k[:-1]])
        seg = np.cumsum(new_seg.astype(np.int64))
        cummax = pd.Series(v).groupby(seg).cummax().to_numpy()
        prev = np.empty(n, np.int64)
        prev[0] = NEG
        prev[1:] = np.where(new_seg[1:], NEG, cummax[:-1])
        if carry != NEG:
            first_rows = seg == 0  # the block's first key-run
            prev[first_rows] = np.maximum(prev[first_rows], carry)
        mask = prev != NEG
        return pa.table(
            {
                key_col: t.column(key_col).combine_chunks(),
                order_col: t.column(order_col).combine_chunks(),
                "prev_max": pc.if_else(
                    pa.array(mask),
                    pa.array(np.where(mask, prev, 0), pa.int64()),
                    pa.scalar(None, pa.int64()),
                ),
            }
        )

    out = [_stamp.remote(refs[i], carries[i]) for i in range(len(refs))]
    if not out:
        return s
    return rd.from_arrow_refs(out)


def cusum_per_key(
    ds: rd.Dataset,
    key_col: str,
    order_col: str,
    id_col: str,
    val_col: str,
    *,
    threshold: int,
) -> rd.Dataset:
    """One-sided CUSUM drift detector per key: S_i = max(0, S_{i-1} + d_i)
    over rows ordered by (order, id), alarm when S_i > threshold — the
    classic sequential change detector, in exact integers (pre-scale
    ``val_col`` to deviations d_i).

    Scale shape: the reset-at-zero recurrence has the closed form
    S_i = RS_i − min(0, min_{j<=i} RS_j) (running sum minus running min
    of the prefix-sum path, empty prefix included), so it distributes
    exactly like `per_key_window`: ONE range sort, per-block vectorized
    cumsum + minimum.accumulate, and a carry chain shipping TWO scalars
    per block boundary (entering running sum, entering path minimum) —
    a sequential-looking detector with no sequential execution."""
    import ray

    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([key_col, order_col, id_col, val_col]).materialize()
        )
        .sort([key_col, order_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _summary(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = _i64(t.column(val_col))
        last = k[-1]
        brk = np.nonzero(k != last)[0]
        start = int(brk[-1]) + 1 if brk.size else 0
        rel = np.cumsum(v[start:])
        return {
            "first": k[0],
            "last": last,
            "sum_last": int(rel[-1]),
            "minpref_last": int(rel.min()),
            "whole": start == 0,
        }

    summaries = ray.get([_summary.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, summaries) if m is not None]
    summaries = [m for m in summaries if m is not None]

    carries: list[tuple | None] = []
    run_key, run_rs, run_mn = None, 0, 0
    for m in summaries:
        carries.append(
            (run_key, run_rs, run_mn)
            if run_key is not None and m["first"] == run_key
            else None
        )
        if m["whole"] and m["last"] == run_key:
            new_mn = min(run_mn, run_rs + m["minpref_last"])
            run_rs += m["sum_last"]
            run_mn = new_mn
        else:
            run_key = m["last"]
            run_rs = m["sum_last"]
            run_mn = min(0, m["minpref_last"])

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry) -> pa.Table:
        k = t.column(key_col).to_numpy(zero_copy_only=False)
        v = _i64(t.column(val_col))
        n = len(k)
        new_key = np.empty(n, dtype=bool)
        new_key[0] = True
        new_key[1:] = k[1:] != k[:-1]
        cont = carry is not None and k[0] == carry[0]
        seg_id = np.cumsum(new_key) - 1
        seg_starts = np.nonzero(new_key)[0]
        start_of_seg = seg_starts[seg_id]
        cv = np.cumsum(v)
        rs = cv - (cv[start_of_seg] - v[start_of_seg])  # per-segment RS
        rs_in = np.zeros(n, np.int64)
        mn_in = np.zeros(n, np.int64)  # fresh keys: min includes RS_0 = 0
        if cont:
            head = seg_id == 0
            rs_in[head] = carry[1]
            mn_in[head] = carry[2]
        rs_g = rs + rs_in
        # segmented running min of the RS path: segments are contiguous
        # after the sort, so a bounded per-segment loop (keys per block)
        # over vectorized minimum.accumulate is the simple exact form
        mn_path = np.empty(n, np.int64)
        seg_ends = np.append(seg_starts[1:], n)
        for st, en in zip(seg_starts, seg_ends):
            mn_path[st:en] = np.minimum.accumulate(rs_g[st:en])
        s_val = rs_g - np.minimum(mn_in, mn_path)
        return pa.table(
            {
                id_col: t.column(id_col),
                key_col: t.column(key_col),
                "s": pa.array(s_val, pa.int64()),
                "alarm": pa.array((s_val > threshold).astype(np.int64)),
            }
        )

    out = [_scan.remote(r, c) for r, c in zip(refs, carries)]
    tables = [t for t in ray.get(out) if t.num_rows]
    return rd.from_arrow(pa.concat_tables(tables))


def ohlc_bars(
    ds: rd.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    *,
    bucket_us: int = 3_600_000_000,
) -> rd.Dataset:
    """OHLC candlestick bars per (key, tumbling bucket): open/close = the
    value at the bucket's first/last timestamp, high/low = max/min, n =
    count. Values ride in exact integer cents; (key, ts) pairs must be
    unique within a bucket (true for event streams with per-key-unique
    timestamps — ties would make open/close ill-defined in ANY engine).

    Scale shape: one `fold_per_key` at bar cardinality computes
    low/high/n/t_open/t_close; open and close values are then fetched with
    two hash joins of the narrow (bar|ts -> cents) stream against the
    materialized bar table — joins at BAR cardinality, the event stream
    never gathers. (A sort-based first/last scan would do it in one pass;
    the fold+join shape reuses the engine's exact-fold primitives and its
    shuffle volume is 2x the narrow stream, not the table.)"""
    from ..util import fold_per_key, hash_join

    SEP = "\x1f"

    def _narrow(b: pa.Table) -> pa.Table:
        ts_us = pc.cast(b.column(ts_col), pa.int64())
        bucket = pc.multiply(
            pc.floor(pc.divide(pc.cast(ts_us, pa.float64()), float(bucket_us))),
            float(bucket_us),
        )
        bucket = pc.cast(bucket, pa.int64())
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column(value_col), 100.0), 0.5)),
            pa.int64(),
        )
        bar = pc.binary_join_element_wise(
            pc.cast(b.column(key_col), pa.string()),
            pc.cast(bucket, pa.string()),
            SEP,
        )
        return pa.table(
            {
                "bar": bar.combine_chunks(),
                "ts_us": ts_us.combine_chunks()
                if isinstance(ts_us, pa.ChunkedArray)
                else ts_us,
                "cents": cents,
            }
        )

    narrow = ds.map_batches(_narrow, batch_format="pyarrow").materialize()
    bars = fold_per_key(
        narrow,
        "bar",
        {
            "low": ("min", "cents"),
            "high": ("max", "cents"),
            "t0": ("min", "ts_us"),
            "t1": ("max", "ts_us"),
            "n": ("count", None),
        },
    ).materialize()

    def _probe(col: str):
        def _fn(b: pa.Table) -> pa.Table:
            if "k2" in b.column_names:
                b = b.drop_columns(["k2"])
            k2 = pc.binary_join_element_wise(
                b.column("bar").combine_chunks(),
                pc.cast(b.column(col), pa.string()),
                SEP,
            )
            return b.append_column("k2", k2)

        return _fn

    ev_keyed = narrow.map_batches(
        lambda b: pa.table(
            {
                "k2": pc.binary_join_element_wise(
                    b.column("bar").combine_chunks(),
                    pc.cast(b.column("ts_us"), pa.string()),
                    SEP,
                ),
                "cents": b.column("cents").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    opened = hash_join(
        bars.map_batches(_probe("t0"), batch_format="pyarrow").materialize(),
        ev_keyed.map_batches(
            lambda b: b.rename_columns(["k2", "open_c"]), batch_format="pyarrow"
        ).materialize(),
        on="k2",
        join_type="inner",
    ).materialize()
    closed = hash_join(
        opened.map_batches(_probe("t1"), batch_format="pyarrow").materialize(),
        ev_keyed.map_batches(
            lambda b: b.rename_columns(["k2", "close_c"]), batch_format="pyarrow"
        ).materialize(),
        on="k2",
        join_type="inner",
    )

    def _final(b: pa.Table) -> pa.Table:
        parts = pc.split_pattern(b.column("bar").combine_chunks(), SEP)
        key = pc.list_element(parts, 0)
        bucket_us_col = pc.cast(pc.list_element(parts, 1), pa.int64())
        return pa.table(
            {
                key_col: pc.cast(key, pa.int64()),
                "bucket": pc.cast(bucket_us_col, pa.timestamp("us")),
                "open_c": pc.cast(b.column("open_c"), pa.int64()).combine_chunks(),
                "high_c": pc.cast(b.column("high"), pa.int64()).combine_chunks(),
                "low_c": pc.cast(b.column("low"), pa.int64()).combine_chunks(),
                "close_c": pc.cast(b.column("close_c"), pa.int64()).combine_chunks(),
                "n": pc.cast(b.column("n"), pa.int64()).combine_chunks(),
            }
        )

    return closed.map_batches(_final, batch_format="pyarrow")
