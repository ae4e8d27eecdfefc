"""Ordered-step funnel analysis over an event stream (the product-analytics
staple: how many users did A, then B strictly after A, then C strictly after
B).

Shape (no Ray groupby at any cardinality):

1. prune to the funnel's event types and melt to a composite int64 key
   ``user * S + step_idx`` with the event timestamp as value (S = number of
   steps) — one narrow (key, ts) stream;
2. ``util.min_per_key`` reduces it to each user's FIRST occurrence per step
   (one range sort over 16 B rows; corpus text/props never move);
3. the sorted first-occurrence stream has all of a user's ≤S rows adjacent,
   so per-block tasks count funnel completions for users fully INSIDE their
   block and emit only their head/tail boundary users' rows (≤2 users per
   block) to the driver, which folds the boundary users — the same
   edges-only discipline as ``util.combine_sorted_partials``.

Work: one narrow sort + one metadata-sized driver fold. The step count is
what a funnel query fixes (3-10), never data-sized.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import min_per_key

_TS_SENTINEL = np.iinfo(np.int64).max


def _count_complete(ts_by_step: np.ndarray) -> np.ndarray:
    """Given a (U, S) matrix of first-occurrence timestamps (sentinel = never
    did the step), return the S cumulative funnel counts: users whose step-i
    time strictly follows step-(i-1)."""
    u, s = ts_by_step.shape
    out = np.zeros(s, dtype=np.int64)
    if u == 0:
        return out
    alive = ts_by_step[:, 0] < _TS_SENTINEL
    out[0] = int(alive.sum())
    for i in range(1, s):
        alive = alive & (ts_by_step[:, i] < _TS_SENTINEL) & (
            ts_by_step[:, i] > ts_by_step[:, i - 1]
        )
        out[i] = int(alive.sum())
    return out


def _pivot(keys: np.ndarray, ts: np.ndarray, n_steps: int) -> np.ndarray:
    """Pivot sorted (user*S+step, ts) rows to a (U, S) timestamp matrix."""
    users = keys // n_steps
    steps = keys % n_steps
    uniq, inv = np.unique(users, return_inverse=True)
    m = np.full((len(uniq), n_steps), _TS_SENTINEL, dtype=np.int64)
    m[inv, steps] = ts
    return m


def funnel_steps(
    events: rd.Dataset,
    steps: list[str],
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pa.Table:
    """Returns a (step, users) table: users reaching each funnel step in
    strict timestamp order. Timestamp ties between consecutive steps do NOT
    advance the funnel (strict ``>``), which keeps the result deterministic
    and SQL-replicable."""
    n_steps = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def _melt(batch: pa.Table) -> pa.Table:
        t = batch.column(type_col)
        mask = pc.is_in(t, value_set=pa.array(steps))
        b = batch.filter(mask)
        if b.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64())}
            )
        u = b.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if u.max(initial=0) >= (1 << 62) // n_steps or u.min(initial=0) < 0:
            raise ValueError(
                f"{user_col} magnitude exceeds the composite-key bound "
                f"2^62/{n_steps}; pre-densify user ids before funnel_steps"
            )
        si = np.array(
            [step_idx[x] for x in b.column(type_col).to_pylist()], dtype=np.int64
        )
        ts = b.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(u * n_steps + si, pa.int64()),
                "ts": pa.array(ts, pa.int64()),
            }
        )

    firsts = min_per_key(
        events.select_columns([user_col, type_col, ts_col]).map_batches(
            _melt, batch_format="pyarrow"
        ),
        "k",
        "ts",
    ).materialize()

    @ray.remote(num_cpus=0.5)
    def _block_fold(t: pa.Table, ns: int):
        """Counts for users fully inside this block + the head/tail users'
        raw rows (the only rows that can span a block boundary)."""
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return np.zeros(ns, dtype=np.int64), np.empty((0, 2), np.int64)
        users = k // ns
        head_u, tail_u = users[0], users[-1]
        edge = (users == head_u) | (users == tail_u)
        interior = ~edge
        counts = _count_complete(_pivot(k[interior], ts[interior], ns))
        return counts, np.stack([k[edge], ts[edge]], axis=1)

    refs = [r for r in firsts.to_arrow_refs()]
    folds = ray.get([_block_fold.remote(r, n_steps) for r in refs])
    total = np.zeros(n_steps, dtype=np.int64)
    edge_rows = []
    for counts, edges in folds:
        total += counts
        edge_rows.append(edges)
    edges = (
        np.concatenate(edge_rows) if edge_rows else np.empty((0, 2), np.int64)
    )
    if len(edges):
        order = np.argsort(edges[:, 0], kind="stable")
        total += _count_complete(
            _pivot(edges[order, 0], edges[order, 1], n_steps)
        )
    return pa.table(
        {
            "step": pa.array(steps, pa.string()),
            "users": pa.array(total, pa.int64()),
        }
    )


def _solve_windowed(
    k: np.ndarray, ts: np.ndarray, n_steps: int, horizon: int
) -> np.ndarray:
    """Greedy windowed-funnel counts over (user*S+step, ts) rows SORTED by
    (k, ts): t0 = user's first step-0 event; t_i = first step-i event with
    t_{i-1} < t <= t_{i-1} + horizon. Fully vectorized: per-(user,step) runs
    are contiguous, so step-0 firsts are run heads and each later step is a
    masked ``np.minimum.reduceat`` over its runs."""
    out = np.zeros(n_steps, dtype=np.int64)
    if len(k) == 0:
        return out
    users = k // n_steps
    steps = k % n_steps
    uniq = np.unique(users)
    inv = np.searchsorted(uniq, users)
    newrun = np.empty(len(k), dtype=bool)
    newrun[0] = True
    newrun[1:] = k[1:] != k[:-1]
    run_start = np.nonzero(newrun)[0]
    run_user = np.searchsorted(uniq, k[run_start] // n_steps)
    run_step = k[run_start] % n_steps
    # sentinel low enough that SENT + horizon cannot overflow int64
    sent = (1 << 62)
    t = np.full((len(uniq), n_steps), sent, dtype=np.int64)
    m0 = run_step == 0
    t[run_user[m0], 0] = ts[run_start[m0]]
    out[0] = int((t[:, 0] < sent).sum())
    for i in range(1, n_steps):
        tp = t[inv, i - 1]
        ok = (steps == i) & (ts > tp) & (ts <= tp + horizon)
        masked = np.where(ok, ts, sent)
        mins = np.minimum.reduceat(masked, run_start)
        mi = run_step == i
        t[run_user[mi], i] = mins[mi]
        out[i] = int((t[:, i] < sent).sum())
    return out


def _ts_us(col: pa.ChunkedArray | pa.Array) -> pa.ChunkedArray | pa.Array:
    """Timestamps normalize to MICROSECONDS before the int64 view so horizon
    arithmetic is unit-stable regardless of the source's timestamp unit
    (parquet is us; pandas-built tables are ns)."""
    if pa.types.is_timestamp(col.type):
        col = col.cast(pa.timestamp("us"))
    return col.cast(pa.int64())


def funnel_steps_windowed(
    events: rd.Dataset,
    steps: list[str],
    horizon_us: int,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pa.Table:
    """Greedy windowed funnel: users must reach each step within
    ``horizon_us`` of the previous step's matched event (conversion-window
    semantics — the unwindowed ``funnel_steps`` compares global firsts).
    Unlike the firsts-only funnel, the greedy match needs every step event,
    so the narrow (user*S+step, ts) stream sorts WITHOUT the min_per_key
    reduction; per-block solves cover interior users and boundary users'
    rows fold on the driver (<= 2 users per block)."""
    import ray

    from ..util import coalesce_blocks

    n_steps = len(steps)
    step_idx = {s: i for i, s in enumerate(steps)}

    def _melt(batch: pa.Table) -> pa.Table:
        t = batch.column(type_col)
        mask = pc.is_in(t, value_set=pa.array(steps))
        b = batch.filter(mask)
        if b.num_rows == 0:
            return pa.table(
                {"k": pa.array([], pa.int64()), "ts": pa.array([], pa.int64())}
            )
        u = b.column(user_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if u.max(initial=0) >= (1 << 61) // n_steps or u.min(initial=0) < 0:
            raise ValueError(
                f"{user_col} magnitude exceeds the composite-key bound"
            )
        si = np.array(
            [step_idx[x] for x in b.column(type_col).to_pylist()], dtype=np.int64
        )
        tsv = _ts_us(b.column(ts_col)).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(u * n_steps + si, pa.int64()),
                "ts": pa.array(tsv, pa.int64()),
            }
        )

    s = (
        coalesce_blocks(
            events.select_columns([user_col, type_col, ts_col])
            .map_batches(_melt, batch_format="pyarrow")
            .materialize()
        )
        .sort(["k", "ts"])
        .materialize()
    )

    @ray.remote(num_cpus=0.5)
    def _block_fold(t: pa.Table, ns: int, hz: int):
        k = t.column("k").to_numpy(zero_copy_only=False)
        ts = t.column("ts").to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return np.zeros(ns, dtype=np.int64), np.empty((0, 2), np.int64)
        users = k // ns
        head_u, tail_u = users[0], users[-1]
        edge = (users == head_u) | (users == tail_u)
        interior = ~edge
        counts = _solve_windowed(k[interior], ts[interior], ns, hz)
        return counts, np.stack([k[edge], ts[edge]], axis=1)

    refs = [r for r in s.to_arrow_refs()]
    folds = ray.get([_block_fold.remote(r, n_steps, horizon_us) for r in refs])
    total = np.zeros(n_steps, dtype=np.int64)
    edge_rows = []
    for counts, edges in folds:
        total += counts
        edge_rows.append(edges)
    edges = (
        np.concatenate(edge_rows) if edge_rows else np.empty((0, 2), np.int64)
    )
    if len(edges):
        order = np.lexsort((edges[:, 1], edges[:, 0]))
        total += _solve_windowed(
            edges[order, 0], edges[order, 1], n_steps, horizon_us
        )
    return pa.table(
        {
            "step": pa.array(steps, pa.string()),
            "users": pa.array(total, pa.int64()),
        }
    )
