"""Column statistics operators — exact quantiles, distinct counts (exact +
HLL sketch), heavy hitters — built on the engine's no-per-group-cost
primitives:

- exact quantiles: the narrow (value, id) range sort already powering
  generalization (``util.sorted_column``) + point lookups at the quantile
  ranks — never a full materialization
- exact distinct count: per-block dedup + range sort + boundary scan
  (``util.min_per_key``) — Ray's groupby pays per-GROUP Python cost at high
  cardinality, the sort path does not
- HyperLogLog: per-batch register maxima (vectorized hash + leading-zero
  count), merged by elementwise max — the classic sketch for beyond-memory
  cardinalities (Flajolet et al., 2007)
- heavy hitters: Arrow-native per-block partial counts (C group_by, no Ray
  per-group cost), exact per-value totals via range sort + boundary-carry
  segment sums (``util.combine_sorted_partials``), then a tiny top-k sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import combine_sorted_partials, min_per_key, sorted_column


def exact_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], *, id_col: str | None = None
) -> pa.Table:
    """Exact discrete quantiles (DuckDB ``quantile_disc`` semantics: the
    element at rank ceil(q*n)-1 of the sorted non-null values)."""
    if id_col is None:
        ds = ds.map_batches(
            lambda b: pa.table(
                {col: b.column(col).combine_chunks(), "_qid": b.column(col).combine_chunks()}
            ),
            batch_format="pyarrow",
        )
        id_col = "_qid"
    sc = sorted_column(ds, col, id_col, lambda a: a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a)
    k = sc.total
    if k == 0:
        return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.nulls(len(qs))})
    ranks = [min(k - 1, max(0, int(np.ceil(q * k)) - 1)) for q in qs]
    t = sc.rows_at_ranks(ranks)
    vals = t.column(col)
    uniq = sorted(set(ranks))
    pos = {r: i for i, r in enumerate(uniq)}
    out = [vals[pos[r]].as_py() for r in ranks]
    return pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(out)})


def count_distinct_exact(ds: rd.Dataset, col: str) -> int:
    """Exact #distinct without a groupby: per-block dedup, then range sort +
    boundary scan keeps one row per value."""
    local = ds.map_batches(
        lambda b: pa.Table.from_arrays(
            [pc.unique(b.column(col))], names=[col]
        ).append_column("_one", pa.array([1] * len(pc.unique(b.column(col))), pa.int8())),
        batch_format="pyarrow",
    )
    return min_per_key(local, col, "_one").count()


def hll_count_distinct(ds: rd.Dataset, col: str, *, p: int = 12) -> int:
    """HyperLogLog estimate with 2^p registers; per-batch vectorized
    register maxima, merged by max (order/partitioning independent)."""
    m = 1 << p

    def _regs(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals.astype(object)).astype(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        # vectorized count-leading-zeros (branchless binary search; rest > 0
        # by construction), rho = clz + 1
        clz = np.zeros(len(h), dtype=np.uint64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            clz = np.where(mask, clz + np.uint64(shift), clz)
            x = np.where(mask, x << np.uint64(shift), x)
        rho = clz.astype(np.int64) + 1
        regs = np.zeros(m, dtype=np.int8)
        np.maximum.at(regs, idx, rho.astype(np.int8))
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(_regs, batch_format="pyarrow")

    merged = np.zeros(m, dtype=np.int8)
    for b in parts.iter_batches(batch_format="pyarrow"):
        for payload in b.column("regs").to_pylist():
            merged = np.maximum(merged, np.frombuffer(payload, dtype=np.int8))

    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-merged.astype(np.float64)))
    zeros = int((merged == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # small-range correction
    return int(round(est))


def exact_value_counts(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Exact per-value counts at ANY cardinality without a Ray groupby:
    Arrow-native per-block partial counts (C group_by), one range sort of
    the narrow (value, partial) stream, per-block segment sums, boundary
    carries (``util.combine_sorted_partials``). Returns Dataset[(col, n)]."""

    def _partial(batch: pa.Table) -> pa.Table:
        g = pa.table({col: batch.column(col).combine_chunks()}).group_by([col]).aggregate(
            [([], "count_all")]
        )
        return g.rename_columns([col, "n"])

    partials = ds.map_batches(_partial, batch_format="pyarrow").materialize()
    s = partials.sort([col]).materialize()
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.5)
    def _segsum(t: pa.Table):
        # empty join/shuffle partitions can surface as ZERO-COLUMN empty
        # blocks (schema lost on empty concat) — drop them here; the
        # boundary-carry combine skips None refs
        if t.num_rows == 0 or col not in t.column_names:
            return None
        g = t.group_by([col]).aggregate([("n", "sum")])
        return g.select([col, "n_sum"]).rename_columns([col, "n"])

    seg_refs = [_segsum.remote(r) for r in refs]
    return combine_sorted_partials(seg_refs, col, "n")


def heavy_hitters(ds: rd.Dataset, col: str, k: int = 10) -> rd.Dataset:
    """Exact top-k values by count, deterministic ties (count desc, value
    asc)."""
    return exact_value_counts(ds, col).sort(["n", col], descending=[True, False]).limit(k)


def group_quantiles(
    ds: rd.Dataset, key_col: str, val_col: str, qs: list[float]
) -> rd.Dataset:
    """Exact per-key discrete quantiles (DuckDB ``quantile_disc``: element at
    rank ceil(q*n)-1 of each key's sorted non-null values) WITHOUT a
    per-group UDF — the output stays distributed, so this works at any key
    cardinality (per-key quantile output is itself key-sized).

    Shape: one range sort by (key, val); every key wholly inside a block is
    solved there with one vectorized np.unique + fancy-index pass; the few
    keys that SPAN block boundaries (at most 2 per block, identified from
    single-row edge metadata on the driver) are re-gathered — only their
    rows — into one small task. Skew caveat (documented): a single key's run
    must fit one task's memory, the same bound any exact grouped quantile
    has."""
    from ..util import coalesce_blocks

    qarr = np.asarray(sorted(qs), dtype=np.float64)

    def _narrow(b: pa.Table) -> pa.Table:
        t = b.select([key_col, val_col])
        return t.filter(valid_mask_np(t.column(val_col)))

    def valid_mask_np(arr):
        m = pc.is_valid(arr)
        if pa.types.is_floating(arr.type):
            m = pc.and_(m, pc.invert(pc.is_nan(arr)))
        return m

    s = (
        coalesce_blocks(ds.map_batches(_narrow, batch_format="pyarrow").materialize())
        .sort([key_col, val_col])
        .materialize()
    )
    refs = s.to_arrow_refs()

    @ray.remote(num_cpus=0.25)
    def _edge_keys(t: pa.Table):
        if t.num_rows == 0:
            return None
        k = t.column(key_col)
        return k[0].as_py(), k[-1].as_py()

    edges = ray.get([_edge_keys.remote(r) for r in refs])
    refs = [r for r, e in zip(refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    spanning: set = set()
    for i in range(len(refs) - 1):
        if edges[i][1] == edges[i + 1][0]:
            spanning.add(edges[i][1])
    span_list = sorted(spanning)

    def _solve(keys: np.ndarray, vals: pa.Array) -> pa.Table:
        """keys sorted; emit (key, q, value) for every key, vectorized."""
        uniq, starts, counts = np.unique(keys, return_index=True, return_counts=True)
        nq = len(qarr)
        # rank ceil(q*n)-1 clamped to [0, n-1], per (key, q)
        n_rep = np.repeat(counts, nq)
        ranks = np.ceil(np.tile(qarr, len(uniq)) * n_rep).astype(np.int64) - 1
        ranks = np.clip(ranks, 0, n_rep - 1)
        idx = np.repeat(starts, nq) + ranks
        return pa.table(
            {
                key_col: pa.array(np.repeat(uniq, nq)),
                "q": pa.array(np.tile(qarr, len(uniq)), pa.float64()),
                "value": vals.take(pa.array(idx, pa.int64())),
            }
        )

    @ray.remote(num_cpus=0.5)
    def _inner(t: pa.Table, span) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        keep = ~np.isin(keys, span) if len(span) else np.ones(len(keys), bool)
        tt = t.filter(pa.array(keep))
        if tt.num_rows == 0:
            return pa.table(
                {
                    key_col: pa.array([], t.column(key_col).type),
                    "q": pa.array([], pa.float64()),
                    "value": pa.array([], t.column(val_col).type),
                }
            )
        return _solve(
            tt.column(key_col).to_numpy(zero_copy_only=False),
            tt.column(val_col).combine_chunks(),
        )

    @ray.remote(num_cpus=0.5)
    def _boundary(span, *tables) -> pa.Table:
        parts = [
            t.filter(pc.is_in(t.column(key_col), value_set=pa.array(span)))
            for t in tables
        ]
        t = pa.concat_tables([p for p in parts if p.num_rows])
        return _solve(
            t.column(key_col).to_numpy(zero_copy_only=False),
            t.column(val_col).combine_chunks(),
        )

    out_refs = [_inner.remote(r, np.asarray(span_list)) for r in refs]
    if span_list:
        # only blocks whose edge range touches a spanning key hold its rows
        touching = [
            r
            for r, e in zip(refs, edges)
            if any(e[0] <= sk <= e[1] for sk in span_list)
        ]
        out_refs.append(_boundary.remote(span_list, *touching))
    return rd.from_arrow_refs(out_refs)


def cms_sketch(
    ds: rd.Dataset, col: str, *, w: int = 2048, d: int = 4, salt: int = 1000
) -> np.ndarray:
    """Count-Min sketch of an int64 column: a d x w int64 counter matrix
    where row i counts occurrences under hash h_i(x) = sm64(x, salt+i) % w.
    Point estimate = min over rows (never underestimates; overestimate is
    bounded by collision mass ~ e*N/w per the CM guarantee).

    Scale shape: the sketch is MERGEABLE, so each batch emits only its
    NONZERO (slot, count) pairs (slot = i*w + h_i, a key space bounded by
    d*w regardless of input size), the merge is one ``sum_per_key``
    sort+boundary-scan over that bounded key space, and the <= d*w result
    rows gather to the driver — the input column streams once and never
    shuffles. Deterministic (fixed SplitMix64 hashes): same matrix at any
    parallelism."""
    from .graph import sum_per_key
    from .shuffle import sm64_key

    def _partial(b: pa.Table) -> pa.Table:
        x = b.column(col).to_numpy(zero_copy_only=False).astype(np.int64)
        slots = np.concatenate(
            [
                (sm64_key(x, salt + i) % np.uint64(w)).astype(np.int64) + i * w
                for i in range(d)
            ]
        ) if len(x) else np.empty(0, np.int64)
        u, c = np.unique(slots, return_counts=True)
        return pa.table(
            {"slot": pa.array(u, pa.int64()), "c": pa.array(c, pa.int64())}
        )

    agg = sum_per_key(ds.map_batches(_partial, batch_format="pyarrow"), "slot", "c")
    mat = np.zeros(d * w, np.int64)
    for t in ray.get(agg.materialize().to_arrow_refs()):
        if t.num_rows == 0 or "slot" not in t.column_names:
            continue
        mat[t.column("slot").to_numpy(zero_copy_only=False)] = t.column(
            "c"
        ).to_numpy(zero_copy_only=False)
    return mat.reshape(d, w)


def cms_estimate(
    mat: np.ndarray, keys: np.ndarray, *, salt: int = 1000
) -> np.ndarray:
    """Point-estimate counts for ``keys`` from a :func:`cms_sketch` matrix:
    min over the d rows' hashed slots (vectorized)."""
    from .shuffle import sm64_key

    d, w = mat.shape
    keys = np.asarray(keys, np.int64)
    ests = np.stack(
        [
            mat[i][(sm64_key(keys, salt + i) % np.uint64(w)).astype(np.int64)]
            for i in range(d)
        ]
    )
    return ests.min(axis=0)


def ols_simple(
    ds: rd.Dataset, x_col: str, y_col: str
) -> "pa.Table":
    """Simple linear regression y ~ a + b*x in ONE streaming pass with EXACT
    integer moment sums: each block emits a single partial-sums row
    (n, sx, sy, sxx, syy, sxy) as int64; the driver folds partials in
    arbitrary-precision Python ints, so the only floating-point steps are
    the final slope / intercept / r2 divisions — each a single-rounded
    expression over exactly-represented integers, reproducible bit-for-bit
    by the same HUGEINT->DOUBLE expression tree in SQL.

    Inputs must be pre-floored integers (the caller scales/floors floats);
    rows where either side is null are dropped (SQL regr_* semantics).
    Overflow bound: per-block int64 sums require |x|,|y| and block length
    such that sum(y^2) < 2^63 per block — pre-scale or shrink blocks beyond
    that (the driver fold itself cannot overflow)."""

    def _partial(b: pa.Table) -> pa.Table:
        x = b.column(x_col)
        y = b.column(y_col)
        ok = pc.and_(pc.is_valid(x), pc.is_valid(y))
        xv = pc.cast(x, pa.int64()).filter(ok).to_numpy(zero_copy_only=False)
        yv = pc.cast(y, pa.int64()).filter(ok).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n": pa.array([len(xv)], pa.int64()),
                "sx": pa.array([int(xv.sum())], pa.int64()),
                "sy": pa.array([int(yv.sum())], pa.int64()),
                "sxx": pa.array([int((xv * xv).sum())], pa.int64()),
                "syy": pa.array([int((yv * yv).sum())], pa.int64()),
                "sxy": pa.array([int((xv * yv).sum())], pa.int64()),
            }
        )

    parts = ds.select_columns([x_col, y_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).take_all()  # bounded: one row per block
    n = sum(int(p["n"]) for p in parts)
    sx = sum(int(p["sx"]) for p in parts)
    sy = sum(int(p["sy"]) for p in parts)
    sxx = sum(int(p["sxx"]) for p in parts)
    syy = sum(int(p["syy"]) for p in parts)
    sxy = sum(int(p["sxy"]) for p in parts)

    # exact integer numerators/denominators; float only at the last step,
    # with the same expression tree as the SQL oracle
    slope_num = n * sxy - sx * sy
    slope_den = n * sxx - sx * sx
    yy_den = n * syy - sy * sy
    slope = float(slope_num) / float(slope_den)
    intercept = (float(sy) - slope * float(sx)) / float(n)
    r2 = (float(slope_num) / float(slope_den)) * (float(slope_num) / float(yy_den))
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "sx": pa.array([sx], pa.int64()),
            "sy": pa.array([sy], pa.int64()),
            "slope": pa.array([slope], pa.float64()),
            "intercept": pa.array([intercept], pa.float64()),
            "r2": pa.array([r2], pa.float64()),
        }
    )


def group_hll_distinct(
    ds: rd.Dataset, col: str, group_col: str, *, p: int = 12
) -> dict:
    """Per-group HyperLogLog distinct estimates (``hll_count_distinct``'s
    grouped sibling): each batch emits one (group, registers) row per group
    it touches — registers built with the same vectorized branchless-clz
    kernel via a (groups x m) ``np.maximum.at`` scatter — and the driver
    folds register maxima per group. The GROUP DOMAIN (not the data) must
    be small-categorical: the driver gather is bounded by blocks x groups,
    the same contract as t-closeness's N_v broadcast. Returns
    {group: estimate}."""
    import pandas as pd

    m = 1 << p

    def _regs(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_numpy(zero_copy_only=False)
        grp = batch.column(group_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(vals.astype(object)).astype(np.uint64)
        idx = (h >> np.uint64(64 - p)).astype(np.int64)
        rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)
        clz = np.zeros(len(h), dtype=np.uint64)
        x = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = x < (np.uint64(1) << np.uint64(64 - shift))
            clz = np.where(mask, clz + np.uint64(shift), clz)
            x = np.where(mask, x << np.uint64(shift), x)
        rho = clz.astype(np.int64) + 1
        codes, uniq = pd.factorize(grp)
        regs = np.zeros((len(uniq), m), dtype=np.int8)
        np.maximum.at(regs, (codes, idx), rho.astype(np.int8))
        return pa.table(
            {
                "grp": pa.array([str(u) for u in uniq], pa.string()),
                "regs": pa.array([regs[g].tobytes() for g in range(len(uniq))], pa.binary()),
            }
        )

    parts = ds.select_columns([group_col, col]).map_batches(
        _regs, batch_format="pyarrow"
    )
    merged: dict[str, np.ndarray] = {}
    for b in parts.iter_batches(batch_format="pyarrow"):
        for g, payload in zip(b.column("grp").to_pylist(), b.column("regs").to_pylist()):
            r = np.frombuffer(payload, dtype=np.int8)
            if g in merged:
                merged[g] = np.maximum(merged[g], r)
            else:
                merged[g] = r

    alpha = 0.7213 / (1 + 1.079 / m)
    out = {}
    for g, regs in merged.items():
        est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
        zeros = int((regs == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)
        out[g] = int(round(est))
    return out


def rank_sketch_quantiles(
    ds: rd.Dataset, col: str, qs: list[float], *, eps: float = 0.005
) -> tuple[pa.Table, int, int]:
    """Mergeable deterministic eps-rank quantile summary — the SCALE path
    for quantiles (``exact_quantiles`` pays a full range sort; this is one
    streaming pass + a driver merge of tiny per-block summaries, the same
    shape as the HLL sketch above).

    Per block: sort locally, keep every ``stride``-th value with weight
    ``stride`` (stride = floor(eps * block_n), so the block summary is
    <= 1/eps rows regardless of block size) plus the block max carrying the
    remainder weight. Weighted rank error is < stride per block, so the
    merged summary answers any rank query within ``eps * N + B`` ranks
    (B = #blocks, from the floor). Deterministic — no sampling — so the
    error bound is an invariant, not an expectation, and the scoreboard
    oracle can gate on it exactly.

    Returns (table[q, value], total_n, n_blocks).
    """

    def _summary(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        if np.issubdtype(v.dtype, np.floating):
            v = v[~np.isnan(v)]
        n = len(v)
        if n == 0:
            return pa.table(
                {
                    "value": pa.array([], pa.float64()),
                    "w": pa.array([], pa.int64()),
                    "blk": pa.array([], pa.int64()),
                }
            )
        v = np.sort(v.astype(np.float64))
        stride = max(1, int(np.floor(eps * n)))
        idx = np.arange(stride - 1, n, stride)
        w = np.full(len(idx), stride, dtype=np.int64)
        rem = n - stride * len(idx)
        if rem > 0:
            idx = np.append(idx, n - 1)
            w = np.append(w, rem)
        return pa.table(
            {
                "value": pa.array(v[idx], pa.float64()),
                "w": pa.array(w, pa.int64()),
                "blk": pa.array([1] + [0] * (len(idx) - 1), pa.int64()),
            }
        )

    parts = (
        ds.select_columns([col])
        .map_batches(_summary, batch_format="pyarrow")
        .take_all()
    )  # bounded: <= (1/eps + 1) rows per block
    if not parts:
        return (
            pa.table({"q": pa.array(qs, pa.float64()), "value": pa.nulls(len(qs))}),
            0,
            0,
        )
    vals = np.array([r["value"] for r in parts], dtype=np.float64)
    ws = np.array([r["w"] for r in parts], dtype=np.int64)
    blocks = int(sum(r["blk"] for r in parts))
    order = np.argsort(vals, kind="stable")
    vals, ws = vals[order], ws[order]
    cum = np.cumsum(ws)
    total = int(cum[-1])
    out = []
    for q in qs:
        target = max(1, min(total, int(np.ceil(q * total))))
        j = int(np.searchsorted(cum, target))
        out.append(vals[min(j, len(vals) - 1)])
    return (
        pa.table({"q": pa.array(qs, pa.float64()), "value": pa.array(out, pa.float64())}),
        total,
        blocks,
    )


def ks_two_sample(
    ds: rd.Dataset, col: str, group_col: str, group_a, group_b
) -> pa.Table:
    """EXACT two-sample Kolmogorov–Smirnov statistic between the ``col``
    distributions of two subpopulations — the drift / split-skew check a
    training-data pipeline runs between corpus versions or splits.

    D = max over distinct values v of |F_a(v) - F_b(v)| is computed as the
    integer numerator max |c_a * n_b - c_b * n_a| (c_* = cumulative counts
    at v), so the result is exact — no float CDF accumulation. Shape: one
    narrow (value, flag) range sort, per-block summaries chained on the
    driver (prefix counts entering each block + the next block's first
    value for tie-safe block boundaries), then an embarrassingly parallel
    per-block vectorized scan — the ``per_key_window`` carry pattern.
    Guards n_a * n_b against int64 overflow (loudly, like per_key_window).
    """
    import ray as _ray

    from ..util import coalesce_blocks

    def _narrow(batch: pa.Table) -> pa.Table:
        g = batch.column(group_col)
        is_a = pc.equal(g, pa.scalar(group_a))
        is_b = pc.equal(g, pa.scalar(group_b))
        t = batch.filter(pc.or_(is_a, is_b))
        flag = pc.cast(pc.equal(t.column(group_col), pa.scalar(group_b)), pa.int8())
        return pa.table(
            {"v": pc.cast(t.column(col), pa.float64()), "g": flag}
        )

    s = (
        coalesce_blocks(ds.map_batches(_narrow, batch_format="pyarrow").materialize())
        .sort(["v"])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @_ray.remote(num_cpus=0.25)
    def _totals(t: pa.Table):
        if t.num_rows == 0:
            return None
        g = t.column("g").to_numpy(zero_copy_only=False)
        nb = int(g.sum())
        return {"na": len(g) - nb, "nb": nb, "first": float(t.column("v")[0].as_py())}

    metas = _ray.get([_totals.remote(r) for r in refs])
    live = [(r, m) for r, m in zip(refs, metas) if m is not None]
    if not live:
        return pa.table(
            {
                "n_a": pa.array([0], pa.int64()),
                "n_b": pa.array([0], pa.int64()),
                "d_num": pa.array([0], pa.int64()),
            }
        )
    n_a = sum(m["na"] for _, m in live)
    n_b = sum(m["nb"] for _, m in live)
    if n_a * n_b >= 1 << 62:
        raise ValueError("ks_two_sample: n_a * n_b overflows the int64 numerator")
    # prefix counts entering each block; next block's first value for the
    # tie-safe evaluation of each block's last position
    prefixes, pa_c, pb_c = [], 0, 0
    for _, m in live:
        prefixes.append((pa_c, pb_c))
        pa_c += m["na"]
        pb_c += m["nb"]
    nexts = [m["first"] for _, m in live[1:]] + [None]

    @_ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, prefix, next_first, na, nb):
        v = t.column("v").to_numpy(zero_copy_only=False)
        g = t.column("g").to_numpy(zero_copy_only=False).astype(np.int64)
        cb = np.cumsum(g) + prefix[1]
        ca = np.arange(1, len(g) + 1, dtype=np.int64) + prefix[0] - (cb - prefix[1])
        valid = np.empty(len(v), dtype=bool)
        valid[:-1] = v[1:] != v[:-1]
        valid[-1] = next_first is None or next_first != v[-1]
        diff = np.abs(ca * nb - cb * na)
        return int(diff[valid].max()) if valid.any() else 0

    parts = _ray.get(
        [
            _scan.remote(r, p, nf, n_a, n_b)
            for (r, _), p, nf in zip(live, prefixes, nexts)
        ]
    )
    return pa.table(
        {
            "n_a": pa.array([n_a], pa.int64()),
            "n_b": pa.array([n_b], pa.int64()),
            "d_num": pa.array([max(parts)], pa.int64()),
        }
    )


def profile_columns(ds: rd.Dataset, cols: list[str]) -> pa.Table:
    """Dataset-profiling pass over numeric columns: per column null count,
    exact distinct count, min and max — the completeness/cardinality report
    every ingest runs before committing a corpus version. Nulls + extrema
    fold in ONE streaming pass (tiny per-block partials, driver merge);
    distinct counts reuse ``count_distinct_exact``'s sort + boundary-scan
    shape, one narrow pass per column (column count is small and fixed)."""

    def _partial(batch: pa.Table) -> pa.Table:
        nulls, mins, maxs = [], [], []
        for c in cols:
            arr = batch.column(c)
            nulls.append(arr.null_count)
            v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
            v = v[~np.isnan(v)]
            mins.append(v.min() if len(v) else np.nan)
            maxs.append(v.max() if len(v) else np.nan)
        return pa.table(
            {
                "nulls": pa.array([np.array(nulls, np.int64).tobytes()]),
                "mins": pa.array([np.array(mins, np.float64).tobytes()]),
                "maxs": pa.array([np.array(maxs, np.float64).tobytes()]),
            }
        )

    nulls = np.zeros(len(cols), np.int64)
    mins = np.full(len(cols), np.nan)
    maxs = np.full(len(cols), np.nan)
    for b in ds.select_columns(cols).map_batches(
        _partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for pn, pmn, pmx in zip(
            b.column("nulls").to_pylist(),
            b.column("mins").to_pylist(),
            b.column("maxs").to_pylist(),
        ):
            nulls += np.frombuffer(pn, np.int64)
            mins = np.fmin(mins, np.frombuffer(pmn, np.float64))
            maxs = np.fmax(maxs, np.frombuffer(pmx, np.float64))
    def _valid_only(c: str):
        def _f(batch: pa.Table) -> pa.Table:
            arr = batch.column(c)
            m = pc.is_valid(arr)
            if pa.types.is_floating(arr.type):
                m = pc.and_(m, pc.invert(pc.is_nan(arr)))
            return pa.table({c: arr.filter(m)})

        return _f

    # nulls AND NaN are missing (repo-wide convention) — they never reach
    # the distinct sort (min_per_key has no null-key ordering)
    distinct = [
        count_distinct_exact(
            ds.select_columns([c]).map_batches(_valid_only(c), batch_format="pyarrow"),
            c,
        )
        for c in cols
    ]
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n_nulls": pa.array(nulls, pa.int64()),
            "n_distinct": pa.array(distinct, pa.int64()),
            "min_v": pa.array(mins, pa.float64()),
            "max_v": pa.array(maxs, pa.float64()),
        }
    )


def group_rank_sketch_check(
    ds: rd.Dataset,
    key_col: str,
    col: str,
    qs: list[float],
    *,
    eps: float = 0.005,
) -> pa.Table:
    """Per-group mergeable eps-rank quantile sketch + its own scoreboard:
    the grouped sibling of ``rank_sketch_quantiles`` (the property that
    makes the sketch the 100-TB shape is exactly that per-(group, block)
    summaries merge associatively — this operator exercises it). Returns
    one row per (group, q) with ``within_bound`` = the estimate's EXACT
    rank error <= eps * n_group + #blocks touching the group.

    Per batch the group loop is bounded by the batch's UNIQUE group count
    (source/priority-like cardinality), with the per-group work fully
    vectorized — the ``mixture_sample`` convention."""

    def _summary(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        keys_out, vals_out, w_out, blk_out = [], [], [], []
        for g in np.unique(k):
            gv = np.sort(v[k == g])
            gv = gv[~np.isnan(gv)]
            n = len(gv)
            if n == 0:
                continue
            stride = max(1, int(np.floor(eps * n)))
            idx = np.arange(stride - 1, n, stride)
            w = np.full(len(idx), stride, dtype=np.int64)
            rem = n - stride * len(idx)
            if rem > 0:
                idx = np.append(idx, n - 1)
                w = np.append(w, rem)
            keys_out.extend([g] * len(idx))
            vals_out.append(gv[idx])
            w_out.append(w)
            blk_out.extend([1] + [0] * (len(idx) - 1))
        if not keys_out:
            return pa.table(
                {
                    "g": pa.array([], pa.string()),
                    "value": pa.array([], pa.float64()),
                    "w": pa.array([], pa.int64()),
                    "blk": pa.array([], pa.int64()),
                }
            )
        return pa.table(
            {
                "g": pa.array([str(x) for x in keys_out], pa.string()),
                "value": pa.array(np.concatenate(vals_out), pa.float64()),
                "w": pa.array(np.concatenate(w_out), pa.int64()),
                "blk": pa.array(blk_out, pa.int64()),
            }
        )

    narrow = ds.select_columns([key_col, col])
    parts = narrow.map_batches(_summary, batch_format="pyarrow").take_all()
    by_g: dict[str, list] = {}
    blocks: dict[str, int] = {}
    for r in parts:
        by_g.setdefault(r["g"], []).append((r["value"], r["w"]))
        blocks[r["g"]] = blocks.get(r["g"], 0) + r["blk"]
    est: dict[str, np.ndarray] = {}
    totals: dict[str, int] = {}
    for g, rows in by_g.items():
        vals = np.array([v for v, _ in rows])
        ws = np.array([w for _, w in rows], dtype=np.int64)
        order = np.argsort(vals, kind="stable")
        vals, ws = vals[order], ws[order]
        cum = np.cumsum(ws)
        total = int(cum[-1])
        totals[g] = total
        e = []
        for q in qs:
            target = max(1, min(total, int(np.ceil(q * total))))
            j = int(np.searchsorted(cum, target))
            e.append(vals[min(j, len(vals) - 1)])
        est[g] = np.array(e)

    groups = sorted(est)

    def _counts(batch: pa.Table) -> pa.Table:
        k = batch.column(key_col).to_numpy(zero_copy_only=False)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        lt = np.zeros((len(groups), len(qs)), np.int64)
        le = np.zeros((len(groups), len(qs)), np.int64)
        for gi, g in enumerate(groups):
            gv = v[k.astype(str) == g] if k.dtype != object else v[k == g]
            if len(gv) == 0:
                continue
            for qi, e in enumerate(est[g]):
                lt[gi, qi] = (gv < e).sum()
                le[gi, qi] = (gv <= e).sum()
        return pa.table(
            {"lt": pa.array([lt.tobytes()]), "le": pa.array([le.tobytes()])}
        )

    lt = np.zeros((len(groups), len(qs)), np.int64)
    le = np.zeros((len(groups), len(qs)), np.int64)
    for b in narrow.map_batches(_counts, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for plt, ple in zip(b.column("lt").to_pylist(), b.column("le").to_pylist()):
            lt += np.frombuffer(plt, np.int64).reshape(len(groups), len(qs))
            le += np.frombuffer(ple, np.int64).reshape(len(groups), len(qs))

    g_out, q_out, ok_out = [], [], []
    for gi, g in enumerate(groups):
        total = totals[g]
        bound = eps * total + blocks[g]
        for qi, q in enumerate(qs):
            target = max(1, min(total, int(np.ceil(q * total))))
            l, u = int(lt[gi, qi]), int(le[gi, qi])
            err = 0 if l + 1 <= target <= u else min(abs(target - (l + 1)), abs(target - u))
            g_out.append(g)
            q_out.append(q)
            ok_out.append(int(err <= bound))
    return pa.table(
        {
            "grp": pa.array(g_out, pa.string()),
            "q": pa.array(q_out, pa.float64()),
            "within_bound": pa.array(ok_out, pa.int64()),
        }
    )


def group_heavy_hitters(
    ds: rd.Dataset, group_col: str, val_col: str, k: int = 3
) -> rd.Dataset:
    """Exact top-k values by count WITHIN each group (top terms per
    language, top URLs per domain, ...), deterministic ties (count desc,
    value asc). Same no-Ray-groupby discipline as ``heavy_hitters`` at any
    group x value cardinality: Arrow-native per-block partial counts on the
    (group, value) pair, ONE narrow sort of the folded pair key for the
    exact sums (``sum_per_key``), then ``topk_per_key`` rank-selects inside
    each group with boundary carries — per-group Python never runs.

    Group values must not contain the fold separator ``\\x1f`` (value
    strings may — only the first separator splits)."""
    from ..util import topk_per_key
    from .graph import sum_per_key

    SEP = "\x1f"

    def _partial(batch: pa.Table) -> pa.Table:
        g = (
            pa.table(
                {
                    group_col: pc.cast(batch.column(group_col), pa.string()),
                    val_col: pc.cast(batch.column(val_col), pa.string()),
                }
            )
            .group_by([group_col, val_col])
            .aggregate([([], "count_all")])
        )
        key = pc.binary_join_element_wise(
            g.column(group_col), g.column(val_col), SEP
        )
        return pa.table({"gv": key, "n": g.column("count_all")})

    sums = sum_per_key(
        ds.map_batches(_partial, batch_format="pyarrow"), "gv", "n"
    )

    def _unfold(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(batch.column("gv"), SEP, max_splits=1)
        return pa.table(
            {
                group_col: pc.list_element(parts, 0),
                val_col: pc.list_element(parts, 1),
                "n": batch.column("n").combine_chunks(),
            }
        )

    pairs = sums.map_batches(_unfold, batch_format="pyarrow")
    return topk_per_key(pairs, group_col, "n", k, descending=True, tie_col=val_col)


def group_rank_auc(
    ds: rd.Dataset, group_col: str, score_col: str, label_col: str
) -> pa.Table:
    """Exact tie-corrected Mann-Whitney AUC per group — P(score_pos >
    score_neg) + 0.5*P(=) of ``score_col`` predicting the 0/1 ``label_col``
    — the ranking-quality audit run over every trained filter/classifier
    before its threshold ships. Scores must be non-negative int64 (fixed
    point); labels 0/1.

    Scale shape (no Ray groupby, no rank materialization): per-block Arrow
    partials count (pos, neg) per DISTINCT (group, score) — packed into one
    int64 (``pos·2^32 + neg``; addition distributes over the packing) and
    folded through ``sum_per_key``'s narrow sort + boundary-carry combine.
    The distinct-counts stream comes back globally sorted by (group, score),
    so 2·U = Σ_v pos_v·(2·cum_neg_before_v + neg_v) accumulates per block
    with one per-group carry folded on the driver (blocks are scanned in
    order; every per-block partial is group-domain bounded). Output is
    group-cardinality-bounded: (group, n_pos, n_neg, auc) with ONE float
    division per group at the very end."""
    from .graph import sum_per_key

    SEP = "\x1f"
    _W = 20  # zero-padded decimal keeps lexicographic == numeric order

    def _partial(batch: pa.Table) -> pa.Table:
        lab = pc.cast(batch.column(label_col), pa.int64())
        g = (
            pa.table(
                {
                    group_col: pc.cast(batch.column(group_col), pa.string()),
                    score_col: batch.column(score_col).combine_chunks(),
                    "pos": lab,
                    "neg": pc.subtract(pa.scalar(1, pa.int64()), lab),
                }
            )
            .group_by([group_col, score_col])
            .aggregate([("pos", "sum"), ("neg", "sum")])
        )
        v = g.column(score_col).to_numpy(zero_copy_only=False)
        if len(v) and v.min() < 0:
            raise ValueError("group_rank_auc requires non-negative scores")
        key = pc.binary_join_element_wise(
            g.column(group_col),
            pc.utf8_lpad(pc.cast(g.column(score_col), pa.string()), _W, "0"),
            SEP,
        )
        packed = (
            g.column("pos_sum").to_numpy(zero_copy_only=False) << np.int64(32)
        ) | g.column("neg_sum").to_numpy(zero_copy_only=False)
        return pa.table({"gv": key, "pn": pa.array(packed, pa.int64())})

    counts = sum_per_key(
        ds.select_columns([group_col, score_col, label_col]).map_batches(
            _partial, batch_format="pyarrow"
        ),
        "gv",
        "pn",
    )
    # sum_per_key's blocks are each sorted but their GATHER order is not
    # guaranteed (Ray does not preserve block order through materialize);
    # the carry-chained scan below needs global order, so re-sort the
    # distinct (key, packed) stream — narrow, and tiny next to the fold
    from ..util import coalesce_blocks

    counts = (
        coalesce_blocks(counts.materialize()).sort(["gv"]).materialize()
    )
    refs = list(counts.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table):
        """Per-group (pos, neg, 2U-partial-with-block-local-cum_neg) for this
        block, in group order — the driver folds cross-block carries."""
        if t.num_rows == 0:
            return []
        gv = t.column("gv").to_numpy(zero_copy_only=False)
        g = np.array([s.rsplit(SEP, 1)[0] for s in gv], dtype=object)
        pn = t.column("pn").to_numpy(zero_copy_only=False)
        pos = pn >> np.int64(32)
        neg = pn & np.int64(0xFFFFFFFF)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        seg_start = np.nonzero(new)[0]
        cn = np.cumsum(neg)
        # neg seen in THIS block before each row, within the row's group
        base = cn[seg_start] - neg[seg_start]
        cum_before = cn - neg - base[np.cumsum(new) - 1]
        contrib = pos * (2 * cum_before + neg)
        pos_s = np.add.reduceat(pos, seg_start)
        neg_s = np.add.reduceat(neg, seg_start)
        u2_s = np.add.reduceat(contrib, seg_start)
        return [
            (g[i], int(p), int(q), int(u))
            for i, p, q, u in zip(seg_start, pos_s, neg_s, u2_s)
        ]

    blocks = ray.get([_scan.remote(r) for r in refs])
    n_pos: dict = {}
    n_neg: dict = {}
    u2: dict = {}
    for block in blocks:
        for gname, p, q, u in block:
            # every score in this block outranks the group's negs from
            # earlier blocks: +2 * carry_neg * block_pos
            u2[gname] = u2.get(gname, 0) + u + 2 * n_neg.get(gname, 0) * p
            n_pos[gname] = n_pos.get(gname, 0) + p
            n_neg[gname] = n_neg.get(gname, 0) + q
    names = sorted(u2)
    # every per-block partial is bounded by the group's final 2*n1*n0, so
    # this driver-side check (exact Python ints) also certifies that no
    # block-local reduceat wrapped int64
    for g in names:
        if 2 * n_pos[g] * n_neg[g] > 2**63 - 1:
            raise ValueError(
                f"group {g!r}: 2*n_pos*n_neg exceeds int64 — AUC rank sums "
                "would overflow; shard the group or subsample"
            )
    auc = [
        u2[g] / (2.0 * n_pos[g] * n_neg[g]) if n_pos[g] and n_neg[g] else None
        for g in names
    ]
    return pa.table(
        {
            group_col: pa.array(names, pa.string()),
            "n_pos": pa.array([n_pos[g] for g in names], pa.int64()),
            "n_neg": pa.array([n_neg[g] for g in names], pa.int64()),
            "auc": pa.array(auc, pa.float64()),
        }
    )


def group_gini(ds: rd.Dataset, group_col: str, val_col: str) -> pa.Table:
    """Exact Gini coefficient per group over non-negative int64 values —
    the inequality audit (token-count concentration across sources, spend
    concentration across users). Formula on ascending-sorted values:
    ``G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x))`` with 1-based ranks;
    tied values contribute the same regardless of order within the tie, so
    the sort's tie order is immaterial.

    Scale shape: ONE range sort by (group, value); per block a vectorized
    local rank-weighted sum — the true rank of a row is its local rank plus
    the rows of its group in earlier blocks, so each block's partial fixes
    up as ``local_rank_sum + offset * block_value_sum`` with a driver-folded
    per-group row-count carry (metadata-sized). Output is group-cardinality
    bounded: (group, n, sum_v, gini) with ONE float division per group.
    Like :func:`group_rank_auc`, the final ``n * sum_v`` bound (exact
    Python ints) certifies no intermediate int64 wrap occurred."""
    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([group_col, val_col]).materialize()
        )
        .sort([group_col, val_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table):
        if t.num_rows == 0:
            return []
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        v = t.column(val_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(v) and v.min() < 0:
            raise ValueError("group_gini requires non-negative values")
        # per-block soundness guard (float bound with 2x slack): the largest
        # partial is sum(local*v) <= len(v)*sum(v); checking BEFORE the int64
        # reduceat means a wrapped block sum can never fool the driver check
        if float(np.sum(v, dtype=np.float64)) * len(v) > 2.0**61:
            raise ValueError(
                "group_gini: block rank-weighted sum would overflow int64; "
                "rescale values"
            )
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        seg_start = np.nonzero(new)[0]
        seg_id = np.cumsum(new) - 1
        # 1-based local rank within the row's group segment
        local = np.arange(len(g), dtype=np.int64) - seg_start[seg_id] + 1
        rv = local * v
        return [
            (g[i], int(nrow), int(sv), int(rs))
            for i, nrow, sv, rs in zip(
                seg_start,
                np.diff(np.append(seg_start, len(g))),
                np.add.reduceat(v, seg_start),
                np.add.reduceat(rv, seg_start),
            )
        ]

    blocks = ray.get([_scan.remote(r) for r in refs])
    n_tot: dict = {}
    sum_v: dict = {}
    rank_sum: dict = {}
    for block in blocks:
        for gname, nrow, sv, rs in block:
            off = n_tot.get(gname, 0)  # rows of this group in earlier blocks
            rank_sum[gname] = rank_sum.get(gname, 0) + rs + off * sv
            n_tot[gname] = off + nrow
            sum_v[gname] = sum_v.get(gname, 0) + sv
    names = sorted(rank_sum)
    for gname in names:
        if n_tot[gname] * sum_v[gname] > 2**62:
            raise ValueError(
                f"group {gname!r}: n*sum exceeds the int64 safety bound — "
                "rank-weighted sums would overflow; rescale values"
            )
    gini = [
        (
            (2 * rank_sum[g] - (n_tot[g] + 1) * sum_v[g])
            / float(n_tot[g] * sum_v[g])
            if sum_v[g] > 0
            else None
        )
        for g in names
    ]
    return pa.table(
        {
            group_col: pa.array(names, pa.string()),
            "n": pa.array([n_tot[g] for g in names], pa.int64()),
            "sum_v": pa.array([sum_v[g] for g in names], pa.int64()),
            "gini": pa.array(gini, pa.float64()),
        }
    )


def kmv_sketches(
    ds: rd.Dataset,
    set_col: str,
    elem_col: str,
    *,
    k: int = 256,
) -> dict:
    """Per-set KMV (theta) sketches: the k smallest SplitMix64 hashes of
    each set's distinct elements. Returns ``{set_value: (theta, sample)}``
    where ``sample`` is the sorted int63 hash array below ``theta``; a set
    with < k distinct elements keeps everything with theta = 2^63 (the
    sketch is exact). Sketch set algebra (union/intersection estimates,
    `theta_intersections`) runs on these bounded samples driver-side.

    Scale shape: distinct (set, hash) rows via the sort-based
    `distinct_rows`, then `rank_per_key` (one range sort, per-block
    segment ranks, boundary carries) keeps rank < k — the gather is
    bounded by k · |sets|, never element cardinality. The same
    hash-orders-the-sample trick every theta-sketch library uses, so
    sketches built over DIFFERENT corpus partitions merge by min-k of
    the union (associative, order-proof)."""
    from ..util import distinct_rows, rank_per_key
    from .shuffle import sm64_key

    _KMV_SALT = 4099

    ds = ds.select_columns([set_col, elem_col])

    def _hash(b: pa.Table) -> pa.Table:
        e = b.column(elem_col).to_numpy(zero_copy_only=False).astype(np.int64)
        h = (sm64_key(e, _KMV_SALT) >> np.uint64(1)).astype(np.int64)
        return pa.table({set_col: b.column(set_col), "h": pa.array(h)})

    hashed = distinct_rows(
        ds.map_batches(_hash, batch_format="pyarrow"), [set_col, "h"]
    )
    ranked = rank_per_key(hashed, set_col, "h", rank_col="rn")
    kept = ranked.map_batches(
        lambda b: b.filter(pc.less(b.column("rn"), k)),
        batch_format="pyarrow",
    ).take_all()

    by_set: dict = {}
    for r in kept:
        by_set.setdefault(r[set_col], []).append(int(r["h"]))
    out = {}
    for s, hs in by_set.items():
        hs.sort()
        if len(hs) < k:
            out[s] = (1 << 63, np.array(hs, np.int64))
        else:
            # theta = the k-th smallest; the sample is everything below it
            out[s] = (hs[k - 1], np.array(hs[: k - 1], np.int64))
    return out


def theta_intersections(sketches: dict) -> dict:
    """Pairwise intersection-cardinality estimates from KMV sketches:
    for sets A, B with theta = min(thetaA, thetaB), the estimate is
    |{h in sampleA ∩ sampleB : h < theta}| · 2^63 / theta (exact when
    both sketches are exact). Returns {(a, b): est} for a < b."""
    out = {}
    keys = sorted(sketches)
    for i, a in enumerate(keys):
        ta, sa = sketches[a]
        for b in keys[i + 1 :]:
            tb, sb = sketches[b]
            theta = min(ta, tb)
            inter = np.intersect1d(sa, sb, assume_unique=True)
            n_below = int((inter < theta).sum())
            if theta >= (1 << 63):
                out[(a, b)] = float(n_below)
            else:
                out[(a, b)] = n_below * float(1 << 63) / float(theta)
    return out


def theta_union(sketches: dict, *, k: int = 256) -> float:
    """Distinct-cardinality estimate of the UNION of sketched sets by the
    min-k merge law (the property that makes KMV sketches mergeable
    across corpus partitions): pool all samples, keep the k smallest,
    theta' = the k-th; est = (k-1)·2^63/theta'. Exact when the pooled
    distinct sample count stays below k. The union of zero sets is empty."""
    if not sketches:
        return 0.0
    pooled = np.unique(np.concatenate([s for _, s in sketches.values()]))
    thetas = [t for t, _ in sketches.values()]
    cutoff = min(thetas)
    pooled = pooled[pooled < cutoff]
    if len(pooled) < k:
        # below saturation relative to every contributing theta: if every
        # sketch was exact (theta = 2^63) this is the exact distinct count
        if cutoff >= (1 << 63):
            return float(len(pooled))
        return len(pooled) * float(1 << 63) / float(cutoff)
    theta = float(np.partition(pooled, k - 1)[k - 1])
    return (k - 1) * float(1 << 63) / theta


# round(log10(1 + 1/d) * 1e6) for d = 1..9 — Benford's law expected
# first-digit shares in micro units; FIXED constants (not recomputed) so
# the SQL oracle inlines the identical integers and no float log enters
# the comparison
BENFORD_EXP_MICRO = {
    1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
    6: 66947, 7: 57992, 8: 51153, 9: 45757,
}


def benford_audit(ds: rd.Dataset, col: str) -> rd.Dataset:
    """Benford's-law first-digit audit of a positive currency column in
    EXACT integer arithmetic: per-digit observed counts plus the
    cross-multiplied deviation |n_d·10^6 − n·exp_micro| (comparing the
    observed share n_d/n against the Benford share exp_micro/10^6 without a
    division). Digit extraction is string-based on the cent value — no
    float log10, so prices at power-of-ten boundaries can't misclassify.

    Shape: one `exact_value_counts` at digit cardinality (9); the total and
    deviations derive from the 9-row table on the driver."""

    def _digit(b: pa.Table) -> pa.Table:
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column(col), 100.0), 0.5)), pa.int64()
        )
        t = pa.table({"c": cents}).filter(pc.greater(cents, 0))
        d = pc.utf8_slice_codeunits(pc.cast(t.column("c"), pa.string()), 0, 1)
        return pa.table({"digit": pc.cast(d, pa.int64()).combine_chunks()})

    counts = exact_value_counts(
        ds.map_batches(_digit, batch_format="pyarrow"), "digit"
    ).take_all()  # 9 rows — bounded by construction
    obs = {int(r["digit"]): int(r["n"]) for r in counts}
    total = sum(obs.values())
    rows = []
    for d in range(1, 10):
        n_d = obs.get(d, 0)
        dev = abs(n_d * 1_000_000 - total * BENFORD_EXP_MICRO[d])
        rows.append((d, n_d, BENFORD_EXP_MICRO[d], dev))
    dg, n, e, v = zip(*rows)
    return rd.from_arrow(
        pa.table(
            {
                "digit": pa.array(dg, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "exp_micro": pa.array(e, pa.int64()),
                "dev_micro": pa.array(v, pa.int64()),
            }
        )
    )


def contingency_table(ds: rd.Dataset, a_col: str, b_col: str) -> rd.Dataset:
    """Exact contingency table for categorical association tests: per
    (a, b) cell the observed count ``o``, the marginals ``row_n``/``col_n``
    and the cross-multiplied independence deviation
    ``diff = o·N − row_n·col_n`` (the chi-square numerator's signed root,
    kept as an exact int64 — |diff| < 2^63 up to ~3·10^9 rows; squaring
    and the chi-square division are left to the consumer because a float
    SUM's order is partition-dependent and would break value-hash
    determinism).

    Shape: one per-batch Arrow partial count at CELL cardinality folded by
    `exact_value_counts` on the packed key; marginals derive from the cell
    table (cells >= rows of any marginal), broadcast driver-side at
    category cardinality."""
    SEP = "\x1f"

    def _cells(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(b.column(a_col), pa.string()),
            pc.cast(b.column(b_col), pa.string()),
            SEP,
        )
        return pa.table({"cell": key.combine_chunks()})

    cells = exact_value_counts(
        ds.map_batches(_cells, batch_format="pyarrow"), "cell"
    ).materialize()

    # marginals from the cell table — category-cardinality driver gather
    rows = cells.take_all()
    ra: dict[str, int] = {}
    cb: dict[str, int] = {}
    n_total = 0
    for r in rows:
        a, b = r["cell"].split(SEP, 1)
        n = int(r["n"])
        ra[a] = ra.get(a, 0) + n
        cb[b] = cb.get(b, 0) + n
        n_total += n

    def _final(t: pa.Table) -> pa.Table:
        aa, bb, oo, rr, cc, dd = [], [], [], [], [], []
        for cell, n in zip(t.column("cell").to_pylist(), t.column("n").to_pylist()):
            a, b = cell.split(SEP, 1)
            o = int(n)
            aa.append(a)
            bb.append(b)
            oo.append(o)
            rr.append(ra[a])
            cc.append(cb[b])
            dd.append(o * n_total - ra[a] * cb[b])
        return pa.table(
            {
                a_col: pa.array(aa, pa.string()),
                b_col: pa.array(bb, pa.string()),
                "o": pa.array(oo, pa.int64()),
                "row_n": pa.array(rr, pa.int64()),
                "col_n": pa.array(cc, pa.int64()),
                "diff": pa.array(dd, pa.int64()),
            }
        )

    return cells.map_batches(_final, batch_format="pyarrow")


def mann_whitney_u2(
    ds: rd.Dataset, group_col: str, value_col: str, group_a: str, group_b: str
) -> rd.Dataset:
    """Mann-Whitney rank-sum statistic in EXACT integer arithmetic: returns
    one row (n_a, n_b, u2_a) where u2_a = 2·U_A (doubled so tie credit —
    half a point per cross-group tie — stays integral). U_A counts, over
    all (a, b) cross pairs, wins (a > b) plus half-ties; equivalently
    2·U_A = Σ_v nA(v)·(2·cumB(<=v) − nB(v)). Values ride as exact cents.

    Shape: one `fold_per_key` at distinct-value cardinality (per-value
    group counts), one constant-key running sum over the sorted value
    stream (`per_key_window` — range sort + boundary carries), one
    value-cardinality hash join, and a tiny scoreboard fold. The raw table
    never gathers; no float ever enters."""
    from ..extras.window import per_key_window
    from ..util import fold_per_key, hash_join

    def _narrow(b: pa.Table) -> pa.Table:
        g = b.column(group_col)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column(value_col), 100.0), 0.5)),
            pa.int64(),
        )
        is_a = pc.cast(pc.equal(g, group_a), pa.int64())
        is_b = pc.cast(pc.equal(g, group_b), pa.int64())
        t = pa.table({"c": cents, "na": is_a, "nb": is_b})
        keep = pc.or_(
            pc.equal(t.column("na"), 1), pc.equal(t.column("nb"), 1)
        )
        return t.filter(pc.fill_null(keep, False))

    counts = fold_per_key(
        ds.map_batches(_narrow, batch_format="pyarrow"),
        "c",
        {"na": ("sum", "na"), "nb": ("sum", "nb")},
    ).materialize()

    w = per_key_window(
        counts.map_batches(
            lambda b: pa.table(
                {
                    "k": pa.array(np.zeros(b.num_rows, np.int64)),
                    "c": b.column("c").combine_chunks(),
                    # distinct id column: sort keys must not repeat
                    "cid": b.column("c").combine_chunks(),
                    "nb": pc.cast(b.column("nb"), pa.int64()).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ),
        "k",
        "c",
        "cid",
        "nb",
    ).materialize()

    j = hash_join(
        counts,
        w.map_batches(
            lambda b: pa.table(
                {
                    "c": b.column("cid").combine_chunks(),
                    "cum": pc.cast(b.column("cum_val"), pa.int64()).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ).materialize(),
        on="c",
        join_type="inner",
    )

    def _terms(b: pa.Table) -> pa.Table:
        na = b.column("na").to_numpy(zero_copy_only=False).astype(np.int64)
        nb = b.column("nb").to_numpy(zero_copy_only=False).astype(np.int64)
        cum = b.column("cum").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.zeros(len(na), np.int64)),
                "n_a": pa.array(na, pa.int64()),
                "n_b": pa.array(nb, pa.int64()),
                "u2_a": pa.array(na * (2 * cum - nb), pa.int64()),
            }
        )

    tot = fold_per_key(
        j.map_batches(_terms, batch_format="pyarrow"),
        "k",
        {"n_a": ("sum", "n_a"), "n_b": ("sum", "n_b"), "u2_a": ("sum", "u2_a")},
    ).take_all()
    r = tot[0] if tot else {"n_a": 0, "n_b": 0, "u2_a": 0}
    return rd.from_arrow(
        pa.table(
            {
                "n_a": pa.array([int(r["n_a"])], pa.int64()),
                "n_b": pa.array([int(r["n_b"])], pa.int64()),
                "u2_a": pa.array([int(r["u2_a"])], pa.int64()),
            }
        )
    )


def spearman_pair(
    ds: rd.Dataset, a_col: str, b_col: str
) -> rd.Dataset:
    """Spearman rank correlation's exact integer core for two numeric
    columns: one row (n, sum_d2_x4) where d = (2·avgrank_a − 2·avgrank_b)
    per row — average ranks for ties carried DOUBLED so they stay integral
    (avg2x of a tie group = 2·min_rank + count − 1). The familiar
    rho = 1 − 6·Σd²/(n(n²−1)) is the caller's one float division;
    everything order-dependent is integer.

    Shape: per column one `exact_value_counts` + one constant-key running
    sum over the sorted distinct values gives avg2x per VALUE; two
    value-keyed hash joins stamp the rows; one scoreboard fold. Rows never
    gather."""
    from ..extras.window import per_key_window
    from ..util import fold_per_key, hash_join

    def _avg2x(col: str) -> rd.Dataset:
        counts = exact_value_counts(
            ds.map_batches(
                lambda b, c=col: pa.table(
                    {c: pc.cast(b.column(c), pa.int64()).combine_chunks()}
                ),
                batch_format="pyarrow",
            ),
            col,
        ).materialize()
        w = per_key_window(
            counts.map_batches(
                lambda b, c=col: pa.table(
                    {
                        "k": pa.array(np.zeros(b.num_rows, np.int64)),
                        "v": b.column(c).combine_chunks(),
                        "vid": b.column(c).combine_chunks(),
                        "cnt": pc.cast(b.column("n"), pa.int64()).combine_chunks(),
                    }
                ),
                batch_format="pyarrow",
            ),
            "k",
            "v",
            "vid",
            "cnt",
        )
        cum = w.map_batches(
            lambda b: pa.table(
                {
                    "v": pc.cast(b.column("vid"), pa.int64()).combine_chunks(),
                    "cum": pc.cast(b.column("cum_val"), pa.int64()).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        cnts = counts.map_batches(
            lambda b, c=col: pa.table(
                {
                    "v": pc.cast(b.column(c), pa.int64()).combine_chunks(),
                    "cnt": pc.cast(b.column("n"), pa.int64()).combine_chunks(),
                }
            ),
            batch_format="pyarrow",
        ).materialize()
        j = hash_join(cum, cnts, on="v", join_type="inner")
        return j.map_batches(
            lambda b: pa.table(
                {
                    "v": pc.cast(b.column("v"), pa.int64()).combine_chunks(),
                    # min 1-based rank of the tie group = cum - cnt + 1;
                    # avg2x = 2*min + cnt - 1 = 2*cum - cnt + 1
                    "avg2x": pa.array(
                        2 * b.column("cum").to_numpy(zero_copy_only=False)
                        - b.column("cnt").to_numpy(zero_copy_only=False)
                        + 1,
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ).materialize()

    a_map = _avg2x(a_col)
    b_map = _avg2x(b_col)

    rows = ds.map_batches(
        lambda b: pa.table(
            {
                "va": pc.cast(b.column(a_col), pa.int64()).combine_chunks(),
                "vb": pc.cast(b.column(b_col), pa.int64()).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    j = hash_join(
        rows.materialize(),
        a_map.map_batches(
            lambda b: b.rename_columns(["va", "a2x"]), batch_format="pyarrow"
        ).materialize(),
        on="va",
        join_type="inner",
    ).materialize()
    j2 = hash_join(
        j,
        b_map.map_batches(
            lambda b: b.rename_columns(["vb", "b2x"]), batch_format="pyarrow"
        ).materialize(),
        on="vb",
        join_type="inner",
    )

    def _d2(b: pa.Table) -> pa.Table:
        d = b.column("a2x").to_numpy(zero_copy_only=False).astype(
            np.int64
        ) - b.column("b2x").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "one": pa.array(np.ones(b.num_rows, np.int64)),
                "d2": pa.array(d * d, pa.int64()),
            }
        )

    tot = fold_per_key(
        j2.map_batches(_d2, batch_format="pyarrow"),
        "k",
        {"n": ("sum", "one"), "sum_d2_x4": ("sum", "d2")},
    ).take_all()
    r = tot[0] if tot else {"n": 0, "sum_d2_x4": 0}
    return rd.from_arrow(
        pa.table(
            {
                "n": pa.array([int(r["n"])], pa.int64()),
                "sum_d2_x4": pa.array([int(r["sum_d2_x4"])], pa.int64()),
            }
        )
    )
