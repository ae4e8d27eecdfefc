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