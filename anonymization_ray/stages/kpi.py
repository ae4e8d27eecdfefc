"""KPI stage — equivalence classes, randomization similarity, k-anonymity.

Reference semantics (``service/KpiService.java``):

- K2 equivalence classes: group records by the tuple of *all*
  ``<attr>_generalized`` bindings (unbound for masked/randomized attrs; null
  originals form their own group) — ``QueryBuildingService.java:142-163``
- K3 randomization similarity: per randomized attribute,
  benchmark = 2 * mean(|orig - randomized|) over non-null records; a record's
  similar-set = records whose ORIGINAL value lies within
  [randomized_r - benchmark, randomized_r + benchmark] (inclusive); records
  with null originals are mutually similar — ``KpiService.java:102-154``
- K4 k-anonymity = min over records of |equivalence class ∩ (∩ similarity
  sets)| — ``KpiService.java:75-99``; stored as ``soya:kanonymity``.

Scale design: equivalence classes are one hash groupby; benchmarks are
streaming (sum, count) partial aggregates; the class∩similarity intersection
is computed inside ``groupby(gen_cols).map_groups`` — co-locating each
equivalence class once, vectorized searchsorted for the single-randomized-
attribute case, chunked boolean intersection otherwise.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .codecs import CODECS

# sentinel used to make null group keys groupable
_NULL_INT = -2147483648
_NULL_STR = "\x00<null>"


@dataclass
class RandomizedAttr:
    orig_col: str
    rand_col: str
    kind: str  # numeric|date|dateTime
    benchmark: float | None = None  # filled by compute_benchmarks


def _canon(batch_col: pa.ChunkedArray, kind: str) -> np.ndarray:
    arr = CODECS[kind].to_numeric(batch_col)
    return arr.to_numpy(zero_copy_only=False).astype(np.float64)


def compute_benchmarks(
    ds: ray.data.Dataset, rand_attrs: list[RandomizedAttr]
) -> list[RandomizedAttr]:
    """benchmark = 2 * mean(|orig - randomized|) over non-null originals
    (``KpiService.java:146-148``). One streaming pass for all attributes."""
    if not rand_attrs:
        return rand_attrs

    def _partial(batch: pa.Table) -> pa.Table:
        row = {}
        for i, ra in enumerate(rand_attrs):
            o = _canon(batch.column(ra.orig_col), ra.kind)
            r = _canon(batch.column(ra.rand_col), ra.kind)
            valid = ~(np.isnan(o) | np.isnan(r))
            row[f"s{i}"] = [float(np.abs(o[valid] - r[valid]).sum())]
            row[f"c{i}"] = [int(valid.sum())]
        return pa.table(row)

    parts = ds.map_batches(_partial, batch_format="pyarrow")
    cols = [f"s{i}" for i in range(len(rand_attrs))] + [f"c{i}" for i in range(len(rand_attrs))]
    sums = parts.sum(cols)
    if not isinstance(sums, dict):
        sums = {f"sum({cols[0]})": sums}
    out = []
    for i, ra in enumerate(rand_attrs):
        c = sums.get(f"sum(c{i})") or 0
        b = (2.0 * (sums.get(f"sum(s{i})") or 0.0) / c) if c else None
        out.append(RandomizedAttr(ra.orig_col, ra.rand_col, ra.kind, b))
    return out


def _group_key_batch(batch: pa.Table, gen_cols: list[str]) -> pa.Table:
    """Null-safe group key columns (nulls form their own group, matching the
    SPARQL GROUP BY over OPTIONAL bindings)."""
    cols = {}
    for c in gen_cols:
        a = batch.column(c)
        if pa.types.is_integer(a.type):
            cols[f"_k_{c}"] = pc.coalesce(pc.cast(a, pa.int64()), pa.scalar(_NULL_INT, pa.int64()))
        else:
            cols[f"_k_{c}"] = pc.coalesce(pc.cast(a, pa.string()), pa.scalar(_NULL_STR, pa.string()))
    for name, arr in cols.items():
        if name in batch.column_names:
            batch = batch.drop_columns([name])
        batch = batch.append_column(name, arr)
    return batch


def equivalence_classes(ds: ray.data.Dataset, gen_cols: list[str]) -> ray.data.Dataset:
    """K2: one row per generalized-tuple class with its size (``class_size``)."""
    keyed = ds.map_batches(lambda b: _group_key_batch(b, gen_cols), batch_format="pyarrow")
    key_cols = [f"_k_{c}" for c in gen_cols]
    grouped = keyed.groupby(key_cols).count()

    def _rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [c[3:] if c.startswith("_k_") else ("class_size" if c == "count()" else c) for c in batch.column_names]
        )

    return grouped.map_batches(_rename, batch_format="pyarrow")


def _group_min_intersection(
    group: pa.Table, rand_attrs: list[RandomizedAttr], chunk: int = 1024
) -> int:
    """Min over records in one equivalence class of
    |{x in class : for every randomized attr, orig_x within r's range}|."""
    m = group.num_rows
    if not rand_attrs:
        return m
    origs, rands, nulls = [], [], []
    for ra in rand_attrs:
        o = _canon(group.column(ra.orig_col), ra.kind)
        r = _canon(group.column(ra.rand_col), ra.kind)
        origs.append(o)
        rands.append(r)
        nulls.append(np.isnan(o))

    if len(rand_attrs) == 1:
        # vectorized: counts via searchsorted over sorted originals
        ra, o, r, isnull = rand_attrs[0], origs[0], rands[0], nulls[0]
        b = ra.benchmark or 0.0
        o_sorted = np.sort(o[~isnull])
        n_null = int(isnull.sum())
        counts = np.empty(m, dtype=np.int64)
        nn = ~isnull
        if nn.any():
            lo = np.searchsorted(o_sorted, r[nn] - b, side="left")
            hi = np.searchsorted(o_sorted, r[nn] + b, side="right")
            counts[nn] = hi - lo
        counts[isnull] = n_null
        return int(counts.min()) if m else 0

    best = m
    for s in range(0, m, chunk):
        e = min(m, s + chunk)
        mask = np.ones((e - s, m), dtype=bool)
        for o, r, isnull, ra in zip(origs, rands, nulls, rand_attrs):
            b = ra.benchmark or 0.0
            r_chunk = r[s:e, None]
            null_chunk = isnull[s:e, None]
            in_range = (~np.isnan(o)[None, :]) & (o[None, :] >= r_chunk - b) & (o[None, :] <= r_chunk + b)
            mask &= np.where(null_chunk, isnull[None, :], in_range)
        best = min(best, int(mask.sum(axis=1).min()))
    return best


def k_anonymity(
    ds: ray.data.Dataset,
    gen_cols: list[str],
    rand_attrs: list[RandomizedAttr],
) -> int:
    """K4. ``rand_attrs`` must carry benchmarks (``compute_benchmarks``)."""
    if not gen_cols and not rand_attrs:
        return ds.count()
    if not gen_cols:
        # single class containing every record
        keyed = ds.map_batches(
            lambda b: b.append_column("_k_all", pa.array([0] * b.num_rows, pa.int32())),
            batch_format="pyarrow",
        )
        gen_key_cols = ["_k_all"]
    else:
        keyed = ds.map_batches(lambda b: _group_key_batch(b, gen_cols), batch_format="pyarrow")
        gen_key_cols = [f"_k_{c}" for c in gen_cols]

    if not rand_attrs:
        grouped = keyed.groupby(gen_key_cols).count()
        return int(grouped.min("count()"))

    def _per_group(group: pa.Table) -> pa.Table:
        return pa.table({"group_min": [_group_min_intersection(group, rand_attrs)]})

    mins = keyed.groupby(gen_key_cols).map_groups(_per_group, batch_format="pyarrow")
    return int(mins.min("group_min"))
