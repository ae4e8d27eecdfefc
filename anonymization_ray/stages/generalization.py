"""Generalization — equal-frequency bucketing of a numeric/date/dateTime column.

Reference semantics (``service/anonymizer/Generalization.java:30-105`` and the
three subclasses):

- drop nulls; k = non-null count; g buckets via the bucket formula
  (``Anonymization.java:77-82``)
- sort the column; the record at sorted rank ``i`` goes to bucket
  ``floor(g*i/k)`` (``Generalization.java:42-57``)
- bucket boundary for position ``p`` derives from sorted index
  ``floor(p*k/g)``: boundary value = midpoint of the adjacent sorted values
  across the cut (``Generalization.java:94-104``; note this index formula is
  *not* the same as the assignment formula when g does not divide p*k — we
  replicate both exactly)
- bucket 0's min and the last bucket's max are "obfuscated"
  (``Generalization.java:76-89``)
- output column ``<attr>_generalized`` references bucket ``<attr>_<idx>``
  (``Generalization.java:59-62,74``).

Scale design: sort only the narrow (value, id) projection; fetch single rows
at the g-1 assignment-cut ranks and g-1 boundary ranks (point lookups); assign
buckets on the unsorted wide data via a broadcast lexicographic searchsorted
inside ``map_batches``. Ties in value are broken by id (the reference's tie
order is arbitrary HashMap order; ours is deterministic).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data

from ..config import calculate_num_buckets
from ..util import sorted_column, valid_mask
from .codecs import CODECS, Codec


@dataclass
class GeneralizationResult:
    attribute: str
    out_col: str
    g: int
    k: int
    kind: str
    # per bucket: bucket idx, min/max in canonical numeric units (None when
    # obfuscated: bucket 0 min, last bucket max)
    buckets: pa.Table

    def bucket_table(self) -> pa.Table:
        return self.buckets

    def formatted_bounds(self) -> list[dict]:
        """Flat-output style bounds with the "obfuscated" sentinel
        (``FaltJsonService.java:204-215``)."""
        codec = CODECS[self.kind]
        out = []
        for row in self.buckets.to_pylist():
            out.append(
                {
                    "bucket": row["bucket"],
                    "min": "obfuscated" if row["min"] is None else codec.format_value(row["min"]),
                    "max": "obfuscated" if row["max"] is None else codec.format_value(row["max"]),
                }
            )
        return out


def _assignment_cut_pairs(sc, g: int) -> tuple[np.ndarray, np.ndarray]:
    """(value, id) at ranks ceil(p*k/g), p=1..g-1 — the first row of each
    bucket under the assignment rule floor(g*i/k)."""
    k = sc.total
    ranks = [-((-p * k) // g) for p in range(1, g)]
    t = sc.rows_at_ranks(ranks)
    v = t.column(sc.value_col).to_numpy(zero_copy_only=False).astype(np.float64)
    ids = t.column(sc.id_col).to_numpy(zero_copy_only=False)
    return v, ids


def _boundary_values(sc, g: int, codec: Codec) -> pa.Table:
    """Bucket boundary table from ranks floor(p*k/g) (reference
    ``getBucketRange``): B_p = midpoint(v[c_p - 1], v[c_p]); bucket p gets
    min=B_p (obfuscated for p=0) and max=B_{p+1} (obfuscated for p=g-1).

    Fully vectorized — at web scale g grows with k (k=10^7 gives g~5·10^5),
    so per-boundary Python calls would dominate the stage."""
    k = sc.total
    num_t = codec.numeric_dtype()
    if g <= 1:
        return pa.table(
            {
                "bucket": pa.array(range(g), type=pa.int32()),
                "min": pa.array([None] * g, type=num_t),
                "max": pa.array([None] * g, type=num_t),
            }
        )
    cuts = (np.arange(1, g, dtype=np.int64) * k) // g
    # cuts is nondecreasing, so the interleaved (cuts-1, cuts) stream is
    # already sorted — linear adjacent-dedup beats np.unique's O(n log n)
    # sort (measurable driver time at web-scale g)
    both = np.empty(2 * (g - 1), dtype=np.int64)
    both[0::2] = cuts - 1
    both[1::2] = cuts
    keep = np.empty(len(both), dtype=bool)
    keep[0] = True
    np.not_equal(both[1:], both[:-1], out=keep[1:])
    needed = both[keep]
    t = sc.rows_at_ranks(needed)  # ndarray: skips a 2g-element tolist
    vals = t.column(sc.value_col).to_numpy(zero_copy_only=False)
    a = vals[np.searchsorted(needed, cuts - 1)]
    b = vals[np.searchsorted(needed, cuts)]
    boundaries = codec.midpoint_array(a, b)
    mins = np.concatenate([[0], boundaries]).astype(boundaries.dtype)
    maxs = np.concatenate([boundaries, [0]]).astype(boundaries.dtype)
    null_first = np.zeros(g, dtype=bool)
    null_first[0] = True
    null_last = np.zeros(g, dtype=bool)
    null_last[-1] = True
    return pa.table(
        {
            "bucket": pa.array(np.arange(g, dtype=np.int32), type=pa.int32()),
            "min": pa.array(mins, mask=null_first).cast(num_t),
            "max": pa.array(maxs, mask=null_last).cast(num_t),
        }
    )


def assign_buckets_np(
    v: np.ndarray, ids: np.ndarray, cut_v: np.ndarray, cut_id: np.ndarray
) -> np.ndarray:
    """bucket = #cut pairs (vc, ic) <= (v, id), lexicographic. Vectorized:
    searchsorted on values, id-tiebreak only on the (rare) exact-tie rows."""
    lo = np.searchsorted(cut_v, v, side="left")
    hi = np.searchsorted(cut_v, v, side="right")
    b = lo.astype(np.int32)
    tie_rows = np.nonzero(lo != hi)[0]
    for i in tie_rows:
        l, h = lo[i], hi[i]
        b[i] = l + np.searchsorted(cut_id[l:h], ids[i], side="right")
    return b


def generalize_column(
    ds: ray.data.Dataset,
    col: str,
    id_col: str,
    *,
    num_attrs: int,
    kind: str,
    out_col: str | None = None,
) -> tuple[ray.data.Dataset, GeneralizationResult]:
    """Add ``<col>_generalized`` (int32 bucket index, null for null input) and
    return the bucket boundary side-table."""
    codec = CODECS[kind]
    out = out_col or f"{col}_generalized"

    sc = sorted_column(ds, col, id_col, codec.to_numeric)
    k = sc.total
    if k == 0:
        def _null(batch: pa.Table) -> pa.Table:
            return batch.append_column(out, pa.nulls(batch.num_rows, pa.int32()))

        empty = pa.table(
            {
                "bucket": pa.array([], pa.int32()),
                "min": pa.array([], codec.numeric_dtype()),
                "max": pa.array([], codec.numeric_dtype()),
            }
        )
        return ds.map_batches(_null, batch_format="pyarrow"), GeneralizationResult(
            attribute=col, out_col=out, g=0, k=0, kind=kind, buckets=empty
        )

    g = calculate_num_buckets(k, num_attrs)
    cut_v, cut_id = _assignment_cut_pairs(sc, g) if g > 1 else (np.array([]), np.array([]))
    buckets = _boundary_values(sc, g, codec)

    def _assign(batch: pa.Table) -> pa.Table:
        varr = codec.to_numeric(batch.column(col))
        valid = np.asarray(valid_mask(varr))
        v = varr.to_numpy(zero_copy_only=False).astype(np.float64)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        b = np.zeros(len(v), dtype=np.int32)
        if g > 1 and valid.any():
            b[valid] = assign_buckets_np(v[valid], ids[valid], cut_v, cut_id)
        col_arr = pa.array(b, type=pa.int32(), mask=~valid)
        if out in batch.column_names:
            batch = batch.drop_columns([out])
        return batch.append_column(out, col_arr)

    res = GeneralizationResult(attribute=col, out_col=out, g=g, k=k, kind=kind, buckets=buckets)
    return ds.map_batches(_assign, batch_format="pyarrow"), res
