"""Z-order (Morton) clustering — multi-dimensional data layout for
row-group pruning at rest. A 100-TB table queried by TWO columns (e.g.
part x supplier, domain x crawl-date) cannot be sorted by both; interleaving
the bits of the two keys gives one sort key whose ordering keeps
2-D-adjacent rows in the same row groups, so parquet min/max statistics
prune box queries on EITHER column. The z-value itself is pure integer
bit arithmetic — exactly replicable in SQL, which is what the oracle pins.

Scale shape: the z-value map is stateless and vectorized (numpy shifts on
int64); the clustering write is ONE range sort by z (the same exchange any
sorted sink pays) — no new shuffle primitive.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def zorder_key(a: np.ndarray, b: np.ndarray, bits: int = 16) -> np.ndarray:
    """Interleave the low ``bits`` of two non-negative int arrays:
    z = sum_k ((a>>k)&1) << (2k)  |  ((b>>k)&1) << (2k+1).
    Values must fit in ``bits`` bits (raises otherwise — silent truncation
    would interleave garbage)."""
    a = a.astype(np.int64)
    b = b.astype(np.int64)
    cap = np.int64(1) << np.int64(bits)
    if a.min(initial=0) < 0 or b.min(initial=0) < 0:
        raise ValueError("zorder_key needs non-negative keys")
    if (len(a) and a.max() >= cap) or (len(b) and b.max() >= cap):
        raise ValueError(f"zorder_key inputs must fit {bits} bits")
    z = np.zeros(len(a), dtype=np.int64)
    for k in range(bits):
        z |= ((a >> np.int64(k)) & 1) << np.int64(2 * k)
        z |= ((b >> np.int64(k)) & 1) << np.int64(2 * k + 1)
    return z


def zorder_sql_expr(col_a: str, col_b: str, bits: int = 16) -> str:
    """The identical z-value as one SQL expression (bit-exact oracle)."""
    terms = []
    for k in range(bits):
        terms.append(f"((({col_a} >> {k}) & 1) << {2 * k})")
        terms.append(f"((({col_b} >> {k}) & 1) << {2 * k + 1})")
    return " | ".join(terms)


def add_zorder_column(
    ds: rd.Dataset, col_a: str, col_b: str, *, out_col: str = "z", bits: int = 16
) -> rd.Dataset:
    """Append the Morton key column (stateless vectorized pass)."""

    def _z(batch: pa.Table) -> pa.Table:
        a = batch.column(col_a).to_numpy(zero_copy_only=False)
        b = batch.column(col_b).to_numpy(zero_copy_only=False)
        return batch.append_column(out_col, pa.array(zorder_key(a, b, bits), pa.int64()))

    return ds.map_batches(_z, batch_format="pyarrow")


def write_zordered(
    ds: rd.Dataset,
    out_dir: str,
    col_a: str,
    col_b: str,
    *,
    bits: int = 16,
    num_rows_per_file: int | None = None,
) -> None:
    """Cluster by z and write parquet: ONE sort by the Morton key, then a
    plain partitioned write — downstream range scans on (col_a, col_b)
    boxes prune row groups via parquet min/max stats on BOTH columns."""
    zd = add_zorder_column(ds, col_a, col_b, bits=bits).sort("z")
    kwargs = {}
    if num_rows_per_file is not None:
        kwargs["num_rows_per_file"] = num_rows_per_file
    zd.write_parquet(out_dir, **kwargs)
