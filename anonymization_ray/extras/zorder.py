"""Z-order (Morton) clustering keys — the multi-dimensional physical-layout
primitive: interleaving the bits of two sort dimensions gives a single sort
key whose ranges are 2-D locality buckets, so ONE narrow sort + range
partition clusters the table for row-group pruning on EITHER dimension
(what a 100-TB table needs when queries filter sometimes by key, sometimes
by value — a plain composite sort only prunes the leading column).

Everything is exact int64 bit arithmetic (bounded loop over BIT positions —
20 vectorized numpy ops, never a row loop), replicated term-for-term in SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd


def zorder_key(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    *,
    bits: int = 20,
    out_col: str = "zval",
    bucket_bits: int = 8,
    bucket_col: str | None = "zbucket",
) -> rd.Dataset:
    """Append the Morton interleave of (x, y) (x gets even bit positions, y
    odd) and optionally the top-``bucket_bits`` cluster id. Raises when a
    value exceeds ``bits`` — silent truncation would break locality."""
    cap = 1 << bits
    shift = 2 * bits - bucket_bits

    def _z(b: pa.Table) -> pa.Table:
        x = b.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = b.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        for name, v in ((x_col, x), (y_col, y)):
            if len(v) and (v.min() < 0 or v.max() >= cap):
                raise ValueError(
                    f"{name} out of [0, 2^{bits}) for z-ordering; raise bits"
                )
        z = np.zeros(len(x), np.int64)
        for i in range(bits):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        out = b.append_column(out_col, pa.array(z, pa.int64()))
        if bucket_col:
            out = out.append_column(bucket_col, pa.array(z >> shift, pa.int64()))
        return out

    return ds.map_batches(_z, batch_format="pyarrow")


def sql_zorder_expr(x_expr: str, y_expr: str, bits: int = 20) -> str:
    """The identical interleave as a SQL BIGINT expression."""
    terms = []
    for i in range(bits):
        terms.append(f"(({x_expr}) // {1 << i} % 2) * {1 << (2 * i)}")
        terms.append(f"(({y_expr}) // {1 << i} % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
