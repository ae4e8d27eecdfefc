"""Hash-bucketed table layout + shuffle-free co-located join.

The "pick ONE partitioning key and reuse it across stages" pattern made
concrete: pay the all-to-all ONCE at write time (each table is hash-bucketed
by the join key into B directories), and every subsequent equi-join on that
key becomes B independent, embarrassingly-parallel bucket joins — one task
reads bucket b of both sides and joins in memory with Arrow's C kernel. No
repartition, no join shuffle, no aggregator actors at read time. On a real
cluster the bucket pairing is also the co-location unit (bucket b of every
table lands on the same node), so the join never crosses the network.

Bucket function: ``sm64_key(key) % B`` — SplitMix64, replicated bit-for-bit
in HUGEINT SQL throughout this repo, so layouts written here are
oracle-checkable and stable across runs/engines.

Sizing contract: B must be chosen so (|A|+|B|)/B fits a worker's heap —
the same contract as any hash-partition count. Buckets are parquet
directories, so a failed run resumes per-bucket (the resumable-output rule).
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .shuffle import sm64_key


def bucket_of(keys: np.ndarray, num_buckets: int) -> np.ndarray:
    """Deterministic bucket id per int64 key (SplitMix64 then mod)."""
    return (sm64_key(keys.astype(np.int64)) % np.uint64(num_buckets)).astype(np.int64)


def write_bucketed(
    ds: rd.Dataset, out_dir: str, key_col: str, num_buckets: int
) -> str:
    """Hash-bucket ``ds`` by ``key_col`` into ``out_dir/bucket=<b>/`` parquet
    directories — the one-time all-to-all that every later co-located join
    amortizes. Null keys are rejected loudly (a null would silently change
    join semantics)."""

    def _tag(b: pa.Table) -> pa.Table:
        k = b.column(key_col)
        if pc.any(pc.is_null(k)).as_py():
            raise ValueError(f"write_bucketed: null {key_col} keys are not joinable")
        kv = k.to_numpy(zero_copy_only=False).astype(np.int64)
        return b.append_column(
            "__bucket", pa.array(bucket_of(kv, num_buckets), pa.int64())
        )

    shutil.rmtree(out_dir, ignore_errors=True)  # write_parquet appends
    tagged = ds.map_batches(_tag, batch_format="pyarrow")
    tagged.write_parquet(out_dir, partition_cols=["__bucket"])
    return out_dir


@ray.remote(num_cpus=1)
def _join_bucket(
    dir_a: str, dir_b: str, b: int, key_col: str, how: str
) -> pa.Table:
    import pyarrow.parquet as pq

    def _read(d: str) -> pa.Table | None:
        p = os.path.join(d, f"__bucket={b}")
        if not os.path.isdir(p):
            return None
        t = pq.read_table(p)
        return t.drop_columns([c for c in ("__bucket",) if c in t.column_names])

    ta, tb = _read(dir_a), _read(dir_b)
    if ta is None or tb is None or ta.num_rows == 0 or tb.num_rows == 0:
        if how == "inner" or ta is None or ta.num_rows == 0:
            return pa.table({})
        # left outer with empty right: pad right columns as nulls
        return ta
    return ta.join(tb, keys=key_col, join_type=how)


def bucketed_join(
    dir_a: str,
    dir_b: str,
    key_col: str,
    num_buckets: int,
    *,
    how: str = "inner",
) -> rd.Dataset:
    """Join two same-key bucketed layouts with ZERO shuffle: one Arrow
    in-memory join task per bucket (bucket b of A can only match bucket b
    of B — the bucket function is the join-key hash), results re-exposed as
    a Dataset via zero-copy block refs."""
    refs = [
        _join_bucket.remote(dir_a, dir_b, b, key_col, how)
        for b in range(num_buckets)
    ]
    # joined blocks stay in the object store — the driver only probes row
    # counts to drop schema-less empty buckets
    @ray.remote(num_cpus=0.25)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    keep = [r for r, c in zip(refs, counts) if c > 0]
    if not keep:
        return rd.from_arrow(pa.table({key_col: pa.array([], pa.int64())}))
    return rd.from_arrow_refs(keep)
