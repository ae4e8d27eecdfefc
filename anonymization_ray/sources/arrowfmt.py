"""ORC and Feather (Arrow IPC) shard sources/sinks.

Warehouse interchange formats the reference's flat exports map onto
(SURVEY.md §2 S-family): ORC is the Hive/Trino-side columnar twin of
Parquet, Feather v2 IS the Arrow IPC file format (zero-copy mmap-able).
Ray Data ships no ORC/Feather reader in 2.49, so both directions are
built from primitives the streaming executor already schedules:

- **write**: one shard per input block via ``map_batches`` — each task
  serializes its block with the pyarrow ORC/IPC writer and emits a
  one-row manifest (path, rows). Shard filenames are a SHA-1 of the
  serialized payload, so a retried task rewrites the SAME file with the
  SAME bytes (idempotent under Ray task retry — no duplicate shards,
  the write stays exactly-once at the manifest level).
- **read**: ``ray.data.read_binary_files`` lists + fetches shards in
  parallel (parallelism = shard count, the WARC-source contract), and a
  vectorized decode turns each payload into its Arrow table via
  ``pa.BufferReader`` — no filesystem state inside the worker beyond
  the fetched bytes, so the same path works against any fsspec store.

At 100 TB: shards are block-sized (the write never concentrates), the
manifest is the only driver-sized artifact, and read parallelism scales
with the shard count the write produced.
"""

from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import ray.data as rd


def _shard_writer(out_dir: str, ext: str, serialize):
    os.makedirs(out_dir, exist_ok=True)

    def _write(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"path": pa.array([], pa.string()),
                 "rows": pa.array([], pa.int64())}
            )
        payload = serialize(batch)
        name = hashlib.sha1(payload).hexdigest()[:20]
        path = os.path.join(out_dir, f"part-{name}.{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)  # atomic: readers never see a torn shard
        return pa.table(
            {"path": pa.array([path], pa.string()),
             "rows": pa.array([batch.num_rows], pa.int64())}
        )

    return _write


def _orc_bytes(batch: pa.Table) -> bytes:
    from pyarrow import orc

    sink = pa.BufferOutputStream()
    orc.write_table(batch.combine_chunks(), sink)
    return sink.getvalue().to_pybytes()


def _ipc_bytes(batch: pa.Table) -> bytes:
    sink = pa.BufferOutputStream()
    with pa.ipc.new_file(sink, batch.schema) as w:
        w.write_table(batch)
    return sink.getvalue().to_pybytes()


def write_orc_shards(ds: rd.Dataset, out_dir: str) -> pa.Table:
    """Write one ORC shard per block; returns the (path, rows) manifest."""
    man = ds.map_batches(
        _shard_writer(out_dir, "orc", _orc_bytes), batch_format="pyarrow"
    )
    return pa.Table.from_pandas(man.to_pandas(), preserve_index=False)


def write_feather_shards(ds: rd.Dataset, out_dir: str) -> pa.Table:
    """Write one Feather-v2/IPC shard per block; returns the manifest."""
    man = ds.map_batches(
        _shard_writer(out_dir, "arrow", _ipc_bytes), batch_format="pyarrow"
    )
    return pa.Table.from_pandas(man.to_pandas(), preserve_index=False)


def _decode_reader(decode):
    def _read(batch: pa.Table) -> pa.Table:
        tables = [
            decode(buf.as_py() if hasattr(buf, "as_py") else buf)
            for buf in batch.column("bytes")
        ]
        if not tables:
            raise ValueError("empty binary batch from shard read")
        return pa.concat_tables(tables, promote_options="default")

    return _read


def _orc_decode(payload: bytes) -> pa.Table:
    from pyarrow import orc

    return orc.ORCFile(pa.BufferReader(payload)).read()


def _ipc_decode(payload: bytes) -> pa.Table:
    return pa.ipc.open_file(pa.BufferReader(payload)).read_all()


def read_orc(paths: str | list[str]) -> rd.Dataset:
    """ORC shard dir/file(s) -> Dataset (parallelism = shard count)."""
    ds = rd.read_binary_files(paths, file_extensions=["orc"])
    return ds.map_batches(_decode_reader(_orc_decode), batch_format="pyarrow")


def read_feather(paths: str | list[str]) -> rd.Dataset:
    """Feather/IPC shard dir/file(s) -> Dataset (parallelism = shards)."""
    ds = rd.read_binary_files(paths, file_extensions=["arrow"])
    return ds.map_batches(_decode_reader(_ipc_decode), batch_format="pyarrow")
