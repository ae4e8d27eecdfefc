"""Zone-map (min/max) pruned Parquet sink — the numeric-range complement of
the hive-partitioned sink (wave 27): cluster the table by a filter column
with ONE narrow range sort, write one file per block, and let range queries
skip every file whose [min, max] zone misses the predicate — at 100 TB the
manifest (2 int64s per file) is what turns a full-corpus scan into a
handful of row-group reads. The manifest is read straight from the Parquet
footers (no sidecar to drift out of sync with the data)."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd


def write_zonemapped(
    ds: rd.Dataset, path: str, by: str, *, num_files: int = 8
) -> list[tuple[str, int, int]]:
    """Sort by ``by``, write ~num_files files, return the (file, lo, hi)
    manifest recovered from the footers."""
    ds.sort(by).repartition(num_files).write_parquet(path)
    return read_manifest(path, by)


def read_manifest(path: str, by: str) -> list[tuple[str, int, int]]:
    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        f = os.path.join(path, name)
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(by)
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        out.append((f, lo, hi))
    return out


def read_pruned(
    path: str, by: str, lo, hi, *, manifest: list[tuple[str, int, int]] | None = None
) -> tuple[rd.Dataset, int, int]:
    """Range read touching only overlapping zones. Returns (dataset,
    files_read, files_total); the residual in-file filter keeps it exact."""
    import pyarrow.compute as pc

    man = manifest if manifest is not None else read_manifest(path, by)
    keep = [f for f, zlo, zhi in man if not (zhi < lo or zlo > hi)]
    total = len(man)
    if not keep:
        schema = pq.ParquetFile(man[0][0]).schema_arrow if man else None
        return rd.from_arrow(schema.empty_table()) if schema else rd.from_items([]), 0, total

    ds = rd.read_parquet(keep)

    def _residual(b: pa.Table) -> pa.Table:
        c = b.column(by)
        return b.filter(pc.and_(pc.greater_equal(c, lo), pc.less_equal(c, hi)))

    return ds.map_batches(_residual, batch_format="pyarrow"), len(keep), total
