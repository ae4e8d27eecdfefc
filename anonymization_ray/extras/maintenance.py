"""Table maintenance — small-file compaction. A streaming 100-TB job that
writes one file per task leaves thousands of KB-scale parquet files behind
(each a metadata fetch + an open at read time); periodic compaction rewrites
a directory into target-sized files. Resumable by construction: the output
directory is written whole and swapped by the caller; the input is
untouched.
"""

from __future__ import annotations

import math

import ray.data as rd


def compact_parquet(
    in_dir: str,
    out_dir: str,
    *,
    target_rows_per_file: int = 1_000_000,
) -> dict:
    """Rewrite ``in_dir``'s parquet into ``out_dir`` with
    ~``target_rows_per_file`` rows per file. One metadata-count, one
    streaming read -> write with a row cap per file — NO repartition
    shuffle: ``num_rows_per_file`` packs at the sink, so the data moves
    exactly once. Returns {n_rows, n_files_in, n_files_out}."""
    import os

    import pyarrow.parquet as pq

    files = [
        os.path.join(in_dir, f)
        for f in sorted(os.listdir(in_dir))
        if f.endswith(".parquet")
    ]
    n_rows = sum(pq.read_metadata(f).num_rows for f in files)
    ds = rd.read_parquet(in_dir)
    ds.write_parquet(
        out_dir,
        min_rows_per_file=min(target_rows_per_file, max(1, n_rows)),
        max_rows_per_file=target_rows_per_file,
    )
    n_out = len([f for f in os.listdir(out_dir) if f.endswith(".parquet")])
    return {
        "n_rows": n_rows,
        "n_files_in": len(files),
        "n_files_out": n_out,
        "expected_files": max(1, math.ceil(n_rows / target_rows_per_file)),
    }
