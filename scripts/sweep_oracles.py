#!/usr/bin/env python
"""Driver-style correctness sweep: run EVERY queries() entry and its DuckDB
oracle side-by-side over one sf directory, compare schema / row count /
sorted values, and print one line per mismatch (none expected).

Usage: python scripts/sweep_oracles.py [sf_dir] [num_cpus] [--only name1,name2]
(This script owns its Ray session — library code never calls ray.init.)
"""

from __future__ import annotations

import sys
import time

import duckdb
import pyarrow as pa
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings"


def main() -> int:
    argv = list(sys.argv[1:])
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        del argv[i : i + 2]
    sys.argv = [sys.argv[0], *argv]
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, ".")
    from __ray_entry__ import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES.split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    q, o = queries(), oracle_sql()
    if only:
        missing = only - set(q)
        if missing:
            print(f"unknown query names: {sorted(missing)}")
            return 1
        q = {k: v for k, v in q.items() if k in only}
    bad = 0
    t0 = time.perf_counter()
    for name in sorted(q):
        try:
            res = q[name](sf)
            df = res.to_pandas() if hasattr(res, "to_pandas") else res
            if isinstance(df, pa.Table):
                df = df.to_pandas()
            ref = con.execute(o[name]).df()
            cols = sorted(df.columns)
            if cols != sorted(ref.columns):
                print(f"MISMATCH {name}: schema {cols} vs {sorted(ref.columns)}")
                bad += 1
                continue
            a = df[cols].sort_values(cols).reset_index(drop=True).astype(str)
            b = ref[cols].sort_values(cols).reset_index(drop=True).astype(str)
            if len(a) != len(b):
                print(f"MISMATCH {name}: rows {len(a)} vs {len(b)}")
                bad += 1
            elif not a.equals(b):
                print(f"MISMATCH {name}: values")
                bad += 1
        except Exception as e:  # noqa: BLE001 — report and keep sweeping
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            bad += 1
    print(f"swept {len(q)} queries over {sf} in {time.perf_counter()-t0:.1f}s; "
          f"mismatches: {bad}")
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
