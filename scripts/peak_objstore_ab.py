#!/usr/bin/env python
"""A/B peak-object-store measurement for the corpus-prep path (VERDICT r3
item 1 done-criterion): run prepare_training_corpus over a 20x-replicated
documents corpus twice —

  stream : current code (text stays lazy until the final partitioned write)
  pinned : the round-3 shape simulated by an upfront .materialize() of the
           full (id, text) corpus before the pipeline runs

— and report the peak object-store usage of each (sampled at 50 ms from
ray.available_resources). Usage: python scripts/peak_objstore_ab.py <mode>
(one mode per process so sessions don't share the store).
"""

from __future__ import annotations

import json
import shutil
import sys
import threading
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CORPUS = "/tmp/corpus20x_ab"
OUT = "/tmp/prep_ab_out"
REPL = 20
SHARDS = 64


def build_corpus() -> None:
    if Path(CORPUS, "shard_63.parquet").exists():
        return
    src = pq.read_table("/root/testdata/sf0.1/documents.parquet", columns=["doc_id", "text"])
    Path(CORPUS).mkdir(parents=True, exist_ok=True)
    n = src.num_rows
    ids = src.column("doc_id").to_numpy()
    texts = src.column("text")
    reps = []
    for r in range(REPL):
        reps.append(
            pa.table({"doc_id": pa.array(ids + r * 10_000_000, pa.int64()), "text": texts})
        )
    full = pa.concat_tables(reps)
    rows_per = (full.num_rows + SHARDS - 1) // SHARDS
    for s in range(SHARDS):
        part = full.slice(s * rows_per, rows_per)
        pq.write_table(part, f"{CORPUS}/shard_{s}.parquet")


def main() -> int:
    mode = sys.argv[1]
    build_corpus()
    import ray

    ray.init(address="local", num_cpus=32, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    from anonymization_ray.pipelines.corpus import prepare_training_corpus

    total = ray.cluster_resources().get("object_store_memory", 0.0)
    stop = threading.Event()
    peak = {"used": 0.0, "sum": 0.0, "n": 0}

    def _poll():
        while not stop.is_set():
            avail = ray.available_resources().get("object_store_memory", total)
            used = total - avail
            peak["used"] = max(peak["used"], used)
            peak["sum"] += used
            peak["n"] += 1
            time.sleep(0.05)

    t = threading.Thread(target=_poll, daemon=True)
    t.start()

    docs = ray.data.read_parquet(CORPUS, columns=["doc_id", "text"])
    if mode == "pinned":
        docs = docs.materialize()  # round-3 shape: full corpus text pinned upfront

    shutil.rmtree(OUT, ignore_errors=True)
    t0 = time.perf_counter()
    manifest = prepare_training_corpus(
        docs, OUT, min_tokens=20, bench_mod=89, decon_n=6, num_shards=32
    )
    wall = time.perf_counter() - t0
    stop.set()
    t.join(timeout=1)
    print(
        json.dumps(
            {
                "mode": mode,
                "peak_objstore_mb": round(peak["used"] / 1e6, 1),
                "mean_objstore_mb": round(peak["sum"] / max(peak["n"], 1) / 1e6, 1),
                "total_objstore_mb": round(total / 1e6, 1),
                "wall_sec": round(wall, 1),
                "docs_in": manifest.get("input_docs"),
                "chunks_out": manifest.get("packed_rows"),
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
