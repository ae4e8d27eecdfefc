"""Graph materialization: sorted Parquet triple tables with per-partition
lineage manifests and checkpoint-resume.

Layouts (north star): SPO (sorted subj, pred, obj) and POS (pred, obj, subj).
Output is hash-partitioned by subject into ``part=<i>/`` directories — never
one giant file — so a failed run resumes by skipping partitions whose
manifest already exists (anti-join of manifest vs input partitions).

Manifest (one JSON per partition per layout):
    {"partition": i, "rows": n, "config_hash": h, "inputs": [...],
     "layout": "spo"}
"""

from __future__ import annotations

import hashlib
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

LAYOUT_KEYS = {"spo": ["subj", "pred", "obj"], "pos": ["pred", "obj", "subj"]}


def _partition_col(batch: pa.Table, num_partitions: int) -> pa.Table:
    # deterministic subject hash -> partition, vectorized (pandas siphash with
    # its fixed default key: stable across processes and runs)
    import numpy as np
    import pandas as pd

    subs = batch.column("subj").to_numpy(zero_copy_only=False)
    parts = (pd.util.hash_array(subs.astype(object)) % num_partitions).astype(np.int32)
    if "part" in batch.column_names:
        batch = batch.drop_columns(["part"])
    return batch.append_column("part", pa.array(parts, pa.int32()))


def config_hash(obj) -> str:
    return hashlib.sha256(json.dumps(obj, sort_keys=True, default=str).encode()).hexdigest()[:16]


def _manifest_path(out_dir: str, layout: str, part: int) -> str:
    # manifests live OUTSIDE the layout dir so parquet directory readers
    # (ray.data / pyarrow.dataset) never trip over JSON files
    return os.path.join(out_dir, "_manifests", f"{layout}_part={part}.json")


def finished_partitions(out_dir: str, layout: str, num_partitions: int, cfg_hash: str) -> set[int]:
    done = set()
    for p in range(num_partitions):
        mp = _manifest_path(out_dir, layout, p)
        if os.path.exists(mp):
            try:
                m = json.load(open(mp))
                if m.get("config_hash") == cfg_hash:
                    done.add(p)
            except (json.JSONDecodeError, OSError):
                pass
    return done


def resume_missing_partitions(
    out_dir: str, layout: str, num_partitions: int, cfg_hash: str
) -> list[int]:
    return [
        p
        for p in range(num_partitions)
        if p not in finished_partitions(out_dir, layout, num_partitions, cfg_hash)
    ]


def materialize_triples(
    triples: rd.Dataset,
    out_dir: str,
    *,
    layouts: tuple[str, ...] = ("spo", "pos"),
    num_partitions: int = 16,
    inputs: list[str] | None = None,
    config: dict | None = None,
    resume: bool = True,
) -> dict:
    """Write sorted triple layouts; returns {layout: {"rows": n, "written":
    [parts], "skipped": [parts]}}. Rerunning after a partial failure only
    rewrites partitions whose manifest is missing/stale."""
    cfg_hash = config_hash(config or {})
    report: dict = {}

    parted = triples.map_batches(
        lambda b: _partition_col(b, num_partitions), batch_format="pyarrow"
    )
    # materialize once; both layouts and all partitions consume it without
    # re-running the upstream pipeline. Coalesce: unions of many small
    # streams leave hundreds of tiny blocks that multiply sort overhead.
    from ..util import coalesce_blocks

    parted = coalesce_blocks(parted.materialize())

    for layout in layouts:
        keys = LAYOUT_KEYS[layout]
        todo = (
            resume_missing_partitions(out_dir, layout, num_partitions, cfg_hash)
            if resume
            else list(range(num_partitions))
        )
        skipped = [p for p in range(num_partitions) if p not in todo]
        layout_dir = os.path.join(out_dir, layout)
        os.makedirs(layout_dir, exist_ok=True)
        os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
        rows_total = 0
        if todo:
            todo_set = set(todo)
            # clear stale files of partitions being (re)written — write_parquet
            # appends into existing directories
            import shutil

            for p in todo:
                pdir = os.path.join(layout_dir, f"part={p}")
                if os.path.isdir(pdir):
                    shutil.rmtree(pdir)
            if len(todo) < num_partitions:
                tarr = pa.array(sorted(todo_set), pa.int32())
                subset = parted.map_batches(
                    lambda b, ta=tarr: b.filter(pc.is_in(b.column("part"), value_set=ta)),
                    batch_format="pyarrow",
                )
            else:
                subset = parted
            ordered = subset.sort(keys)
            ordered.write_parquet(layout_dir, partition_cols=["part"])
            counts = {
                r["part"]: r["count()"]
                for r in subset.groupby("part").count().take_all()
            }
            for p in todo:
                n = int(counts.get(p, 0))
                rows_total += n
                with open(_manifest_path(out_dir, layout, p), "w") as f:
                    json.dump(
                        {
                            "partition": p,
                            "rows": n,
                            "config_hash": cfg_hash,
                            "inputs": inputs or [],
                            "layout": layout,
                        },
                        f,
                    )
        report[layout] = {"rows": rows_total, "written": todo, "skipped": skipped}
    return report


def read_layout(out_dir: str, layout: str) -> rd.Dataset:
    return rd.read_parquet(os.path.join(out_dir, layout))


def read_pred(out_dir: str, pred: str) -> rd.Dataset:
    """Index-aware read of one predicate from the POS layout: the layout is
    sorted by (pred, obj, subj) inside hash partitions, so parquet row-group
    statistics are tight on ``pred`` and the pushed-down filter prunes
    row groups before any byte leaves storage — the triple-store access
    path the POS layout exists for."""
    import pyarrow.dataset as pads

    return rd.read_parquet(
        os.path.join(out_dir, "pos"), filter=pads.field("pred") == pred
    )


def read_subject(out_dir: str, subj: str) -> rd.Dataset:
    """Index-aware read of one subject's triples from the SPO layout (sorted
    by (subj, pred, obj)): row-group pruning on ``subj``."""
    import pyarrow.dataset as pads

    return rd.read_parquet(
        os.path.join(out_dir, "spo"), filter=pads.field("subj") == subj
    )
