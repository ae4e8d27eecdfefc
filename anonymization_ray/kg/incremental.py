"""Incremental KG ingest: merge a delta batch of triples into an existing
materialized triple store, rewriting ONLY the partitions the delta touches.

A 10^12-document KG is never rebuilt per crawl increment — the store at
``out_dir`` (SPO/POS layouts, subject-hash ``part=<i>/`` directories,
per-partition lineage manifests; see ``materialize.py``) absorbs deltas:

1. the delta stream gets the SAME deterministic subject-hash partition
   column as the base store;
2. the touched partition ids are gathered (bounded by ``num_partitions``,
   never by delta size);
3. for each layout, only the touched ``part=<i>`` directories are read
   back, unioned with the delta subset, deduplicated with the sort-based
   ``distinct_rows`` (set semantics: re-ingesting a crawl is a no-op), and
   rewritten sorted; untouched partitions keep their files AND manifests
   byte-for-byte;
4. touched manifests are rewritten with the merged row count and the delta
   appended to the lineage ``inputs`` list.

Work is proportional to (touched base partitions + delta), not base size —
the property that makes per-crawl increments affordable at 100 TB. Merge is
crash-safe the same way materialize is: a partition's manifest is written
only after its data lands, so a killed merge re-runs and rewrites the same
touched set (distinct-union is idempotent).
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .materialize import LAYOUT_KEYS, _manifest_path, _partition_col


def store_num_partitions(out_dir: str) -> int:
    """Infer the store's partition count from its manifest directory."""
    mdir = os.path.join(out_dir, "_manifests")
    parts = [
        int(f.split("part=")[1].split(".")[0])
        for f in os.listdir(mdir)
        if f.endswith(".json") and "part=" in f
    ]
    if not parts:
        raise ValueError(f"no partition manifests under {mdir}")
    return max(parts) + 1


def merge_delta(
    out_dir: str,
    delta: rd.Dataset,
    *,
    layouts: tuple[str, ...] = ("spo", "pos"),
    delta_input: str = "delta",
    num_partitions: int | None = None,
) -> dict:
    """Merge ``delta`` triples (subj/pred/obj[/obj_kind...] rows) into the
    store at ``out_dir``; returns {layout: {"rows": n_merged_rows,
    "touched": [parts], "untouched": [parts]}}."""
    import shutil

    from ..util import coalesce_blocks, distinct_rows

    nparts = num_partitions or store_num_partitions(out_dir)

    parted = delta.map_batches(
        lambda b: _partition_col(b, nparts), batch_format="pyarrow"
    )
    parted = coalesce_blocks(parted.materialize())
    touched = sorted(
        {r["part"] for r in parted.groupby("part").count().take_all()}
    )
    report: dict = {}
    if not touched:
        for layout in layouts:
            report[layout] = {
                "rows": 0,
                "touched": [],
                "untouched": list(range(nparts)),
            }
        return report

    cols = parted.schema().names  # includes 'part'
    merged = None
    for layout in layouts:
        keys = LAYOUT_KEYS[layout]
        layout_dir = os.path.join(out_dir, layout)
        if merged is None:
            # base rows of the touched partitions (one layout holds the full
            # row set; hive dirs re-attach the part column on read)
            base_files = []
            for p in touched:
                pdir = os.path.join(layout_dir, f"part={p}")
                if os.path.isdir(pdir):
                    base_files += [
                        os.path.join(pdir, f)
                        for f in os.listdir(pdir)
                        if f.endswith(".parquet")
                    ]
            streams = [parted]
            if base_files:
                base = rd.read_parquet(base_files)
                # partition value comes back as the hive key; recompute to a
                # plain column with identical values/type
                base = base.map_batches(
                    lambda b: _partition_col(
                        b.drop_columns(["part"]) if "part" in b.column_names else b,
                        nparts,
                    ),
                    batch_format="pyarrow",
                )
                streams.append(base.select_columns(cols))
            uni = streams[0].select_columns(cols)
            for s in streams[1:]:
                uni = uni.union(s)
            # 'part' is a pure function of subj, so including it in the
            # distinct key set keeps set semantics AND keeps the column
            merged = coalesce_blocks(distinct_rows(uni, cols).materialize())
            n_merged = merged.count()
        for p in touched:
            pdir = os.path.join(layout_dir, f"part={p}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
        merged.sort(keys).write_parquet(layout_dir, partition_cols=["part"])
        counts = {
            r["part"]: r["count()"] for r in merged.groupby("part").count().take_all()
        }
        for p in touched:
            mp = _manifest_path(out_dir, layout, p)
            try:
                m = json.load(open(mp))
            except (OSError, json.JSONDecodeError):
                m = {"partition": p, "layout": layout, "config_hash": "", "inputs": []}
            m["rows"] = int(counts.get(p, 0))
            m["inputs"] = list(m.get("inputs", [])) + [delta_input]
            with open(mp, "w") as f:
                json.dump(m, f)
        report[layout] = {
            "rows": int(n_merged),
            "touched": touched,
            "untouched": [p for p in range(nparts) if p not in touched],
        }
    return report
