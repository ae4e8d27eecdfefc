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


# --------------------------------------------------------------------------
# incremental exact dedup: delta vs a persisted content-hash index
# --------------------------------------------------------------------------

def build_hash_index(
    docs: rd.Dataset,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 16,
) -> int:
    """Seed the dedup index: hash-partitioned parquet of content hashes
    (one ``part=<i>/`` dir per hash bucket, content-hash-named files so
    re-runs are idempotent). Returns the number of distinct hashes."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..util import distinct_rows

    def _h(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.array(b.column(text_col).to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table({"h": pa.array(h, pa.int64())})

    hashes = distinct_rows(
        docs.select_columns([text_col]).map_batches(_h, batch_format="pyarrow"), ["h"]
    ).materialize()
    n = hashes.count()

    def _write(b: pa.Table) -> pa.Table:
        import hashlib

        h = b.column("h").to_numpy(zero_copy_only=False)
        parts = (h.astype("uint64") % np.uint64(num_partitions)).astype(np.int64)
        written = []
        for p in np.unique(parts):
            sub = np.sort(h[parts == p])
            pdir = os.path.join(index_dir, f"part={int(p)}")
            os.makedirs(pdir, exist_ok=True)
            name = f"seed-{hashlib.sha256(sub.tobytes()).hexdigest()[:16]}.parquet"
            pq.write_table(pa.table({"h": pa.array(sub, pa.int64())}),
                           os.path.join(pdir, name))
            written.append(name)
        return pa.table({"file": pa.array(written, pa.string())})

    hashes.map_batches(_write, batch_format="pyarrow").materialize()
    with open(os.path.join(index_dir, "_meta.json"), "w") as f:
        json.dump({"num_partitions": num_partitions}, f)
    return int(n)


def dedup_against_index(
    docs: rd.Dataset,
    index_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    delta_input: str = "delta",
    update_index: bool = True,
) -> rd.Dataset:
    """Incremental exact dedup for crawl increments: keep only delta docs
    whose content hash is NOT already in the persisted index (first-by-id
    within the delta), and append the survivors' hashes to the index.
    Returns Dataset[(id_col,)] of survivors.

    Scale shape: the index at 10^12 docs is terabytes of hashes — never
    broadcast. The delta's narrow (hash, id) stream is hash-partitioned to
    the index's buckets and each bucket task reads ONLY its own ``part=<i>``
    hash files (np.searchsorted membership probe) — index I/O is
    proportional to the buckets the delta touches, and bucket tasks are
    bounded by ``num_partitions`` regardless of delta size."""
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from ..util import min_per_key

    meta = json.load(open(os.path.join(index_dir, "_meta.json")))
    nparts = int(meta["num_partitions"])

    def _h(b: pa.Table) -> pa.Table:
        h = pd.util.hash_array(
            np.array(b.column(text_col).to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {"h": pa.array(h, pa.int64()), id_col: b.column(id_col).combine_chunks()}
        )

    keyed = docs.select_columns([text_col, id_col]).map_batches(
        _h, batch_format="pyarrow"
    )
    firsts = min_per_key(keyed, "h", id_col)

    def _part(b: pa.Table) -> pa.Table:
        h = b.column("h").to_numpy(zero_copy_only=False)
        p = (h.astype("uint64") % np.uint64(nparts)).astype(np.int64)
        return b.append_column("part", pa.array(p, pa.int64()))

    def _probe(group: pa.Table) -> pa.Table:
        import hashlib

        if group.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64())})
        p = int(group.column("part")[0].as_py())
        pdir = os.path.join(index_dir, f"part={p}")
        if os.path.isdir(pdir):
            idx = np.sort(
                np.concatenate(
                    [
                        pq.read_table(os.path.join(pdir, f), columns=["h"])
                        .column("h")
                        .to_numpy(zero_copy_only=False)
                        for f in os.listdir(pdir)
                        if f.endswith(".parquet")
                    ]
                    or [np.array([], np.int64)]
                )
            )
        else:
            idx = np.array([], np.int64)
        h = group.column("h").to_numpy(zero_copy_only=False)
        if len(idx):
            pos = np.searchsorted(idx, h)
            np.clip(pos, 0, len(idx) - 1, out=pos)
            new = idx[pos] != h
        else:
            new = np.ones(len(h), bool)
        surv = group.filter(pa.array(new))
        if update_index and surv.num_rows:
            os.makedirs(pdir, exist_ok=True)
            sub = np.sort(surv.column("h").to_numpy(zero_copy_only=False))
            name = (
                f"{delta_input}-"
                f"{hashlib.sha256(sub.tobytes()).hexdigest()[:16]}.parquet"
            )
            tmp = os.path.join(pdir, "." + name + ".tmp")
            pq.write_table(pa.table({"h": pa.array(sub, pa.int64())}), tmp)
            os.replace(tmp, os.path.join(pdir, name))
        return surv.select([id_col])

    return (
        firsts.map_batches(_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_probe, batch_format="pyarrow")
    )


def delete_subjects(
    out_dir: str,
    subjects: rd.Dataset,
    *,
    subj_col: str = "subj",
    layouts: tuple[str, ...] = ("spo", "pos"),
    delete_input: str = "forget",
    num_partitions: int | None = None,
) -> dict:
    """Right-to-be-forgotten for the materialized triple store: remove every
    triple whose subject appears in ``subjects``, rewriting ONLY the
    subject-hash partitions those subjects map to (the same touched-partition
    discipline as ``merge_delta`` — work is proportional to touched
    partitions + the deletion list, never base size; untouched partitions
    keep their files AND manifests byte-identical). The deletion list is
    distinct-reduced and broadcast; the touched partitions re-filter with one
    vectorized anti ``is_in`` pass and re-sort. Returns {layout: {"deleted":
    n, "touched": [...], "untouched": [...]}}."""
    import shutil

    import numpy as np

    from ..extras.joins import semi_anti_join
    from ..util import coalesce_blocks

    nparts = num_partitions or store_num_partitions(out_dir)

    # distinct subjects + their partitions (tiny by contract: a deletion
    # request is id-list-scale, not corpus-scale)
    subj_parted = subjects.map_batches(
        lambda b: _partition_col(
            pa.table({"subj": pc.cast(b.column(subj_col), pa.string())}), nparts
        ),
        batch_format="pyarrow",
    )
    touched = sorted({r["part"] for r in subj_parted.groupby("part").count().take_all()})
    report: dict = {}
    if not touched:
        for layout in layouts:
            report[layout] = {
                "deleted": 0,
                "touched": [],
                "untouched": list(range(nparts)),
            }
        return report

    kept = None
    n_deleted = 0
    for layout in layouts:
        keys = LAYOUT_KEYS[layout]
        layout_dir = os.path.join(out_dir, layout)
        if kept is None:
            base_files = []
            for p in touched:
                pdir = os.path.join(layout_dir, f"part={p}")
                if os.path.isdir(pdir):
                    base_files += [
                        os.path.join(pdir, f)
                        for f in os.listdir(pdir)
                        if f.endswith(".parquet")
                    ]
            if base_files:
                base = rd.read_parquet(base_files)
                base = base.map_batches(
                    lambda b: _partition_col(
                        b.drop_columns(["part"]) if "part" in b.column_names else b,
                        nparts,
                    ),
                    batch_format="pyarrow",
                )
                n_base = base.count()
                kept = coalesce_blocks(
                    semi_anti_join(
                        base, subjects, on="subj", right_on=subj_col, anti=True
                    ).materialize()
                )
                n_deleted = n_base - kept.count()
            else:
                kept = rd.from_arrow(
                    pa.table(
                        {
                            "subj": pa.array([], pa.string()),
                            "pred": pa.array([], pa.string()),
                            "obj": pa.array([], pa.string()),
                            "obj_kind": pa.array([], pa.string()),
                            "part": pa.array([], pa.int64()),
                        }
                    )
                )
        for p in touched:
            pdir = os.path.join(layout_dir, f"part={p}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
        if kept.count():
            kept.sort(keys).write_parquet(layout_dir, partition_cols=["part"])
        counts = (
            {r["part"]: r["count()"] for r in kept.groupby("part").count().take_all()}
            if kept.count()
            else {}
        )
        for p in touched:
            mp = _manifest_path(out_dir, layout, p)
            try:
                m = json.load(open(mp))
            except (OSError, json.JSONDecodeError):
                m = {"partition": p, "layout": layout, "config_hash": "", "inputs": []}
            m["rows"] = int(counts.get(p, 0))
            m["inputs"] = list(m.get("inputs", [])) + [delete_input]
            with open(mp, "w") as f:
                json.dump(m, f)
        report[layout] = {
            "deleted": int(n_deleted),
            "touched": touched,
            "untouched": [p for p in range(nparts) if p not in touched],
        }
    return report


def merge_upsert(
    out_dir: str,
    updates: rd.Dataset,
    *,
    key_cols: tuple[str, str] = ("subj", "pred"),
    layouts: tuple[str, ...] = ("spo", "pos"),
    delta_input: str = "upsert",
    num_partitions: int | None = None,
) -> dict:
    """UPSERT into the materialized triple store: every base row whose
    ``key_cols`` (default (subj, pred)) appear in ``updates`` is REPLACED by
    the update rows for that key (multi-valued keys replace as a set); keys
    absent from the base insert. ``merge_delta`` is insert-with-set-semantics
    (re-ingest is a no-op); this is the mutation sibling — the MERGE INTO /
    SCD-overwrite shape a living KG needs when an entity's attribute CHANGES
    rather than accretes.

    Same touched-partition discipline as ``merge_delta``: updates are
    subject-hash partitioned, only their partitions are read back, anti-
    filtered on an exact composite string key (no hash-collision risk), and
    rewritten sorted; untouched partitions keep files and manifests
    byte-identical. Work ~ touched partitions + update size."""
    import shutil

    from ..util import coalesce_blocks, distinct_rows

    nparts = num_partitions or store_num_partitions(out_dir)
    ka, kb = key_cols

    parted = updates.map_batches(
        lambda b: _partition_col(b, nparts), batch_format="pyarrow"
    )
    parted = coalesce_blocks(parted.materialize())
    touched = sorted({r["part"] for r in parted.groupby("part").count().take_all()})
    report: dict = {}
    if not touched:
        for layout in layouts:
            report[layout] = {
                "rows": 0,
                "touched": [],
                "untouched": list(range(nparts)),
            }
        return report

    def _with_key(b: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            pc.cast(b.column(ka), pa.string()),
            pc.cast(b.column(kb), pa.string()),
            "\x00",
        )
        return b.append_column("__k", k)

    cols = parted.schema().names  # includes 'part'
    merged = None
    for layout in layouts:
        keys = LAYOUT_KEYS[layout]
        layout_dir = os.path.join(out_dir, layout)
        if merged is None:
            base_files = []
            for p in touched:
                pdir = os.path.join(layout_dir, f"part={p}")
                if os.path.isdir(pdir):
                    base_files += [
                        os.path.join(pdir, f)
                        for f in os.listdir(pdir)
                        if f.endswith(".parquet")
                    ]
            streams = [parted.select_columns(cols)]
            if base_files:
                from ..extras.joins import semi_anti_join

                base = rd.read_parquet(base_files).map_batches(
                    lambda b: _partition_col(
                        b.drop_columns(["part"]) if "part" in b.column_names else b,
                        nparts,
                    ),
                    batch_format="pyarrow",
                )
                survivors = semi_anti_join(
                    base.map_batches(_with_key, batch_format="pyarrow"),
                    parted.map_batches(_with_key, batch_format="pyarrow").select_columns(
                        ["__k"]
                    ),
                    on="__k",
                    anti=True,
                ).map_batches(
                    lambda b: b.drop_columns(["__k"]), batch_format="pyarrow"
                )
                streams.append(survivors.select_columns(cols))
            uni = streams[0]
            for s in streams[1:]:
                uni = uni.union(s)
            merged = coalesce_blocks(distinct_rows(uni, cols).materialize())
        for p in touched:
            pdir = os.path.join(layout_dir, f"part={p}")
            if os.path.isdir(pdir):
                shutil.rmtree(pdir)
        if merged.count():
            merged.sort(keys).write_parquet(layout_dir, partition_cols=["part"])
        counts = {
            r["part"]: r["count()"]
            for r in merged.groupby("part").count().take_all()
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
            "rows": int(merged.count()),
            "touched": touched,
            "untouched": [p for p in range(nparts) if p not in touched],
        }
    return report
