"""Mid-pipeline checkpoint: per-input-shard extraction+linking lineage.

At 10^12 documents the expensive stage is extraction+linking over the page
table; a failed run must not redo finished work. Each INPUT parquet file is
one resumable unit: its fused ExtractLinker output (linked mention rows +
alias-edge rows, one table with the ``obj_kind='edge'`` marker) lands in
``<ckpt>/stage_extract/shard=<name>/`` with a JSON manifest carrying lineage
(source file, config hash) and metrics (pages in, mention rows, edge rows).
Re-running skips shards with fresh manifests — only missing/stale shards are
re-extracted — and downstream stages (canonicalization -> anonymization ->
materialization) read the checkpoint parquet, never the raw pages.

Shard identity is the source file's basename (stable under adding/removing
other files); the config hash covers the alias index and pipeline config, so
a config change invalidates every shard (same invariant as
``materialize.materialize_triples``).

The crawl-dedup pre-filter is intentionally OUTSIDE this stage: exact dedup
is a global decision (min url per content hash), incompatible with
shard-local resume — run ``fingerprint.dedup_pages_exact`` when producing
the page table, and checkpoint the deduped table.
"""

from __future__ import annotations

import glob as _glob
import json
import os
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data as rd

from .materialize import config_hash

STAGE_DIR = "stage_extract"


def _shard_name(path: str) -> str:
    base = os.path.basename(path)
    return base[:-8] if base.endswith(".parquet") else base


def _manifest_path(ckpt_dir: str, shard: str) -> str:
    return os.path.join(ckpt_dir, "_manifests", f"extract_{shard}.json")


def extract_cfg_hash(alias_index: dict, config: dict | None) -> str:
    return config_hash({"alias": sorted(alias_index.items()), "config": config or {}})


class _CkptExtractLinker:
    """Fused extract+link over path-tagged page batches; the output rows
    carry their source shard so the write partitions by lineage."""

    def __init__(self, alias_ref) -> None:
        from .link import ExtractLinker

        self._el = ExtractLinker(alias_ref, emit_url=False)

    _OUT_SCHEMA = pa.schema(
        [
            ("subj", pa.string()),
            ("pred", pa.string()),
            ("obj", pa.string()),
            ("obj_kind", pa.string()),
            ("edge_a", pa.string()),
            ("edge_b", pa.string()),
            ("shard", pa.string()),
        ]
    )

    def __call__(self, batch: pa.Table) -> pa.Table:
        paths = batch.column("path")
        parts = []
        for pval in pc.unique(paths).to_pylist():
            sl = batch.filter(pc.equal(paths, pval)).drop_columns(["path"])
            t = self._el(sl)
            parts.append(
                t.append_column(
                    "shard", pa.array([_shard_name(pval)] * t.num_rows, pa.string())
                )
            )
        if not parts:
            # keep the output schema on empty batches — zero-column tables
            # break write_parquet/concat schema unification
            return self._OUT_SCHEMA.empty_table()
        return pa.concat_tables(parts).cast(self._OUT_SCHEMA)


def extract_link_checkpointed(
    pages_dir: str,
    alias_index: dict,
    ckpt_dir: str,
    *,
    config: dict | None = None,
    concurrency=None,
    batch_size: int = 512,
) -> tuple[rd.Dataset, rd.Dataset, dict]:
    """Returns (linked_triples, alias_edges, report).

    report = {"shards": n, "extracted": [...], "skipped": [...],
              "metrics": {shard: {"pages_in": p, "mentions": m, "edges": e}}}
    """
    files = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {pages_dir}")
    cfg_hash = extract_cfg_hash(alias_index, config)
    stage_dir = os.path.join(ckpt_dir, STAGE_DIR)
    os.makedirs(os.path.join(ckpt_dir, "_manifests"), exist_ok=True)

    todo: list[str] = []
    skipped: list[str] = []
    metrics: dict[str, dict] = {}
    for f in files:
        shard = _shard_name(f)
        mp = _manifest_path(ckpt_dir, shard)
        fresh = False
        if os.path.exists(mp):
            try:
                with open(mp) as fh:
                    m = json.load(fh)
                fresh = m.get("config_hash") == cfg_hash and m.get("source") == f
                if fresh:
                    metrics[shard] = m.get("metrics", {})
            except (json.JSONDecodeError, OSError):
                fresh = False
        (skipped if fresh else todo).append(f)

    # reconcile orphans: a checkpoint shard whose SOURCE file disappeared
    # (removed/renamed between runs) must not contaminate the stage read —
    # drop its partition dir and manifest (the "stable under adding/removing
    # other files" invariant)
    live = {_shard_name(f) for f in files}
    for sdir in _glob.glob(os.path.join(stage_dir, "shard=*")):
        shard = os.path.basename(sdir).split("=", 1)[1]
        if shard not in live:
            shutil.rmtree(sdir, ignore_errors=True)
            try:
                os.remove(_manifest_path(ckpt_dir, shard))
            except OSError:
                pass

    if todo:
        if concurrency is None:
            from ..util import actor_pool_size

            concurrency = actor_pool_size()
        alias_ref = ray.put(alias_index)
        pages = rd.read_parquet(todo, columns=["url", "html"], include_paths=True)
        out = pages.map_batches(
            _CkptExtractLinker,
            fn_constructor_args=(alias_ref,),
            batch_format="pyarrow",
            concurrency=concurrency,
            batch_size=batch_size,
        ).materialize()
        # clear stale shard dirs — write_parquet appends
        for f in todo:
            sdir = os.path.join(stage_dir, f"shard={_shard_name(f)}")
            if os.path.isdir(sdir):
                shutil.rmtree(sdir)
        out.write_parquet(stage_dir, partition_cols=["shard"])
        # per-shard metrics: tiny groupby (shards x 2 rows) on the driver
        counts: dict[str, dict[str, int]] = {}
        agg = out.map_batches(
            lambda b: pa.table(
                {
                    "shard": b.column("shard").combine_chunks(),
                    "is_edge": pc.cast(
                        pc.equal(b.column("obj_kind"), "edge"), pa.int64()
                    ),
                    "one": pa.array([1] * b.num_rows, pa.int64()),
                }
            ),
            batch_format="pyarrow",
        ).groupby("shard").sum(["is_edge", "one"])
        for r in agg.take_all():
            counts[r["shard"]] = {
                "edges": int(r["sum(is_edge)"]),
                "mentions": int(r["sum(one)"]) - int(r["sum(is_edge)"]),
            }
        for f in todo:
            shard = _shard_name(f)
            c = counts.get(shard, {"edges": 0, "mentions": 0})
            m = {
                "pages_in": pq.read_metadata(f).num_rows,
                "mentions": c["mentions"],
                "edges": c["edges"],
            }
            metrics[shard] = m
            with open(_manifest_path(ckpt_dir, shard), "w") as fh:
                json.dump(
                    {
                        "shard": shard,
                        "source": f,
                        "config_hash": cfg_hash,
                        "stage": "extract_link",
                        "metrics": m,
                    },
                    fh,
                )

    full = rd.read_parquet(stage_dir)
    triples = full.filter(expr="obj_kind != 'edge'").drop_columns(
        ["edge_a", "edge_b", "shard"]
    )
    edges = full.filter(expr="obj_kind == 'edge'").select_columns(["edge_a", "edge_b"])
    report = {
        "shards": len(files),
        "extracted": sorted(_shard_name(f) for f in todo),
        "skipped": sorted(_shard_name(f) for f in skipped),
        "metrics": metrics,
    }
    return triples, edges, report


def kg_pipeline_checkpointed(
    sf_dir: str,
    pages_dir: str,
    ckpt_dir: str,
    *,
    anonymize: bool = True,
    out_dir: str | None = None,
    num_partitions: int = 16,
    concurrency=None,
):
    """Full pipeline over a parquet page table with mid-pipeline resume:
    extraction+linking checkpointed per input shard (above); the final triple
    materialization resumes per output partition (materialize_triples). A
    re-run after any failure only redoes unfinished units of each stage."""
    from .anonymize import anonymize_triples, skolemize
    from .canonicalize import apply_canonical_mapping, canonicalize_components
    from .link import build_alias_index
    from .materialize import materialize_triples
    from .pipeline import DEFAULT_TRIPLE_CONFIG, KgRunResult

    alias = build_alias_index(sf_dir)
    cfg = {"anonymize": anonymize, "preds": [c.pred for c in DEFAULT_TRIPLE_CONFIG]}
    triples, edges, extract_report = extract_link_checkpointed(
        pages_dir, alias, ckpt_dir, config=cfg, concurrency=concurrency
    )
    mapping = canonicalize_components(edges)
    canon = apply_canonical_mapping(triples, mapping)
    canon = canon.materialize()

    gen_results: dict = {}
    if anonymize:
        canon, gen_results = anonymize_triples(canon, DEFAULT_TRIPLE_CONFIG)
        canon = skolemize(canon)

    report = None
    if out_dir is not None:
        report = materialize_triples(
            canon,
            out_dir,
            num_partitions=num_partitions,
            inputs=[sf_dir, pages_dir],
            config=cfg,
        )
    return KgRunResult(
        triples=canon,
        gen_results=gen_results,
        materialize_report=report,
        extract_report=extract_report,
    )
