"""End-to-end KG construction pipeline (the north-star composition):

pages -> text extraction -> mention/triple extraction (actor pool) ->
entity linking (broadcast alias index) -> canonicalization (union-find) ->
anonymization (generalize + mask + skolemize) -> sorted SPO/POS parquet with
lineage manifests.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import ray.data as rd

from .anonymize import TriplePredicateConfig, anonymize_triples, skolemize
from .extract import extract_text
from .link import build_alias_index
from .materialize import materialize_triples
from .pages import synthesize_pages

DEFAULT_TRIPLE_CONFIG = [
    TriplePredicateConfig("hasAccountBalance", "double", "generalization"),
]


@dataclass
class KgRunResult:
    triples: rd.Dataset
    gen_results: dict = field(default_factory=dict)
    materialize_report: dict | None = None
    extract_report: dict | None = None  # set by checkpoint.kg_pipeline_checkpointed


def kg_pipeline(
    sf_dir: str,
    *,
    pages: rd.Dataset | None = None,
    anonymize: bool = True,
    dedup_pages: bool = True,
    out_dir: str | None = None,
    num_partitions: int = 16,
    extractor_concurrency=None,
    materialize_canonical: bool | None = None,
) -> KgRunResult:
    if extractor_concurrency is None:
        from ..util import actor_pool_size

        # min actors pre-started (autoscaling from 1 serializes the stage)
        # but never the full CPU count (narrow widths starve the read)
        extractor_concurrency = actor_pool_size()
    pages = pages if pages is not None else synthesize_pages(sf_dir)
    if dedup_pages:
        from .fingerprint import dedup_pages_exact, page_content_hashes, page_fingerprints

        # pass 1: narrow dedup key — computed from a (url, text) PROJECTION
        # so the parquet read skips the MB-scale html column (projection
        # pushdown into the read task). The FULL fingerprint index (minhash +
        # simhash near-dup signatures) is only computed when it is actually
        # materialized as the out_dir artifact — the signatures dominate the
        # kernel's cost and the exact-dedup decision never reads them.
        # Pass 2: the filtered (url, html) stream feeds extraction — the
        # dedup filter itself only touches url.
        narrow = pages.select_columns(["url", "text"])
        if out_dir is not None:
            import os
            import shutil

            fp = page_fingerprints(narrow)
            fp_dir = os.path.join(out_dir, "fingerprints")
            shutil.rmtree(fp_dir, ignore_errors=True)  # write_parquet appends
            fp.write_parquet(fp_dir)
            fp = rd.read_parquet(fp_dir)
        else:
            fp = page_content_hashes(narrow)
        pages = dedup_pages_exact(pages.select_columns(["url", "html"]), fp)
    else:
        pages = pages.select_columns(["url", "html"])
    # MB-scale html never rides further than the fused actor pool. The
    # canonical mapping here is corpus-independent (alias edges come only
    # from the broadcast dictionary — canonicalize.alias_canonical_mapping),
    # so extraction, linking AND the canonical rewrite fuse into one
    # streaming pass: no edge channel, no separate mapping scan, union-find
    # fully off the corpus critical path. Pipelines with corpus-derived
    # edges (checkpointed runs) keep the edge-stream + canonicalize_components
    # path.
    from .canonicalize import alias_canonical_mapping
    from .link import extract_link_canonical

    alias = build_alias_index(sf_dir)
    mapping = alias_canonical_mapping(alias)
    canon = extract_link_canonical(
        pages, alias, mapping, concurrency=extractor_concurrency
    )
    # The canonical triple stream is the job's largest intermediate (at
    # 100 TB of pages it dwarfs everything downstream), so pinning it in the
    # object store is a spill-vs-recompute tradeoff gated on CONSUMER COUNT:
    # anonymize_triples scans it once per configured predicate plus a final
    # keep-pass, and materialize_triples sorts the (post-anonymize) stream
    # twice (SPO + POS) — each un-materialized consumer re-runs the fused
    # extract+link+canonicalize actor pass over the html corpus. With a
    # single consumer (anonymize=False, out_dir=None) the materialize is
    # pure spill cost and is skipped. Measured at sf0.1 (BASELINE.md round 4,
    # "canonical-stream materialize gate"): multi-consumer materialize wins
    # by ~the cost of one extra extraction pass per consumer; single-consumer
    # skip avoids pinning the full stream for no reuse.
    n_consumers = (len(DEFAULT_TRIPLE_CONFIG) + 1 if anonymize else 0) + (
        2 if out_dir is not None else 0
    )
    if materialize_canonical is None:
        materialize_canonical = n_consumers >= 2
    if materialize_canonical:
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
            inputs=[sf_dir],
            config={"anonymize": anonymize, "preds": [c.pred for c in DEFAULT_TRIPLE_CONFIG]},
        )
    return KgRunResult(triples=canon, gen_results=gen_results, materialize_report=report)


def verify_text_invariant(sf_dir: str) -> int:
    """Count rows violating byte-identical extraction (must be 0)."""
    import pyarrow.compute as pc

    pages = extract_text(synthesize_pages(sf_dir))

    def _check(batch):
        import pyarrow as pa

        bad = pc.invert(pc.equal(batch.column("text"), batch.column("text_extracted")))
        return pa.table({"bad": pa.array([pc.sum(pc.cast(bad, pa.int64())).as_py() or 0])})

    return int(pages.map_batches(_check, batch_format="pyarrow").sum("bad") or 0)
