"""CLI entry point — the `ray job submit` surface of the north rule:

    ray job submit -- python -m anonymization_ray \
        --sf-dir /root/testdata/sf0.01 --out-dir /tmp/kg_out

Runs the full KG-construction + anonymization pipeline and writes the sorted
SPO/POS triple layouts with lineage manifests (resumable: re-running skips
finished partitions).

`--mode prepare-corpus` runs the training-corpus prep pipeline instead
(gate + cluster dedup -> decontaminate -> split -> chunk -> pack) and writes
sharded packed parquet + manifest.json under --out-dir.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="anonymization_ray")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    p.add_argument("--pages-parquet", default=None,
                   help="read the page table from this parquet dir instead of synthesizing")
    p.add_argument("--out-dir", default=None,
                   help="required for kg / prepare-corpus modes")
    p.add_argument("--num-partitions", type=int, default=16)
    p.add_argument("--checkpoint-dir", default=None,
                   help="kg mode with --pages-parquet: per-input-shard "
                        "extraction checkpoint; prepare-corpus mode: "
                        "per-stage resume (loser/contamination/bin "
                        "artifacts keyed by config hash)")
    p.add_argument("--no-anonymize", action="store_true")
    p.add_argument("--no-dedup", action="store_true")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="only used when Ray is not already initialised")
    p.add_argument("--mode", choices=["kg", "prepare-corpus", "serve"],
                   default="kg")
    p.add_argument("--host", default="127.0.0.1", help="serve mode bind host")
    p.add_argument("--port", type=int, default=8081, help="serve mode port")
    p.add_argument("--chunk-size", type=int, default=64)
    p.add_argument("--pack-budget", type=int, default=256)
    p.add_argument("--num-shards", type=int, default=8)
    p.add_argument("--decon-n", type=int, default=3,
                   help="decontamination n-gram size; raise it on small-"
                        "vocabulary corpora where short grams over-match")
    p.add_argument("--bench-mod", type=int, default=None,
                   help="id modulus selecting the simulated held-out "
                        "benchmark slice; 0 disables the slice AND "
                        "decontamination. Defaults to 89 on the sf tables "
                        "and 0 (no simulated benchmark) with --warc-dir")
    p.add_argument("--warc-dir", default=None,
                   help="prepare-corpus: ingest WARC archive(s) instead of "
                        "the sf documents table (url-hash doc ids, extracted text)")
    args = p.parse_args(argv)

    if args.mode == "serve":
        # the REST surface (reference AnonymizationRestController.java:35-70);
        # request-scale, runs entirely in-process — no Ray session needed
        from anonymization_ray.serve import serve

        serve(args.host, args.port)
        return 0

    if not args.out_dir:
        p.error(f"--out-dir is required for --mode {args.mode}")

    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, logging_level="ERROR")
        if args.num_cpus:
            kwargs["num_cpus"] = args.num_cpus
        ray.init(**kwargs)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import ray.data as rd

    from anonymization_ray.kg.pipeline import kg_pipeline

    t0 = time.perf_counter()
    if args.mode == "prepare-corpus":
        import os

        from anonymization_ray.pipelines.corpus import prepare_training_corpus

        if args.warc_dir:
            from anonymization_ray.pipelines.corpus import documents_from_warc

            docs = documents_from_warc(args.warc_dir)
        else:
            docs = rd.read_parquet(
                os.path.join(args.sf_dir, "documents.parquet"),
                columns=["doc_id", "text"],
            )
        manifest = prepare_training_corpus(
            docs,
            args.out_dir,
            chunk_size=args.chunk_size,
            pack_budget=args.pack_budget,
            num_shards=args.num_shards,
            decon_n=args.decon_n,
            # real crawls carry no simulated benchmark slice by default
            bench_mod=(0 if args.warc_dir else 89)
            if args.bench_mod is None else args.bench_mod,
            checkpoint_dir=args.checkpoint_dir,
            input_key=args.warc_dir or args.sf_dir,
            # WARC lineage is expensive to re-execute — snapshot it to
            # pruned parquet so the prep pipeline's lazy re-scans are
            # columnar reads, not archive re-parses
            snapshot_input=bool(args.warc_dir),
        )
        print(json.dumps({"sec": round(time.perf_counter() - t0, 2), **manifest}))
        ray.shutdown()
        return 0
    if args.checkpoint_dir:
        if not args.pages_parquet:
            p.error("--checkpoint-dir requires --pages-parquet")
        from anonymization_ray.kg.checkpoint import kg_pipeline_checkpointed

        res = kg_pipeline_checkpointed(
            args.sf_dir,
            args.pages_parquet,
            args.checkpoint_dir,
            anonymize=not args.no_anonymize,
            out_dir=args.out_dir,
            num_partitions=args.num_partitions,
        )
    else:
        pages = rd.read_parquet(args.pages_parquet) if args.pages_parquet else None
        res = kg_pipeline(
            args.sf_dir,
            pages=pages,
            anonymize=not args.no_anonymize,
            dedup_pages=not args.no_dedup,
            out_dir=args.out_dir,
            num_partitions=args.num_partitions,
        )
    out = {
        "sec": round(time.perf_counter() - t0, 2),
        "out_dir": args.out_dir,
        "report": res.materialize_report,
        "extract_report": res.extract_report,
    }
    print(json.dumps(out))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
