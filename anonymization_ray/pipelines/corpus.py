"""End-to-end training-corpus preparation — the engine's operators composed
into the pipeline a pre-training data team actually runs:

    quality gate + near-dup cluster dedup   (extras.cleanse.clean_corpus)
    -> benchmark decontamination            (extras.decontaminate)
    -> train-split selection                (extras.shuffle hash threshold)
    -> context-length chunking              (extras.chunk)
    -> token-budget sequence packing        (extras.pack)
    -> sharded parquet + manifest

Every decision is a pure function of the data (SplitMix64 / MINSTD keys, min
id per cluster), so re-running the pipeline reproduces the corpus bit-for-bit
at any parallelism — the property the per-stage oracles check individually
and `tests/test_corpus_pipeline.py` checks for the composition.

Scale shape: the big stream is filtered EARLY (gate first, then the
broadcast anti-filters for dedup losers / contaminated ids — both small
fractions of a real crawl), the only all-to-alls are the ones the semantics
require (minhash band self-join inside clean_corpus, the final pack join),
and the output is partitioned parquet (one directory per shard) — the unit
an orchestrator retries or consumers read independently. (The prep run
itself is all-or-nothing per invocation: upstream decisions — dedup
clusters, contamination — are global, so partial outputs are cleared and
rewritten; mid-pipeline checkpointing lives in ``kg/checkpoint.py`` where
per-input-shard state is actually local.)
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def prepare_training_corpus(
    docs: rd.Dataset,
    out_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 20,
    bench_mod: int = 89,
    decon_n: int = 3,
    train_fraction: float = 0.9,
    split_salt: int = 7,
    chunk_size: int = 64,
    pack_budget: int = 256,
    num_shards: int = 8,
) -> dict:
    """Run the full prep pipeline over ``docs`` (id, text); write packed
    chunks to ``out_dir`` partitioned by shard and a ``manifest.json`` with
    per-stage counts. Returns the manifest dict.

    Documents with ``id % bench_mod == 0`` play the held-out benchmark: they
    are excluded from training AND any other document sharing a
    ``decon_n``-gram with them is dropped (decontamination). ``bench_mod <= 0``
    disables both (real ingestion where no eval suite lives in the corpus)."""
    from ..extras.chunk import chunk_documents
    from ..extras.cleanse import clean_corpus
    from ..extras.decontaminate import decontaminate, ngram_set
    from ..extras.joins import semi_anti_join
    from ..extras.pack import pack_sequences
    from ..extras.shuffle import sm64_key
    from ..util import hash_join

    docs = docs.select_columns([id_col, text_col]).materialize()
    n_input = docs.count()

    # benchmark slice out, eval set's n-grams broadcast for decontamination
    def _is_bench(bench: bool):
        def _f(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            m = (ids % bench_mod) == 0
            return b.filter(pa.array(m if bench else ~m))

        return _f

    if bench_mod > 0:
        bench_grams = ngram_set(
            docs.map_batches(_is_bench(True), batch_format="pyarrow"), text_col, decon_n
        )
        corpus = docs.map_batches(_is_bench(False), batch_format="pyarrow")
    else:
        bench_grams = None
        corpus = docs

    # gate + near-dup cluster keepers -> (id, n_tokens); re-attach text
    kept = clean_corpus(corpus, text_col, id_col, min_tokens=min_tokens)
    # keepers are MOST of the corpus — never a broadcast side; shuffle semi
    kept_docs = semi_anti_join(corpus, kept, on=id_col, broadcast=False).materialize()
    n_kept = kept_docs.count()

    if bench_grams is not None:
        contaminated = decontaminate(kept_docs, bench_grams, text_col=text_col,
                                     id_col=id_col, n=decon_n)
        # contaminated ids ARE a small set — the broadcast anti-filter is right
        clean = semi_anti_join(
            kept_docs, contaminated, on=id_col, anti=True
        ).materialize()
        n_clean = clean.count()
    else:
        clean, n_clean = kept_docs, n_kept

    # train-split selection inline (same hash/threshold as split_assign);
    # fraction >= 1 keeps everything (2^64 overflows uint64 — no threshold)
    if train_fraction >= 1.0:
        train = clean
    else:
        edge = np.uint64(int(train_fraction * 2**64))

        def _train(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            return b.filter(pa.array(sm64_key(ids, split_salt) < edge))

        train = clean.map_batches(_train, batch_format="pyarrow")

    chunks = chunk_documents(
        train, text_col=text_col, id_col=id_col, size=chunk_size
    ).materialize()
    n_chunks = chunks.count()

    # pack on a synthetic per-chunk key: a full-width SplitMix64 hash-combine
    # of (doc_id, chunk_id). Arithmetic packing (doc_id * 2^k + chunk_id)
    # silently wraps int64 when doc_ids are themselves 63-bit url hashes
    # (documents_from_warc), colliding distinct chunks at the 2^(63-k)
    # birthday bound; the hash-combine keeps the full 63 bits — the same
    # 2^-63-per-pair identity contract doc_id already carries.

    def _keyed(b: pa.Table) -> pa.Table:
        d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("chunk_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = sm64_key(sm64_key(d, 13).astype(np.int64) + c)
        t = b.append_column(
            "chunk_key", pa.array((k >> np.uint64(1)).astype(np.int64), pa.int64())
        )
        return t

    keyed = chunks.map_batches(_keyed, batch_format="pyarrow").materialize()
    bins = pack_sequences(
        keyed, "chunk_key", "n_tokens", budget=pack_budget, num_shards=num_shards
    )
    packed = hash_join(
        keyed, bins.select_columns(["chunk_key", "shard", "bin", "pos"]),
        on="chunk_key", join_type="inner",
        num_partitions=max(2, min(8, n_chunks // 2000 + 1)),
    ).drop_columns(["chunk_key"])

    # epoch_order: deterministic shuffled READ order over bins — consumers
    # sort by (epoch_order, shard, bin, pos) to stream the corpus in a
    # reproducible random bin order without a second global sort here
    def _epoch(b: pa.Table) -> pa.Table:
        sh = b.column("shard").to_numpy(zero_copy_only=False).astype(np.int64)
        bn = b.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
        h = sm64_key(sh * (1 << 32) + bn, split_salt + 1)
        return b.append_column(
            "epoch_order", pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64())
        )

    packed = packed.map_batches(_epoch, batch_format="pyarrow")

    os.makedirs(out_dir, exist_ok=True)
    data_dir = os.path.join(out_dir, "data")
    if os.path.exists(data_dir):
        import shutil

        shutil.rmtree(data_dir)  # write_parquet APPENDS into existing dirs
    packed = packed.materialize()
    n_packed = packed.count()
    n_tokens = int(
        packed.map_batches(
            lambda b: pa.table(
                {"s": pa.array([pc.sum(b.column("n_tokens")).as_py() or 0], pa.int64())}
            ),
            batch_format="pyarrow",
        ).sum("s")
    )
    packed.write_parquet(data_dir, partition_cols=["shard"])

    manifest = {
        "input_docs": n_input,
        "kept_after_gate_and_dedup": n_kept,
        "kept_after_decontamination": n_clean,
        "train_chunks": n_chunks,
        "packed_rows": n_packed,
        "packed_tokens": n_tokens,
        "config": {
            "min_tokens": min_tokens,
            "bench_mod": bench_mod,
            "decon_n": decon_n,
            "train_fraction": train_fraction,
            "split_salt": split_salt,
            "chunk_size": chunk_size,
            "pack_budget": pack_budget,
            "num_shards": num_shards,
        },
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    return manifest


def documents_from_warc(warc_paths: str | list) -> rd.Dataset:
    """WARC archives -> (doc_id, text) ready for :func:`prepare_training_corpus`:
    pages via the pure-python WARC source, text via the byte-identical
    extraction stage, doc ids as the SplitMix64 hash of the url (stable
    across runs and partitionings, like every other decision key here)."""
    import pandas as pd

    from ..extras.shuffle import sm64_key
    from ..kg.extract import extract_text
    from ..sources.warc import read_warc

    raw = read_warc(warc_paths)
    # NOTE: the url dedup below ranks FULL rows, so payloads move through one
    # all-to-all. That is the standard ingestion-time URL dedup; if archives
    # are url-disjoint (typical crawl layout), run per-archive instead.

    # crawl payloads are arbitrary bytes — lossy-decode to valid UTF-8 so
    # the extraction cast can never fail, and key each capture for the
    # refetch dedup below (same url fetched twice is ubiquitous in WARC)
    def _sanitize(b: pa.Table) -> pa.Table:
        htmls = [
            p.decode("utf-8", "replace").encode()
            for p in b.column("html").to_pylist()
        ]
        # undated/malformed captures must LOSE the earliest-capture race,
        # not win it — fill with +inf, not 0
        ts = pc.fill_null(
            pc.cast(b.column("warc_ts"), pa.timestamp("us")).cast(pa.int64()),
            (1 << 63) - 1,
        )
        hh = pd.util.hash_array(np.array([p for p in htmls], object)).astype(np.int64)
        return pa.table(
            {
                "url": b.column("url").combine_chunks(),
                "warc_ts": b.column("warc_ts").combine_chunks(),
                "html": pa.array(htmls, pa.binary()),
                "text": b.column("text").combine_chunks(),
                "lang": b.column("lang").combine_chunks(),
                "ts_us": ts,
                "hh": pa.array(hh, pa.int64()),
            }
        )

    sane = raw.map_batches(_sanitize, batch_format="pyarrow")
    # one capture per url — the earliest, payload-hash tie-broken so the
    # choice never depends on partitioning; without this, refetched urls
    # collide on doc_id and fan out in the pack join
    from ..util import topk_per_key

    first = topk_per_key(sane, "url", "ts_us", 1, descending=False, tie_col="hh")
    pages = extract_text(first.drop_columns(["ts_us", "hh"]))

    def _docs(b: pa.Table) -> pa.Table:
        urls = b.column("url").combine_chunks()
        h = sm64_key(
            pd.util.hash_array(urls.to_numpy(zero_copy_only=False)).astype(np.int64)
        )
        return pa.table(
            {
                "doc_id": pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64()),
                "text": pc.fill_null(
                    pc.cast(b.column("text_extracted").combine_chunks(), pa.string()),
                    "",
                ),
            }
        )

    return pages.map_batches(_docs, batch_format="pyarrow")
