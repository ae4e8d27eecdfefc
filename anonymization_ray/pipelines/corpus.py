"""End-to-end training-corpus preparation — the engine's operators composed
into the pipeline a pre-training data team actually runs:

    quality gate + near-dup cluster dedup   (extras.cleanse.clean_corpus_decisions)
    -> benchmark decontamination            (extras.decontaminate)
    -> train-split selection                (extras.shuffle hash threshold)
    -> context-length chunking              (extras.chunk)
    -> token-budget sequence packing        (extras.pack)
    -> sharded parquet + manifest

Every decision is a pure function of the data (SplitMix64 / MINSTD keys, min
id per cluster), so re-running the pipeline reproduces the corpus bit-for-bit
at any parallelism — the property the per-stage oracles check individually
and `tests/test_corpus_pipeline.py` checks for the composition.

Scale shape: the corpus TEXT never materializes in the object store. All
decision stages are NARROW — loser ids, contaminated ids, per-chunk bin
assignments — and the text stream stays lazy end-to-end: each consumer
re-executes the pruned columnar read (gate and chunking are cheap vectorized
kernels) instead of spill-writing and spill-reading the same corpus bytes
through the object store. The big stream is filtered EARLY (gate first, then
the broadcast anti-filters for dedup losers / contaminated ids — both small
fractions of a real crawl), the only all-to-alls are the ones the semantics
require (minhash band self-join, the final pack join), and the output is
partitioned parquet (one directory per shard).

Resume: pass ``checkpoint_dir`` to checkpoint each decision stage (loser
set, contamination set, bin assignments, final manifest) as a parquet
artifact + JSON manifest keyed by the config hash — the same discipline as
``kg/checkpoint.py``. A killed run re-uses every completed stage; because
every stage is a pure function of (input, config), a resumed run is
bit-identical to a fresh one. Expensive non-parquet inputs (WARC ingestion)
snapshot to pruned parquet first (``snapshot_input=True``) so the lazy
re-scans hit columnar storage, not the WARC parser.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


class _PrepCheckpoint:
    """Per-stage resume: stage artifact parquet under ``<dir>/stage_<name>``
    plus a manifest under ``<dir>/_manifests/<name>.json`` carrying the
    config hash and stage metrics. ``load`` returns the manifest dict when
    fresh (hash matches), else None; ``save`` (re)writes artifact+manifest.
    With ``ckpt_dir=None`` every method is a no-op and the pipeline runs
    exactly as before."""

    def __init__(self, ckpt_dir: str | None, cfg_hash: str) -> None:
        self.dir = ckpt_dir
        self.hash = cfg_hash
        if ckpt_dir:
            os.makedirs(os.path.join(ckpt_dir, "_manifests"), exist_ok=True)

    def _mpath(self, stage: str) -> str:
        return os.path.join(self.dir, "_manifests", f"{stage}.json")

    def artifact_dir(self, stage: str) -> str:
        return os.path.join(self.dir, f"stage_{stage}")

    def load(self, stage: str) -> dict | None:
        if not self.dir:
            return None
        try:
            with open(self._mpath(stage)) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            return None
        if m.get("config_hash") != self.hash:
            return None
        return m

    def dataset(self, stage: str) -> rd.Dataset:
        return rd.read_parquet(self.artifact_dir(stage))

    def save(self, stage: str, ds: rd.Dataset | None, meta: dict) -> rd.Dataset | None:
        """Write the stage artifact (when ``ds`` is given) and its manifest;
        returns a read-back Dataset so downstream consumers scan the parquet
        artifact instead of re-executing the stage lineage."""
        if not self.dir:
            return ds
        out = None
        if ds is not None:
            adir = self.artifact_dir(stage)
            shutil.rmtree(adir, ignore_errors=True)  # write_parquet appends
            ds.write_parquet(adir)
            out = rd.read_parquet(adir)
        with open(self._mpath(stage), "w") as fh:
            json.dump({"stage": stage, "config_hash": self.hash, "meta": meta}, fh)
        return out


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
    broadcast_limit: int = 2_000_000,
    checkpoint_dir: str | None = None,
    input_key: str | None = None,
    snapshot_input: bool = False,
) -> dict:
    """Run the full prep pipeline over ``docs`` (id, text); write packed
    chunks to ``out_dir`` partitioned by shard and a ``manifest.json`` with
    per-stage counts. Returns the manifest dict.

    Documents with ``id % bench_mod == 0`` play the held-out benchmark: they
    are excluded from training AND any other document sharing a
    ``decon_n``-gram with them is dropped (decontamination). ``bench_mod <= 0``
    disables both (real ingestion where no eval suite lives in the corpus).

    ``checkpoint_dir`` enables per-stage resume (see module docstring);
    ``input_key`` folds an input identity (e.g. the source path) into the
    config hash so a different input invalidates the checkpoints;
    ``snapshot_input=True`` writes the pruned (id, text) input to parquet
    once up front and re-points ``docs`` at it — REQUIRED shape when the
    input lineage is expensive to re-execute (WARC parse), wasteful for
    inputs that are already pruned parquet reads."""
    from ..extras.chunk import chunk_documents
    from ..extras.cleanse import clean_corpus_decisions
    from ..extras.decontaminate import decontaminate, ngram_set
    from ..extras.joins import semi_anti_join
    from ..extras.pack import pack_sequences
    from ..extras.shuffle import sm64_key
    from ..kg.materialize import config_hash
    from ..util import hash_join

    config = {
        "min_tokens": min_tokens,
        "bench_mod": bench_mod,
        "decon_n": decon_n,
        "train_fraction": train_fraction,
        "split_salt": split_salt,
        "chunk_size": chunk_size,
        "pack_budget": pack_budget,
        "num_shards": num_shards,
    }
    cfg_hash = config_hash({"config": config, "input_key": input_key})
    ck = _PrepCheckpoint(checkpoint_dir, cfg_hash)

    data_dir = os.path.join(out_dir, "data")
    final = ck.load("final")
    if final is not None and os.path.isdir(data_dir):
        return final["meta"]

    # the text stream stays LAZY — no object-store pin of the corpus text
    docs = docs.select_columns([id_col, text_col])
    if snapshot_input:
        sdir = (
            ck.artifact_dir("ingest")
            if checkpoint_dir
            else os.path.join(out_dir, "_ingest")
        )
        if ck.load("ingest") is None or not os.path.isdir(sdir):
            shutil.rmtree(sdir, ignore_errors=True)
            os.makedirs(os.path.dirname(sdir) or ".", exist_ok=True)
            docs.write_parquet(sdir)
            ck.save("ingest", None, {"dir": sdir})
        docs = rd.read_parquet(sdir)

    # --- stage: gate + near-dup cluster dedup -> NARROW loser id set -------
    def _is_bench(bench: bool):
        def _f(b: pa.Table) -> pa.Table:
            ids = b.column(id_col).to_numpy(zero_copy_only=False)
            m = (ids % bench_mod) == 0
            return b.filter(pa.array(m if bench else ~m))

        return _f

    corpus = (
        docs.map_batches(_is_bench(False), batch_format="pyarrow")
        if bench_mod > 0
        else docs
    )

    cl = ck.load("cleanse")
    if cl is not None:
        n_input, n_kept, n_losers = (
            cl["meta"]["n_input"],
            cl["meta"]["n_kept"],
            cl["meta"]["n_losers"],
        )
        losers = ck.dataset("cleanse") if n_losers else None
    else:
        n_input = docs.count()
        kept, losers = clean_corpus_decisions(
            corpus,
            text_col,
            id_col,
            min_tokens=min_tokens,
            broadcast_limit=broadcast_limit,
        )
        n_kept = kept.count()
        n_losers = losers.count()
        saved = ck.save(
            "cleanse",
            losers if n_losers else None,  # empty artifact dirs don't read back
            {"n_input": n_input, "n_kept": n_kept, "n_losers": n_losers},
        )
        losers = saved if saved is not None else losers

    # kept documents, recomputed lazily: gate inline (cheap vectorized token
    # count) + broadcast anti-filter on the small loser set — never a
    # corpus-sized join to re-attach the keep decision to the text
    def _gate(b: pa.Table) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(b.column(text_col), r"\S+"), pa.int64())
        return b.filter(pc.greater_equal(n, min_tokens))

    kept_stream = corpus.map_batches(_gate, batch_format="pyarrow")
    if n_losers > 0:
        kept_stream = semi_anti_join(
            kept_stream,
            losers,
            on=id_col,
            anti=True,
            broadcast=n_losers <= broadcast_limit,
        )

    # --- stage: decontamination -> NARROW contaminated id set --------------
    n_contam = 0
    contaminated = None
    if bench_mod > 0:
        dc = ck.load("decon")
        if dc is not None:
            n_contam = dc["meta"]["n_contaminated"]
            contaminated = ck.dataset("decon") if n_contam else None
        else:
            bench_grams = ngram_set(
                docs.map_batches(_is_bench(True), batch_format="pyarrow"),
                text_col,
                decon_n,
            )
            contaminated = decontaminate(
                kept_stream, bench_grams, text_col=text_col, id_col=id_col, n=decon_n
            ).select_columns([id_col]).materialize()
            n_contam = contaminated.count()
            saved = ck.save(
                "decon",
                contaminated if n_contam else None,
                {"n_contaminated": n_contam},
            )
            contaminated = saved if saved is not None else contaminated
    n_clean = n_kept - n_contam

    clean = kept_stream
    if n_contam > 0:
        # contaminated ids ARE a small set — the broadcast anti-filter is right
        clean = semi_anti_join(
            clean,
            contaminated,
            on=id_col,
            anti=True,
            broadcast=n_contam <= broadcast_limit,
        )

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

    # --- stage: chunk + pack -> NARROW per-chunk bin assignment ------------
    # chunked text stays lazy; pack on a synthetic per-chunk key: a
    # full-width SplitMix64 hash-combine of (doc_id, chunk_id). Arithmetic
    # packing (doc_id * 2^k + chunk_id) silently wraps int64 when doc_ids
    # are themselves 63-bit url hashes (documents_from_warc), colliding
    # distinct chunks at the 2^(63-k) birthday bound; the hash-combine keeps
    # the full 63 bits — the same 2^-63-per-pair identity contract doc_id
    # already carries.
    def _keyed(b: pa.Table) -> pa.Table:
        d = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        c = b.column("chunk_id").to_numpy(zero_copy_only=False).astype(np.int64)
        k = sm64_key(sm64_key(d, 13).astype(np.int64) + c)
        return b.append_column(
            "chunk_key", pa.array((k >> np.uint64(1)).astype(np.int64), pa.int64())
        )

    keyed = chunk_documents(
        train, text_col=text_col, id_col=id_col, size=chunk_size
    ).map_batches(_keyed, batch_format="pyarrow")

    bn = ck.load("bins")
    if bn is not None:
        n_chunks = bn["meta"]["n_chunks"]
        bins = ck.dataset("bins")
    else:
        # pack_sequences projects (chunk_key, n_tokens) internally — one
        # narrow pass over the lazy chunk lineage, no text shuffle
        bins = pack_sequences(
            keyed, "chunk_key", "n_tokens", budget=pack_budget, num_shards=num_shards
        ).materialize()
        n_chunks = bins.count()
        saved = ck.save("bins", bins, {"n_chunks": n_chunks})
        bins = saved if saved is not None else bins

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
        bn_ = b.column("bin").to_numpy(zero_copy_only=False).astype(np.int64)
        h = sm64_key(sh * (1 << 32) + bn_, split_salt + 1)
        return b.append_column(
            "epoch_order", pa.array((h >> np.uint64(1)).astype(np.int64), pa.int64())
        )

    packed = packed.map_batches(_epoch, batch_format="pyarrow")

    os.makedirs(out_dir, exist_ok=True)
    if os.path.exists(data_dir):
        shutil.rmtree(data_dir)  # write_parquet APPENDS into existing dirs
    # stream straight to the partitioned sink — counts come from the written
    # parquet's narrow column, never from materializing the text in the
    # object store
    packed.write_parquet(data_dir, partition_cols=["shard"])
    written = rd.read_parquet(data_dir, columns=["n_tokens"])
    n_packed = written.count()
    n_tokens = int(written.sum("n_tokens") or 0)

    manifest = {
        "input_docs": n_input,
        "kept_after_gate_and_dedup": n_kept,
        "kept_after_decontamination": n_clean,
        "train_chunks": n_chunks,
        "packed_rows": n_packed,
        "packed_tokens": n_tokens,
        "config": config,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=1)
    ck.save("final", None, manifest)
    return manifest


def documents_from_warc(warc_paths: str | list) -> rd.Dataset:
    """WARC archives -> (doc_id, text) ready for :func:`prepare_training_corpus`:
    pages via the pure-python WARC source, text via the byte-identical
    extraction stage, doc ids as the SplitMix64 hash of the url (stable
    across runs and partitionings, like every other decision key here).

    The returned Dataset's lineage includes the WARC parser — pass
    ``snapshot_input=True`` to ``prepare_training_corpus`` so the prep
    pipeline's lazy re-scans read a pruned parquet snapshot instead of
    re-parsing the archives."""
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
