"""End-to-end training-corpus preparation: invariants + determinism."""

import glob
import json

import pyarrow.parquet as pq
import ray.data as rd

SF = "/root/testdata/sf0.001"


def _run(tmp, salt=7):
    from anonymization_ray.pipelines.corpus import prepare_training_corpus

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return prepare_training_corpus(
        docs,
        str(tmp),
        min_tokens=10,
        chunk_size=16,
        pack_budget=64,
        num_shards=4,
        split_salt=salt,
    )


def test_corpus_pipeline_invariants(tmp_path):
    out = tmp_path / "corpus"
    m = _run(out)
    # manifest counts are monotone down the funnel
    assert m["input_docs"] >= m["kept_after_gate_and_dedup"] >= m["kept_after_decontamination"]
    assert m["packed_rows"] == m["train_chunks"] or m["packed_rows"] <= m["train_chunks"]
    assert m["packed_rows"] > 0

    files = glob.glob(str(out / "data" / "shard=*" / "*.parquet"))
    assert files
    t = pq.read_table(files[0])
    got = rd.read_parquet(str(out / "data")).to_pandas()
    assert len(got) == m["packed_rows"]

    # benchmark docs excluded; every chunk respects the size; bins respect
    # the budget; positions enumerate within each bin
    assert not (got.doc_id % 89 == 0).any()
    assert (got.n_tokens <= 16).all()
    bins = got.groupby(["shard", "bin"])
    assert (bins.n_tokens.sum() <= 64).all()
    for (_, _), grp in bins:
        assert sorted(grp.pos) == list(range(len(grp)))

    # manifest round-trips
    with open(out / "manifest.json") as fh:
        assert json.load(fh)["packed_rows"] == m["packed_rows"]


def test_corpus_pipeline_deterministic(tmp_path):
    a = _run(tmp_path / "a")
    b = _run(tmp_path / "b")
    assert a == b
    da = rd.read_parquet(str(tmp_path / "a" / "data")).to_pandas()
    db = rd.read_parquet(str(tmp_path / "b" / "data")).to_pandas()
    key = ["doc_id", "chunk_id"]
    da = da.sort_values(key).reset_index(drop=True)
    db = db.sort_values(key).reset_index(drop=True)
    assert da.equals(db)


def test_epoch_order_is_per_bin_and_deterministic(tmp_path):
    _run(tmp_path / "e")
    got = rd.read_parquet(str(tmp_path / "e" / "data")).to_pandas()
    assert "epoch_order" in got.columns
    # one order value per (shard, bin); chunks of a bin stay contiguous
    per_bin = got.groupby(["shard", "bin"]).epoch_order.nunique()
    assert (per_bin == 1).all()
    # and the order key actually scrambles bins (not monotone in bin id)
    b0 = got[got.shard == got.shard.iloc[0]].drop_duplicates(["bin"])
    if len(b0) > 2:
        assert not b0.sort_values("bin").epoch_order.is_monotonic_increasing


def test_corpus_pipeline_hashed_63bit_doc_ids(tmp_path):
    """WARC-path doc ids are 63-bit url hashes; the pack's chunk key must not
    wrap/collide (the old doc_id*2^20+chunk_id packing kept only ~43 bits)."""
    import numpy as np
    import pyarrow as pa

    from anonymization_ray.pipelines.corpus import prepare_training_corpus

    rng = np.random.Generator(np.random.Philox(key=5))
    ids = np.unique(rng.integers(1 << 60, 1 << 62, size=40, dtype=np.int64))
    texts = [f"doc {i} " + ("tok " * 40) for i in range(len(ids))]
    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    )
    m = prepare_training_corpus(
        docs,
        str(tmp_path / "c"),
        min_tokens=5,
        bench_mod=0,
        train_fraction=1.0,
        chunk_size=16,
        pack_budget=64,
        num_shards=4,
    )
    got = rd.read_parquet(str(tmp_path / "c" / "data")).to_pandas()
    # no join fan-out: packed rows == chunks, each (doc, chunk) exactly once
    assert m["packed_rows"] == m["train_chunks"] == len(got)
    assert not got.duplicated(["doc_id", "chunk_id"]).any()
    assert set(got.doc_id) == set(ids.tolist())


def _run_ckpt(tmp, ckpt, salt=7):
    from anonymization_ray.pipelines.corpus import prepare_training_corpus

    docs = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    return prepare_training_corpus(
        docs,
        str(tmp),
        min_tokens=10,
        chunk_size=16,
        pack_budget=64,
        num_shards=4,
        split_salt=salt,
        checkpoint_dir=str(ckpt),
        input_key="sf0.001-documents",
    )


def test_corpus_prep_checkpoint_resume_bit_identical(tmp_path, monkeypatch):
    """A killed-and-rerun prep reuses completed stages and produces output
    bit-identical to a fresh run."""
    fresh = _run(tmp_path / "fresh")
    m1 = _run_ckpt(tmp_path / "a", tmp_path / "ckpt")
    assert m1 == fresh

    # simulate a failure after the decision stages: final output gone
    import shutil

    shutil.rmtree(tmp_path / "a" / "data")
    (tmp_path / "a" / "manifest.json").unlink()
    import os
    os.remove(tmp_path / "ckpt" / "_manifests" / "final.json")

    # completed stages must NOT recompute — poison their entry points
    import importlib

    cleanse_mod = importlib.import_module("anonymization_ray.extras.cleanse")
    decon_mod = importlib.import_module("anonymization_ray.extras.decontaminate")
    pack_mod = importlib.import_module("anonymization_ray.extras.pack")

    def _boom(*a, **k):
        raise AssertionError("stage recomputed despite fresh checkpoint")

    monkeypatch.setattr(cleanse_mod, "clean_corpus_decisions", _boom)
    monkeypatch.setattr(decon_mod, "decontaminate", _boom)
    monkeypatch.setattr(pack_mod, "pack_sequences", _boom)

    m2 = _run_ckpt(tmp_path / "a", tmp_path / "ckpt")
    assert m2 == m1
    da = rd.read_parquet(str(tmp_path / "fresh" / "data")).to_pandas()
    db = rd.read_parquet(str(tmp_path / "a" / "data")).to_pandas()
    key = ["doc_id", "chunk_id"]
    da = da.sort_values(key).reset_index(drop=True)
    db = db.sort_values(key).reset_index(drop=True)[da.columns]
    assert da.equals(db)


def test_corpus_prep_checkpoint_final_short_circuit(tmp_path, monkeypatch):
    """With the final manifest fresh and data present, a re-run touches
    nothing at all."""
    m1 = _run_ckpt(tmp_path / "o", tmp_path / "ck")
    import importlib
    chunk_mod = importlib.import_module("anonymization_ray.extras.chunk")

    def _boom(*a, **k):
        raise AssertionError("pipeline re-ran despite fresh final manifest")

    monkeypatch.setattr(chunk_mod, "chunk_documents", _boom)
    m2 = _run_ckpt(tmp_path / "o", tmp_path / "ck")
    assert m2 == m1


def test_corpus_prep_checkpoint_config_invalidation(tmp_path):
    """A config change invalidates every stage: same checkpoint dir, new
    salt — results equal a fresh run at the new salt."""
    _run_ckpt(tmp_path / "x", tmp_path / "ck", salt=7)
    m_new = _run_ckpt(tmp_path / "x", tmp_path / "ck", salt=8)
    m_ref = _run(tmp_path / "ref", salt=8)
    assert m_new == m_ref
