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
