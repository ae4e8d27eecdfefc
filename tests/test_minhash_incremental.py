"""Incremental MinHash-LSH index: equivalence with the one-shot pair
generator, index growth across appends, config guard."""

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.dedup import (
    minhash_index_append_pairs,
    minhash_index_write,
    minhash_lsh_pairs,
)


def _docs(rows):
    ids, texts = zip(*rows)
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": list(texts)})
    ).repartition(2)


BASE = [(1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "completely unrelated text about ray data pipelines here"),
        (3, "a third document discussing parquet row group statistics")]
NEW = [(11, "the quick brown fox jumps over the lazy dog"),      # ~dup of 1
       (12, "novel content sharing nothing with the base corpus")]


def test_incremental_equals_full_restricted(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    minhash_index_write(_docs(BASE), idx, text_col="text", id_col="doc_id",
                        bands=32)
    corpus = _docs(BASE + NEW)
    inc = minhash_index_append_pairs(
        idx, _docs(NEW), corpus, text_col="text", id_col="doc_id",
        verify_threshold=0.4, update_index=False,
    )
    got = sorted((r["id_a"], r["id_b"]) for r in inc.take_all())
    full = minhash_lsh_pairs(
        corpus, "text", "doc_id", bands=32, verify_threshold=0.4
    )
    new_ids = {i for i, _ in NEW}
    want = sorted(
        (r["id_a"], r["id_b"])
        for r in full.take_all()
        if r["id_a"] in new_ids or r["id_b"] in new_ids
    )
    assert got == want == [(1, 11)]


def test_append_grows_index_for_next_increment(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    minhash_index_write(_docs(BASE), idx, text_col="text", id_col="doc_id",
                        bands=32)
    corpus1 = _docs(BASE + NEW)
    minhash_index_append_pairs(
        idx, _docs(NEW), corpus1, text_col="text", id_col="doc_id",
        verify_threshold=0.4,
    )
    # a second increment near-duplicating doc 11 (added by increment 1)
    # must pair against it — proof the append landed in the index
    NEW2 = [(21, "the quick brown fox jumps over the lazy dog again")]
    corpus2 = _docs(BASE + NEW + NEW2)
    inc2 = minhash_index_append_pairs(
        idx, _docs(NEW2), corpus2, text_col="text", id_col="doc_id",
        verify_threshold=0.4,
    )
    got = sorted((r["id_a"], r["id_b"]) for r in inc2.take_all())
    assert (11, 21) in got


def test_config_guard(ray_session, tmp_path):
    idx = str(tmp_path / "idx")
    renamed = _docs(BASE).map_batches(
        lambda b: b.rename_columns(["other", "text"]), batch_format="pyarrow"
    )
    minhash_index_write(renamed, idx, text_col="text", id_col="other",
                        bands=32)
    with pytest.raises(ValueError, match="id_col"):
        minhash_index_append_pairs(
            idx, _docs(NEW), _docs(BASE + NEW),
            text_col="text", id_col="doc_id",
        )
