"""ORC / Feather shard source-sink unit tests (wave 63)."""

import os

import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.sources.arrowfmt import (
    read_feather,
    read_orc,
    write_feather_shards,
    write_orc_shards,
)


def _ds(nblocks: int = 3) -> rd.Dataset:
    t = pa.table(
        {
            "doc_id": pa.array(range(30), pa.int64()),
            "text": pa.array([f"doc {i} é\t\"q\"\nnl" for i in range(30)]),
        }
    )
    return rd.from_arrow(t).repartition(nblocks)


@pytest.mark.parametrize("fmt", ["orc", "feather"])
def test_roundtrip_sharded(fmt, tmp_path, ray_session):
    write = write_orc_shards if fmt == "orc" else write_feather_shards
    read = read_orc if fmt == "orc" else read_feather
    out = str(tmp_path / fmt)
    man = write(_ds(), out)
    # one shard per non-empty block, manifest rows sum to the row count
    assert man.num_rows >= 1
    assert sum(man.column("rows").to_pylist()) == 30
    assert all(os.path.exists(p) for p in man.column("path").to_pylist())
    back = read(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert back["doc_id"].tolist() == list(range(30))
    assert back["text"][7] == "doc 7 é\t\"q\"\nnl"


def test_write_is_retry_idempotent(tmp_path, ray_session):
    # same block bytes -> same shard filename: a second write of the same
    # data adds no new files (the task-retry contract)
    out = str(tmp_path / "o")
    write_orc_shards(_ds(1), out)
    first = sorted(os.listdir(out))
    write_orc_shards(_ds(1), out)
    assert sorted(os.listdir(out)) == first


def test_empty_blocks_skip_shards(tmp_path, ray_session):
    out = str(tmp_path / "e")
    t = pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())})
    man = write_feather_shards(rd.from_arrow(t), out)
    assert man.num_rows == 0
