"""Per-shard Bloom pruning index (extras/bloomidx.py) — pruning bound,
no false negatives, absent-key rejection."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.bloomidx import (
    bloom_candidate_shards,
    build_shard_blooms,
    shard_of,
)


def _docs(n=400):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(n), pa.int64())})
    )


def test_present_keys_always_candidate():
    blooms = build_shard_blooms(_docs(), "doc_id", num_shards=8)
    probes = np.array([0, 17, 399], np.int64)
    cand = bloom_candidate_shards(blooms, probes, num_shards=8)
    # no false negatives: every present probe maps to its own hash shard
    got = np.sort(np.concatenate(list(cand.values())))
    assert got.tolist() == [0, 17, 399]
    own = shard_of(probes, 8)
    for s, keys in cand.items():
        assert all(own[np.where(probes == k)[0][0]] == s for k in keys)


def test_pruning_bound_and_absent_keys():
    blooms = build_shard_blooms(_docs(), "doc_id", num_shards=8)
    # 3 probes touch at most 3 of 8 shards
    cand = bloom_candidate_shards(
        blooms, np.array([5, 6, 7], np.int64), num_shards=8
    )
    assert 1 <= len(cand) <= 3
    # far-away absent keys: with m=2^16 bits over 400 keys the false-
    # positive rate is ~0, so a miss prunes EVERY shard
    miss = bloom_candidate_shards(
        blooms, np.array([10_000_001, 10_000_002], np.int64), num_shards=8
    )
    assert miss == {}
