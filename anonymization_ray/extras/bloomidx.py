"""Per-shard Bloom-filter pruning index — membership pruning for point
lookups over HASH-sharded corpora.

Zonemaps (`extras/zonemap.py`) prune by min/max range and need sorted or
clustered layouts; a hash-sharded corpus has every shard spanning the full
key range, so zonemaps prune nothing there. A per-shard Bloom filter over
the shard's keys prunes by MEMBERSHIP instead: a point-lookup consults the
(tiny, driver-held) bloom manifest and reads only the shards that may
contain a probe key; false positives cost one extra shard read and are
removed by the exact filter after the read — never a wrong result.

Build shape: blooms are bit-OR-associative, so each batch contributes a
partial bloom per shard it touches and the driver ORs the partials — ONE
pass over the narrow key column, no re-read, no shuffle beyond the hive
write itself. Manifest size is num_shards · m_bits/8 bytes (KBs), shipped
once via closure; at 100 TB the same manifest prunes the same way because
it scales with shard COUNT, not corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .shuffle import sm64_key

_SALT_H0 = 9901
_SALT_H1 = 9902


def shard_of(keys: np.ndarray, num_shards: int) -> np.ndarray:
    """Hash shard assignment (SplitMix64 — scrambles sequential ids)."""
    return (sm64_key(keys.astype(np.int64), _SALT_H0 + 17) % np.uint64(num_shards)).astype(
        np.int64
    )


def _bit_positions(keys: np.ndarray, m_bits: int, k_hashes: int) -> np.ndarray:
    """(len(keys), k_hashes) bit indices via double hashing h0 + j·h1."""
    h0 = sm64_key(keys.astype(np.int64), _SALT_H0)
    h1 = sm64_key(keys.astype(np.int64), _SALT_H1) | np.uint64(1)
    j = np.arange(k_hashes, dtype=np.uint64)
    return ((h0[:, None] + j[None, :] * h1[:, None]) % np.uint64(m_bits)).astype(
        np.int64
    )


def build_shard_blooms(
    ds: rd.Dataset,
    key_col: str,
    *,
    num_shards: int,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> dict[int, np.ndarray]:
    """{shard: uint64 bit array} bloom manifest for ``ds[key_col]`` under
    `shard_of` hash sharding. One narrow pass; per-batch partial blooms
    OR-fold on the driver (gather bounded by blocks · shards-touched ·
    m_bits/8 bytes)."""
    words = m_bits // 64

    def _partial(b: pa.Table) -> pa.Table:
        keys = b.column(key_col).to_numpy(zero_copy_only=False).astype(np.int64)
        sh = shard_of(keys, num_shards)
        out_s, out_w = [], []
        for s in np.unique(sh):
            arr = np.zeros(words, np.uint64)
            pos = _bit_positions(keys[sh == s], m_bits, k_hashes).ravel()
            np.bitwise_or.at(arr, pos >> 6, np.uint64(1) << (pos & 63).astype(np.uint64))
            out_s.append(int(s))
            out_w.append(arr.tobytes())
        return pa.table(
            {
                "shard": pa.array(out_s, pa.int64()),
                "bloom": pa.array(out_w, pa.binary()),
            }
        )

    partials = ds.select_columns([key_col]).map_batches(
        _partial, batch_format="pyarrow"
    )
    blooms: dict[int, np.ndarray] = {}
    for blk in ray.get(partials.to_arrow_refs()):
        for s, raw in zip(blk.column("shard").to_pylist(), blk.column("bloom").to_pylist()):
            arr = np.frombuffer(raw, np.uint64)
            if s in blooms:
                blooms[s] = blooms[s] | arr
            else:
                blooms[s] = arr.copy()
    return blooms


def bloom_candidate_shards(
    blooms: dict[int, np.ndarray],
    probes: np.ndarray,
    *,
    num_shards: int,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> dict[int, np.ndarray]:
    """{shard: probe keys that may live there}. A probe's OWN hash shard is
    checked against that shard's bloom — membership elsewhere is
    impossible by construction, so at most one shard per probe."""
    probes = np.asarray(probes, np.int64)
    sh = shard_of(probes, num_shards)
    pos = _bit_positions(probes, m_bits, k_hashes)
    out: dict[int, np.ndarray] = {}
    for i, (p, s) in enumerate(zip(probes, sh)):
        bloom = blooms.get(int(s))
        if bloom is None:
            continue
        idx = pos[i]
        if bool(np.all((bloom[idx >> 6] >> (idx & 63).astype(np.uint64)) & np.uint64(1))):
            out.setdefault(int(s), []).append(p)
    return {s: np.array(v, np.int64) for s, v in out.items()}
