"""Counter-based deterministic RNG for partition-independent noise.

The reference seeds one ``java.util.Random(seed)`` per anonymizer instance and
draws sequentially in ascending sorted-value order
(``RandomizationNumeric.java:22,31-40``; seed from the request DTO,
``dto/AnonymizationJsonLDRequestDto.java:31-32``). A sequential stream cannot
be reproduced by parallel tasks, so we use a counter-based scheme instead:

- one Philox key per (request_seed, object_type, attribute)
- a fixed budget of ``DRAWS_PER_RANK`` doubles per global sorted rank
- a task covering ranks [a, b) advances the counter to a*DRAWS_PER_RANK and
  draws a (b-a, DRAWS_PER_RANK) matrix — identical output regardless of how
  ranks are split across tasks/nodes.

Same seed => byte-identical output at any parallelism. Distributionally
equivalent to the reference (uniform noise for numerics, gaussian for
date/dateTime via Box–Muller), not bit-equal to Java's LCG.

numpy detail: ``Philox.advance(n)`` advances n 128-bit counter blocks = 4
doubles each, so DRAWS_PER_RANK must be a multiple of 4 (verified in tests).
"""

from __future__ import annotations

import hashlib

import numpy as np

# 32 doubles per rank: 16 retry rounds of (u1,u2) pairs; uniforms use column 0
# of each pair, gaussians use Box-Muller on both.
RETRY_ROUNDS = 16
DRAWS_PER_RANK = 2 * RETRY_ROUNDS
assert DRAWS_PER_RANK % 4 == 0


def attribute_seed(request_seed: int, object_type: str, attribute: str) -> int:
    """Stable per-(seed, type, attribute) Philox key — mirrors the reference's
    per-anonymizer ``new Random(seed)`` isolation."""
    h = hashlib.sha256(f"{request_seed}|{object_type}|{attribute}".encode()).digest()
    return int.from_bytes(h[:16], "little")


def attribute_seed64(request_seed: int, object_type: str, attribute: str) -> int:
    """Low 64 bits of :func:`attribute_seed` — the key for the SplitMix64
    stream (the SQL oracle needs a key that fits mod-2^64 arithmetic)."""
    return attribute_seed(request_seed, object_type, attribute) & 0xFFFFFFFFFFFFFFFF


# SplitMix64 (Steele/Lea/Flood, public domain reference constants) used as a
# pure counter RNG: draw(ctr) = finalize(key + ctr * GOLDEN_GAMMA) mod 2^64.
# Same partition-independence as the Philox path (a draw depends only on its
# global counter), but the finalizer is 3 multiply/xorshift steps — exactly
# expressible in DuckDB SQL with HUGEINT mod-2^64 arithmetic, which makes the
# full randomized output value-hash checkable against a SQL oracle.
SM64_GAMMA = 0x9E3779B97F4A7C15
_SM64_M1 = 0xBF58476D1CE4E5B9
_SM64_M2 = 0x94D049BB133111EB


def _sm64_mix(x: np.ndarray) -> np.ndarray:
    """SplitMix64 finalizer over a uint64 array (wrapping arithmetic)."""
    z = (x ^ (x >> np.uint64(30))) * np.uint64(_SM64_M1)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(_SM64_M2)
    return z ^ (z >> np.uint64(31))


def sm_rank_uniforms(key64: int, start_rank: int, count: int) -> np.ndarray:
    """(count, DRAWS_PER_RANK) uniforms — SplitMix64 counter stream.

    Element (i, j) uses counter (start_rank + i) * DRAWS_PER_RANK + j, so any
    split of ranks across tasks yields byte-identical values (same layout
    contract as :func:`rank_uniforms`)."""
    ranks = np.arange(start_rank, start_rank + count, dtype=np.uint64)
    ctr = ranks[:, None] * np.uint64(DRAWS_PER_RANK) + np.arange(
        DRAWS_PER_RANK, dtype=np.uint64
    )
    with np.errstate(over="ignore"):
        z = _sm64_mix(np.uint64(key64) + ctr * np.uint64(SM64_GAMMA))
    return (z >> np.uint64(11)).astype(np.float64) * (1.0 / 9007199254740992.0)


def sm_uniform_rounds(key64: int, start_rank: int, count: int) -> np.ndarray:
    """(count, RETRY_ROUNDS) U(0,1) — SplitMix64 counter stream, even lanes."""
    return sm_rank_uniforms(key64, start_rank, count)[:, 0::2]


def sm_gaussian_rounds(key64: int, start_rank: int, count: int) -> np.ndarray:
    """(count, RETRY_ROUNDS) N(0,1) via Box-Muller over SplitMix64 pairs.

    Formula written to match the SQL oracle operation-for-operation:
    sqrt(-2*ln(max(u1, 1e-300))) * cos(2*pi*u2)."""
    u = sm_rank_uniforms(key64, start_rank, count)
    u1 = np.maximum(u[:, 0::2], 1e-300)
    u2 = u[:, 1::2]
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def rank_uniforms(key: int, start_rank: int, count: int) -> np.ndarray:
    """(count, DRAWS_PER_RANK) uniforms for global ranks [start_rank, start_rank+count)."""
    bg = np.random.Philox(key=key)
    bg.advance(start_rank * DRAWS_PER_RANK // 4)
    rng = np.random.Generator(bg)
    return rng.random((count, DRAWS_PER_RANK))


def uniform_rounds(key: int, start_rank: int, count: int) -> np.ndarray:
    """(count, RETRY_ROUNDS) U(0,1) draws (one per retry round)."""
    return rank_uniforms(key, start_rank, count)[:, 0::2]


def gaussian_rounds(key: int, start_rank: int, count: int) -> np.ndarray:
    """(count, RETRY_ROUNDS) N(0,1) draws via Box-Muller (counter-stable)."""
    u = rank_uniforms(key, start_rank, count)
    u1 = np.clip(u[:, 0::2], 1e-300, 1.0)
    u2 = u[:, 1::2]
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
