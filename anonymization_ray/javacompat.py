"""Byte-exact replication of the reference's randomized outputs (conformance
mode).

The reference consumes one ``java.util.Random(seed)`` stream PER attribute,
drawing in ascending sorted-value order with retry-dependent draw counts
(``RandomizationNumeric.java:22,31-40``, ``RandomizationDate.java:40-58``,
``RandomizationDateTime.java:36-51``, window walk ``Randomization.java:27-75``).
That stream is inherently sequential — the number of draws a record consumes
depends on every earlier record's retries — so this mode gathers the (tiny,
request-scale) sorted column and replays the exact Java semantics; the
engine's default remains the partition-independent Philox path
(``stages/randomization.py``).

Tie order: Java sorts a stream of ``HashMap`` entries with a stable sort, so
records with EQUAL values keep the map's iteration order — ascending hash
bucket ``(h ^ h>>>16) & (tableSize-1)`` of the resource URI's
``String.hashCode`` (Jena resources hash by URI), insertion order within a
bucket. ``java_entry_rank`` reproduces that order; validated against the
reference goldens (flat case 14 has a date tie whose draw order follows the
hash buckets).
"""

from __future__ import annotations

import math

import numpy as np

_MASK48 = (1 << 48) - 1
_MULT = 0x5DEECE66D
_ADD = 0xB


class JavaRandom:
    """java.util.Random: 48-bit LCG; nextDouble / nextGaussian (Marsaglia
    polar, one spare gaussian cached) — bit-compatible draw sequence."""

    def __init__(self, seed: int) -> None:
        self.seed = (seed ^ _MULT) & _MASK48
        self._have_g = False
        self._next_g = 0.0

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _MULT + _ADD) & _MASK48
        return self.seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)

    def next_gaussian(self) -> float:
        if self._have_g:
            self._have_g = False
            return self._next_g
        while True:
            v1 = 2 * self.next_double() - 1
            v2 = 2 * self.next_double() - 1
            s = v1 * v1 + v2 * v2
            if 0 < s < 1:
                break
        mult = math.sqrt(-2 * math.log(s) / s)
        self._next_g = v2 * mult
        self._have_g = True
        return v1 * mult


def java_string_hash(s: str) -> int:
    """java.lang.String.hashCode (32-bit wrapping)."""
    h = 0
    for c in s:
        h = (31 * h + ord(c)) & 0xFFFFFFFF
    return h


def java_table_size(n: int) -> int:
    """Final table size of a default-constructed HashMap after n puts
    (resize when size exceeds 0.75 * capacity)."""
    size = 16
    while n > 0.75 * size:
        size <<= 1
    return size


def _bucket(uri: str, size: int) -> int:
    # resource hashCode = uri.hashCode() + 30: Jena salts node hashes with a
    # per-kind seed and Node.hashURI is 30. Validated against every split
    # tie group in the reference goldens (flat + JSON-LD cases 12/14 — 7
    # independent ordering constraints; plain uri.hashCode() and the
    # *31-variants each mis-order at least one)
    h = (java_string_hash(uri) + 30) & 0xFFFFFFFF
    return (h ^ (h >> 16)) & (size - 1)


def java_entry_rank(uris: list[str], full_count: int | None = None) -> np.ndarray:
    """Iteration rank of each uri in a HashMap holding exactly these keys.

    Order: ascending hash bucket; within a bucket, insertion order — which
    itself came from iterating the all-rows map (``results`` in
    ``QueryService.getData``), so the secondary key is that map's bucket,
    then the original row order."""
    n = len(uris)
    size = java_table_size(n)
    full_size = java_table_size(full_count if full_count is not None else n)
    keys = sorted(
        range(n), key=lambda i: (_bucket(uris[i], size), _bucket(uris[i], full_size), i)
    )
    rank = np.empty(n, dtype=np.int64)
    rank[keys] = np.arange(n, dtype=np.int64)
    return rank


def _java_round(x: float) -> int:
    """Math.round(double): floor(x + 0.5) as long."""
    return math.floor(x + 0.5)


def _window_dists(dv: np.ndarray, w: int, k: int) -> np.ndarray:
    """The reference's sequential lowerBound walk (Randomization.java:42-52)
    over distance-unit values ``dv`` in JAVA sort order."""
    out = np.empty(k)
    lb = 0
    for idx in range(k):
        x = dv[idx]
        while lb < k - (w + 1) and (
            lb < idx - w or abs(dv[lb] - x) > abs(dv[lb + w + 1] - x)
        ):
            lb += 1
        out[idx] = max(abs(dv[lb] - x), abs(dv[lb + w] - x))
    return out


def randomize_sorted_java(kind: str, v: np.ndarray, w: int, seed: int) -> np.ndarray:
    """Randomized values for a column ALREADY in Java sort order.

    ``v`` units: numeric = the double values; date = epoch days; dateTime =
    epoch millis (distances use double seconds, bounds truncated seconds —
    RandomizationDateTime.java:33-51). Returns values in the same units."""
    k = len(v)
    rng = JavaRandom(seed)
    out = np.empty(k)
    if kind == "numeric":
        dv = v.astype(np.float64)
        dists = _window_dists(dv, w, k)
        vmin, vmax = dv[0], dv[k - 1]
        for i in range(k):
            val, dist = dv[i], dists[i]
            rv = float("inf")
            while rv > vmax or rv < vmin:
                noise = rng.next_double() * dist
                rv = val - noise if (val + noise > vmax or val + noise < vmin) else val + noise
            out[i] = rv
        return out
    if kind == "date":
        dv = v.astype(np.float64)  # epoch days; DAYS.between widened to double
        dists = _window_dists(dv, w, k)
        vmin, vmax = dv[0], dv[k - 1]
        for i in range(k):
            val, dist = dv[i], dists[i]
            nd = 2**31 - 1
            while val + nd > vmax or val + nd < vmin:
                nd = int(_java_round(rng.next_gaussian() * dist))
                if val + nd > vmax or val + nd < vmin:
                    nd = -nd
            out[i] = val + nd
        return out
    # dateTime: millis in, millis out; Calendar.add(SECOND, noise)
    millis = v.astype(np.int64)
    dv = millis / 1000.0  # double seconds (distance units)
    vs = np.sign(millis) * (np.abs(millis) // 1000)  # truncated long seconds
    dists = _window_dists(dv, w, k)
    smin, smax = int(vs[0]), int(vs[k - 1])
    for i in range(k):
        s, dist = int(vs[i]), dists[i]
        noise = 2**31 - 1
        while s + noise > smax or s + noise < smin:
            noise = int(rng.next_gaussian() * dist)  # Java (int) cast truncates
            if s + noise > smax or s + noise < smin:
                noise = -noise
        out[i] = millis[i] + noise * 1000
    return out
