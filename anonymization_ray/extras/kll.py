"""KLL-style mergeable quantile sketch over int64 columns — the streaming
complement of the exact narrow-sort quantiles in `extras/stats`: when a
100-TB column needs approximate quantiles in ONE pass with bounded memory
(k·log(n/k) items per sketch), partial sketches fold per batch and merge
associatively, so the whole reduction is a take_all of #batches sketches
(KBs each) plus a driver fold — no sort, no shuffle.

Determinism: every compaction coin is SplitMix64 of a per-sketch counter
(not RNG state), and the driver folds partials in a canonical order, so the
estimate is a pure function of the data. Correctness is scoreboarded the
CMS/HLL way: the rank-error invariant (|rank(est_q) − q·n| ≤ n·ε with a
5× safety factor on KLL's 1.33/k single-sketch bound) is checked against
EXACT ranks — an estimator regression flips a flag and hash-mismatches.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from .shuffle import sm64_key


class KLL:
    """Fixed-k KLL sketch on int64 values. Level i holds items of weight 2^i."""

    def __init__(self, k: int = 256):
        self.k = k
        self.levels: list[np.ndarray] = [np.empty(0, np.int64)]
        self.n = 0
        self._coins = 0

    def _coin(self) -> int:
        self._coins += 1
        return int(sm64_key(np.array([self._coins], np.int64), 97)[0] & np.uint64(1))

    def update(self, vals: np.ndarray) -> "KLL":
        self.levels[0] = np.concatenate([self.levels[0], vals.astype(np.int64)])
        self.n += len(vals)
        self._compact()
        return self

    def merge(self, other: "KLL") -> "KLL":
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.int64))
        for i, lv in enumerate(other.levels):
            self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._coins = max(self._coins, other._coins)
        self._compact()
        return self

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                buf = np.sort(self.levels[i], kind="stable")
                off = self._coin()
                kept = buf[off::2]
                self.levels[i] = np.empty(0, np.int64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.int64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], kept])
            i += 1

    def quantile(self, q: float) -> int:
        items = np.concatenate(self.levels)
        weights = np.concatenate(
            [np.full(len(lv), 1 << i, np.int64) for i, lv in enumerate(self.levels)]
        )
        order = np.argsort(items, kind="stable")
        items, weights = items[order], weights[order]
        cum = np.cumsum(weights)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return int(items[min(idx, len(items) - 1)])

    def to_table(self) -> pa.Table:
        return pa.table(
            {
                "level": pa.array(
                    np.concatenate(
                        [np.full(len(lv), i, np.int64) for i, lv in enumerate(self.levels)]
                    )
                ),
                "item": pa.array(np.concatenate(self.levels)),
                "n": pa.array([self.n] * sum(len(lv) for lv in self.levels), pa.int64()),
                "coins": pa.array(
                    [self._coins] * sum(len(lv) for lv in self.levels), pa.int64()
                ),
            }
        )

    @staticmethod
    def from_table(t: pa.Table, k: int) -> "KLL":
        s = KLL(k)
        if t.num_rows == 0:
            return s
        lv = t.column("level").to_numpy(zero_copy_only=False)
        it = t.column("item").to_numpy(zero_copy_only=False)
        s.n = int(t.column("n")[0].as_py())
        s._coins = int(t.column("coins")[0].as_py())
        s.levels = [
            it[lv == i].astype(np.int64) for i in range(int(lv.max()) + 1)
        ]
        return s


def kll_sketch(ds: rd.Dataset, col: str, *, k: int = 256) -> KLL:
    """One-pass distributed sketch: per-batch partial KLLs serialize to
    Arrow rows; the driver folds them in canonical (n, first-item) order so
    the result is a pure function of the data, not of block arrival."""
    def _partial(b: pa.Table) -> pa.Table:
        s = KLL(k).update(b.column(col).to_numpy(zero_copy_only=False))
        return s.to_table()

    import ray

    parts = [
        t for t in ray.get(
            ds.map_batches(_partial, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    sketches = [KLL.from_table(t, k) for t in parts]
    sketches.sort(key=lambda s: (s.n, int(s.levels[0][0]) if len(s.levels[0]) else 0))
    out = KLL(k)
    for s in sketches:
        out.merge(s)
    return out
