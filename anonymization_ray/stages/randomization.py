"""Randomization — noise scaled by the distance to the ~w-th nearest neighbor
in sorted order.

Reference semantics (``service/anonymizer/Randomization.java:27-75`` + the
numeric/date/dateTime subclasses):

- w = k // g (if w == k then k-1, ``Randomization.java:29,37``)
- sort the column; for each sorted rank idx a window lower bound advances while
  the window [lb, lb+w] can move closer (``Randomization.java:42-47``);
  noise scale dist = max(|v - v[lb]|, |v - v[lb+w]|) (``:50-52``)
- numeric: noise = U(0,1) * dist, reflected (v - noise) when v + noise leaves
  [min, max], retried until in range (``RandomizationNumeric.java:31-40`` —
  uniform, not gaussian)
- date: noiseDays = round(N(0,1) * dist_days), sign-flip then retry
  (``RandomizationDate.java:40-58``)
- dateTime: noise = int(N(0,1) * dist_seconds) seconds, same reflection
  (``RandomizationDateTime.java:36-51``)
- output column ``<attr>_randomized`` (``Randomization.java:72-75``).

Parallel formulation: the sequential lower-bound scan has the closed form

    lb(idx) = min(max(first_j, idx - w, 0), k - w - 1)
    first_j = first j with v[j] + v[j+w+1] >= 2 * v[idx]

(the advance predicate |v[j]-v| > |v[j+w+1]-v| is monotone in j, so the greedy
stop is the first satisfying j — a searchsorted over the nondecreasing series
s[j] = v[j] + v[j+w+1]). Each sorted narrow block is processed by one task
with a ±(w+1) halo of neighbor values; noise uses a counter-based Philox
stream keyed per attribute and indexed by global rank, so results are
byte-identical at any parallelism (distributionally equivalent to the
reference's sequential java.util.Random, not bit-equal).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ..config import calculate_num_buckets
from ..rng import (
    attribute_seed,
    attribute_seed64,
    gaussian_rounds,
    sm_gaussian_rounds,
    sm_uniform_rounds,
    uniform_rounds,
)
from ..util import chunked_ranges, default_num_partitions, hash_join, sorted_column
from .codecs import CODECS, DATE, NUMERIC


def _trunc_div(a: np.ndarray, b: int) -> np.ndarray:
    """Java-style integer division (truncates toward zero)."""
    return (np.sign(a) * (np.abs(a) // b)).astype(np.int64)


def randomize_ranks_np(
    kind: str,
    key: int,
    v_all: np.ndarray,
    halo_start: int,
    start: int,
    stop: int,
    w: int,
    k: int,
    vmin: float,
    vmax: float,
    rng_mode: str = "philox",
) -> np.ndarray:
    """Randomize global sorted ranks [start, stop); ``v_all`` covers global
    ranks [halo_start, halo_start+len) ⊇ [start-w, stop+w+1) ∩ [0, k).

    ``rng_mode="splitmix"`` draws from the SplitMix64 counter stream (SQL-
    oracle-exact; date rounding is Java ``Math.round`` = floor(x+0.5), which
    DuckDB can replicate bit-for-bit); ``"philox"`` keeps the original
    Philox stream (np.rint date rounding)."""
    n = stop - start
    idx = np.arange(start, stop, dtype=np.int64)
    v = v_all[idx - halo_start].astype(np.float64)
    dist = window_noise_scale_np(v_all, halo_start, start, stop, w, k)

    codec = CODECS[kind]
    sm = rng_mode == "splitmix"
    if kind == NUMERIC:
        u = (sm_uniform_rounds if sm else uniform_rounds)(key, start, n)  # (n, RETRY_ROUNDS)
        noise = u * dist[:, None]
        cand = v[:, None] + noise
        out_hi = (cand > vmax) | (cand < vmin)
        cand = np.where(out_hi, v[:, None] - noise, cand)
        ok = (cand >= vmin) & (cand <= vmax)
        out = _first_ok(cand, ok, fallback=np.clip(v, vmin, vmax))
        return out

    z = (sm_gaussian_rounds if sm else gaussian_rounds)(key, start, n)
    if kind == DATE:
        zd = z * dist[:, None]
        noise = np.floor(zd + 0.5) if sm else np.rint(zd)  # days
        base, lo, hi = v, vmin, vmax
        scale_back = 1
    else:  # DATETIME: values in millis, noise in whole seconds
        vs = _trunc_div(v.astype(np.int64), 1000).astype(np.float64)
        dist_s = dist / codec.distance_scale()
        noise = np.trunc(z * dist_s[:, None])  # seconds, Java (int) cast
        base = vs
        lo = float(_trunc_div(np.array([int(vmin)]), 1000)[0])
        hi = float(_trunc_div(np.array([int(vmax)]), 1000)[0])
        scale_back = 1000

    cand = base[:, None] + noise
    out_rng = (cand > hi) | (cand < lo)
    noise = np.where(out_rng, -noise, noise)
    cand = base[:, None] + noise
    ok = (cand >= lo) & (cand <= hi)
    sel_noise = _first_ok(noise, ok, fallback=np.zeros(n))
    return v + sel_noise * scale_back


def _first_ok(cand: np.ndarray, ok: np.ndarray, fallback: np.ndarray) -> np.ndarray:
    """Per row: first retry-round column where ok; else fallback."""
    first = np.argmax(ok, axis=1)
    any_ok = ok.any(axis=1)
    picked = cand[np.arange(cand.shape[0]), first]
    return np.where(any_ok, picked, fallback)


def window_noise_scale_np(
    v_all: np.ndarray, halo_start: int, start: int, stop: int, w: int, k: int
) -> np.ndarray:
    """The deterministic part of randomization: dist per sorted rank
    (``Randomization.java:42-52``), exposed for oracle checks."""
    n = stop - start
    idx = np.arange(start, stop, dtype=np.int64)
    v = v_all[idx - halo_start].astype(np.float64)
    if w <= 0 or k <= 1:
        return np.zeros(n)
    j0 = max(0, start - w)
    j1 = min(k - w - 2, stop - 1)
    if j1 >= j0:
        jr = np.arange(j0, j1 + 1, dtype=np.int64)
        svec = v_all[jr - halo_start].astype(np.float64) + v_all[jr + w + 1 - halo_start].astype(
            np.float64
        )
        first_j = j0 + np.searchsorted(svec, 2.0 * v, side="left")
    else:
        first_j = np.full(n, k - w - 1, dtype=np.int64)
    lb = np.minimum(np.maximum(np.maximum(first_j, idx - w), 0), k - w - 1)
    return np.maximum(
        np.abs(v - v_all[lb - halo_start].astype(np.float64)),
        np.abs(v - v_all[lb + w - halo_start].astype(np.float64)),
    )


@ray.remote
def _window_scale_block(
    value_col: str,
    id_col: str,
    out_col: str,
    halo_start: int,
    start: int,
    stop: int,
    w: int,
    k: int,
    *halo_tables: pa.Table,
) -> pa.Table:
    tbl = pa.concat_tables(halo_tables)
    v_all = tbl.column(value_col).to_numpy(zero_copy_only=False)
    dist = window_noise_scale_np(v_all, halo_start, start, stop, w, k)
    ids = tbl.column(id_col).slice(start - halo_start, stop - start)
    return pa.table({id_col: ids.combine_chunks(), out_col: pa.array(dist, pa.float64())})


def window_noise_scale(
    ds: ray.data.Dataset,
    col: str,
    id_col: str,
    *,
    num_attrs: int,
    kind: str,
    out_col: str = "noise_scale",
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Dataset of (id, noise_scale) — the seed-independent noise magnitude."""
    codec = CODECS[kind]
    sc = sorted_column(ds, col, id_col, codec.to_numeric)
    k = sc.total
    if k == 0:
        return ds.map_batches(
            lambda b: pa.table(
                {id_col: b.column(id_col), out_col: pa.nulls(b.num_rows, pa.float64())}
            ),
            batch_format="pyarrow",
        )
    g = calculate_num_buckets(k, num_attrs)
    w = k // g
    if w == k:
        w = k - 1
    out_refs = []
    for start, stop in chunked_ranges(sc.offsets):
        halo = sc.halo_slice_refs(max(0, start - (w + 1)), min(k, stop + (w + 1)))
        out_refs.append(
            _window_scale_block.remote(
                sc.value_col, sc.id_col, out_col, max(0, start - (w + 1)), start, stop, w, k, *halo
            )
        )
    scale_ds = ray.data.from_arrow_refs(out_refs)
    if num_partitions is None:
        num_partitions = max(2, min(default_num_partitions(), k // 50_000 + 1))
    return hash_join(
        ds.select_columns([id_col]), scale_ds, on=id_col, join_type="left_outer",
        num_partitions=num_partitions,
    )


@ray.remote
def _randomize_block(
    kind: str,
    key: int,
    value_col: str,
    id_col: str,
    out_col: str,
    halo_start: int,
    start: int,
    stop: int,
    w: int,
    k: int,
    vmin: float,
    vmax: float,
    rng_mode: str,
    *halo_tables: pa.Table,
) -> pa.Table:
    tbl = pa.concat_tables(halo_tables)
    v_all = tbl.column(value_col).to_numpy(zero_copy_only=False)
    out_vals = randomize_ranks_np(
        kind, key, v_all, halo_start, start, stop, w, k, vmin, vmax, rng_mode
    )
    ids = tbl.column(id_col).slice(start - halo_start, stop - start)
    codec = CODECS[kind]
    if kind == NUMERIC:
        out_arr = pa.array(out_vals, type=pa.float64())
    else:
        out_arr = codec.from_numeric(np.asarray(out_vals).astype(np.int64))
    return pa.table({id_col: ids.combine_chunks(), out_col: out_arr})


def randomize_column(
    ds: ray.data.Dataset,
    col: str,
    id_col: str,
    *,
    num_attrs: int,
    kind: str,
    seed: int,
    object_type: str = "",
    out_col: str | None = None,
    num_partitions: int | None = None,
    rng_mode: str = "philox",
) -> ray.data.Dataset:
    """Add ``<col>_randomized`` (native type, null where input null).

    ``rng_mode="philox"`` (default): counter-based stream keyed per
    (seed, type, attribute), byte-identical at any parallelism.
    ``rng_mode="splitmix"``: same counter-keyed partition independence, but
    the generator (SplitMix64) and every downstream float op are exactly
    expressible in DuckDB SQL — use when the output must be value-hash
    checkable against a SQL oracle.
    ``rng_mode="java_lcg"``: byte-exact replication of the reference's
    sequential ``java.util.Random(seed)`` draws (conformance mode) — gathers
    the sorted narrow column on the driver, so REQUEST-scale inputs only;
    the caller is responsible for a Java-order ``id_col`` tie-break
    (``javacompat.java_entry_rank``)."""
    codec = CODECS[kind]
    out = out_col or f"{col}_randomized"

    sc = sorted_column(ds, col, id_col, codec.to_numeric)
    k = sc.total
    if k == 0:
        null_t = pa.float64() if kind == NUMERIC else (
            pa.date32() if kind == DATE else pa.timestamp("ms")
        )

        def _null(batch: pa.Table) -> pa.Table:
            return batch.append_column(out, pa.nulls(batch.num_rows, null_t))

        return ds.map_batches(_null, batch_format="pyarrow")

    g = calculate_num_buckets(k, num_attrs)
    w = k // g
    if w == k:
        w = k - 1

    if rng_mode == "java_lcg":
        from ..javacompat import randomize_sorted_java

        tbl = pa.concat_tables(ray.get(list(sc.refs)))
        v = tbl.column(sc.value_col).to_numpy(zero_copy_only=False)
        out_vals = randomize_sorted_java(kind, np.asarray(v), w, seed)
        if kind == NUMERIC:
            out_arr = pa.array(out_vals, pa.float64())
        else:
            out_arr = codec.from_numeric(np.asarray(out_vals).astype(np.int64))
        rand_ds = ray.data.from_arrow(
            pa.table({id_col: tbl.column(sc.id_col).combine_chunks(), out: out_arr})
        )
        if out == col:
            ds = ds.drop_columns([col])
        if num_partitions is None:
            num_partitions = max(2, min(default_num_partitions(), k // 50_000 + 1))
        return hash_join(
            ds, rand_ds, on=id_col, join_type="left_outer", num_partitions=num_partitions
        )

    ends = sc.values_at_ranks([0, k - 1])
    vmin, vmax = float(ends[0]), float(ends[k - 1])
    if rng_mode == "splitmix":
        key = attribute_seed64(seed, object_type, col)
    else:
        key = attribute_seed(seed, object_type, col)

    out_refs = []
    for start, stop in chunked_ranges(sc.offsets):
        halo_start = max(0, start - (w + 1))
        halo_stop = min(k, stop + (w + 1))
        halo = sc.halo_slice_refs(halo_start, halo_stop)
        out_refs.append(
            _randomize_block.remote(
                kind,
                key,
                sc.value_col,
                sc.id_col,
                out,
                halo_start,
                start,
                stop,
                w,
                k,
                vmin,
                vmax,
                rng_mode,
                *halo,
            )
        )
    rand_ds = ray.data.from_arrow_refs(out_refs)
    if out == col:
        ds = ds.drop_columns([col])
    if num_partitions is None:
        # small column -> few join partitions (each spins an aggregator actor)
        num_partitions = max(2, min(default_num_partitions(), k // 50_000 + 1))
    return hash_join(ds, rand_ds, on=id_col, join_type="left_outer", num_partitions=num_partitions)
