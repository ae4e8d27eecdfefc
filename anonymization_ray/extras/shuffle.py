"""Deterministic corpus shuffle and train/val/test split assignment.

Training pipelines need a REPRODUCIBLE global shuffle (epoch ordering must
not depend on partitioning, executor count, or which worker ran first) and a
stable per-document split assignment that never moves a document between
train and eval when the corpus is re-sharded. Ray Data's ``random_shuffle``
is neither (seeded per-run, not per-row); both ops here key every decision on
a SplitMix64 hash of the document id alone, so the result is a pure function
of the data — and bit-replicable in SQL (``sql_sm64_chain`` builds the same
finalizer out of HUGEINT mod-2^64 primitives), which makes both operators
value-hash-exact against DuckDB oracles.

Shapes at scale:

- ``split_assign`` is a stateless one-pass ``map_batches`` (integer threshold
  compare on the hash — no floats anywhere), streams at input rate;
- ``deterministic_shuffle`` is ONE narrow global sort over ``(hash, id)``
  (the canonical all-to-all a training shuffle genuinely requires) followed
  by zero-copy per-block position stamping: block row-counts come from
  metadata-sized summaries, the prefix-sum runs on the driver over
  #blocks integers, and each block writes ``offset + arange`` — no second
  shuffle, no driver row materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..rng import SM64_GAMMA, _SM64_M1, _SM64_M2, _sm64_mix
from ..sqlrng import _mul64, _xsh


def sm64_key(ids: np.ndarray, salt: int = 0) -> np.ndarray:
    """Order-scrambling uint64 key: SplitMix64 finalizer of ``id + salt + 1``
    (the +1 keeps id 0 off the weak all-zero input)."""
    x = (ids.astype(np.uint64) + np.uint64(salt + 1)) * np.uint64(SM64_GAMMA)
    return _sm64_mix(x)


def sql_sm64_chain(table: str, id_col: str, salt: int = 0) -> str:
    """CTE chain computing :func:`sm64_key` exactly in DuckDB: ``h0..h3``
    stages (one per finalizer step, so expressions never nest) ending in a
    relation ``(..., h)`` with ``h`` the HUGEINT hash in [0, 2^64)."""
    return f"""
h0 AS (SELECT *, {_mul64(f"CAST({id_col} AS HUGEINT) + {salt + 1}", SM64_GAMMA)} AS z FROM {table}),
h1 AS (SELECT * EXCLUDE (z), {_mul64(_xsh("z", 30), _SM64_M1)} AS z FROM h0),
h2 AS (SELECT * EXCLUDE (z), {_mul64(_xsh("z", 27), _SM64_M2)} AS z FROM h1),
h3 AS (SELECT * EXCLUDE (z), {_xsh("z", 31)} AS h FROM h2)"""


def split_assign(
    ds: rd.Dataset,
    id_col: str,
    fractions: dict[str, float],
    *,
    salt: int = 0,
) -> rd.Dataset:
    """Dataset[(id_col, split)] — stable hash-based assignment into named
    splits with the given fractions (must sum to 1). Thresholds are integer
    (``floor(cum_fraction * 2^64)``) so the compare is exact and the SQL
    oracle replicates it without any float."""
    names = list(fractions)
    cum, edges = 0.0, []
    for n in names[:-1]:
        cum += fractions[n]
        # clamp: a cumulative fraction of 1.0 (e.g. a trailing 0-weight
        # split) must mean "everything below", not a uint64 overflow
        edges.append(np.uint64(min(int(cum * 2**64), 2**64 - 1)))

    def _assign(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = sm64_key(ids, salt)
        out = np.full(len(h), names[-1], dtype=object)
        prev = np.zeros(len(h), dtype=bool)
        for name, edge in zip(names, edges):
            m = (h < edge) & ~prev
            out[m] = name
            prev |= m
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "split": pa.array(out, pa.string()),
            }
        )

    return ds.map_batches(_assign, batch_format="pyarrow")


def deterministic_shuffle(
    ds: rd.Dataset, id_col: str, *, salt: int = 0
) -> rd.Dataset:
    """Dataset[(id_col, pos)] — the global shuffle ORDER as a position
    column: ``pos`` is the 1-based rank of ``(sm64_key(id), id)``. Consumers
    sort/range-partition by ``pos`` to read the corpus in shuffled order;
    the mapping is a pure function of the ids, identical at any parallelism.
    """
    from ..util import coalesce_blocks

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "hkey": pa.array(sm64_key(ids, salt), pa.uint64()),
            }
        )

    keyed = (
        ds.select_columns([id_col])
        .map_batches(_key, batch_format="pyarrow")
        .materialize()
    )
    s = coalesce_blocks(keyed).sort(["hkey", id_col]).materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _nrows(t: pa.Table) -> int:
        return t.num_rows

    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])

    @ray.remote(num_cpus=0.25)
    def _stamp(t: pa.Table, off: int) -> pa.Table:
        return pa.table(
            {
                id_col: t.column(id_col).combine_chunks(),
                "pos": pa.array(
                    np.arange(1, t.num_rows + 1, dtype=np.int64) + off, pa.int64()
                ),
            }
        )

    return rd.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def mixture_sample(
    ds: rd.Dataset,
    key_col: str,
    weights: dict[str, float],
    id_col: str,
    *,
    default: float = 1.0,
    salt: int = 11,
) -> rd.Dataset:
    """Dataset[(id_col, key_col, copy_idx)] — deterministic per-source
    mixture weighting (epoch composition): a document whose source has
    weight ``w`` appears ``floor(w)`` times plus one more iff
    ``sm64_key(id, salt) < frac(w)·2^64``. Up-sampling (w>1), down-sampling
    (w<1) and dropping (w=0) all fall out; the expansion is a stateless
    streaming fan-out (``np.repeat`` per batch, no shuffle) and a pure
    function of (id, source), so re-sharding or re-running never changes
    the epoch's composition. Thresholds are precomputed integers — the SQL
    oracle replicates the draw with no float arithmetic."""
    plan = {
        k: (int(np.floor(w)), np.uint64(int((w - np.floor(w)) * 2**64)))
        for k, w in weights.items()
    }
    dflt = (int(np.floor(default)), np.uint64(int((default - np.floor(default)) * 2**64)))

    def _expand(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        src = batch.column(key_col).to_numpy(zero_copy_only=False)
        h = sm64_key(ids, salt)
        # per-UNIQUE-source Python only (source cardinality is tiny), then
        # a vectorized gather back to row granularity
        uniq, inv = np.unique(src, return_inverse=True)
        base = np.array([plan.get(s, dflt)[0] for s in uniq], np.int64)[inv]
        thr = np.array([plan.get(s, dflt)[1] for s in uniq], np.uint64)[inv]
        cnt = base + (h < thr)
        keep = cnt > 0
        cnt = cnt[keep]
        off = np.concatenate([[0], np.cumsum(cnt)])
        copy_idx = np.arange(off[-1], dtype=np.int64) - np.repeat(off[:-1], cnt)
        take = pa.array(np.repeat(np.nonzero(keep)[0], cnt), pa.int64())
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks().take(take),
                key_col: batch.column(key_col).combine_chunks().take(take),
                "copy_idx": pa.array(copy_idx, pa.int64()),
            }
        )

    return ds.map_batches(_expand, batch_format="pyarrow")


def token_budget_cut(
    ds: rd.Dataset,
    id_col: str,
    tokens_col: str,
    budget: int,
    *,
    salt: int = 0,
) -> rd.Dataset:
    """Dataset[(id_col, tokens_col, cum)] — the budget-sized corpus prefix:
    documents in deterministic-shuffle order (``sm64_key(id), id``) kept
    while the RUNNING token total stays <= ``budget`` ("train on the first
    N tokens of the shuffled corpus", the standard fixed-token-budget
    subsample).

    Shape: one narrow (hash, id, n_tokens) range sort, per-block token sums
    gathered as SCALARS (bounded by block count), exclusive-prefix offsets
    on the driver, then a vectorized in-block cumsum + compare. Blocks whose
    offset already exceeds the budget short-circuit to empty. Pure function
    of (ids, token counts) — identical at any parallelism."""
    from ..util import coalesce_blocks

    def _key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                tokens_col: pc.cast(batch.column(tokens_col), pa.int64()),
                "hkey": pa.array(sm64_key(ids, salt), pa.uint64()),
            }
        )

    keyed = (
        ds.select_columns([id_col, tokens_col])
        .map_batches(_key, batch_format="pyarrow")
        .materialize()
    )
    s = coalesce_blocks(keyed).sort(["hkey", id_col]).materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _toksum(t: pa.Table) -> int:
        if t.num_rows == 0 or tokens_col not in t.column_names:
            return 0
        return int(
            t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64).sum()
        )

    sums = ray.get([_toksum.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(sums)[:-1]]).astype(np.int64)

    @ray.remote(num_cpus=0.25)
    def _cut(t: pa.Table, off: int) -> pa.Table:
        empty = pa.table(
            {
                id_col: pa.array([], pa.int64()),
                tokens_col: pa.array([], pa.int64()),
                "cum": pa.array([], pa.int64()),
            }
        )
        if t.num_rows == 0 or tokens_col not in t.column_names:
            return empty
        n = t.column(tokens_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cum = np.cumsum(n) + off
        m = cum <= budget
        if not m.any():
            return empty
        tt = t.filter(pa.array(m))
        return pa.table(
            {
                id_col: tt.column(id_col).combine_chunks(),
                tokens_col: tt.column(tokens_col).combine_chunks(),
                "cum": pa.array(cum[m], pa.int64()),
            }
        )

    return rd.from_arrow_refs(
        [_cut.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )


def split_leakage(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    *,
    train_frac: float = 0.8,
    salt: int = 0,
) -> "pa.Table":
    """Cross-split contamination check: how many eval-split documents share
    an EXACT content hash with any train-split document — the leakage audit
    every train/val split of a dedup-imperfect corpus needs before the eval
    numbers mean anything.

    Shape at crawl scale: the split assignment is the stateless SplitMix64
    threshold (no shuffle), text collapses to a 16 B siphash immediately, the
    distinct train-hash set is built by sort + boundary scan
    (``util.min_per_key`` — never a Ray per-group aggregate), and the
    membership probe is ONE hash-partitioned semi-join on int64 keys — the
    corpus text itself never moves. Returns one row
    (n_train, n_eval, n_leaked).
    """
    import pandas as pd

    from ..util import hash_join, min_per_key

    edge = np.uint64(min(int(train_frac * 2**64), 2**64 - 1))

    def _hash_split(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        txt = batch.column(text_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(txt.astype(object)).astype(np.int64)
        is_train = sm64_key(ids, salt) < edge
        return pa.table(
            {
                "content_hash": pa.array(h, pa.int64()),
                "is_train": pa.array(is_train),
            }
        )

    hashed = ds.select_columns([id_col, text_col]).map_batches(
        _hash_split, batch_format="pyarrow"
    ).materialize()  # narrow (hash, flag) rows; reused by both sides

    train = hashed.filter(expr="is_train == True").map_batches(
        lambda b: pa.table(
            {
                "content_hash": b.column("content_hash").combine_chunks(),
                "_one": pa.array(np.ones(b.num_rows, np.int8)),
            }
        ),
        batch_format="pyarrow",
    )
    n_train = train.count()
    ev = hashed.filter(expr="is_train == False").select_columns(["content_hash"])
    n_eval = ev.count()
    if n_train == 0 or n_eval == 0:
        leaked = 0
    else:
        distinct_train = min_per_key(train, "content_hash", "_one").select_columns(
            ["content_hash"]
        )
        nparts = max(2, min(8, n_eval // 4000 + 1))
        leaked = hash_join(
            ev, distinct_train, on="content_hash", join_type="inner",
            num_partitions=nparts,
        ).count()
    return pa.table(
        {
            "n_train": pa.array([n_train], pa.int64()),
            "n_eval": pa.array([n_eval], pa.int64()),
            "n_leaked": pa.array([leaked], pa.int64()),
        }
    )


def temperature_upsample(
    ds: rd.Dataset,
    key_col: str,
    id_col: str,
    *,
    salt: int = 13,
) -> rd.Dataset:
    """Square-root temperature rebalancing (the multilingual-corpus
    standard, alpha = 0.5): every source/language is upsampled by
    f_s = sqrt(n_max / n_s), so the largest source keeps weight 1.0 and a
    source 100x smaller is repeated ~10x — flattening the distribution
    toward (but not onto) uniform. The per-source counts are ONE tiny
    sort-scan aggregate (bounded by source cardinality); the expansion is
    :func:`mixture_sample`'s stateless deterministic fan-out.

    sqrt and the single division are IEEE-correctly-rounded in both numpy
    and DuckDB, so the oracle replicates the exact thresholds — no
    pow()-libm hazard (that is why alpha is fixed at 0.5)."""
    import math

    from .stats import exact_value_counts

    counts = {
        r[key_col]: r["n"]
        for r in exact_value_counts(
            ds.select_columns([key_col]), key_col
        ).take_all()
    }
    if not counts:
        return mixture_sample(ds, key_col, {}, id_col, default=1.0, salt=salt)
    n_max = max(counts.values())
    weights = {k: math.sqrt(n_max / n) for k, n in counts.items()}
    return mixture_sample(ds, key_col, weights, id_col, default=0.0, salt=salt)


CURRICULUM_SALT = 6007


def curriculum_order(
    ds: rd.Dataset,
    id_col: str,
    difficulty_col: str,
    *,
    bands: int = 4,
) -> rd.Dataset:
    """Curriculum training order: docs ranked globally by a difficulty
    proxy, cut into ``bands`` equal-height difficulty bands (easy first),
    then deterministically shuffled WITHIN each band — the standard
    curriculum-learning layout (easy->hard macro order, no intra-band
    difficulty correlation to bias early steps). Returns
    (id, band, pos): ``pos`` is the global serving order.

    Both passes are the engine's global-rank shape (`util.rank_per_key`
    under a constant key: ONE narrow range sort + per-block ranks +
    boundary carries). The intra-band shuffle key packs
    band · 2^61 + sm64(id)//8 into one int64 so pass 2 is a single sort;
    ties (collisions of the truncated hash) break on the id, and the SQL
    oracle orders by the identical packed value, so the order is
    bit-reproducible.

    ``bands`` is capped at 4: the packed key band·2^61 + h//8 overflows
    int64 at band index 4 (4·2^61 = 2^63 wraps negative and the serving
    order would be silently wrong) — refuse loudly rather than corrupt."""
    import pyarrow.compute as pc

    if not 1 <= bands <= 4:
        raise ValueError(
            f"bands must be in [1, 4] (got {bands}): the band*(2^61) packed "
            "sort key overflows int64 at band index 4"
        )

    from ..util import rank_per_key

    n = ds.count()

    def _const(b: pa.Table) -> pa.Table:
        return b.append_column(
            "_k", pa.array(np.zeros(b.num_rows, np.int64))
        )

    narrow = ds.select_columns([id_col, difficulty_col]).map_batches(
        _const, batch_format="pyarrow"
    )
    ranked = rank_per_key(
        narrow, "_k", difficulty_col, tie_col=id_col, rank_col="_r"
    )

    def _banded(b: pa.Table) -> pa.Table:
        r = b.column("_r").to_numpy(zero_copy_only=False).astype(np.int64)
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        band = r * bands // n
        h = (sm64_key(ids, CURRICULUM_SALT) >> np.uint64(1)).astype(np.int64)
        packed = band * (np.int64(1) << np.int64(61)) + h // 8
        return pa.table(
            {
                id_col: pa.array(ids),
                "band": pa.array(band, pa.int64()),
                "_pk": pa.array(packed, pa.int64()),
                "_k": pa.array(np.zeros(len(r), np.int64)),
            }
        )

    banded = ranked.map_batches(_banded, batch_format="pyarrow")
    pos = rank_per_key(banded, "_k", "_pk", tie_col=id_col, rank_col="pos")
    return pos.select_columns([id_col, "band", "pos"])
