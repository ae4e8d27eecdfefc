"""Semi / anti join — the filter-join shapes a 100-TB pipeline uses to
subset one table by membership in another (e.g. keep only documents whose
url survived dedup; drop customers that appear in an opt-out list).

Two execution paths, chosen by the small-side size:

- **broadcast** (default when the right side is small): the DISTINCT right
  keys are reduced per-block (``pc.unique`` partials, so only the distinct
  stream — not the raw rows — ever reaches the driver), ``ray.put`` ONCE,
  and every left batch filters with one vectorized ``pc.is_in``. No shuffle
  of the big side at all — the left stream never moves.
- **shuffle**: Ray Data's native hash-partitioned ``left_semi`` /
  ``left_anti`` join for when both sides are large.

The broadcast path is the one that matters at scale: an anti join against a
dimension-sized exclusion list must not pay an all-to-all exchange of the
fact table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# above this many DISTINCT right keys the broadcast array stops being
# "dimension-scale" (100M int64 keys ~ 800MB per node) — callers with a
# bigger small side should take the shuffle path
BROADCAST_KEY_CAP = 100_000_000


def semi_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    broadcast: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Rows of ``left`` whose ``on`` value does (semi) / does not (anti)
    appear in ``right[right_on]``. Left schema is preserved either way;
    each left row appears at most once (membership, not multiplication)."""
    right_on = right_on or on
    if broadcast:
        # distinct-reduce BEFORE gathering: per-block unique partials make
        # the driver-side take_all proportional to key cardinality, not row
        # count; nulls never match (SQL IN semantics)
        partials = right.map_batches(
            lambda b: pa.table({right_on: pc.unique(pc.drop_null(b.column(right_on)))}),
            batch_format="pyarrow",
        )
        blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
        if not blocks:
            # empty right side: anti keeps everything, semi keeps nothing
            # (avoids type fishing on a possibly schema-less empty dataset)
            return left if anti else left.limit(0)
        keys = pc.unique(pa.concat_tables(blocks).column(right_on).combine_chunks())
        if len(keys) > BROADCAST_KEY_CAP:
            raise ValueError(
                f"{len(keys)} distinct keys exceeds the broadcast cap "
                f"({BROADCAST_KEY_CAP}); use broadcast=False"
            )
        key_ref = ray.put(keys)

        def _filter(batch: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)
            m = pc.is_in(batch.column(on), value_set=ks)
            m = pc.fill_null(m, False)
            if anti:
                m = pc.invert(m)
            return batch.filter(m)

        return left.map_batches(_filter, batch_format="pyarrow")

    from ..util import default_num_partitions

    if num_partitions is None:
        n_r = right.count()
        num_partitions = max(2, min(default_num_partitions() // 2, n_r // 2000 + 1))
    return left.join(
        right.select_columns([right_on]),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )


def skew_join(
    big: rd.Dataset,
    small: rd.Dataset,
    *,
    on: str,
    payload_cols: list[str],
    hot_threshold: int = 100_000,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Skew-resistant inner join of a fact stream against a keyed dimension:
    ``big``'s HOT keys (per-key row count >= hot_threshold) are served by a
    broadcast map-side lookup — those rows NEVER shuffle — while the cold
    remainder takes the ordinary hash join. This is the salting alternative
    for the hot-key problem: a hash shuffle routes every row of a hot key to
    ONE aggregator (the straggler that kills a 256-node join); pulling hot
    keys out of the exchange entirely removes the skew instead of spreading
    it.

    Scale shape: per-key counts come from ``exact_value_counts`` (partial
    combiner + sort-scan reduce, no Ray groupby); the hot set is bounded BY
    CONSTRUCTION at N/hot_threshold keys, so the driver gather and the
    broadcast payload stay dimension-scale no matter how skewed the input.
    The cold hash join moves only rows whose keys are provably spread.
    Inner-join semantics both paths; output columns = big's + payload_cols.
    """
    import numpy as np

    from ..util import hash_join
    from .stats import exact_value_counts

    counts = exact_value_counts(big, on).materialize()
    n_distinct = counts.count()
    hot_tbl = (
        counts.filter(lambda r, t=hot_threshold: r["n"] >= t)
        .select_columns([on])
        .take_all()
    )
    hot_keys = np.sort(np.array([r[on] for r in hot_tbl], dtype=np.int64))

    if len(hot_keys) == 0:
        return hash_join(
            big, small.select_columns([on, *payload_cols]), on=on,
            join_type="inner", num_partitions=num_partitions,
        )

    # dimension rows for the hot keys, gathered bounded and broadcast ONCE
    hot_small = semi_anti_join(
        small.select_columns([on, *payload_cols]),
        rd.from_arrow(pa.table({on: pa.array(hot_keys, pa.int64())})),
        on=on,
    ).take_all()
    hk = np.array([r[on] for r in hot_small], dtype=np.int64)
    order = np.argsort(hk, kind="stable")
    hk = hk[order]
    small_schema = small.schema().base_schema
    payload = {
        c: pa.array(
            [hot_small[int(i)][c] for i in order],
            small_schema.field(c).type,
        )
        for c in payload_cols
    }
    state = ray.put((hk, payload))
    hot_set = ray.put(pa.array(hot_keys, pa.int64()))

    def _hot_lookup(batch: pa.Table) -> pa.Table:
        keys_sorted, pl = ray.get(state)
        k = batch.column(on).to_numpy(zero_copy_only=False)
        if len(keys_sorted) == 0:
            # hot keys with NO dimension row: inner join drops them all
            idx_c = np.zeros(len(k), dtype=np.int64)
            hit = np.zeros(len(k), dtype=bool)
        else:
            idx = np.searchsorted(keys_sorted, k)
            idx_c = np.minimum(idx, len(keys_sorted) - 1)
            hit = keys_sorted[idx_c] == k
        out = batch.filter(pa.array(hit))
        take = pa.array(idx_c[hit], pa.int64())
        for c in payload_cols:
            out = out.append_column(c, pl[c].take(take))
        return out

    def _split(batch: pa.Table, want_hot: bool) -> pa.Table:
        m = pc.fill_null(pc.is_in(batch.column(on), value_set=ray.get(hot_set)), False)
        return batch.filter(m if want_hot else pc.invert(m))

    hot_rows = big.map_batches(
        lambda b: _hot_lookup(_split(b, True)), batch_format="pyarrow"
    )
    if len(hot_keys) == n_distinct:
        # every key is hot: the cold side would be schema-losing empty
        # blocks (see hash_join docstring) — the broadcast path covered it
        return hot_rows
    cold = big.map_batches(lambda b: _split(b, False), batch_format="pyarrow")
    cold_small = semi_anti_join(
        small.select_columns([on, *payload_cols]),
        rd.from_arrow(pa.table({on: pa.array(hot_keys, pa.int64())})),
        on=on,
        anti=True,
    )
    cold_rows = hash_join(
        cold, cold_small, on=on, join_type="inner", num_partitions=num_partitions
    )
    # union needs identical schemas; the join may reorder columns
    out_cols = [c for c in big.schema().base_schema.names] + payload_cols

    def _order(b: pa.Table) -> pa.Table:
        return b.select(out_cols)

    return hot_rows.map_batches(_order, batch_format="pyarrow").union(
        cold_rows.map_batches(_order, batch_format="pyarrow")
    )


def fuzzy_blocked_pairs(
    ds: rd.Dataset,
    block_col: str,
    id_col: str,
    text_col: str,
    *,
    max_dist: int = 1,
    max_block: int = 50_000,
) -> rd.Dataset:
    """Blocked fuzzy record linkage: all (id_a < id_b) pairs WITHIN a block
    whose ``text_col`` values are within Levenshtein distance ``max_dist``
    — the entity-resolution primitive (same-nation customers whose names
    differ by a typo, near-identical product titles, etc.).

    Partitioning assumption (documented per the custom-operator contract):
    candidate generation is all-pairs INSIDE a block, so the block column
    must bound block size (here: a categorical like nation/segment). Blocks
    beyond ``max_block`` rows raise rather than silently going quadratic —
    pick a finer blocking key instead.

    The Levenshtein DP is vectorized ACROSS pairs: the two O(len) loops run
    over character positions (bounded by string length, ~tens), while every
    numpy op inside spans all of the block's candidate pairs at once — no
    per-pair Python. Group count is domain-bounded, so ``groupby`` +
    ``map_groups`` is the right co-location tool here (unlike the
    high-cardinality reductions, which use sort+boundary scans)."""
    import numpy as np

    def _levenshtein_pairs(a_pad: np.ndarray, b_pad: np.ndarray,
                           la: np.ndarray, lb: np.ndarray) -> np.ndarray:
        """Edit distances for P (a, b) pairs given (P, L) uint32 codepoint
        matrices and true lengths. DP rows vectorized across pairs."""
        p, l_a = a_pad.shape
        l_b = b_pad.shape[1]
        res = np.zeros(p, dtype=np.int64)
        res[la == 0] = lb[la == 0]
        prev = np.broadcast_to(np.arange(l_b + 1, dtype=np.int64), (p, l_b + 1)).copy()
        for i in range(1, l_a + 1):
            cur = np.empty_like(prev)
            cur[:, 0] = i
            ai = a_pad[:, i - 1][:, None]  # (P, 1)
            sub = prev[:, :-1] + (b_pad != ai)
            # cur[:, j] needs cur[:, j-1]: the j loop is inherent to the
            # recurrence but bounded by string length, not pair count
            for j in range(1, l_b + 1):
                cur[:, j] = np.minimum(
                    np.minimum(prev[:, j] + 1, cur[:, j - 1] + 1), sub[:, j - 1]
                )
            done = la == i
            if done.any():
                res[done] = cur[done, lb[done]]
            prev = cur
        return res

    def _block_pairs(g: pa.Table) -> pa.Table:
        n = g.num_rows
        empty = pa.table(
            {
                "id_a": pa.array([], pa.int64()),
                "id_b": pa.array([], pa.int64()),
                "dist": pa.array([], pa.int64()),
            }
        )
        if n < 2:
            return empty
        if n > max_block:
            raise ValueError(
                f"fuzzy block of {n} rows exceeds max_block={max_block}; "
                f"use a finer blocking key than {block_col!r}"
            )
        ids = g.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = g.column(text_col).to_pylist()
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        lmax = int(lens.max())
        pad = np.zeros((n, lmax), dtype=np.uint32)
        for i, t in enumerate(texts):  # one pass over block ROWS, not pairs
            pad[i, : lens[i]] = np.frombuffer(
                t.encode("utf-32-le"), dtype=np.uint32
            )
        ia, ib = np.triu_indices(n, k=1)
        # length prefilter: |la - lb| > max_dist can never match
        keep = np.abs(lens[ia] - lens[ib]) <= max_dist
        ia, ib = ia[keep], ib[keep]
        if len(ia) == 0:
            return empty
        d = _levenshtein_pairs(pad[ia], pad[ib], lens[ia], lens[ib])
        hit = d <= max_dist
        a, b = ids[ia[hit]], ids[ib[hit]]
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "dist": pa.array(d[hit], pa.int64()),
            }
        )

    return (
        ds.select_columns([block_col, id_col, text_col])
        .groupby(block_col)
        .map_groups(_block_pairs, batch_format="pyarrow")
    )


def grouped_pair_counts(
    ds: rd.Dataset,
    group_col: str,
    item_col: str,
    *,
    min_support: int = 2,
    max_group: int = 10_000,
) -> rd.Dataset:
    """Market-basket pair counts: for every unordered item pair appearing
    together in >= ``min_support`` groups, the co-occurrence count —
    the frequent-itemset / recommendation primitive.

    Shape (contrast with the hash-self-join co-occurrence in
    ``queries_kg.q_kg_entity_cooccurrence``): distinct (group, item) rows
    sort by (group, item); pair expansion is a per-block vectorized
    triangle over each group's contiguous run, with the <= 2 boundary
    groups per block deferred to a single driver-folded task — no join, no
    duplicate pair stream. Groups larger than ``max_group`` raise (the
    quadratic guard; basket sizes are domain-bounded). Pair counts reduce
    via ``sum_per_key`` on a packed int64 key."""
    import numpy as np

    from ..extras.graph import sum_per_key
    from ..util import coalesce_blocks, distinct_rows

    d = distinct_rows(
        ds.select_columns([group_col, item_col]), [group_col, item_col]
    ).materialize()
    s = coalesce_blocks(d).sort([group_col, item_col]).materialize()
    refs = list(s.to_arrow_refs())

    def _expand(g: np.ndarray, it: np.ndarray) -> np.ndarray:
        """Packed pair keys for every within-group (a < b) pair; input
        sorted by (group, item)."""
        n = len(g)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new)[0]
        sizes = np.diff(np.append(starts, n))
        if sizes.max(initial=0) > max_group:
            raise ValueError(
                f"group of {sizes.max()} items exceeds max_group={max_group}"
            )
        if it.max(initial=0) >= (1 << 31) or it.min(initial=0) < 0:
            raise ValueError("item ids must fit uint31 for pair packing")
        outs = []
        for sz in np.unique(sizes):
            if sz < 2:
                continue
            gs = starts[sizes == sz]
            block = it[gs[:, None] + np.arange(sz)[None, :]]  # (G, sz)
            ia, ib = np.triu_indices(int(sz), k=1)
            a = block[:, ia].ravel()
            b = block[:, ib].ravel()
            outs.append(a * (1 << 31) + b)  # sorted run => a < b
        return np.concatenate(outs) if outs else np.empty(0, dtype=np.int64)

    import ray

    @ray.remote(num_cpus=0.5, num_returns=2)
    def _block_pairs(t: pa.Table):
        """Returns (interior-pair key table — STAYS in the object store,
        never driver-gathered — and the small boundary-group rows)."""
        g = t.column(group_col).to_numpy(zero_copy_only=False)
        it = t.column(item_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(g) == 0:
            return (
                pa.table(
                    {
                        "k": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                ),
                np.empty((0, 2), np.int64),
            )
        head, tail = g[0], g[-1]
        edge = (g == head) | (g == tail)
        keys = _expand(g[~edge], it[~edge])
        return (
            pa.table(
                {
                    "k": pa.array(keys, pa.int64()),
                    "c": pa.array(np.ones(len(keys), np.int64)),
                }
            ),
            np.stack([g[edge], it[edge]], axis=1),
        )

    pair_refs, edge_refs = [], []
    for r in refs:
        pr, er = _block_pairs.remote(r)
        pair_refs.append(pr)
        edge_refs.append(er)
    edge_rows = [e for e in ray.get(edge_refs) if len(e)]
    if edge_rows:
        e = np.concatenate(edge_rows)
        order = np.lexsort((e[:, 1], e[:, 0]))
        keys = _expand(e[order, 0], e[order, 1])
        if len(keys):
            pair_refs.append(
                ray.put(
                    pa.table(
                        {
                            "k": pa.array(keys, pa.int64()),
                            "c": pa.array(np.ones(len(keys), np.int64)),
                        }
                    )
                )
            )
    if not pair_refs:
        return rd.from_arrow(
            pa.table(
                {
                    "item_a": pa.array([], pa.int64()),
                    "item_b": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                }
            )
        )
    counts = sum_per_key(rd.from_arrow_refs(pair_refs), "k", "c")

    def _unpack(b: pa.Table) -> pa.Table:
        t = b.filter(pc.greater_equal(b.column("c"), min_support))
        kk = t.column("k").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "item_a": pa.array(kk >> 31, pa.int64()),
                "item_b": pa.array(kk & ((1 << 31) - 1), pa.int64()),
                "n": t.column("c").combine_chunks(),
            }
        )

    return counts.map_batches(_unpack, batch_format="pyarrow")


def build_bloom(
    ds: rd.Dataset, col: str, *, m_bits: int = 1 << 20, k: int = 4, salt: int = 0
):
    """Bloom filter over an int key column -> packed uint8 bit array
    (m_bits/8 bytes). Per-batch partial bit arrays (vectorized SplitMix64
    probes, np.bitwise_or fan-in) — only #batches × m_bits/8 bytes ever
    reach the driver, never the keys themselves. That is the point: at
    100 TB the build side's DISTINCT keys can be 100× the broadcast cap
    while 1–16 MB of bloom bits still ship to every probe task."""
    import numpy as np

    from .shuffle import sm64_key

    nbytes = m_bits // 8

    def _partial(b: pa.Table) -> pa.Table:
        bits = np.zeros(nbytes, np.uint8)
        v = pc.drop_null(b.column(col)).to_numpy(zero_copy_only=False)
        if len(v):
            for j in range(k):
                h = (sm64_key(v, salt * 31 + j) % np.uint64(m_bits)).astype(np.int64)
                np.bitwise_or.at(bits, h >> 3, np.uint8(1) << (h & 7).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    partials = ds.map_batches(_partial, batch_format="pyarrow").take_all()
    out = np.zeros(nbytes, np.uint8)
    for row in partials:
        out |= np.frombuffer(row["bits"], np.uint8)
    return out


def bloom_semi_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    m_bits: int = 1 << 20,
    k: int = 4,
    salt: int = 0,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """EXACT semi join through a bloom prefilter — the middle path between
    `semi_anti_join`'s two extremes: when the build side's distinct keys
    blow the broadcast cap but shuffling the full probe stream is the
    bottleneck, broadcast m_bits of bloom instead, drop the (1-ε) of probe
    rows that cannot match WITHOUT any shuffle, and run the exact
    hash-partitioned semi join only on the surviving sliver. False
    positives are removed by the confirm join; false negatives don't exist
    — so the result is exactly `left SEMI JOIN right`."""
    import numpy as np

    from .shuffle import sm64_key

    right_on = right_on or on
    bits = build_bloom(right.select_columns([right_on]), right_on, m_bits=m_bits, k=k, salt=salt)
    ref = ray.put(bits)

    def _probe(b: pa.Table) -> pa.Table:
        arr = ray.get(ref)
        v = b.column(on).to_numpy(zero_copy_only=False)
        m = np.ones(len(v), bool)
        for j in range(k):
            h = (sm64_key(v, salt * 31 + j) % np.uint64(m_bits)).astype(np.int64)
            m &= (arr[h >> 3] & (np.uint8(1) << (h & 7).astype(np.uint8))) != 0
        return b.filter(pa.array(m))

    candidates = left.map_batches(_probe, batch_format="pyarrow")
    return semi_anti_join(
        candidates, right, on=on, right_on=right_on,
        broadcast=False, num_partitions=num_partitions,
    )


def band_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_val: str,
    right_val: str,
    band: int,
    left_keep: list[str],
    right_keep: list[str],
) -> rd.Dataset:
    """Numeric band join: all (l, r) pairs with |l.val − r.val| <= band
    (integer units — scale floats to cents first). The classic bucketed
    plan: values bucket into band-width cells, each LEFT row replicates
    into its cell and both neighbors (3x bounded blowup, never a cross
    join), one cell-keyed hash join, then the exact predicate filters.
    Any candidate pair's values differ by < 2·band, so cells b−1..b+1
    cover every match exactly once (pairs are emitted once because the
    RIGHT side is bucketed once)."""
    import numpy as np

    from ..util import hash_join

    def _r(b: pa.Table) -> pa.Table:
        v = b.column(right_val).to_numpy(zero_copy_only=False).astype(np.int64)
        t = pa.table({"cell": pa.array(v // band), "_rv": pa.array(v)})
        for c in right_keep:
            t = t.append_column(c, b.column(c))
        return t

    def _l(b: pa.Table) -> pa.Table:
        v = b.column(left_val).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = v // band
        reps = np.concatenate([cell - 1, cell, cell + 1])
        idx = np.tile(np.arange(len(v), dtype=np.int64), 3)
        t = pa.table(
            {
                "cell": pa.array(reps),
                "_lv": pa.array(np.tile(v, 3)),
            }
        )
        take = pa.array(idx)
        for c in left_keep:
            t = t.append_column(c, b.column(c).take(take))
        return t

    rb = right.map_batches(_r, batch_format="pyarrow").materialize()
    lb = left.map_batches(_l, batch_format="pyarrow").materialize()
    j = hash_join(lb, rb, on="cell", join_type="inner")

    def _exact(b: pa.Table) -> pa.Table:
        lv = b.column("_lv").to_numpy(zero_copy_only=False).astype(np.int64)
        rv = b.column("_rv").to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.abs(lv - rv) <= band
        t = b.filter(pa.array(keep)).drop_columns(["cell"])
        names = [
            f"{left_val}_i" if c == "_lv" else f"{right_val}_i" if c == "_rv" else c
            for c in t.column_names
        ]
        return t.rename_columns(names)

    return j.map_batches(_exact, batch_format="pyarrow")
