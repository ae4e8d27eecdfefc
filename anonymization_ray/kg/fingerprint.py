"""Page fingerprinting + exact-dedup pre-filter.

Web-scale KG construction dedupes the crawl before extraction (a large
fraction of Common-Crawl is exact or near duplicates). This stage computes,
per page, inside one vectorized ``map_batches``:

- ``content_hash``: 64-bit siphash of the page text (exact-dup key)
- ``page_minhash``: 64-perm MinHash signature over word-3 shingles (near-dup
  signal, carried for downstream LSH)
- ``page_simhash``: 64-bit SimHash

Exact dedup then shuffles ONLY the narrow (content_hash, url) projection,
keeps min(url) per hash, and inner-joins the winners back — page payloads
never ride the dedup shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..extras.dedup import _perm_params
from ..util import hash_join


def page_content_hashes(pages: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """(url, content_hash) only — the exact-dedup decision needs nothing
    else. The near-dup signatures (64-perm minhash + simhash) dominate the
    fingerprint kernel's cost, so pipelines that do not materialize the
    fingerprint index artifact must not pay for them."""

    def _ch(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ch = pd.util.hash_array(np.array(texts, dtype=object)).astype(np.int64)
        return pa.table(
            {
                "url": batch.column("url").combine_chunks(),
                "content_hash": pa.array(ch, pa.int64()),
            }
        )

    return pages.map_batches(_ch, batch_format="pyarrow")


def page_fingerprints(pages: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Narrow fingerprint index: (url, content_hash, page_minhash,
    page_simhash) — one row per page. Written alongside the graph as the
    dedup index and reused for the exact-dedup decision."""
    a, b = _perm_params(64)

    def _fp(batch: pa.Table) -> pa.Table:
        from ..extras.dedup import minhash_from_flat, shingle_hash_batch

        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        ch = pd.util.hash_array(np.array(texts, dtype=object)).astype(np.int64)
        if n:
            # one flat shingle-hash pass + segment reductions — no per-page
            # Python in the crawl's dominant stage
            h, offsets = shingle_hash_batch(texts)
            sigs = minhash_from_flat(h, offsets, a, b)
            hu = h.view(np.uint64)
            bits = ((hu[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int8
            )
            votes = np.add.reduceat(2 * bits.astype(np.int16) - 1, offsets[:-1], axis=0)
            simh = np.left_shift(
                (votes > 0).astype(np.uint64), np.arange(64, dtype=np.uint64)[None, :]
            ).sum(axis=1, dtype=np.uint64)
        else:
            sigs = np.empty((0, 64), dtype=np.int64)
            simh = np.empty(0, dtype=np.uint64)
        return pa.table(
            {
                "url": batch.column("url").combine_chunks(),
                "content_hash": pa.array(ch, pa.int64()),
                "page_minhash": pa.array(list(sigs), pa.list_(pa.int64())),
                "page_simhash": pa.array(simh.view(np.int64), pa.int64()),
            }
        )

    return pages.map_batches(_fp, batch_format="pyarrow")


def dedup_pages_exact(
    pages: rd.Dataset,
    fingerprints: rd.Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_limit: int = 2_000_000,
    strategy: str = "fullsort",
) -> rd.Dataset:
    """Drop non-min(url) pages per content_hash, deciding from the (already
    computed) narrow fingerprint index — page payloads never ride the dedup
    shuffle.

    Two strategies (MEASURED on the 13.4M-page replicated crawl at 16 CPUs,
    BASELINE.md round-4 A/B — pick by what you know about the corpus):

    - ``"fullsort"`` (default): ONE range sort of the (hash, url) index +
      per-block adjacent-equal loser scan + one page filter. 17.8 s on the
      bench corpus. The single pass wins whenever duplicates exist at all,
      because every alternative must touch the urls somehow.
    - ``"duplight"``: sort ONLY the 8-byte hash column (~8x fewer shuffle
      bytes), detect duplicated hashes by adjacent-equal scan, and resolve
      winners on the gathered dup slice. A truly duplicate-FREE corpus pays
      just the integer sort and skips the page filter entirely — but ANY
      duplicates force a second (hash, url) scan of the fingerprint index,
      which measured SLOWER overall (29.2 s) on the bench corpus's 21.5k
      dup hashes. Choose it only when dedup has already run upstream (e.g.
      re-processing a cleaned corpus) and this pass is a safety net; it
      falls back to fullsort past ``broadcast_limit``.
    """
    if strategy == "fullsort":
        return _dedup_pages_exact_fullsort(
            pages,
            fingerprints,
            num_partitions=num_partitions,
            broadcast_limit=broadcast_limit,
        )
    if strategy != "duplight":
        raise ValueError(f"unknown dedup strategy {strategy!r}")
    import numpy as np
    import ray

    s = (
        fingerprints.select_columns(["content_hash"])
        .sort(["content_hash"])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _edge_hash(t: pa.Table):
        if t.num_rows == 0:
            return None
        c = t.column("content_hash")
        return c[0].as_py(), c[-1].as_py()

    bounds = ray.get([_edge_hash.remote(r) for r in refs])
    refs = [r for r, b in zip(refs, bounds) if b is not None]
    bounds = [b for b in bounds if b is not None]

    # per-block cap keeps the driver gather <= broadcast_limit + n_blocks
    # entries even on an adversarial all-duplicate corpus (a block over its
    # cap forces the fullsort fallback without shipping its array)
    per_block_cap = broadcast_limit // max(1, len(refs)) + 1

    @ray.remote(num_cpus=0.5)
    def _dups(t: pa.Table, prev_last, cap: int):
        """Distinct duplicated hashes in this block (plus boundary run):
        values equal to their predecessor — the predecessor of row 0 is the
        previous block's last value."""
        h = t.column("content_hash").to_numpy(zero_copy_only=False)
        n = len(h)
        eq = np.empty(n, dtype=bool)
        eq[0] = prev_last is not None and h[0] == prev_last
        eq[1:] = h[1:] == h[:-1]
        d = np.unique(h[eq])
        # dup-ROW upper bound (run members + one head each): bounds the
        # later driver gather of the dup slice
        rows_bound = int(eq.sum()) * 2
        return len(d), rows_bound, (d if len(d) <= cap else None)

    folds = ray.get(
        [
            _dups.remote(refs[i], bounds[i - 1][1] if i > 0 else None, per_block_cap)
            for i in range(len(refs))
        ]
    )
    n_dup_hashes = sum(nd for nd, _, _ in folds)  # upper bound (boundary overlap)
    n_dup_rows = sum(rb for _, rb, _ in folds)
    if n_dup_hashes == 0:
        return pages
    # both the dup-hash broadcast AND the driver-gathered dup slice must be
    # bounded — a single mega-duplicated hash can blow the row bound even
    # when the hash count is tiny
    if (
        n_dup_hashes <= broadcast_limit
        and n_dup_rows <= broadcast_limit
        and all(d is not None for _, _, d in folds)
    ):
        dup_np = np.unique(np.concatenate([d for _, _, d in folds if len(d)]))
        dup_hashes = pa.array(dup_np, pa.int64())
        dup_ref = ray.put(dup_hashes)

        def _dup_slice(batch: pa.Table) -> pa.Table:
            m = pc.is_in(batch.column("content_hash"), value_set=ray.get(dup_ref))
            return batch.filter(m)

        # ONE corpus scan pulls just the duplicated (hash, url) rows to the
        # driver (bounded by n_dup_rows <= broadcast_limit); winners/losers
        # resolve with a driver-side lexsort — no distributed min_per_key,
        # no second corpus pass
        dup_fp = pa.concat_tables(
            [
                t
                for t in ray.get(
                    fingerprints.select_columns(["content_hash", "url"])
                    .map_batches(_dup_slice, batch_format="pyarrow")
                    .to_arrow_refs()
                )
                if t.num_rows
            ]
        )
        h = dup_fp.column("content_hash").to_numpy(zero_copy_only=False)
        u = np.asarray(dup_fp.column("url").to_pylist(), dtype=object)
        order = np.lexsort((u, h))
        hs = h[order]
        first = np.empty(len(hs), dtype=bool)
        first[0] = True
        first[1:] = hs[1:] != hs[:-1]
        loser_urls = pa.array(u[order][~first], pa.string())
        loser_ref = ray.put(loser_urls)

        def _drop_losers(batch: pa.Table) -> pa.Table:
            mask = pc.invert(
                pc.is_in(batch.column("url"), value_set=ray.get(loser_ref))
            )
            return batch.filter(mask)

        return pages.map_batches(_drop_losers, batch_format="pyarrow")

    return _dedup_pages_exact_fullsort(
        pages,
        fingerprints,
        num_partitions=num_partitions,
        broadcast_limit=broadcast_limit,
    )


def _dedup_pages_exact_fullsort(
    pages: rd.Dataset,
    fingerprints: rd.Dataset,
    *,
    num_partitions: int | None = None,
    broadcast_limit: int = 2_000_000,
) -> rd.Dataset:
    """The default single-pass shape: sort the narrow (hash, url) index,
    mark every row whose hash equals its predecessor as a loser (per-block
    vectorized scan, single-row boundary lookups), then broadcast-or-join
    the loser urls."""
    # Loser detection WITHOUT a many-group aggregate (Ray's groupby pays a
    # per-group cost — ruinous when nearly every page is its own group):
    # sort the narrow (hash, url) index, then a vectorized per-block scan
    # marks every row whose hash equals its predecessor (block boundaries
    # handled via single-row lookups on the ordered blocks).
    import ray

    from ..util import sorted_column

    sc = sorted_column(
        fingerprints.select_columns(["content_hash", "url"]),
        "content_hash",
        "url",
        lambda a: a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a,
    )
    if sc.total == 0:
        return pages

    @ray.remote(num_cpus=0.5)
    def _block_losers(tbl: pa.Table, prev_hash) -> pa.Table:
        h = tbl.column("content_hash").to_numpy(zero_copy_only=False)
        dup = np.empty(len(h), dtype=bool)
        dup[0] = prev_hash is not None and h[0] == prev_hash
        dup[1:] = h[1:] == h[:-1]
        return pa.table({"url": tbl.column("url").filter(pa.array(dup))})

    # previous-block boundary hashes (one tiny lookup per block)
    boundary = {}
    if len(sc.refs) > 1:
        t = sc.rows_at_ranks([int(sc.offsets[b]) - 1 for b in range(1, len(sc.refs))])
        hs = t.column("content_hash").to_pylist()
        for b in range(1, len(sc.refs)):
            boundary[b] = hs[b - 1]
    loser_refs = [
        _block_losers.remote(sc.refs[b], boundary.get(b)) for b in range(len(sc.refs))
    ]
    loser_tables = [t for t in ray.get(loser_refs) if t.num_rows]
    loser_count = sum(t.num_rows for t in loser_tables)
    if loser_count == 0:
        return pages

    if loser_count <= broadcast_limit:
        loser_arr = pa.concat_tables(loser_tables).column("url").combine_chunks()

        def _filter_pages(batch: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(batch.column("url"), value_set=loser_arr))
            return batch.filter(mask)

        return pages.map_batches(_filter_pages, batch_format="pyarrow")

    # loser set too big to broadcast: anti-join pages against the loser urls
    losers_ds = rd.from_arrow_refs(loser_refs)
    tagged = losers_ds.map_batches(
        lambda b: b.append_column("_loser", pa.array([True] * b.num_rows, pa.bool_())),
        batch_format="pyarrow",
    )
    joined = hash_join(pages, tagged, on="url", join_type="left_outer",
                       num_partitions=num_partitions)
    return joined.map_batches(
        lambda b: b.filter(pc.is_null(b.column("_loser"))).drop_columns(["_loser"]),
        batch_format="pyarrow",
    )
