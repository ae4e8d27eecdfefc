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
) -> rd.Dataset:
    """Drop non-min(url) pages per content_hash, deciding from the (already
    computed) narrow fingerprint index — page payloads never ride the dedup
    shuffle.

    Two regimes, chosen by the DUPLICATE-hash count:

    - **dup-light fast path** (the realistic crawl: most pages unique): the
      only corpus-sized exchange is ``exact_value_counts`` over the int64
      content_hash column — 16 B/row with per-block combining — instead of
      sorting the (hash, url-STRING) pairs (~4-5x the bytes). The hashes
      with count > 1 broadcast (bounded by the dup population), the
      min-url winners are computed on THAT SLICE only, and the loser urls
      (slice minus winners) apply as a vectorized page filter. A corpus
      with zero duplicates pays one integer count pass and nothing else.
    - **dup-heavy fallback**: when the dup-hash set exceeds
      ``broadcast_limit``, the original full (hash, url) sort + per-block
      loser scan runs (its cost is then proportional to real work).
    """
    import ray

    from ..extras.stats import exact_value_counts

    import numpy as np

    counts = exact_value_counts(
        fingerprints.select_columns(["content_hash"]), "content_hash"
    )
    dup_tbls = [
        t
        for t in ray.get(
            counts.map_batches(
                lambda b: b.filter(pc.greater(b.column("n"), 1)),
                batch_format="pyarrow",
            ).to_arrow_refs()
        )
        if t.num_rows
    ]
    n_dup_hashes = sum(t.num_rows for t in dup_tbls)
    if n_dup_hashes == 0:
        return pages
    n_dup_rows = sum(
        int(pc.sum(t.column("n")).as_py() or 0) for t in dup_tbls
    )
    # both the dup-hash broadcast AND the driver-gathered dup slice must be
    # bounded — a single mega-duplicated hash can blow the row bound even
    # when the hash count is tiny
    if n_dup_hashes <= broadcast_limit and n_dup_rows <= broadcast_limit:
        dup_hashes = (
            pa.concat_tables(dup_tbls).column("content_hash").combine_chunks()
        )
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
    """Dup-heavy regime: sort the narrow (hash, url) index, mark every row
    whose hash equals its predecessor as a loser (per-block vectorized scan,
    single-row boundary lookups), then broadcast-or-join the loser urls."""
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
