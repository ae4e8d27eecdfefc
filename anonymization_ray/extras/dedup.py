"""Deduplication family for training-data pipelines.

All operators follow the same scale shape: per-batch vectorized signature
computation (``map_batches``), then one hash shuffle on the signature /
band bucket (vectorized self-join for pair generation — never a per-bucket
Python UDF). Nothing materializes the corpus on the driver.

- exact: content hash -> keep min doc_id per group
- MinHash + LSH: char-shingles -> 64-perm minhash -> banded buckets ->
  in-bucket candidate pairs (optionally jaccard-verified)
- SimHash: 64-bit token-weight simhash -> 4-band exact-match blocking ->
  hamming-verified pairs
- n-gram jaccard: exact similarity for candidate pairs
- embedding near-dup: cosine >= threshold pairs via normalized blocked matmul
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# fixed seeded permutation parameters (deterministic across runs/processes)
_MERSENNE = (1 << 61) - 1
_N_PERM = 64


def _perm_params(num_perm: int = _N_PERM, seed: int = 42) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.Generator(np.random.Philox(key=seed))
    a = rng.integers(1, _MERSENNE, size=num_perm, dtype=np.int64)
    b = rng.integers(0, _MERSENNE, size=num_perm, dtype=np.int64)
    return a, b


def _shingle_hashes(text: str, k: int = 3) -> np.ndarray:
    """Word k-shingles (char shingles over a small shared vocabulary make
    unrelated documents look similar; word shingles separate cleanly)."""
    words = text.split()
    if len(words) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.int64)
    return np.unique(
        np.fromiter(
            (zlib.crc32(" ".join(words[i : i + k]).encode()) for i in range(len(words) - k + 1)),
            dtype=np.int64,
        )
    )


# odd position multipliers for order-sensitive shingle combination
_SHINGLE_MULT = (
    np.random.Generator(np.random.Philox(key=99)).integers(
        1, 1 << 62, size=8, dtype=np.int64
    )
    | 1
)


def shingle_hash_batch(texts: list, k: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All word-k-shingle 64-bit hashes for a WHOLE batch: flat int64 array
    + per-text offsets (len N+1). Tokens are hashed ONCE with one vectorized
    siphash call; a shingle's hash is the position-weighted combination of
    its k token hashes (order-sensitive, wrapping int64) — no per-shingle
    string allocation, no per-page Python. 8x the per-page crc32 loop this
    replaced; the hot kernel of fingerprinting/minhash at crawl scale.
    Texts shorter than k words contribute one whole-text hash."""
    n = len(texts)
    toks: list[list[str]] = [(t.split() if t else []) for t in texts]
    lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
    short = lens < k
    counts = np.where(short, 1, lens - (k - 1))
    offsets = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    flat = np.empty(int(lens.sum()), dtype=object)
    pos = 0
    for t in toks:
        flat[pos : pos + len(t)] = t
        pos += len(t)
    th = pd.util.hash_array(flat).astype(np.int64) if flat.size else np.empty(0, np.int64)
    starts = np.cumsum(lens) - lens
    long_idx = np.nonzero(~short)[0]
    out = np.empty(int(offsets[-1]), dtype=np.int64)
    if long_idx.size:
        cnt = counts[long_idx]
        ramp = np.arange(int(cnt.sum()), dtype=np.int64) - np.repeat(
            np.cumsum(cnt) - cnt, cnt
        )
        head = np.repeat(starts[long_idx], cnt) + ramp
        sh = th[head] * _SHINGLE_MULT[0]
        for j in range(1, k):
            sh = sh ^ (th[head + j] * _SHINGLE_MULT[j % len(_SHINGLE_MULT)])
        out[np.repeat(offsets[long_idx], cnt) + ramp] = sh
    short_rows = np.nonzero(short)[0]
    if short_rows.size:
        short_txt = np.array([texts[i] or "" for i in short_rows], dtype=object)
        out[offsets[short_rows]] = pd.util.hash_array(short_txt).astype(np.int64)
    return out, offsets


def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keeper ids: min(id) per identical content. The shuffle key is a 64-bit
    content hash (pandas siphash — deterministic), not the text itself, so
    only ~16 B/row moves."""

    def _hash(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(txt.astype(object)).astype(np.int64)
        return pa.table({"content_hash": pa.array(h), id_col: batch.column(id_col).combine_chunks()})

    from ..util import min_per_key

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    # nearly every hash is its own group at crawl scale — a Ray per-group
    # aggregate pays ~8-10s per 500k groups; min_per_key is the sort +
    # boundary-scan shape (same as kg/fingerprint.dedup_pages_exact)
    kept = min_per_key(hashed, "content_hash", id_col)
    return kept.map_batches(
        lambda b: b.select([id_col]), batch_format="pyarrow"
    )


def minhash_signatures(
    ds: rd.Dataset, text_col: str, id_col: str, *, num_perm: int = _N_PERM, shingle_k: int = 3
) -> rd.Dataset:
    """(id, sig: list<int64>[num_perm]) — per-batch vectorized over perms."""
    a, b = _perm_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).combine_chunks()
        if not texts:
            return pa.table({id_col: ids, "sig": pa.array([], pa.list_(pa.int64()))})
        h, offsets = shingle_hash_batch(texts, shingle_k)
        sigs = minhash_from_flat(h, offsets, a, b)
        return pa.table({id_col: ids, "sig": pa.array(list(sigs), pa.list_(pa.int64()))})

    return ds.map_batches(_sig, batch_format="pyarrow")


def minhash_from_flat(
    h: np.ndarray, offsets: np.ndarray, a: np.ndarray, b: np.ndarray, slab: int = 16
) -> np.ndarray:
    """(N, num_perm) minhash signatures from flat shingle hashes via
    segment-min reduceat — no per-document Python. The per-permutation hash
    is multiply-shift (odd multiplier, wrapping int64, compared as uint64):
    one vectorized multiply per permutation instead of a Mersenne mod —
    division dominated the kernel otherwise. Permutations are computed in
    slabs to bound the (perm x shingle) intermediate."""
    num_perm = len(a)
    n = len(offsets) - 1
    ao = (a | 1).astype(np.int64)  # odd multipliers: bijective mod 2^64
    sigs = np.empty((n, num_perm), dtype=np.int64)
    for p0 in range(0, num_perm, slab):
        p1 = min(num_perm, p0 + slab)
        vals = (ao[p0:p1, None] * h[None, :] + b[p0:p1, None]).view(np.uint64)
        sigs[:, p0:p1] = np.minimum.reduceat(vals, offsets[:-1], axis=1).T.view(np.int64)
    return sigs


def banded_stream(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = _N_PERM,
    bands: int = 16,
    shingle_k: int = 3,
) -> rd.Dataset:
    """Materialized (band, bucket, id) LSH rows for ``ds`` — the banding
    stage shared by the one-shot pair generator and the incremental index.

    The text stream stays LAZY: pinning (id, text) in the object store is
    a full-corpus spill at crawl scale. The signature kernel reads it once;
    callers that verify re-read only the candidate-id slice. The banded
    stream is read more than once downstream (both sides of the self-join,
    or index persist + join): holding the NARROW (band, bucket, id) rows —
    ~20·bands B/doc vs KB-scale text — is what keeps the expensive
    signature kernel single-pass."""
    rows_per_band = num_perm // bands
    ds = ds.select_columns([id_col, text_col])
    sigs = minhash_signatures(ds, text_col, id_col, num_perm=num_perm, shingle_k=shingle_k)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sig = np.stack(batch.column("sig").to_numpy(zero_copy_only=False))
        out_band, out_bh, out_id = [], [], []
        for b_i in range(bands):
            band = sig[:, b_i * rows_per_band : (b_i + 1) * rows_per_band]
            bh = pd.util.hash_array(
                np.ascontiguousarray(band).view([("", band.dtype)] * rows_per_band).ravel()
            ).astype(np.int64)
            out_band.append(np.full(len(ids), b_i, dtype=np.int32))
            out_bh.append(bh)
            out_id.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_band), pa.int32()),
                "bucket": pa.array(np.concatenate(out_bh), pa.int64()),
                id_col: pa.array(np.concatenate(out_id)),
            }
        )

    return sigs.map_batches(_bands, batch_format="pyarrow").materialize()


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = _N_PERM,
    bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float | None = 0.5,
    max_bucket: int | None = None,
) -> rd.Dataset:
    """Candidate near-duplicate pairs (a < b) from banded LSH buckets; when
    ``verify_threshold`` is set, pairs are verified with exact n-gram jaccard
    inside the bucket group.

    ``max_bucket`` is the skew valve: a bucket of D near-identical documents
    yields D^2 join rows in ONE partition (exact duplicates share every
    band). Buckets above the cap are dropped from pair generation — run
    ``exact_dedup`` first, which owns exact-duplicate collapse; the cap only
    ever fires on pathological exact-dup clusters, far above any genuine
    near-dup neighborhood. The census costs one extra narrow sort of the
    banded stream, so it is opt-in: enable (e.g. 10_000) on crawls that have
    NOT been exact-deduped first; ``None`` (default) skips it."""
    ds = ds.select_columns([id_col, text_col])
    banded = banded_stream(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )

    if max_bucket is not None:
        # bucket-size census over a folded (band, bucket) key with the
        # no-groupby exact counter; oversized keys broadcast as a filter.
        # The fold is a 64-bit mix (cross-band collisions ~2^-64 — and a
        # collision can only DROP a bucket conservatively, never emit a
        # wrong pair: verification below is exact)
        _GOLD = np.int64(-0x61C8864680B583EB)

        def _fold(b: pa.Table) -> pa.Array:
            band = b.column("band").to_numpy(zero_copy_only=False).astype(np.int64)
            bkt = b.column("bucket").to_numpy(zero_copy_only=False)
            return pa.array(bkt * _GOLD + band, pa.int64())

        from .stats import exact_value_counts

        keyed = banded.map_batches(
            lambda b: pa.table({"_fk": _fold(b)}), batch_format="pyarrow"
        )
        totals = exact_value_counts(keyed, "_fk")
        big = totals.map_batches(
            lambda b: b.filter(pc.greater(b.column("n"), max_bucket)).select(["_fk"]),
            batch_format="pyarrow",
        ).take_all()
        if big:
            bad = pa.array(sorted({r["_fk"] for r in big}), pa.int64())

            def _drop_big(b: pa.Table) -> pa.Table:
                return b.filter(pc.invert(pc.is_in(_fold(b), value_set=bad)))

            banded = banded.map_batches(_drop_big, batch_format="pyarrow")

    # candidate pairs via a self-join on (band, bucket) — a vectorized hash
    # join, NOT a per-bucket Python UDF (bucket count is O(corpus), so
    # per-group calls would dominate wall time)
    from ..util import default_num_partitions, distinct_rows, hash_join

    nparts = max(2, default_num_partitions() // 2)
    left = banded.rename_columns({id_col: "id_a"})
    right = banded.rename_columns({id_col: "id_b"})
    cand = left.join(
        right, join_type="inner", num_partitions=nparts, on=("band", "bucket")
    )

    def _ordered(batch: pa.Table) -> pa.Table:
        m = pc.less(batch.column("id_a"), batch.column("id_b"))
        return batch.filter(m).select(["id_a", "id_b"])

    pairs = cand.map_batches(_ordered, batch_format="pyarrow")
    # pair cardinality is the pipeline's largest intermediate — dedup by
    # sort + boundary scan, never a pair-cardinality Ray groupby
    uniq = distinct_rows(pairs, ["id_a", "id_b"])
    if verify_threshold is None:
        return uniq

    return verify_pairs_exact(
        uniq, ds, text_col=text_col, id_col=id_col, shingle_k=shingle_k,
        threshold=verify_threshold, nparts=nparts,
    )


def verify_pairs_exact(
    uniq: rd.Dataset,
    ds: rd.Dataset,
    *,
    text_col: str,
    id_col: str,
    shingle_k: int = 3,
    threshold: float = 0.5,
    nparts: int | None = None,
) -> rd.Dataset:
    """Exact n-gram-jaccard verification of candidate (id_a, id_b) pairs
    against the text stream ``ds`` — the shared tail of the one-shot LSH
    pair generator and the incremental index append. Returns
    (id_a, id_b, jaccard) rows with jaccard >= ``threshold``."""
    from ..util import default_num_partitions, hash_join

    if nparts is None:
        nparts = max(2, default_num_partitions() // 2)
    # exact jaccard verification: the full text stream never joins — only
    # CANDIDATE ids (small by LSH construction) get their text re-read. The
    # semi join's broadcast path filters the lazy text stream in one
    # vectorized is_in pass (no shuffle of the corpus); the materialized
    # result is bounded by 2x the pair count.
    from .joins import semi_anti_join

    uniq = uniq.materialize()  # reused: id extraction + the pair-attach join

    def _both_ids(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                id_col: pa.concat_arrays(
                    [
                        b.column("id_a").combine_chunks(),
                        b.column("id_b").combine_chunks(),
                    ]
                )
            }
        )

    cand_ids = uniq.map_batches(_both_ids, batch_format="pyarrow")
    cand_texts = semi_anti_join(ds, cand_ids, on=id_col).materialize()
    ta = cand_texts.rename_columns({id_col: "id_a", text_col: "text_a"})
    tb = cand_texts.rename_columns({id_col: "id_b", text_col: "text_b"})
    jparts = max(2, min(nparts, uniq.count() // 2000 + 1))
    joined = hash_join(uniq, ta, on="id_a", join_type="inner", num_partitions=jparts)
    joined = hash_join(joined, tb, on="id_b", join_type="inner", num_partitions=jparts)

    def _verify(batch: pa.Table, thr=threshold, k=shingle_k) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {
                    "id_a": batch.column("id_a").combine_chunks(),
                    "id_b": batch.column("id_b").combine_chunks(),
                    "jaccard": pa.array([], pa.float64()),
                }
            )
        # both sides' shingle hashes in ONE vectorized kernel pass per side;
        # per-pair set sizes and intersections come from TWO whole-batch
        # lexsorts + boundary scans (no per-pair Python): dedup each side's
        # (pair, hash) rows, then count adjacent duplicates of the combined
        # sorted stream — a duplicate across sides IS an intersection hit
        a_txt = batch.column("text_a").to_pylist()
        b_txt = batch.column("text_b").to_pylist()
        ha, oa = shingle_hash_batch(a_txt, k)
        hb, ob = shingle_hash_batch(b_txt, k)

        def _uniq_per_pair(h: np.ndarray, off: np.ndarray):
            idx = np.repeat(np.arange(n), np.diff(off))
            order = np.lexsort((h, idx))
            hs, ix = h[order], idx[order]
            keep = np.ones(len(hs), dtype=bool)
            keep[1:] = (hs[1:] != hs[:-1]) | (ix[1:] != ix[:-1])
            return hs[keep], ix[keep]

        ua, ia = _uniq_per_pair(ha, oa)
        ub, ib = _uniq_per_pair(hb, ob)
        na = np.bincount(ia, minlength=n)
        nb = np.bincount(ib, minlength=n)
        ch = np.concatenate([ua, ub])
        ci = np.concatenate([ia, ib])
        order = np.lexsort((ch, ci))
        hs, ix = ch[order], ci[order]
        dup = (hs[1:] == hs[:-1]) & (ix[1:] == ix[:-1])
        inter = np.bincount(ix[1:][dup], minlength=n)
        u = na + nb - inter
        ja = np.divide(inter, u, out=np.ones(n), where=u > 0)
        out = pa.table(
            {
                "id_a": batch.column("id_a").combine_chunks(),
                "id_b": batch.column("id_b").combine_chunks(),
                "jaccard": pa.array(ja, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("jaccard"), thr))

    return joined.map_batches(_verify, batch_format="pyarrow")


def ngram_jaccard(text_a: str, text_b: str, k: int = 3) -> float:
    sa = set(_shingle_hashes(text_a or "", k).tolist())
    sb = set(_shingle_hashes(text_b or "", k).tolist())
    if not sa and not sb:
        return 1.0
    return len(sa & sb) / len(sa | sb)


def _md5_64(tok: str) -> int:
    """First 8 md5 bytes, little-endian — bit-identical to DuckDB's
    ``md5_number_upper``, which makes the simhash SQL-oracleable."""
    import hashlib

    return int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "little")


def simhash_signatures(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, simhash int64): sign-sum of token md5-64 bit vectors.

    Vectorized per batch: ONE ``pd.factorize`` over the flattened token
    array (hash-based — no object-dtype sort), md5 only the unique
    vocabulary (the md5 choice is what keeps the DuckDB oracle bit-exact),
    then per-document bit votes with no per-document Python. A bit is set
    iff strictly more than half the token occurrences have it
    (votes = 2·Σbits − n_tokens > 0), identical to the sign-sum form.

    Two vote paths, chosen by the dense-count footprint: when
    ``vocab × docs`` fits, a per-(doc, word) ``np.bincount`` matrix times
    the (vocab, 64) bit matrix — one BLAS matmul (counts < 2^53, so the
    float64 product is exact); otherwise (doc, word) occurrence pairs are
    deduped by lexsort + boundary scan and the bit matrix is reduced with
    weighted ``np.add.reduceat`` in 16-bit slabs."""

    _DENSE_CAP = 1 << 24  # vocab x docs cells (~128 MB float64 counts)

    def _sim(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        toks: list[list[str]] = [(t or "").split() for t in texts]
        lens = np.fromiter((len(t) for t in toks), dtype=np.int64, count=n)
        out = np.zeros(n, dtype=np.uint64)
        total = int(lens.sum())
        nz = lens > 0
        if total:
            flat = np.empty(total, dtype=object)
            pos = 0
            for t in toks:
                flat[pos : pos + len(t)] = t
                pos += len(t)
            codes, vocab = pd.factorize(flat)
            vh = np.fromiter(
                (_md5_64(w) for w in vocab), dtype=np.uint64, count=len(vocab)
            )
            doc_idx = np.repeat(np.arange(n), lens)
            V = len(vocab)
            if V * n <= _DENSE_CAP:
                counts = np.bincount(doc_idx * V + codes, minlength=n * V).reshape(
                    n, V
                )
                bits = (
                    (vh[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                    & np.uint64(1)
                ).astype(np.float64)
                seg = counts.astype(np.float64) @ bits
                votes_on = (2 * seg - lens[:, None]) > 0
                packed = (
                    np.packbits(votes_on, axis=1, bitorder="little")
                    .view(np.uint64)
                    .ravel()
                )
                out[:] = np.where(nz, packed, 0)
            else:
                order = np.lexsort((codes, doc_idx))
                ds_, cs_ = doc_idx[order], codes[order]
                newseg = np.ones(total, dtype=bool)
                newseg[1:] = (ds_[1:] != ds_[:-1]) | (cs_[1:] != cs_[:-1])
                ustart = np.nonzero(newseg)[0]
                cnt = np.diff(np.append(ustart, total)).astype(np.int64)
                ud, uc = ds_[ustart], cs_[ustart]
                doc_first = np.ones(len(ud), dtype=bool)
                doc_first[1:] = ud[1:] != ud[:-1]
                idx = np.nonzero(doc_first)[0]
                acc = np.zeros(len(idx), dtype=np.uint64)
                nz_lens = lens[nz][:, None]
                for b0 in range(0, 64, 16):
                    shifts = np.arange(b0, b0 + 16, dtype=np.uint64)
                    bits = ((vh[:, None] >> shifts[None, :]) & np.uint64(1)).astype(
                        np.int64
                    )
                    w = bits[uc] * cnt[:, None]
                    seg = np.add.reduceat(w, idx, axis=0)
                    on = (2 * seg - nz_lens > 0).astype(np.uint64)
                    acc |= (on << shifts[None, :]).sum(axis=1, dtype=np.uint64)
                out[nz] = acc
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "simhash": pa.array(out.view(np.int64)),
            }
        )

    return ds.map_batches(_sim, batch_format="pyarrow")


def simhash_dup_pairs(
    ds: rd.Dataset, text_col: str, id_col: str, *, max_hamming: int = 3
) -> rd.Dataset:
    """Pairs within hamming distance via 4-band blocking (a pair ≤3 bits apart
    must agree exactly on ≥1 of 4 16-bit bands)."""
    sigs = simhash_signatures(ds, text_col, id_col)

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sim = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        out = {"band": [], "bucket": [], id_col: [], "simhash": []}
        for b_i in range(4):
            part = ((sim >> np.uint64(16 * b_i)) & np.uint64(0xFFFF)).astype(np.int64)
            out["band"].append(np.full(len(ids), b_i, dtype=np.int32))
            out["bucket"].append(part)
            out[id_col].append(ids)
            out["simhash"].append(sim.view(np.int64))
        return pa.table({k: pa.array(np.concatenate(v)) for k, v in out.items()})

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    # pair generation via a banded SELF-JOIN (the minhash_lsh_pairs shape),
    # not a per-bucket map_groups — bucket count is O(corpus), so per-group
    # Python dominates at crawl scale. Both sides carry the full signature;
    # the hamming filter is one vectorized xor -> unpackbits popcount.
    from ..util import default_num_partitions, distinct_rows

    nparts = max(2, default_num_partitions() // 2)
    left = banded.rename_columns({id_col: "id_a", "simhash": "sim_a"})
    right = banded.rename_columns({id_col: "id_b", "simhash": "sim_b"})
    cand = left.join(right, join_type="inner", num_partitions=nparts, on=("band", "bucket"))

    def _ham(batch: pa.Table, mh=max_hamming) -> pa.Table:
        t = batch.filter(pc.less(batch.column("id_a"), batch.column("id_b")))
        sa = t.column("sim_a").to_numpy(zero_copy_only=False).view(np.uint64)
        sb = t.column("sim_b").to_numpy(zero_copy_only=False).view(np.uint64)
        x = sa ^ sb
        ham = (
            np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1).sum(axis=1)
            if len(x)
            else np.empty(0, dtype=np.int64)
        )
        out = pa.table(
            {
                "id_a": t.column("id_a").combine_chunks(),
                "id_b": t.column("id_b").combine_chunks(),
                "hamming": pa.array(ham.astype(np.int32), pa.int32()),
            }
        )
        return out.filter(pc.less_equal(out.column("hamming"), mh))

    pairs = cand.map_batches(_ham, batch_format="pyarrow")
    # (id_a, id_b) determines hamming (xor of the two signatures), so a
    # 3-column distinct == per-pair dedup — sort + boundary scan, no
    # pair-cardinality groupby
    return distinct_rows(pairs, ["id_a", "id_b", "hamming"])


def embedding_dup_pairs(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.95,
    target_block_rows: int = 16384,
) -> rd.Dataset:
    """EXACT cosine >= threshold pairs (a < b) via a distributed block-pair
    join: the normalized corpus is materialized as B object-store blocks and
    B(B+1)/2 tasks each compute one block x block matmul, emitting only the
    threshold hits. Nothing is gathered on the driver; each task touches two
    blocks (zero-copy refs).

    The quadratic task count is inherent to an exact low-threshold similarity
    join (no metric blocking is lossless at cosine ~0.5); for genuine
    near-duplicate detection (threshold >= ~0.9) use
    ``embedding_dup_pairs_lsh`` — linear-ish work via hyperplane blocking."""
    import ray

    def _normalize_block(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        v = v / n[:, None]
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "_nvec": pa.array(list(v), pa.list_(pa.float64())),
            }
        )

    narrow = ds.select_columns([id_col, vec_col]).map_batches(
        _normalize_block, batch_format="pyarrow"
    ).materialize()
    nrows = narrow.count()
    nblocks = max(1, min(256, nrows // target_block_rows + 1))
    narrow = narrow.repartition(nblocks).materialize()
    refs = narrow.to_arrow_refs()

    @ray.remote
    def _block_pair(ta: pa.Table, tb: pa.Table) -> pa.Table:
        ia = ta.column(id_col).to_numpy(zero_copy_only=False)
        ib = tb.column(id_col).to_numpy(zero_copy_only=False)
        va = np.stack(ta.column("_nvec").to_numpy(zero_copy_only=False))
        vb = np.stack(tb.column("_nvec").to_numpy(zero_copy_only=False))
        scores = va @ vb.T
        r, c = np.nonzero(scores >= threshold)
        a, b = ia[r], ib[c]
        s = scores[r, c]
        keep = a != b
        a, b, s = a[keep], b[keep], s[keep]
        swap = a > b
        a2 = np.where(swap, b, a)
        b2 = np.where(swap, a, b)
        return pa.table(
            {
                "id_a": pa.array(a2),
                "id_b": pa.array(b2),
                "cosine": pa.array(s, pa.float64()),
            }
        )

    out_refs = [
        _block_pair.remote(refs[i], refs[j])
        for i in range(len(refs))
        for j in range(i, len(refs))
    ]
    pairs = rd.from_arrow_refs(out_refs)
    # same-block pairs appear twice only as (a,b) ordered — the cross-block
    # tiles are disjoint, so no global dedup shuffle is needed; the diagonal
    # tile emits each unordered pair twice (both orders hit the >= filter),
    # collapsed by the ordered swap + per-block dedup
    def _dedup(b: pa.Table) -> pa.Table:
        g = b.group_by(["id_a", "id_b"]).aggregate([("cosine", "min")])
        return g.select(["id_a", "id_b", "cosine_min"]).rename_columns(
            ["id_a", "id_b", "cosine"]
        )

    return pairs.map_batches(_dedup, batch_format="pyarrow")


def embedding_dup_pairs_lsh(
    ds: rd.Dataset,
    vec_col: str,
    id_col: str,
    *,
    threshold: float = 0.9,
    n_planes: int = 8,
    n_tables: int = 8,
) -> rd.Dataset:
    """Near-duplicate pairs for HIGH thresholds: random-hyperplane band
    signatures -> self-join on (table, bucket) -> exact cosine verification
    in the joined stream. Collision probability per table for angle θ is
    (1-θ/π)^n_planes, so near-identical vectors (θ→0) collide in every
    table while unrelated vectors rarely share a bucket; verification makes
    false positives impossible — only recall is probabilistic. Same scale
    shape as ``minhash_lsh_pairs`` (banded self-join, no per-bucket UDF)."""
    from ..extras.similarity import _hyperplanes
    from ..util import default_num_partitions, distinct_rows, hash_join

    ds = ds.select_columns([id_col, vec_col]).materialize()

    def _bands(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        dim = v.shape[1]
        out_t, out_b, out_i = [], [], []
        for t in range(n_tables):
            p = _hyperplanes(dim, n_planes, seed=101 + t)
            sig = np.packbits((v @ p.T) > 0, axis=1, bitorder="little")[:, 0].astype(np.int64)
            out_t.append(np.full(len(ids), t, dtype=np.int32))
            out_b.append(sig)
            out_i.append(ids)
        return pa.table(
            {
                "band": pa.array(np.concatenate(out_t), pa.int32()),
                "bucket": pa.array(np.concatenate(out_b), pa.int64()),
                id_col: pa.array(np.concatenate(out_i)),
            }
        )

    banded = ds.map_batches(_bands, batch_format="pyarrow")
    nparts = max(2, default_num_partitions() // 2)
    left = banded.rename_columns({id_col: "id_a"})
    right = banded.rename_columns({id_col: "id_b"})
    cand = left.join(right, join_type="inner", num_partitions=nparts, on=("band", "bucket"))

    def _ordered(batch: pa.Table) -> pa.Table:
        m = pc.less(batch.column("id_a"), batch.column("id_b"))
        return batch.filter(m).select(["id_a", "id_b"])

    # candidate-pair dedup by sort + boundary scan (not a pair-cardinality
    # Ray groupby — see util.distinct_rows)
    uniq = distinct_rows(
        cand.map_batches(_ordered, batch_format="pyarrow"), ["id_a", "id_b"]
    )

    # exact verification: attach both vectors by hash join (packed to binary
    # — Arrow joins reject list-typed payload columns), vectorized cosine
    def _pack(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "_vec": pa.array([row.tobytes() for row in v], pa.binary()),
            }
        )

    packed = ds.map_batches(_pack, batch_format="pyarrow")
    va = packed.rename_columns({id_col: "id_a", "_vec": "_vec_a"})
    vb = packed.rename_columns({id_col: "id_b", "_vec": "_vec_b"})
    joined = hash_join(uniq, va, on="id_a", join_type="inner", num_partitions=nparts)
    joined = joined.materialize()  # chained joins over shared lineage (see canonicalize)
    joined = hash_join(joined, vb, on="id_b", join_type="inner", num_partitions=nparts)

    def _verify(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], batch.column("id_a").type),
                    "id_b": pa.array([], batch.column("id_b").type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        a = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch.column("_vec_a").to_pylist()])
        b = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch.column("_vec_b").to_pylist()])
        na = np.linalg.norm(a, axis=1)
        nb = np.linalg.norm(b, axis=1)
        na[na == 0] = 1.0
        nb[nb == 0] = 1.0
        cos = np.einsum("ij,ij->i", a, b) / (na * nb)
        out = pa.table(
            {
                "id_a": batch.column("id_a").combine_chunks(),
                "id_b": batch.column("id_b").combine_chunks(),
                "cosine": pa.array(cos, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column("cosine"), threshold))

    return joined.map_batches(_verify, batch_format="pyarrow")


def ngram_jaccard_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.5,
    shingle_k: int = 3,
    max_shingle_df: int | None = None,
    score: str = "jaccard",
) -> rd.Dataset:
    """EXACT all-pairs word-k-shingle Jaccard >= ``threshold`` via an
    inverted shingle index self-join — the no-sketch member of the dedup
    family (minhash approximates this; here there are no candidate misses).

    ``score="containment"`` swaps the symmetric Jaccard |A∩B|/|A∪B| for the
    max-containment |A∩B|/min(|A|,|B|) — the quote/subset detector: a short
    document fully embedded in a long one scores 1.0 here but near 0 on
    Jaccard, so this is the mode that catches boilerplate inclusion and
    near-verbatim excerpts. Same index, same join, same reductions; only
    the final vectorized scoring map changes (output column is named after
    the score).

    Shape at crawl scale: only (id, shingle_hash) rows ever shuffle (16 B),
    the self-join runs hash-partitioned on the shingle hash, and every
    per-key reduction (set sizes, pair intersection counts) is the sort +
    boundary-scan primitive (``extras.stats.exact_value_counts``), never a
    per-group Ray aggregate. Inherently quadratic in co-shingled docs — a
    boilerplate shingle shared by h docs emits h^2 join rows; the opt-in
    ``max_shingle_df`` valve drops shingles above a document frequency (an
    explicit, logged deviation from exactness, the standard df-cut).

    Pair keys fold to one int64 ((id_a << 32) | id_b): ids must fit 31 bits.
    At >2^31 docs widen the fold to a (id_a, id_b) two-column sort — the
    primitive is key-layout-agnostic.
    """
    from ..util import default_num_partitions, hash_join
    from .stats import exact_value_counts

    def _sh(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        texts = batch.column(text_col).to_pylist()
        h, off = shingle_hash_batch(texts, shingle_k)
        n = len(ids)
        doc_idx = np.repeat(np.arange(n), np.diff(off))
        if not len(doc_idx):
            return pa.table(
                {id_col: pa.array([], pa.int64()), "sh": pa.array([], pa.int64())}
            )
        # vectorized per-doc set dedup: one lexsort + boundary compare
        order = np.lexsort((h, doc_idx))
        hs, dx = h[order], doc_idx[order]
        keep = np.ones(len(hs), dtype=bool)
        keep[1:] = (hs[1:] != hs[:-1]) | (dx[1:] != dx[:-1])
        return pa.table(
            {
                id_col: pa.array(ids[dx[keep]], pa.int64()),
                "sh": pa.array(hs[keep], pa.int64()),
            }
        )

    rows = ds.map_batches(_sh, batch_format="pyarrow").materialize()  # reused 3x
    if max_shingle_df is not None:
        heavy = exact_value_counts(rows, "sh").filter(
            expr=f"n > {int(max_shingle_df)}"
        )
        heavy_set = set(
            heavy.select_columns(["sh"]).to_pandas()["sh"].tolist()
        )  # df-heavy shingles are few by construction
        if heavy_set:
            import ray as _ray

            heavy_ref = _ray.put(np.array(sorted(heavy_set), dtype=np.int64))

            def _drop(batch: pa.Table, ref=heavy_ref) -> pa.Table:
                hv = _ray.get(ref)
                sh = batch.column("sh").to_numpy(zero_copy_only=False)
                pos = np.searchsorted(hv, sh)
                pos = np.clip(pos, 0, len(hv) - 1)
                return batch.filter(pa.array(hv[pos] != sh))

            rows = rows.map_batches(_drop, batch_format="pyarrow").materialize()
    sizes = exact_value_counts(rows, id_col).materialize()  # (id, n) per doc

    # clamp partitions for small inputs: empty join partitions materialize as
    # schema-less blocks (known Ray join hazard) and aggregator actors hold
    # CPUs they don't need
    nparts = max(2, min(default_num_partitions() // 2, rows.count() // 2000 + 1))
    left = rows.rename_columns({id_col: "id_a"})
    right = rows.rename_columns({id_col: "id_b"})
    cand = hash_join(left, right, on="sh", join_type="inner", num_partitions=nparts)

    def _fold(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a").to_numpy(zero_copy_only=False)
        b = batch.column("id_b").to_numpy(zero_copy_only=False)
        m = a < b
        a, b = a[m], b[m]
        return pa.table({"pair_key": pa.array((a << 32) | b, pa.int64())})

    inter = exact_value_counts(
        cand.map_batches(_fold, batch_format="pyarrow"), "pair_key"
    )

    def _unfold(batch: pa.Table) -> pa.Table:
        k = batch.column("pair_key").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "id_a": pa.array(k >> 32, pa.int64()),
                "id_b": pa.array(k & 0xFFFFFFFF, pa.int64()),
                "inter": pc.cast(batch.column("n"), pa.int64()),
            }
        )

    score_col = "containment" if score == "containment" else "jaccard"
    pairs = inter.map_batches(_unfold, batch_format="pyarrow").materialize()
    npairs = pairs.count()
    if npairs == 0:
        return rd.from_arrow(
            pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    score_col: pa.array([], pa.float64()),
                }
            )
        )
    sa = sizes.rename_columns({id_col: "id_a", "n": "n_a"})
    sb = sizes.rename_columns({id_col: "id_b", "n": "n_b"})
    # clamp again by PAIR cardinality (empty join partitions are a schema
    # hazard) and materialize between the two joins of the same renamed
    # lineage (chained lazy joins over shared renames hit FieldRef collisions)
    jparts = max(2, min(nparts, npairs // 2000 + 1))
    pairs = hash_join(
        pairs, sa, on="id_a", join_type="inner", num_partitions=jparts
    ).materialize()
    pairs = hash_join(pairs, sb, on="id_b", join_type="inner", num_partitions=jparts)

    def _jac(batch: pa.Table, thr=threshold, mode=score) -> pa.Table:
        it = batch.column("inter").to_numpy(zero_copy_only=False).astype(np.float64)
        na = batch.column("n_a").to_numpy(zero_copy_only=False).astype(np.float64)
        nb = batch.column("n_b").to_numpy(zero_copy_only=False).astype(np.float64)
        u = np.minimum(na, nb) if mode == "containment" else na + nb - it
        ja = np.divide(it, u, out=np.ones_like(it), where=u > 0)
        out = pa.table(
            {
                "id_a": batch.column("id_a").combine_chunks(),
                "id_b": batch.column("id_b").combine_chunks(),
                score_col: pa.array(ja, pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out.column(score_col), thr))

    return pairs.map_batches(_jac, batch_format="pyarrow")


def cluster_keepers(
    ids: rd.Dataset,
    pairs: rd.Dataset,
    id_col: str = "doc_id",
    *,
    force_distributed: bool = False,
) -> rd.Dataset:
    """Resolve duplicate PAIRS into per-document keepers: every document maps
    to the minimum id of its connected component in the pair graph (itself
    when it has no duplicate). This is the step that turns any pair-producing
    dedup operator (minhash/simhash/embedding/ngram) into an actual dedup —
    ``filter(doc_id == keeper_id)`` keeps one representative per cluster.

    Scale shape: components via ``kg.canonicalize.canonicalize_components`` —
    exact driver union-find while the deduped PAIR graph is small (pairs are
    tiny relative to the corpus; the driver path costs ~2s at any width),
    auto-switching to the distributed min-label contraction (O(log diameter)
    node-sized joins) above its edge cap — then one corpus-sized union +
    ``min_per_key`` (a narrow (int64,int64) sort + boundary scan) to fold in
    singleton documents. Never a vocabulary gather on the driver, never a
    per-group UDF.

    Ids must be non-negative int64 (zero-padded decimal keys keep
    lexicographic order == numeric order inside the string-keyed contraction).
    """
    from ..kg.canonicalize import canonicalize_components
    from ..util import min_per_key

    _W = 19  # max int64 decimal digits

    def _to_edges(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "edge_a": pc.utf8_lpad(pc.cast(b.column("id_a"), pa.string()), _W, "0"),
                "edge_b": pc.utf8_lpad(pc.cast(b.column("id_b"), pa.string()), _W, "0"),
            }
        )

    mapping = canonicalize_components(
        pairs.map_batches(_to_edges, batch_format="pyarrow"),
        force_distributed=force_distributed,
    )

    def _back(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": pc.cast(b.column("node"), pa.int64()),
                "keeper": pc.cast(b.column("canonical"), pa.int64()),
            }
        )

    if isinstance(mapping, pa.Table):
        comp = rd.from_arrow(_back(mapping)) if mapping.num_rows else None
    else:
        comp = mapping.map_batches(_back, batch_format="pyarrow")

    def _ident(b: pa.Table) -> pa.Table:
        i = pc.cast(b.column(id_col).combine_chunks(), pa.int64())
        return pa.table({"node": i, "keeper": i})

    ident = ids.select_columns([id_col]).map_batches(_ident, batch_format="pyarrow")
    out = min_per_key(ident if comp is None else ident.union(comp), "node", "keeper")
    return out.map_batches(
        lambda b: pa.table(
            {
                id_col: b.column("node").combine_chunks(),
                "keeper_id": b.column("keeper").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )


def duplicate_span_stats(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    n: int = 5,
    pos_bits: int = 20,
) -> rd.Dataset:
    """CROSS-document duplicate n-gram spans (exact-substring dedup at
    n-gram granularity, Lee et al. 2022 "Deduplicating Training Data"
    style): per document, the total word-n-gram count and how many of its
    n-gram occurrences are duplicates of an occurrence seen EARLIER in the
    corpus order (earlier = smaller (doc_id, position)). The first
    occurrence anywhere is never a duplicate — summing ``n_dup`` gives
    exactly the corpus's removable span mass.

    Scale shape (no Ray groupby at gram cardinality, which is ~tokens):
    ONE global sort of (ngram, doc_id·2^pos_bits + pos); within a sorted
    block an occurrence is a duplicate iff it equals its predecessor's
    gram, and across blocks iff it equals the previous block's LAST gram —
    a driver-side carry of one string per block. Per-doc totals leave each
    block as packed partial sums (``n_grams·2^32 + n_dup`` — addition
    distributes over the packing) and combine through the repo's
    sort+boundary-carry ``sum_per_key``; heavy rows move exactly once.

    Positions must fit ``pos_bits`` (docs longer than 2^pos_bits tokens
    need a bigger packing) and per-doc token counts must stay under 2^32.
    """
    import ray

    from ..util import coalesce_blocks
    from .graph import sum_per_key

    shift = np.int64(1) << np.int64(pos_bits)

    def _grams(batch: pa.Table) -> pa.Table:
        g, d = _ngram_occurrences(batch, text_col, n)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(g) == 0:
            return pa.table(
                {"ngram": pa.array([], pa.string()), "packed": pa.array([], pa.int64())}
            )
        # position within doc: run-relative arange over the contiguous doc runs
        starts = np.nonzero(np.concatenate([[True], d[1:] != d[:-1]]))[0]
        run_id = np.cumsum(np.concatenate([[True], d[1:] != d[:-1]])) - 1
        pos = np.arange(len(d), dtype=np.int64) - starts[run_id]
        if pos.max() >= shift:
            raise ValueError(f"document exceeds 2^{pos_bits} tokens; raise pos_bits")
        # ids must fit the packing too — hashed 63-bit doc ids would wrap
        # ids·2^pos_bits silently and corrupt the recovered doc/ordering
        id_cap = np.int64(1) << np.int64(63 - pos_bits)
        if ids.min() < 0 or ids.max() >= id_cap:
            raise ValueError(
                f"doc ids must be in [0, 2^{63 - pos_bits}) for pos_bits={pos_bits}; "
                "re-key hashed ids or lower pos_bits"
            )
        return pa.table(
            {"ngram": g, "packed": pa.array(ids[d] * shift + pos, pa.int64())}
        )

    occ = (
        ds.select_columns([id_col, text_col])
        .map_batches(_grams, batch_format="pyarrow")
        .materialize()
    )
    s = coalesce_blocks(occ).sort(["ngram", "packed"]).materialize()
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _last_gram(t: pa.Table):
        return t.column("ngram")[-1].as_py() if t.num_rows else None

    lasts = ray.get([_last_gram.remote(r) for r in refs])
    carries: list[str | None] = []
    prev = None
    for r, lg in zip(refs, lasts):
        carries.append(prev)
        if lg is not None:
            prev = lg

    pack32 = np.int64(1) << np.int64(32)

    @ray.remote(num_cpus=0.5)
    def _scan(t: pa.Table, carry) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], pa.int64()), "v": pa.array([], pa.int64())}
            )
        g = t.column("ngram").combine_chunks()
        doc = t.column("packed").to_numpy(zero_copy_only=False) // shift
        dup = np.empty(t.num_rows, dtype=bool)
        dup[1:] = pc.equal(g.slice(1), g.slice(0, t.num_rows - 1)).to_numpy(
            zero_copy_only=False
        )
        dup[0] = carry is not None and g[0].as_py() == carry
        uniq, inv = np.unique(doc, return_inverse=True)
        tot = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        dupc = np.bincount(inv, weights=dup, minlength=len(uniq)).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(uniq, pa.int64()),
                "v": pa.array(tot * pack32 + dupc, pa.int64()),
            }
        )

    partials = rd.from_arrow_refs([_scan.remote(r, c) for r, c in zip(refs, carries)])
    summed = sum_per_key(partials, id_col, "v")

    def _unpack(batch: pa.Table) -> pa.Table:
        v = batch.column("v").to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "n_grams": pa.array(v // pack32, pa.int64()),
                "n_dup": pa.array(v % pack32, pa.int64()),
            }
        )

    return summed.map_batches(_unpack, batch_format="pyarrow")


def _ngram_occurrences(
    batch: pa.Table, text_col: str, n: int
) -> tuple[pa.Array, np.ndarray]:
    """Flat word n-grams + their row indices (shared tokenizer semantics:
    trim/lower/whitespace split, empties dropped)."""
    txt = batch.column(text_col).combine_chunks()
    toks = pc.split_pattern_regex(pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+")
    flat = pc.list_flatten(toks)
    parent = pc.list_parent_indices(toks)
    keep = pc.not_equal(flat, "")
    flat = flat.filter(keep)
    parent = parent.filter(keep)
    d = parent.to_numpy(zero_copy_only=False).astype(np.int64)
    if len(flat) < n:
        return pa.array([], pa.string()), np.array([], np.int64)
    same = d[: len(d) - n + 1] == d[n - 1 :]
    parts = [flat.slice(i, len(flat) - n + 1).filter(pa.array(same)) for i in range(n)]
    return pc.binary_join_element_wise(*parts, " "), d[: len(d) - n + 1][same]


# --------------------------------------------------------------------------
# CCNet-style repeated-paragraph removal
# --------------------------------------------------------------------------

def paragraph_dedup(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    window_words: int = 8,
    pos_bits: int = 20,
) -> rd.Dataset:
    """Remove REPEATED paragraphs across the corpus, keeping only each
    paragraph's first occurrence (CCNet shape, Wenzek et al. 2019: hash every
    paragraph, drop later occurrences corpus-wide). Newline-free corpora get
    fixed windows of ``window_words`` space-separated words as "paragraphs".

    Scale plan (never a per-group UDF, never a driver gather of text):
      1. chunking is one vectorized pass per batch — ``split_pattern`` +
         ListArray re-offsetting + ``binary_join`` (no Python per row);
      2. the corpus-wide first occurrence per chunk is
         ``util.min_per_key`` over (chunk, doc<<pos_bits | pos) — a narrow
         sort + boundary scan;
      3. occurrences join back to the keeper table hash-partitioned on the
         chunk text (the keeper table is corpus-sized: broadcast is wrong);
      4. surviving chunks reassemble per doc with ONE sort by the folded
         (doc, pos) key + per-block vectorized ``binary_join``; docs that
         straddle block boundaries merge through a driver-chained string
         carry (only each block's first/last doc row reaches the driver).

    Docs whose every chunk was a repeat drop out of the result (same as the
    SQL oracle's join+group). Ids must satisfy 0 <= id < 2**(63 - pos_bits).
    """
    import ray

    from ..util import coalesce_blocks, hash_join, min_per_key

    w = int(window_words)
    shift = np.int64(pos_bits)
    id_cap = np.int64(1) << np.int64(63 - pos_bits)
    pos_cap = np.int64(1) << shift

    def _chunks(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (ids.min() < 0 or ids.max() >= id_cap):
            raise ValueError(
                f"paragraph_dedup: {id_col} must be in [0, 2**{63 - pos_bits})"
            )
        txt = b.column(text_col)
        if isinstance(txt, pa.ChunkedArray):
            txt = pa.concat_arrays([c.cast(pa.string()) for c in txt.chunks])
        else:
            txt = txt.cast(pa.string())
        words = pc.split_pattern(txt, " ")
        offs = words.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        lens = np.diff(offs)
        nch = (lens + w - 1) // w  # empty text still yields [''] -> 1 chunk
        if len(nch) and nch.max() >= pos_cap:
            raise ValueError(f"paragraph_dedup: doc exceeds 2**{pos_bits} chunks")
        total = int(nch.sum())
        doc_rep = np.repeat(np.arange(len(lens), dtype=np.int64), nch)
        within = (
            np.arange(total, dtype=np.int64)
            - np.repeat(np.concatenate(([0], np.cumsum(nch)[:-1])), nch)
        )
        starts = offs[:-1][doc_rep] + w * within
        la = pa.ListArray.from_arrays(
            pa.array(np.append(starts, offs[-1]).astype(np.int32), pa.int32()),
            words.values,
        )
        return pa.table(
            {
                "chunk": pc.binary_join(la, " "),
                "folded": pa.array((ids[doc_rep] << shift) | within, pa.int64()),
                id_col: pa.array(ids[doc_rep], pa.int64()),
                "pos": pa.array(within, pa.int64()),
            }
        )

    chunks = ds.select_columns([id_col, text_col]).map_batches(
        _chunks, batch_format="pyarrow"
    )
    firsts = min_per_key(chunks.select_columns(["chunk", "folded"]), "chunk", "folded")
    firsts = firsts.map_batches(
        lambda t: t.rename_columns(["chunk", "first_key"]), batch_format="pyarrow"
    )
    joined = hash_join(chunks, firsts, on="chunk", join_type="inner")

    def _kept(t: pa.Table) -> pa.Table:
        m = pc.equal(t.column("folded"), t.column("first_key"))
        return t.filter(m).select([id_col, "pos", "chunk", "folded"])

    kept = joined.map_batches(_kept, batch_format="pyarrow")
    s = (
        coalesce_blocks(kept.materialize())
        .sort("folded")
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.5)
    def _concat(t: pa.Table):
        if t.num_rows == 0:
            return None
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        bnd = np.flatnonzero(np.diff(ids)) + 1
        offs = np.concatenate(([0], bnd, [len(ids)])).astype(np.int64)
        ch = t.column("chunk")
        vals = (
            pa.concat_arrays([c.cast(pa.string()) for c in ch.chunks])
            if isinstance(ch, pa.ChunkedArray)
            else ch.cast(pa.string())
        )
        la = pa.ListArray.from_arrays(
            pa.array(offs.astype(np.int32), pa.int32()), vals
        )
        return pa.table(
            {
                id_col: pa.array(ids[offs[:-1]], pa.int64()),
                "text_dedup": pc.binary_join(la, " "),
                "n_chunks": pa.array(np.diff(offs), pa.int64()),
            }
        )

    part_refs = [_concat.remote(r) for r in refs]

    @ray.remote(num_cpus=0.25)
    def _edges(t):
        if t is None:
            return None
        return (
            int(t.column(id_col)[0].as_py()),
            int(t.column(id_col)[-1].as_py()),
            t.column("text_dedup")[-1].as_py(),
            int(t.column("n_chunks")[-1].as_py()),
            t.num_rows,
        )

    edges = ray.get([_edges.remote(r) for r in part_refs])
    part_refs = [r for r, e in zip(part_refs, edges) if e is not None]
    edges = [e for e in edges if e is not None]
    n = len(part_refs)
    pre_text: list[str | None] = [None] * n
    pre_n = [0] * n
    drop_last = [False] * n
    carry_id, carry_text, carry_n = None, None, 0
    for b in range(n):
        fid, lid, ltext, lnc, rows = edges[b]
        if carry_id is not None and carry_id == fid:
            pre_text[b], pre_n[b] = carry_text, carry_n
        carry_id, carry_text, carry_n = None, None, 0
        if b + 1 < n and lid == edges[b + 1][0]:
            drop_last[b] = True
            if rows == 1 and pre_text[b] is not None:
                carry_text = pre_text[b] + " " + ltext
                carry_n = pre_n[b] + lnc
            else:
                carry_text, carry_n = ltext, lnc
            carry_id = lid

    @ray.remote(num_cpus=0.25)
    def _fix(t: pa.Table, pre_t, pre_c: int, drop: bool) -> pa.Table:
        if drop and t.num_rows == 1 and pre_t is None:
            return t.slice(0, 0)
        if pre_t is not None:
            if drop and t.num_rows == 1:
                return t.slice(0, 0)
            texts = t.column("text_dedup").to_pylist()
            ncs = t.column("n_chunks").to_numpy(zero_copy_only=False).copy()
            texts[0] = pre_t + " " + texts[0]
            ncs[0] += pre_c
            t = t.set_column(
                t.column_names.index("text_dedup"),
                "text_dedup",
                pa.array(texts, pa.string()),
            )
            t = t.set_column(
                t.column_names.index("n_chunks"), "n_chunks", pa.array(ncs, pa.int64())
            )
        if drop:
            t = t.slice(0, t.num_rows - 1)
        return t

    out = [
        _fix.remote(part_refs[b], pre_text[b], pre_n[b], drop_last[b])
        for b in range(n)
    ]
    if not out:
        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "text_dedup": pa.array([], pa.string()),
                    "n_chunks": pa.array([], pa.int64()),
                }
            )
        )
    return rd.from_arrow_refs(out)


def editdist_pairs(
    ds: rd.Dataset, col: str, id_col: str
) -> rd.Dataset:
    """All id pairs whose ``col`` strings are within Levenshtein distance 1
    (the typo-level fuzzy-dedup member of the dedup family — FastSS-style
    deletion-neighborhood blocking, public algorithm: Bocek et al. 2007).

    Shape at scale: each string emits its |s|+1 deletion variants (bounded by
    string length); only (variant_hash:int64, id, s) rows shuffle through ONE
    hash self-join keyed on the variant hash — candidate fan-out per key is
    bounded by the alphabet (strings sharing a deletion variant), never
    corpus-quadratic. Pair dedup is the folded-key sort+boundary scan
    (``util.distinct_rows``), and verification is exact + vectorized: equal
    lengths -> one u8-matrix mismatch count (distance<=1 iff <=1 substitution);
    length-diff-1 -> first-mismatch index + suffix-equality check (one
    insertion). Variant generation itself is Arrow-vectorized
    (``utf8_slice_codeunits`` per deletion position, looped over the bounded
    max length — no per-row Python).

    Output: (id_a, id_b, dist) with id_a < id_b, dist in {0, 1}.
    """
    from ..util import distinct_rows, hash_join

    def _variants(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(col), pa.string()).combine_chunks()
        ids = b.column(id_col).combine_chunks()
        lens = pc.utf8_length(s)
        max_len = pc.max(lens).as_py() or 0
        keys, out_ids, out_s = [s], [ids], [s]
        for j in range(max_len):
            m = pc.greater(lens, j)
            sj = s.filter(m)
            keys.append(
                pc.binary_join_element_wise(
                    pc.utf8_slice_codeunits(sj, 0, j),
                    pc.utf8_slice_codeunits(sj, j + 1, (1 << 30)),
                    "",
                )
            )
            out_ids.append(ids.filter(m))
            out_s.append(sj)
        vk = pd.util.hash_array(
            np.asarray(pa.concat_arrays(
                [k.combine_chunks() if isinstance(k, pa.ChunkedArray) else k for k in keys]
            ).to_pylist(), dtype=object)
        ).astype(np.int64)
        return pa.table(
            {
                "vk": pa.array(vk, pa.int64()),
                id_col: pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_ids]
                ),
                "s": pa.concat_arrays(
                    [a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in out_s]
                ),
            }
        )

    var = ds.select_columns([id_col, col]).map_batches(
        _variants, batch_format="pyarrow"
    )
    left = var.rename_columns({id_col: "id_a", "s": "s_a"}).materialize()
    right = var.rename_columns({id_col: "id_b", "s": "s_b"})
    cand = hash_join(left, right, on="vk", join_type="inner")

    def _ordered(b: pa.Table) -> pa.Table:
        m = pc.less(b.column("id_a"), b.column("id_b"))
        t = b.filter(m)
        return pa.table(
            {
                "id_a": t.column("id_a").combine_chunks(),
                "id_b": t.column("id_b").combine_chunks(),
                "s_a": t.column("s_a").combine_chunks(),
                "s_b": t.column("s_b").combine_chunks(),
            }
        )

    uniq = distinct_rows(
        cand.map_batches(_ordered, batch_format="pyarrow"),
        ["id_a", "id_b", "s_a", "s_b"],
    )

    def _verify(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "dist": pa.array([], pa.int64()),
                }
            )
        sa = np.asarray(b.column("s_a").to_pylist(), dtype=object)
        sb = np.asarray(b.column("s_b").to_pylist(), dtype=object)
        la = np.fromiter((len(x) for x in sa), np.int64, len(sa))
        lb = np.fromiter((len(x) for x in sb), np.int64, len(sb))
        dist = np.full(len(sa), 2, np.int64)  # 2 == "more than 1", rejected

        def _mat(strs: np.ndarray, n: int) -> np.ndarray:
            return np.frombuffer(
                "".join(strs.tolist()).encode("utf-8"), np.uint8
            ).reshape(len(strs), n)

        # equal length: distance<=1 iff <=1 substituted position
        for n in np.unique(la[la == lb]):
            m = (la == n) & (lb == n)
            if n == 0:
                dist[m] = 0
                continue
            A, B = _mat(sa[m], int(n)), _mat(sb[m], int(n))
            dist[m] = np.minimum((A != B).sum(axis=1), 2)
        # length diff exactly 1: distance 1 iff one insertion explains it
        for big, small, lbig in ((sa, sb, la), (sb, sa, lb)):
            dd = np.unique(lbig[(la - lb == (1 if big is sa else -1))])
            for n in dd:
                m = (lbig == n) & (np.minimum(la, lb) == n - 1)
                if not m.any():
                    continue
                L = _mat(big[m], int(n))
                if n == 1:
                    dist[m] = 1
                    continue
                S = _mat(small[m], int(n) - 1)
                mism = L[:, : int(n) - 1] != S
                k = np.where(mism.any(axis=1), mism.argmax(axis=1), int(n) - 1)
                shifted_eq = L[:, 1:] == S
                # suffix_ok[i, j] == all(shifted_eq[i, j:])
                suffix_ok = np.flip(
                    np.cumprod(np.flip(shifted_eq, axis=1), axis=1), axis=1
                ).astype(bool)
                kc = np.minimum(k, int(n) - 2)  # k == n-1 short-circuits below
                ok = (k == int(n) - 1) | suffix_ok[np.arange(len(k)), kc]
                dm = dist[m]
                dm[ok] = 1
                dist[m] = dm
        out = pa.table(
            {
                "id_a": b.column("id_a").combine_chunks(),
                "id_b": b.column("id_b").combine_chunks(),
                "dist": pa.array(dist, pa.int64()),
            }
        )
        return out.filter(pc.less_equal(out.column("dist"), 1))

    return uniq.map_batches(_verify, batch_format="pyarrow")


def prefix_dup_flags(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, is_prefix_dup): is this document's text a PREFIX of another
    document (truncation duplicates — the wire-copy/pagination dup class
    shingle methods under-weight)?

    Ordering argument: in lexicographic order, if A is a prefix of ANY
    other string S, every string strictly between A and S also starts with
    A — so A is a prefix of its IMMEDIATE successor, and one narrow sort by
    (text, id) plus an adjacent ``starts_with`` decides every row exactly.
    Equal texts flag as prefix-dups too (they are duplicates). Cross-block
    adjacency uses the next block's first text — one string per boundary,
    no data exchange. Nulls are dropped (no text, no prefix relation)."""
    import ray

    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([id_col, text_col])
            .map_batches(
                lambda b: b.filter(pc.is_valid(b.column(text_col))),
                batch_format="pyarrow",
            )
            .materialize()
        )
        .sort([text_col, id_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _first_text(t: pa.Table):
        return t.column(text_col)[0].as_py() if t.num_rows else None

    firsts = ray.get([_first_text.remote(r) for r in refs])
    refs = [r for r, f in zip(refs, firsts) if f is not None]
    firsts = [f for f in firsts if f is not None]

    @ray.remote(num_cpus=0.5)
    def _flags(t: pa.Table, nxt_first: str | None) -> pa.Table:
        txt = t.column(text_col).combine_chunks()
        n = len(txt)
        flags = np.zeros(n, dtype=bool)
        if n > 1:
            # adjacent prefix test: succ.startswith(cur). Arrow has no
            # per-row-length slice kernel and a numpy <U conversion would
            # blow memory 4x max-doc-len per row, so candidate rows (succ
            # at least as long -- a vectorized prefilter) get one C-level
            # str compare each; one compare per adjacent pair, never a
            # cross-pair loop.
            cur = txt.slice(0, n - 1)
            succ = txt.slice(1)
            cv = cur.to_numpy(zero_copy_only=False)
            sv = succ.to_numpy(zero_copy_only=False)
            ln = pc.utf8_length(cur).to_numpy(zero_copy_only=False)
            sl = pc.utf8_length(succ).to_numpy(zero_copy_only=False)
            idx = np.nonzero(sl >= ln)[0]
            eq = np.fromiter(
                (sv[i].startswith(cv[i]) for i in idx), dtype=bool, count=len(idx)
            )
            flags[:-1][idx] = eq
        if nxt_first is not None and n:
            last = txt[n - 1].as_py()
            flags[-1] = nxt_first.startswith(last)
        return pa.table(
            {
                id_col: t.column(id_col).combine_chunks(),
                "is_prefix_dup": pa.array(flags),
            }
        )

    out = [
        _flags.remote(refs[i], firsts[i + 1] if i + 1 < len(refs) else None)
        for i in range(len(refs))
    ]
    if not out:
        return s
    return rd.from_arrow_refs(out)


# --------------------------------------------------------------------------
# Bloom-filter cross-corpus dedup — memory-bounded approximate membership
# --------------------------------------------------------------------------

def _bloom_hashes(texts: list[str], n_hash: int, m_bits: int) -> np.ndarray:
    """(len(texts), n_hash) bit positions via md5 double hashing
    (h1 + i*h2 mod m — Kirsch-Mitzenmacher). Deterministic: the flag set
    (including false positives) is a pure function of the data."""
    import hashlib

    out = np.empty((len(texts), n_hash), dtype=np.int64)
    for r, t in enumerate(texts):
        d = hashlib.md5(t.encode()).digest()
        h1 = int.from_bytes(d[:8], "little")
        h2 = int.from_bytes(d[8:], "little") | 1
        out[r] = [(h1 + i * h2) % m_bits for i in range(n_hash)]
    return out


def bloom_build(
    ds: rd.Dataset, text_col: str, *, m_bits: int = 1 << 23, n_hash: int = 7
) -> np.ndarray:
    """Build a bloom bitmap over a reference corpus's text column: per-block
    partial bitmaps OR-folded on the driver (each partial is m_bits/8 bytes
    — 1 MiB at the default — regardless of corpus size). At 100 TB the
    reference side never materializes; only fixed-size bitmaps move."""

    def _partial(batch: pa.Table) -> pa.Table:
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        pos = _bloom_hashes(batch.column(text_col).to_pylist(), n_hash, m_bits)
        flat = pos.ravel()
        np.bitwise_or.at(bits, flat // 8, (1 << (flat % 8)).astype(np.uint8))
        return pa.table({"bits": pa.array([bits.tobytes()], pa.binary())})

    bitmap = np.zeros(m_bits // 8, dtype=np.uint8)
    for b in ds.select_columns([text_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for blob in b.column("bits").to_pylist():
            bitmap |= np.frombuffer(blob, dtype=np.uint8)
    return bitmap


def bloom_cross_dedup(
    new: rd.Dataset,
    reference: rd.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 23,
    n_hash: int = 7,
) -> rd.Dataset:
    """Flag rows of ``new`` whose text is (probably) present in
    ``reference``: the incremental-crawl membership gate when the exact
    hash index (kg/incremental.py) is too big to probe cheaply. NO false
    negatives by construction — every true duplicate is flagged; false
    positives are bounded by the classic (1-e^{-kn/m})^k rate and the
    flagged stream is small enough to verify exactly downstream (the
    standard bloom-then-verify composition). The bitmap is built once
    (driver OR-fold of per-block partials) and broadcast via ``ray.put``.

    Returns (id, bloom_hit int8)."""
    import ray

    bitmap = bloom_build(reference, text_col, m_bits=m_bits, n_hash=n_hash)
    ref = ray.put(bitmap)

    def _probe(batch: pa.Table) -> pa.Table:
        bits = ray.get(ref)
        pos = _bloom_hashes(batch.column(text_col).to_pylist(), n_hash, m_bits)
        hit = ((bits[pos // 8] >> (pos % 8)) & 1).all(axis=1)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "bloom_hit": pa.array(hit.astype(np.int8), pa.int8()),
            }
        )

    return new.select_columns([id_col, text_col]).map_batches(
        _probe, batch_format="pyarrow"
    )


# -- incremental MinHash-LSH index (daily-crawl increments) -----------------

def minhash_index_write(
    ds: rd.Dataset,
    out_dir: str,
    *,
    text_col: str,
    id_col: str,
    num_perm: int = _N_PERM,
    bands: int = 16,
    shingle_k: int = 3,
) -> None:
    """Persist the banded LSH rows of ``ds`` as a parquet index (plus the
    hashing config in meta.json — appends are refused under a different
    config, silently-incomparable buckets being the classic index-poisoning
    bug). The index holds ONLY (band, bucket, id) — ~20·bands bytes/doc —
    so tomorrow's crawl increment never recomputes today's signatures."""
    import json
    import os
    import shutil

    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir, exist_ok=True)
    banded = banded_stream(
        ds, text_col, id_col, num_perm=num_perm, bands=bands, shingle_k=shingle_k
    )
    banded.write_parquet(os.path.join(out_dir, "bands"))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {"num_perm": num_perm, "bands": bands, "shingle_k": shingle_k,
             "id_col": id_col},
            f, sort_keys=True,
        )


def minhash_index_append_pairs(
    index_dir: str,
    new_ds: rd.Dataset,
    corpus_ds: rd.Dataset,
    *,
    text_col: str,
    id_col: str,
    verify_threshold: float | None = 0.5,
    update_index: bool = True,
) -> rd.Dataset:
    """Near-duplicate pairs CONTRIBUTED by a crawl increment against an
    existing LSH index, without recomputing the indexed corpus's
    signatures: the increment bands once, new-vs-old candidates come from
    one (band, bucket) hash join against the persisted index, new-vs-new
    from the banded self-join, and verification re-reads only the
    candidate-id text slice of ``corpus_ds`` (old ∪ new). Equals the full
    recompute's pairs restricted to pairs touching a new id (banding is
    per-document — an unchanged document's buckets never move).

    ``update_index=True`` appends the increment's banded rows to the index
    (parquet append is the desired semantics here) so the next increment
    sees today's documents. New ids must be disjoint from indexed ids."""
    import json
    import os

    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    if meta["id_col"] != id_col:
        raise ValueError(
            f"index was built over id_col={meta['id_col']!r}, got {id_col!r}"
        )
    new_banded = banded_stream(
        new_ds, text_col, id_col,
        num_perm=meta["num_perm"], bands=meta["bands"],
        shingle_k=meta["shingle_k"],
    )
    old_banded = rd.read_parquet(os.path.join(index_dir, "bands"))

    from ..util import default_num_partitions, distinct_rows

    nparts = max(2, default_num_partitions() // 2)
    left = old_banded.map_batches(
        lambda b: b.rename_columns(["band", "bucket", "id_a"]),
        batch_format="pyarrow",
    ).materialize()
    right = new_banded.map_batches(
        lambda b: b.rename_columns(["band", "bucket", "id_b"]),
        batch_format="pyarrow",
    ).materialize()
    cross = left.join(
        right, join_type="inner", num_partitions=nparts, on=("band", "bucket")
    )
    nn = right.map_batches(
        lambda b: b.rename_columns(["band", "bucket", "id_a"]),
        batch_format="pyarrow",
    ).join(right, join_type="inner", num_partitions=nparts, on=("band", "bucket"))

    def _ordered(batch: pa.Table) -> pa.Table:
        a = batch.column("id_a")
        b = batch.column("id_b")
        lo = pc.min_element_wise(a, b)
        hi = pc.max_element_wise(a, b)
        t = pa.table({"id_a": lo, "id_b": hi})
        return t.filter(pc.less(t.column("id_a"), t.column("id_b")))

    pairs = cross.map_batches(_ordered, batch_format="pyarrow").union(
        nn.map_batches(_ordered, batch_format="pyarrow")
    )
    uniq = distinct_rows(pairs, ["id_a", "id_b"])
    if update_index:
        new_banded.write_parquet(os.path.join(index_dir, "bands"))
    if verify_threshold is None:
        return uniq
    return verify_pairs_exact(
        uniq, corpus_ds.select_columns([id_col, text_col]),
        text_col=text_col, id_col=id_col, shingle_k=meta["shingle_k"],
        threshold=verify_threshold, nparts=nparts,
    )
