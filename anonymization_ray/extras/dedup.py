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


def exact_dedup(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """Keeper ids: min(id) per identical content. The shuffle key is a 64-bit
    content hash (pandas siphash — deterministic), not the text itself, so
    only ~16 B/row moves."""

    def _hash(batch: pa.Table) -> pa.Table:
        txt = batch.column(text_col).to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(txt.astype(object)).astype(np.int64)
        return pa.table({"content_hash": pa.array(h), id_col: batch.column(id_col).combine_chunks()})

    hashed = ds.map_batches(_hash, batch_format="pyarrow")
    kept = hashed.groupby("content_hash").min(id_col)

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(f"min({id_col})")})

    return kept.map_batches(_rename, batch_format="pyarrow")


def minhash_signatures(
    ds: rd.Dataset, text_col: str, id_col: str, *, num_perm: int = _N_PERM, shingle_k: int = 3
) -> rd.Dataset:
    """(id, sig: list<int64>[num_perm]) — per-batch vectorized over perms."""
    a, b = _perm_params(num_perm)

    def _sig(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        ids = batch.column(id_col).combine_chunks()
        sigs = np.empty((len(texts), num_perm), dtype=np.int64)
        for i, t in enumerate(texts):
            sh = _shingle_hashes(t or "", shingle_k)
            # (a*x + b) mod p, min over shingles — vectorized (perms x shingles)
            vals = (a[:, None] * sh[None, :] + b[:, None]) % _MERSENNE
            sigs[i] = vals.min(axis=1)
        return pa.table({id_col: ids, "sig": pa.array(list(sigs), pa.list_(pa.int64()))})

    return ds.map_batches(_sig, batch_format="pyarrow")


def minhash_lsh_pairs(
    ds: rd.Dataset,
    text_col: str,
    id_col: str,
    *,
    num_perm: int = _N_PERM,
    bands: int = 16,
    shingle_k: int = 3,
    verify_threshold: float | None = 0.5,
) -> rd.Dataset:
    """Candidate near-duplicate pairs (a < b) from banded LSH buckets; when
    ``verify_threshold`` is set, pairs are verified with exact n-gram jaccard
    inside the bucket group."""
    rows_per_band = num_perm // bands
    # the (id, text) projection feeds signature computation AND both
    # verification joins — materialize the narrow slice once instead of
    # re-executing the upstream three times
    ds = ds.select_columns([id_col, text_col]).materialize()
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

    banded = sigs.map_batches(_bands, batch_format="pyarrow")

    # candidate pairs via a self-join on (band, bucket) — a vectorized hash
    # join, NOT a per-bucket Python UDF (bucket count is O(corpus), so
    # per-group calls would dominate wall time)
    from ..util import default_num_partitions, hash_join

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
    uniq = pairs.groupby(["id_a", "id_b"]).count().drop_columns(["count()"])
    if verify_threshold is None:
        return uniq

    # exact jaccard verification: attach both texts by join, compute per pair
    ta = ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_a", text_col: "text_a"}
    )
    tb = ds.select_columns([id_col, text_col]).rename_columns(
        {id_col: "id_b", text_col: "text_b"}
    )
    joined = hash_join(uniq, ta, on="id_a", join_type="inner", num_partitions=nparts)
    joined = hash_join(joined, tb, on="id_b", join_type="inner", num_partitions=nparts)

    def _verify(batch: pa.Table, thr=verify_threshold, k=shingle_k) -> pa.Table:
        a_ids = batch.column("id_a").to_pylist()
        b_ids = batch.column("id_b").to_pylist()
        a_txt = batch.column("text_a").to_pylist()
        b_txt = batch.column("text_b").to_pylist()
        cache: dict = {}

        def sset(doc_id, text):
            s = cache.get(doc_id)
            if s is None:
                s = set(_shingle_hashes(text or "", k).tolist())
                cache[doc_id] = s
            return s

        ja = np.empty(batch.num_rows)
        for i in range(batch.num_rows):
            sa = sset(a_ids[i], a_txt[i])
            sb = sset(b_ids[i], b_txt[i])
            u = len(sa | sb)
            ja[i] = (len(sa & sb) / u) if u else 1.0
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


def simhash_signatures(ds: rd.Dataset, text_col: str, id_col: str) -> rd.Dataset:
    """(id, simhash int64): sign-sum of token crc32 bit vectors."""

    def _sim(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = np.empty(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            toks = (t or "").split()
            if not toks:
                out[i] = 0
                continue
            hs = np.array([zlib.crc32(w.encode()) for w in toks], dtype=np.uint64)
            hs = hs * np.uint64(0x9E3779B97F4A7C15)  # spread to 64 bits
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
                np.int64
            )
            votes = (2 * bits - 1).sum(axis=0)
            bits_on = (votes > 0).astype(np.uint64)
            out[i] = np.left_shift(bits_on, np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64)
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

    def _pairs(group: pa.Table, mh=max_hamming) -> pa.Table:
        ids = group.column(id_col).to_pylist()
        sims = group.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        a_out, b_out, d_out = [], [], []
        for i in range(len(ids)):
            x = sims[i] ^ sims[i + 1 :]
            ham = np.array([bin(v).count("1") for v in x])
            for off in np.nonzero(ham <= mh)[0]:
                j = i + 1 + off
                a, b = sorted((ids[i], ids[j]))
                a_out.append(a)
                b_out.append(b)
                d_out.append(int(ham[off]))
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "hamming": pa.array(d_out, pa.int32()),
            }
        )

    pairs = banded.groupby(["band", "bucket"]).map_groups(_pairs, batch_format="pyarrow")
    return pairs.groupby(["id_a", "id_b"]).min("hamming").rename_columns(
        {"min(hamming)": "hamming"}
    )


def embedding_dup_pairs(
    ds: rd.Dataset, vec_col: str, id_col: str, *, threshold: float = 0.95
) -> rd.Dataset:
    """Cosine >= threshold pairs (a < b). The corpus matrix is broadcast once
    (ray.put via closure); each batch does one blocked matmul against it —
    suitable while the embedding table fits the object store; beyond that,
    use lsh_topk-style bucketing."""
    mat_t = ds.select_columns([id_col, vec_col]).to_pandas()
    all_ids = mat_t[id_col].to_numpy()
    mat = np.stack(mat_t[vec_col].to_numpy()).astype(np.float64)
    norms = np.linalg.norm(mat, axis=1)
    norms[norms == 0] = 1.0
    matn = mat / norms[:, None]

    def _pairs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        vn = np.linalg.norm(v, axis=1)
        vn[vn == 0] = 1.0
        v = v / vn[:, None]
        scores = v @ matn.T  # (batch, corpus)
        a_out, b_out, s_out = [], [], []
        for r in range(len(ids)):
            hits = np.nonzero(scores[r] >= threshold)[0]
            for h in hits:
                if all_ids[h] > ids[r]:  # dedupe: emit each unordered pair once
                    a_out.append(ids[r])
                    b_out.append(all_ids[h])
                    s_out.append(float(scores[r, h]))
        return pa.table(
            {
                "id_a": pa.array(a_out),
                "id_b": pa.array(b_out),
                "cosine": pa.array(s_out, pa.float64()),
            }
        )

    return ds.map_batches(_pairs, batch_format="pyarrow")
