"""Similarity search over an embedding column (list<float>).

- ``brute_force_topk``: exact cosine top-k. The (small) query matrix is
  broadcast; each batch does one float64 matmul and emits only its local
  top-k per query; a final tiny ``groupby(query).map_groups`` merges local
  winners — the corpus is never gathered.
- ``lsh_topk``: a scale path — seeded random-hyperplane buckets; candidates
  share >= 1 bucket with the query; exact rescoring of candidates only.
  Approximate (recall measured in tests), same output schema.
- ``ivf_topk``: the other scale path — spherical-k-means coarse quantizer
  (driver-trained on a hash-residue sample, broadcast), per-batch list
  assignment, per-query nprobe-list pruning. ``nprobe == nlist`` degenerates
  to exact brute force (the calibration oracle).
- ``lsh_ann_join``: ANN when the query set IS the corpus — banded self-join.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Exact top-k: Dataset[(query_id, vec_id, cosine)], k rows per query.
    Ties broken by ascending id (matching the SQL oracle's ORDER BY)."""
    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids)

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = _normalize(np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64))
        scores = qn @ v.T  # (nq, batch)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(qids)):
            s = scores[qi]
            mask = ids != qids[qi] if exclude_self else np.ones(len(ids), bool)
            cand = np.nonzero(mask)[0]
            if not len(cand):
                continue
            # local top-k: sort by (-score, id)
            order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            out_q.extend([qids[qi]] * len(order))
            out_i.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_local, batch_format="pyarrow")

    def _merge(group: pa.Table, kk=k) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:kk]
        return group.take(order)

    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def _hyperplanes(dim: int, n_planes: int, seed: int = 7) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def lsh_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Approximate top-k: only corpus vectors sharing an LSH bucket with the
    query (in any of ``n_tables`` tables) are scored."""
    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids)
    dim = q.shape[1]
    planes = [_hyperplanes(dim, n_planes, seed=7 + t) for t in range(n_tables)]
    qsigs = [((q @ p.T) > 0).astype(np.uint8) for p in planes]  # (nq, n_planes)
    qbuckets = [np.packbits(s, axis=1, bitorder="little")[:, 0] for s in qsigs]
    qn = _normalize(q)

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        vsig = [
            np.packbits(((v @ p.T) > 0).astype(np.uint8), axis=1, bitorder="little")[:, 0]
            for p in planes
        ]
        vn = _normalize(v)
        out_q, out_i, out_s = [], [], []
        for qi in range(len(qids)):
            cand_mask = np.zeros(len(ids), dtype=bool)
            for t in range(n_tables):
                cand_mask |= vsig[t] == qbuckets[t][qi]
            if exclude_self:
                cand_mask &= ids != qids[qi]
            cand = np.nonzero(cand_mask)[0]
            if not len(cand):
                continue
            s = vn[cand] @ qn[qi]
            order = np.lexsort((ids[cand], -s))[:k]
            sel = cand[order]
            out_q.extend([qids[qi]] * len(sel))
            out_i.extend(ids[sel].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_local, batch_format="pyarrow")

    def _merge(group: pa.Table, kk=k) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:kk]
        return group.take(order)

    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def lsh_ann_join(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 8,
) -> rd.Dataset:
    """ANN JOIN: approximate cosine top-k neighbors for EVERY corpus vector.

    The scale path when the query set IS the corpus: candidates come from a
    banded hyperplane self-join (shuffle by (table, bucket) — the
    pre-bucketed index), exact cosine rescoring runs on the joined pairs,
    and per-query top-k selection is the sort+boundary-carry
    ``util.topk_per_key`` — no per-query corpus scan, no per-group UDF
    anywhere. Approximate: recall depends on bucket collisions (guaranteed
    for near-identical vectors; tested)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..util import default_num_partitions, distinct_rows, hash_join, topk_per_key

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
    left = banded.rename_columns({id_col: "query_id"})
    right = banded.rename_columns({id_col: "cand_id"})
    cand = left.join(right, join_type="inner", num_partitions=nparts, on=("band", "bucket"))

    def _directed(batch: pa.Table) -> pa.Table:
        m = pc.invert(pc.equal(batch.column("query_id"), batch.column("cand_id")))
        return batch.filter(m).select(["query_id", "cand_id"])

    # candidate-pair dedup by sort + boundary scan (not a pair-cardinality
    # Ray groupby — see util.distinct_rows)
    uniq = distinct_rows(
        cand.map_batches(_directed, batch_format="pyarrow"), ["query_id", "cand_id"]
    )

    def _pack(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        n = np.linalg.norm(v, axis=1)
        n[n == 0] = 1.0
        v = v / n[:, None]
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "_vec": pa.array([row.tobytes() for row in v], pa.binary()),
            }
        )

    packed = ds.map_batches(_pack, batch_format="pyarrow")
    joined = hash_join(
        uniq, packed.rename_columns({id_col: "query_id", "_vec": "_vq"}),
        on="query_id", join_type="inner", num_partitions=nparts,
    ).materialize()  # chained joins over shared lineage (see canonicalize)
    joined = hash_join(
        joined, packed.rename_columns({id_col: "cand_id", "_vec": "_vc"}),
        on="cand_id", join_type="inner", num_partitions=nparts,
    )

    def _score(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], batch.column("query_id").type),
                    id_col: pa.array([], batch.column("cand_id").type),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        a = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch.column("_vq").to_pylist()])
        b = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch.column("_vc").to_pylist()])
        cos = np.einsum("ij,ij->i", a, b)
        return pa.table(
            {
                "query_id": batch.column("query_id").combine_chunks(),
                id_col: batch.column("cand_id").combine_chunks(),
                "cosine": pa.array(cos, pa.float64()),
            }
        )

    scored = joined.map_batches(_score, batch_format="pyarrow")
    return topk_per_key(scored, "query_id", "cosine", k, descending=True, tie_col=id_col)


def kmeans_centroids(
    sample: np.ndarray, nlist: int, *, iters: int = 10, seed: int = 11
) -> np.ndarray:
    """Deterministic spherical k-means (Lloyd) on a driver-side sample —
    the coarse quantizer of an IVF index. Centroids are L2-normalized each
    iteration so nearest-centroid == max cosine. Sample size is the usual
    IVF training budget (~100-1000 vectors per list); the corpus itself is
    never gathered."""
    s = _normalize(np.asarray(sample, dtype=np.float64))
    nlist = min(nlist, len(s))
    rng = np.random.Generator(np.random.Philox(key=seed))
    c = s[rng.choice(len(s), size=nlist, replace=False)]
    for _ in range(iters):
        assign = np.argmax(s @ c.T, axis=1)
        for j in range(nlist):
            m = assign == j
            if m.any():
                c[j] = s[m].mean(axis=0)
        c = _normalize(c)
    # stable order: lexicographic by coordinates, so the index is
    # reproducible regardless of rng.choice's internal draw order
    return c[np.lexsort(c.T[::-1])]


def _sample_vectors(
    ds: rd.Dataset, vec_col: str, id_col: str, target: int, total: int
) -> np.ndarray:
    """Deterministic spread sample: keep ids whose 64-bit hash falls in the
    first ``target/total`` fraction — one streaming filter pass, no sort, no
    driver gather beyond the ~target sampled rows."""
    import pandas as pd

    frac = min(1.0, target / max(total, 1))
    cut = np.uint64(int(frac * 2**64)) if frac < 1.0 else np.uint64(2**64 - 1)

    def _f(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = pd.util.hash_array(np.ascontiguousarray(ids)) <= cut
        return batch.filter(pa.array(keep)).select([vec_col])

    rows = ds.map_batches(_f, batch_format="pyarrow").take_all()
    return np.stack([r[vec_col] for r in rows]).astype(np.float64)


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    nlist: int = 32,
    nprobe: int = 4,
    train_size: int = 4096,
    seed: int = 11,
    exclude_self: bool = True,
) -> rd.Dataset:
    """IVF approximate top-k — the second ANN scale path alongside LSH.

    Build: spherical-k-means centroids trained driver-side on a hash-residue
    sample (tiny, broadcast with the query matrix); every corpus vector is
    assigned its nearest-centroid ``list_id`` inside ``map_batches``. Probe:
    each query scores ONLY vectors whose list is among its ``nprobe``
    closest centroids — at scale the lists are parquet partitions and
    non-probed lists are never read; here the pruning happens per batch with
    one vectorized membership test. ``nprobe == nlist`` degenerates to exact
    brute force (tested), which calibrates correctness of the machinery
    independently of recall."""
    q = np.asarray(queries, dtype=np.float64)
    qids = np.asarray(query_ids)
    total = ds.count()
    cents = kmeans_centroids(
        _sample_vectors(ds, vec_col, id_col, train_size, total),
        nlist, seed=seed,
    )
    nlist = len(cents)
    nprobe = min(nprobe, nlist)
    qn = _normalize(q)
    # per-query probe set: nprobe nearest centroids, as a (nq, nlist) bool mask
    qcent = np.argsort(-(qn @ cents.T), axis=1, kind="stable")[:, :nprobe]
    probe_mask = np.zeros((len(qids), nlist), dtype=bool)
    np.put_along_axis(probe_mask, qcent, True, axis=1)

    def _local(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = _normalize(
            np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(np.float64)
        )
        list_id = np.argmax(v @ cents.T, axis=1)  # the IVF assignment
        out_q, out_i, out_s = [], [], []
        for qi in range(len(qids)):
            cand_mask = probe_mask[qi][list_id]
            if exclude_self:
                cand_mask &= ids != qids[qi]
            cand = np.nonzero(cand_mask)[0]
            if not len(cand):
                continue
            s = v[cand] @ qn[qi]
            order = np.lexsort((ids[cand], -s))[:k]
            sel = cand[order]
            out_q.extend([qids[qi]] * len(sel))
            out_i.extend(ids[sel].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "cosine": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.map_batches(_local, batch_format="pyarrow")

    def _merge(group: pa.Table, kk=k) -> pa.Table:
        s = group.column("cosine").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:kk]
        return group.take(order)

    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def load_query_vectors(
    sf_dir: str, n: int = 5, vec_col: str = "embedding", id_col: str = "vec_id"
) -> tuple[np.ndarray, np.ndarray]:
    """First n vectors by id — the fixed query set used by the oracle SQL."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=[id_col, vec_col])
    df = t.to_pandas().sort_values(id_col).head(n)
    return np.stack(df[vec_col].to_numpy()), df[id_col].to_numpy()


def group_centroids(
    ds: rd.Dataset,
    vec_col: str,
    group_col: str,
    *,
    scale: int = 1_000_000,
) -> rd.Dataset:
    """Per-group embedding centroids with EXACT integer accumulation:
    vectors are floored to ``scale`` units (floor(v*scale) int64), each
    block emits per-(group, dim) partial sums + counts via one numpy
    bincount over group codes, and the finale is a sort-based
    ``sum_per_key`` at (groups x dims) cardinality — no Ray groupby, no
    float summation-order drift (the mean is a single division of exact
    integers). Output long-form: (group, dim, n, sum_q, mean_q)."""
    from .graph import sum_per_key
    from ..util import hash_join

    def _partial(b: pa.Table) -> pa.Table:
        import pandas as pd

        grp = b.column(group_col).to_numpy(zero_copy_only=False)
        emb = b.column(vec_col)
        mat = np.stack(emb.to_pandas().to_numpy())  # (n, d) float32
        # promote BEFORE scaling: DuckDB's e*scale runs in float64 on the
        # float32-promoted value; float32 multiply would round differently
        q = np.floor(mat.astype(np.float64) * scale).astype(np.int64)
        codes, uniq = pd.factorize(grp)
        G, d = len(uniq), q.shape[1]
        sums = np.zeros((G, d), dtype=np.int64)
        np.add.at(sums, codes, q)
        cnt = np.bincount(codes, minlength=G).astype(np.int64)
        dim = np.tile(np.arange(d, dtype=np.int64), G)
        glab = np.repeat(np.asarray(uniq), d)
        return pa.table(
            {
                "gd": pa.array(
                    [f"{g}\x1f{i}" for g, i in zip(glab, dim)], pa.string()
                ),
                "sum_q": pa.array(sums.reshape(-1), pa.int64()),
                "n": pa.array(np.repeat(cnt, d), pa.int64()),
            }
        )

    parts = ds.select_columns([group_col, vec_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).materialize()
    sums = sum_per_key(parts.select_columns(["gd", "sum_q"]), "gd", "sum_q")
    cnts = sum_per_key(parts.select_columns(["gd", "n"]), "gd", "n")
    j = hash_join(sums, cnts, on="gd")

    def _final(b: pa.Table) -> pa.Table:
        parts_ = pc.split_pattern(b.column("gd").combine_chunks(), "\x1f")
        s = b.column("sum_q").to_numpy(zero_copy_only=False).astype(np.int64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: pc.cast(pc.list_element(parts_, 0), pa.int64()),
                "dim": pc.cast(pc.list_element(parts_, 1), pa.int64()),
                "n": pa.array(n, pa.int64()),
                "sum_q": pa.array(s, pa.int64()),
                "mean_q": pa.array(s.astype(np.float64) / n.astype(np.float64)),
            }
        )

    return j.map_batches(_final, batch_format="pyarrow")


def quantize_int8(
    ds: rd.Dataset, vec_col: str, id_col: str
) -> rd.Dataset:
    """Scalar int8 quantization of an embedding column — the memory-scale
    path for vector search (4x smaller than float32; ADC distances read the
    codes directly). Per-dimension global [min, max] is computed by a
    streaming partial-extrema pass (tiny per-block rows, driver merge — the
    HLL-merge shape), broadcast once, then codes are assigned in one
    vectorized pass: ``floor((x - min) * 255 / range + 0.5)``.

    The op-order of the quantizer expression is IEEE-reproducible, so the
    DuckDB oracle recomputes every code exactly; the emitted per-vector
    ``code_sum`` (Σ code_d · d, d 1-based) certifies all 64 codes per vector
    in one int64."""

    def _extrema(batch: pa.Table) -> pa.Table:
        m = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        return pa.table(
            {
                "mins": pa.array([m.min(axis=0).tobytes()], pa.binary()),
                "maxs": pa.array([m.max(axis=0).tobytes()], pa.binary()),
            }
        )

    lo, hi = None, None
    for b in ds.select_columns([vec_col]).map_batches(
        _extrema, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for mn, mx in zip(b.column("mins").to_pylist(), b.column("maxs").to_pylist()):
            mn = np.frombuffer(mn, dtype=np.float64)
            mx = np.frombuffer(mx, dtype=np.float64)
            lo = mn if lo is None else np.minimum(lo, mn)
            hi = mx if hi is None else np.maximum(hi, mx)
    import ray as _ray

    bounds_ref = _ray.put((lo, hi))

    def _codes(batch: pa.Table, ref=bounds_ref) -> pa.Table:
        mn, mx = _ray.get(ref)
        rng = mx - mn
        m = np.stack(batch.column(vec_col).to_pylist()).astype(np.float64)
        codes = np.where(
            rng > 0, np.floor((m - mn) * 255.0 / np.where(rng > 0, rng, 1.0) + 0.5), 0.0
        ).astype(np.int64)
        d = np.arange(1, codes.shape[1] + 1, dtype=np.int64)
        return pa.table(
            {
                id_col: batch.column(id_col).combine_chunks(),
                "code_sum": pa.array(codes @ d, pa.int64()),
            }
        )

    return ds.select_columns([id_col, vec_col]).map_batches(
        _codes, batch_format="pyarrow"
    )


def _subspace_codebooks(
    sample: np.ndarray, m: int, ksub: int, *, iters: int = 10, seed: int = 17
) -> np.ndarray:
    """Deterministic per-subspace Lloyd k-means (NO normalization — PQ
    codebooks live in raw subvector space). Returns (m, ksub, dsub).
    Init is a deterministic Philox draw; each codebook is re-ordered
    lexicographically so the index is reproducible."""
    n, d = sample.shape
    dsub = d // m
    ksub = min(ksub, n)
    rng = np.random.Generator(np.random.Philox(key=seed))
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        s = sample[:, j * dsub : (j + 1) * dsub]
        c = s[rng.choice(n, size=ksub, replace=False)].copy()
        for _ in range(iters):
            d2 = ((s[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for t in range(ksub):
                mask = assign == t
                if mask.any():
                    c[t] = s[mask].mean(axis=0)
        books[j] = c[np.lexsort(c.T[::-1])]
    return books


def pq_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    m: int = 8,
    ksub: int = 16,
    train_size: int = 4096,
    seed: int = 17,
    exclude_self: bool = True,
) -> rd.Dataset:
    """Product-quantization ANN (Jégou et al., 2011) — the memory-scale
    vector-search path beyond int8: each L2-normalized vector compresses to
    ``m`` one-byte codes (m·log2(ksub) bits; 64-dim float32 -> 8 bytes =
    32x), and query scoring never touches the original vectors.

    Build: per-subspace codebooks trained driver-side on the same
    hash-residue sample IVF uses (tiny, broadcast once via ``ray.put``).
    Search: each task computes the (m, ksub) inner-product lookup table per
    query ONCE, encodes its batch (argmin over ksub per subspace — one
    vectorized distance matrix), and scores every vector as m table
    gathers + a sum (asymmetric distance computation). Local top-k per
    query per batch; one tiny groupby merge — identical shuffle shape to
    ``brute_force_topk`` but the per-batch compute reads 8-byte codes, not
    512-byte vectors. At 100 TB the codes live as a parquet column 32x
    smaller than the embeddings; re-ranking survivors against the raw
    vectors is one targeted follow-up read."""
    import ray as _ray

    qn = _normalize(np.asarray(queries, dtype=np.float64))
    qids = np.asarray(query_ids)
    total = ds.count()
    sample = _normalize(_sample_vectors(ds, vec_col, id_col, train_size, total))
    books = _subspace_codebooks(sample, m, ksub, seed=seed)
    state = _ray.put((books, qn, qids))

    def _score(batch: pa.Table) -> pa.Table:
        bks, q, qd = _ray.get(state)
        mm, kk_sub, dsub = bks.shape
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        v = _normalize(
            np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                np.float64
            )
        )
        n = len(ids)
        # encode: per subspace argmin ||x_sub - c||^2 = argmax (x·c - |c|^2/2)
        codes = np.empty((n, mm), dtype=np.int64)
        for j in range(mm):
            sub = v[:, j * dsub : (j + 1) * dsub]
            c = bks[j]
            codes[:, j] = np.argmax(sub @ c.T - 0.5 * (c * c).sum(axis=1), axis=1)
        # ADC: per query an (m, ksub) inner-product table, score = gather-sum
        out_q, out_i, out_s = [], [], []
        col = np.arange(mm) * kk_sub
        for qi in range(len(qd)):
            table = np.einsum(
                "md,mkd->mk", q[qi].reshape(mm, dsub), bks
            )  # (m, ksub)
            s = table.ravel()[codes + col].sum(axis=1)
            mask = ids != qd[qi] if exclude_self else np.ones(n, bool)
            cand = np.nonzero(mask)[0]
            if not len(cand):
                continue
            order = cand[np.lexsort((ids[cand], -s[cand]))][:k]
            out_q.extend([qd[qi]] * len(order))
            out_i.extend(ids[order].tolist())
            out_s.extend(s[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_i, pa.int64()),
                "adc_score": pa.array(out_s, pa.float64()),
            }
        )

    local = ds.select_columns([id_col, vec_col]).map_batches(
        _score, batch_format="pyarrow"
    )

    def _merge(group: pa.Table, kk=k) -> pa.Table:
        s = group.column("adc_score").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, -s))[:kk]
        return group.take(order)

    return local.groupby("query_id").map_groups(_merge, batch_format="pyarrow")


def scatter_matrix(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> pa.Table:
    """EXACT integer scatter matrix over an embedding column — the PCA /
    covariance building block (S = sum_n q_n q_n^T over quantized vectors
    q = floor(1e6 * v), upper triangle). One streaming pass of per-batch
    int64 Gram partials (``Q.T @ Q`` — a single BLAS-shaped integer matmul
    per batch); the (dim x dim)-bounded fold happens on the driver with
    arbitrary-precision ints, so the result is bit-identical at any
    parallelism and any corpus size. Per-batch bound: |q| <= ~scale * |v|,
    so a batch of B rows keeps partials under 2^63 for B < 2^63 / (scale^2
    * |v|^2) — ~9e6 rows at unit-norm vectors; the default block size is
    orders of magnitude below that.

    Returns pa.Table(i, j, s) for i <= j (0-based dims). Eigendecomposition
    of the exact matrix is a driver-side ``np.linalg.eigh`` away — that step
    is dim x dim, never data-sized."""
    import numpy as np

    acc: dict[tuple[int, int], int] = {}

    def _partial(batch: pa.Table) -> pa.Table:
        v = np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        q = np.floor(v * float(scale)).astype(np.int64)
        m = q.T @ q  # (d, d) int64 Gram partial
        d = m.shape[0]
        iu = np.triu_indices(d)
        return pa.table(
            {
                "i": pa.array(iu[0].astype(np.int64), pa.int64()),
                "j": pa.array(iu[1].astype(np.int64), pa.int64()),
                "s": pa.array(m[iu], pa.int64()),
            }
        )

    # the partial stream is bounded by d^2 per block — a driver fold over
    # tiny tables, never the data
    for b in ds.select_columns([vec_col]).map_batches(
        _partial, batch_format="pyarrow"
    ).iter_batches(batch_format="pyarrow"):
        for i, j, s in zip(
            b.column("i").to_pylist(), b.column("j").to_pylist(), b.column("s").to_pylist()
        ):
            acc[(i, j)] = acc.get((i, j), 0) + s
    keys = sorted(acc)
    return pa.table(
        {
            "i": pa.array([k[0] for k in keys], pa.int64()),
            "j": pa.array([k[1] for k in keys], pa.int64()),
            "s": pa.array([acc[k] for k in keys], pa.int64()),
        }
    )


def kmeans_lloyd_int(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 4,
    iters: int = 2,
    scale: int = 1_000_000,
) -> pa.Table:
    """Distributed EXACT-integer Lloyd k-means over the FULL corpus (the
    sampled driver-side ``kmeans_centroids`` trains IVF cells; this is the
    clustering operator itself, bit-identical at any parallelism):

    - vectors quantize to q = floor(scale * v) int64 (the scatter-matrix
      convention), so every distance, sum and centroid update is integer
      arithmetic — no float drift across block boundaries or widths;
    - init = the first ``k`` vectors by id (deterministic, SQL-replicable);
    - each iteration is ONE streaming pass: blocks compute argmin-distance
      assignments against the broadcast (k x D) centroid table and emit a
      (k x (D+1)) integer partial (per-cluster dim sums + count); the fold
      is k*D-bounded on the driver with Python bigints;
    - centroid update is floor division; clusters that lose every point
      keep their previous centroid (deterministic, mirrored in SQL via
      coalesce).

    Returns the long (cluster, dim, val) table: dim >= 0 rows carry the
    final centroids, dim = -1 rows the final assignment counts."""
    import numpy as np
    import ray

    # init = the k smallest ids — per-block partial min-k (np.partition) +
    # tiny driver merge + one filtered fetch; never a corpus sort for k rows
    def _min_ids(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if len(ids) > k:
            ids = np.partition(ids, k - 1)[:k]
        return pa.table({id_col: pa.array(np.sort(ids), pa.int64())})

    id_parts = (
        ds.select_columns([id_col])
        .map_batches(_min_ids, batch_format="pyarrow")
        .take_all()
    )
    first_ids = sorted(r[id_col] for r in id_parts)[:k]
    _id_set = pa.array(first_ids, pa.int64())
    init = (
        ds.select_columns([id_col, vec_col])
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column(id_col), value_set=_id_set)),
            batch_format="pyarrow",
        )
        .take_all()
    )
    init.sort(key=lambda r: r[id_col])
    C = np.stack(
        [
            np.floor(np.asarray(r[vec_col], dtype=np.float64) * float(scale)).astype(
                np.int64
            )
            for r in init
        ]
    )
    dim = C.shape[1]
    counts = np.zeros(k, dtype=object)

    narrow = ds.select_columns([vec_col]).materialize()
    for _ in range(iters):
        cref = ray.put(C)

        def _partial(batch: pa.Table) -> pa.Table:
            q = np.floor(
                np.stack(batch.column(vec_col).to_numpy(zero_copy_only=False)).astype(
                    np.float64
                )
                * float(scale)
            ).astype(np.int64)
            cc = ray.get(cref)
            # ||q||^2 - 2 q.C^T + ||c||^2, all int64 (bounded: scale^2 * |v|^2 * D)
            d = (
                (q * q).sum(axis=1)[:, None]
                - 2 * (q @ cc.T)
                + (cc * cc).sum(axis=1)[None, :]
            )
            a = np.argmin(d, axis=1)  # ties -> smallest cluster id
            sums = np.zeros((k, q.shape[1]), dtype=np.int64)
            np.add.at(sums, a, q)
            cnt = np.bincount(a, minlength=k).astype(np.int64)
            out = np.concatenate([cnt[:, None], sums], axis=1)  # (k, 1+D)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(k), pa.int64()),
                    "row": pa.array(list(out), pa.list_(pa.int64())),
                }
            )

        parts = narrow.map_batches(_partial, batch_format="pyarrow").take_all()
        # k x (D+1) fold with Python ints — exact at any corpus size
        agg = [[0] * (dim + 1) for _ in range(k)]
        for r in parts:
            j = r["cluster"]
            for i, x in enumerate(r["row"]):
                agg[j][i] += int(x)
        newC = C.copy()
        for j in range(k):
            n = agg[j][0]
            counts[j] = n
            if n > 0:
                newC[j] = np.array(
                    [s // n for s in agg[j][1:]], dtype=np.int64
                )  # Python // floors exactly
        C = newC

    rows_c, rows_d, rows_v = [], [], []
    for j in range(k):
        rows_c.append(j)
        rows_d.append(-1)
        rows_v.append(int(counts[j]))
        for d_i in range(dim):
            rows_c.append(j)
            rows_d.append(d_i)
            rows_v.append(int(C[j, d_i]))
    return pa.table(
        {
            "cluster": pa.array(rows_c, pa.int64()),
            "dim": pa.array(rows_d, pa.int64()),
            "val": pa.array(rows_v, pa.int64()),
        }
    )
