"""Wave-11 operators: scatter matrix / PCA, z-order layout, bloom
cross-corpus dedup, compaction."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from anonymization_ray.extras.dedup import bloom_cross_dedup
from anonymization_ray.extras.layout import add_zorder_column, write_zordered, zorder_key
from anonymization_ray.extras.maintenance import compact_parquet
from anonymization_ray.extras.similarity import scatter_matrix


def test_scatter_matrix_exact_and_eigh_consistent():
    rng = np.random.default_rng(5)
    v = rng.normal(size=(200, 8)).astype(np.float32)
    ds = rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(200), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in v],
                                      pa.list_(pa.float32())),
            }
        )
    ).repartition(4)
    t = scatter_matrix(ds, vec_col="embedding")
    q = np.floor(v.astype(np.float64) * 1e6).astype(object)
    ref = {}
    d = v.shape[1]
    for i in range(d):
        for j in range(i, d):
            ref[(i, j)] = int(sum(int(a) * int(b) for a, b in zip(q[:, i], q[:, j])))
    got = {(i, j): s for i, j, s in zip(t.column("i").to_pylist(),
                                        t.column("j").to_pylist(),
                                        t.column("s").to_pylist())}
    assert got == ref
    # eigen step: reconstruct the full symmetric matrix; eigh must give
    # non-negative eigenvalues summing to the trace (PSD Gram matrix)
    m = np.zeros((d, d))
    for (i, j), s in got.items():
        m[i, j] = m[j, i] = s
    w = np.linalg.eigvalsh(m)
    assert w.min() > -1e-3 * abs(w.max())
    assert abs(w.sum() - np.trace(m)) < 1e-6 * abs(np.trace(m))


def test_zorder_key_bit_exact_and_bounds():
    a = np.array([0, 1, 2, 3, 65535], dtype=np.int64)
    b = np.array([0, 1, 0, 3, 65535], dtype=np.int64)
    z = zorder_key(a, b)
    # interleave: z(1,1)=3, z(2,0)=4, z(3,3)=15, z(max,max)=2^32-1
    assert z.tolist() == [0, 3, 4, 15, (1 << 32) - 1]
    try:
        zorder_key(np.array([1 << 16]), np.array([0]))
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_zorder_clustering_prunes_more_row_groups():
    # deterministic 64x64 grid; a small box query must overlap FEWER
    # row-group [min,max] ranges under z-layout than under row-major layout
    n = 64
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    x, y = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    t = pa.table({"x": pa.array(x), "y": pa.array(y)})
    base = tempfile.mkdtemp(prefix="zorder_")
    try:
        nat_dir, z_dir = os.path.join(base, "nat"), os.path.join(base, "z")
        rd.from_arrow(t).sort("y").write_parquet(
            nat_dir, min_rows_per_file=256, max_rows_per_file=256
        )
        write_zordered(
            rd.from_arrow(t), z_dir, "x", "y", bits=6, num_rows_per_file=256
        )

        def overlapping_groups(d):
            cnt = 0
            for f in os.listdir(d):
                if not f.endswith(".parquet"):
                    continue
                md = pq.read_metadata(os.path.join(d, f))
                for g in range(md.num_row_groups):
                    rg = md.row_group(g)
                    stats = {
                        rg.column(c).path_in_schema: rg.column(c).statistics
                        for c in range(rg.num_columns)
                    }
                    sx, sy = stats.get("x"), stats.get("y")
                    if sx is None or sy is None:
                        cnt += 1
                        continue
                    if sx.min <= 11 and sx.max >= 4 and sy.min <= 11 and sy.max >= 4:
                        cnt += 1
            return cnt

        nat, z = overlapping_groups(nat_dir), overlapping_groups(z_dir)
        assert z < nat, (z, nat)
        # and the z column round-trips bit-exactly
        back = rd.read_parquet(z_dir).to_pandas()
        assert (zorder_key(back.x.values, back.y.values, 6) == back.z.values).all()
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_bloom_cross_dedup_no_false_negatives():
    texts_ref = [f"doc number {i} alpha beta" for i in range(50)]
    texts_new = texts_ref[:20] + [f"fresh {i} gamma delta" for i in range(30)]
    ref = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(50), pa.int64()), "text": texts_ref})
    ).repartition(3)
    new = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(100, 150), pa.int64()), "text": texts_new})
    ).repartition(2)
    out = bloom_cross_dedup(new, ref).to_pandas()
    hits = set(out[out.bloom_hit == 1].doc_id)
    assert set(range(100, 120)) <= hits  # every true member flagged
    # at 2^23 bits / 50 members, false positives are ~impossible
    assert hits == set(range(100, 120))


def test_compact_parquet_reduces_files_preserves_rows():
    base = tempfile.mkdtemp(prefix="compact_")
    try:
        small, out = os.path.join(base, "in"), os.path.join(base, "out")
        t = pa.table(
            {
                "id": pa.array(np.arange(1000), pa.int64()),
                "v": pa.array(np.arange(1000) * 2, pa.int64()),
            }
        )
        rd.from_arrow(t).repartition(20).write_parquet(small)
        rep = compact_parquet(small, out, target_rows_per_file=500)
        assert rep["n_rows"] == 1000
        assert rep["n_files_in"] >= 10
        assert rep["n_files_out"] <= 3
        back = rd.read_parquet(out).to_pandas().sort_values("id").reset_index(drop=True)
        assert back.id.tolist() == list(range(1000))
        assert back.v.tolist() == [2 * i for i in range(1000)]
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_rolling_sum_rows_halo_across_blocks():
    # windows must be correct when a key's trailing-k rows span block
    # boundaries: force 1-row-ish blocks via repartition and compare to
    # pandas groupby.rolling on the same (key, order, id)-sorted frame
    import pandas as pd

    from anonymization_ray.extras.window import rolling_sum_rows

    rng = np.random.RandomState(7)
    n = 300
    df = pd.DataFrame(
        {
            "k": rng.randint(0, 5, n),
            "o": rng.randint(0, 40, n),
            "i": np.arange(n, dtype=np.int64),
            "v": rng.randint(-50, 50, n).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(37)
    got = (
        rolling_sum_rows(ds, "k", "o", "i", "v", 4)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    sdf = df.sort_values(["k", "o", "i"]).reset_index(drop=True)
    sdf["roll"] = (
        sdf.groupby("k")["v"].rolling(4, min_periods=1).sum().reset_index(drop=True).values
    )
    want = sdf.sort_values("i").reset_index(drop=True)
    assert got["i"].tolist() == want["i"].tolist()
    assert got["roll_sum"].tolist() == want["roll"].astype(int).tolist()
