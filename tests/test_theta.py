"""KMV/theta sketches (extras/stats.kmv_sketches) — exact-below-k
regime, estimation regime, intersection estimates."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.stats import kmv_sketches, theta_intersections


def _sets(pairs):
    return rd.from_arrow(
        pa.table(
            {
                "s": pa.array([p[0] for p in pairs], pa.int64()),
                "e": pa.array([p[1] for p in pairs], pa.int64()),
            }
        )
    )


def test_exact_below_k_and_duplicates_collapse():
    # set 1 = {10, 11, 12} (with dups), set 2 = {11, 12, 13}
    ds = _sets([(1, 10), (1, 11), (1, 11), (1, 12), (2, 11), (2, 12), (2, 13)])
    sk = kmv_sketches(ds, "s", "e", k=16)
    assert sk[1][0] == 1 << 63 and len(sk[1][1]) == 3  # exact sketch
    ests = theta_intersections(sk)
    assert ests[(1, 2)] == 2.0  # |{11,12}| — exact when both sketches exact


def test_estimation_regime_within_bound():
    rng = np.random.default_rng(3)
    a = rng.choice(100_000, 5_000, replace=False)
    b = np.concatenate([a[:2_500], 100_000 + np.arange(2_500)])  # overlap 2500
    rows = [(1, int(v)) for v in a] + [(2, int(v)) for v in b]
    sk = kmv_sketches(_sets(rows), "s", "e", k=256)
    # genuinely estimating: thetas below saturation
    assert sk[1][0] < (1 << 63) and sk[2][0] < (1 << 63)
    est = theta_intersections(sk)[(1, 2)]
    assert abs(est / 2_500 - 1.0) <= 5 / np.sqrt(256)


def test_sentence_stats_edges():
    from anonymization_ray.extras.textstats import sentence_stats

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": [
                "Hello world. How are you?  Fine! ",
                "no terminator here",
                "",
                "Wait... what?! Ok.",
            ],
        }
    )
    got = (
        sentence_stats(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.n_sentences.tolist() == [3, 1, 0, 3]
    assert got.sum_chars.tolist() == [26, 18, 0, 10]


def test_curriculum_order_bands_monotone_in_difficulty():
    from anonymization_ray.extras.shuffle import curriculum_order

    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(40)), pa.int64()),
            "diff": pa.array([i * 3 % 40 for i in range(40)], pa.int64()),
        }
    )
    got = (
        curriculum_order(rd.from_arrow(tbl), "doc_id", "diff", bands=4)
        .to_pandas()
        .sort_values("pos")
        .reset_index(drop=True)
    )
    # serving order visits bands in ascending order, 10 docs each
    assert got.band.tolist() == sorted(got.band.tolist())
    assert got.band.value_counts().tolist() == [10, 10, 10, 10]
    # within a band the order is hash-scrambled, not difficulty-sorted
    d = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("diff").to_pylist()))
    band0 = [d[i] for i in got[got.band == 0].doc_id]
    assert band0 != sorted(band0)
    # bands partition by difficulty: every band-0 diff < every band-3 diff
    band3 = [d[i] for i in got[got.band == 3].doc_id]
    assert max(band0) < min(band3)


def test_readability_fk_values_and_nulls():
    import numpy as np

    from anonymization_ray.extras.textstats import readability_fk

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "The cat sat.",      # W=3 Y=3 S=1
                "no terminator",     # S=0 -> null grade
                "",                  # W=S=0 -> null grade
            ],
        }
    )
    got = (
        readability_fk(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # grade = 0.39*3/1 + 11.8*3/3 - 15.59 = -2.62 -> truncation toward 0
    num = 390000 * 9 + 11800000 * 3 * 1 - 15590000 * 3
    expect = -((-num) // 3) if num < 0 else num // 3
    assert got.fk_grade_micro[0] == expect == -2620000
    assert np.isnan(got.fk_grade_micro[1]) or got.fk_grade_micro.isna()[1]
    assert got.fk_grade_micro.isna()[2]


def test_compression_ratio_separates_repetition_from_entropy():
    from anonymization_ray.extras.textstats import compression_stats

    rep = "spam template " * 200
    rng = np.random.default_rng(11)
    div = "".join(chr(c) for c in rng.integers(33, 123, 2800))
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [rep, div, ""],
        }
    )
    got = (
        compression_stats(rd.from_arrow(tbl))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.roundtrip_ok.tolist() == [1, 1, 1]
    # repetitive text compresses an order of magnitude harder
    assert got.ratio_micro[0] < 30_000          # < 3% of raw
    assert got.ratio_micro[1] > 700_000         # > 70% of raw
    assert got.ratio_micro[2] == 0 and got.raw_len[2] == 0


def test_cusum_matches_sequential_reference_across_blocks():
    from anonymization_ray.extras.window import cusum_per_key

    rng = np.random.default_rng(5)
    n = 3000
    keys = rng.integers(0, 5, n)
    order = rng.permutation(n)
    vals = rng.integers(-50, 55, n)
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(keys, pa.int64()),
                "o": pa.array(order, pa.int64()),
                "id": pa.array(np.arange(n), pa.int64()),
                "v": pa.array(vals, pa.int64()),
            }
        )
    ).repartition(11)
    got = {
        int(r["id"]): (int(r["s"]), int(r["alarm"]))
        for r in cusum_per_key(
            ds, "k", "o", "id", "v", threshold=120
        ).take_all()
    }
    import collections

    byk = collections.defaultdict(list)
    for i in range(n):
        byk[int(keys[i])].append((int(order[i]), i))
    want = {}
    for rows in byk.values():
        s = 0
        for _, i in sorted(rows):
            s = max(0, s + int(vals[i]))
            want[i] = (s, int(s > 120))
    assert got == want


def test_theta_union_merge_law():
    from anonymization_ray.extras.stats import kmv_sketches, theta_union

    # one set split across two "partitions": merged sketches must estimate
    # the union as well as a single sketch of the whole would
    rng = np.random.default_rng(7)
    elems = rng.choice(1_000_000, 4_000, replace=False)
    rows = [(1, int(v)) for v in elems[:2_500]] + [
        (2, int(v)) for v in elems[1_500:]
    ]  # overlapping halves, union = 4000
    sk = kmv_sketches(_sets(rows), "s", "e", k=256)
    est = theta_union(sk, k=256)
    assert abs(est / 4_000 - 1.0) <= 5 / np.sqrt(256)
    # exact regime: tiny sets merge to the exact distinct union
    small = kmv_sketches(
        _sets([(1, 1), (1, 2), (2, 2), (2, 3)]), "s", "e", k=64
    )
    assert theta_union(small, k=64) == 3.0
