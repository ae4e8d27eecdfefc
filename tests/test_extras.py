"""Extras: dedup family, similarity search, text analysis, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.dedup import (
    embedding_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    ngram_jaccard,
    simhash_dup_pairs,
    simhash_signatures,
)
from anonymization_ray.extras.multimodal import attach_fake_media, decode_media
from anonymization_ray.extras.similarity import brute_force_topk, lsh_topk
from anonymization_ray.extras.textstats import fingerprints, language_id

SF = "/root/testdata/sf0.001"


def _docs_with_planted_dups():
    texts = [f"alpha beta gamma delta epsilon zeta eta theta doc{i} " * 3 for i in range(20)]
    texts += [t + "tail" for t in texts[:5]]  # near-dups of docs 0-4
    texts += [texts[0]]  # exact dup of doc 0
    ids = list(range(len(texts)))
    return rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}))


def test_exact_dedup_keeps_min_id():
    ds = _docs_with_planted_dups()
    kept = sorted(exact_dedup(ds, "text", "doc_id").to_pandas()["doc_id"])
    assert 25 not in kept  # exact dup of doc 0 dropped
    assert 0 in kept
    assert len(kept) == 25


def test_minhash_recovers_planted_pairs_deterministically():
    ds = _docs_with_planted_dups()
    p1 = minhash_lsh_pairs(ds, "text", "doc_id", bands=32, verify_threshold=0.5).to_pandas()
    p2 = minhash_lsh_pairs(
        ds.repartition(5), "text", "doc_id", bands=32, verify_threshold=0.5
    ).to_pandas()
    s1 = set(map(tuple, p1[["id_a", "id_b"]].values.tolist()))
    s2 = set(map(tuple, p2[["id_a", "id_b"]].values.tolist()))
    assert s1 == s2  # partitioning-independent
    for i in range(5):
        assert (i, 20 + i) in s1  # planted near-dups found
    assert (0, 25) in s1  # exact dup found


def test_simhash_pairs_find_exact_dups():
    ds = _docs_with_planted_dups()
    sigs = simhash_signatures(ds, "text", "doc_id").to_pandas().set_index("doc_id")["simhash"]
    assert sigs[0] == sigs[25]  # identical text -> identical simhash
    pairs = simhash_dup_pairs(ds, "text", "doc_id", max_hamming=3).to_pandas()
    s = set(map(tuple, pairs[["id_a", "id_b"]].values.tolist()))
    assert (0, 25) in s


def test_ngram_jaccard_bounds():
    assert ngram_jaccard("a b c d e", "a b c d e") == 1.0
    assert ngram_jaccard("a b c d e", "x y z w v") == 0.0


def test_embedding_dup_pairs_symmetric_and_thresholded():
    vecs = [[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [-1.0, 0.0]]
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    )
    pairs = embedding_dup_pairs(ds, "embedding", "vec_id", threshold=0.9).to_pandas()
    assert set(map(tuple, pairs[["id_a", "id_b"]].values.tolist())) == {(0, 1)}


def test_embedding_dup_pairs_no_driver_materialization(monkeypatch):
    # the block-pair join must never gather the corpus on the driver
    vecs = [[1.0, 0.0], [0.99, 0.14], [0.0, 1.0], [-1.0, 0.0]]
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                  "embedding": pa.array(vecs, pa.list_(pa.float32()))})
    )

    def _boom(self, *a, **k):
        raise AssertionError("driver-side to_pandas in embedding_dup_pairs")

    monkeypatch.setattr(rd.Dataset, "to_pandas", _boom)
    pairs = embedding_dup_pairs(ds, "embedding", "vec_id", threshold=0.9)
    monkeypatch.undo()
    got = pairs.to_pandas()
    assert set(map(tuple, got[["id_a", "id_b"]].values.tolist())) == {(0, 1)}


def test_embedding_dup_pairs_lsh_planted_dups():
    from anonymization_ray.extras.dedup import embedding_dup_pairs_lsh

    rng = np.random.Generator(np.random.Philox(key=3))
    base = rng.standard_normal((40, 16))
    ids = list(range(40)) + [i + 1000 for i in range(40)]
    vecs = np.concatenate([base, base * 2.0])  # planted exact-direction dups
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float64()))})
    ).repartition(4)
    got = embedding_dup_pairs_lsh(ds, "embedding", "vec_id", threshold=0.95).to_pandas()
    assert set(map(tuple, got[["id_a", "id_b"]].values.tolist())) == {
        (i, i + 1000) for i in range(40)
    }


def test_lsh_topk_recall_vs_brute_force():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = rd.from_arrow(t)
    q = np.stack(t.column("embedding").to_pylist()[:5])
    qids = np.array(t.column("vec_id").to_pylist()[:5])
    bf = brute_force_topk(ds, q, qids, k=10).to_pandas()
    # short signatures + many tables: this corpus is near-uniform random
    # (top-10 cosines ~0.3-0.45), the hardest regime for hyperplane LSH
    ap = lsh_topk(ds, q, qids, k=10, n_planes=4, n_tables=16).to_pandas()
    recalls = []
    for qid in qids:
        want = set(bf[bf.query_id == qid]["vec_id"])
        got = set(ap[ap.query_id == qid]["vec_id"])
        recalls.append(len(want & got) / len(want))
    assert np.mean(recalls) >= 0.5  # far above random (10/500 = 0.02)


def test_language_id_deterministic():
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                  "text": ["the cat is on the mat and it is fine", "der hund ist das tier und die katze"]})
    )
    a = language_id(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    assert a["lang_pred"].tolist() == ["en", "de"]


def test_winnowing_fingerprint_robust_to_suffix_edit():
    base = "the quick brown fox jumps over the lazy dog " * 8
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": [base, base + " extra"]})
    )
    fp = fingerprints(ds, "text", "doc_id").to_pandas().set_index("doc_id")
    a, b = set(fp.loc[1, "winnow_fp"]), set(fp.loc[2, "winnow_fp"])
    assert fp.loc[1, "md5"] != fp.loc[2, "md5"]
    assert len(a & b) / len(a | b) > 0.8  # fingerprints mostly shared


def test_multimodal_plumbing():
    ds = rd.from_arrow(pa.table({"item_id": pa.array(range(10), pa.int64())}))
    with_media = attach_fake_media(ds, "item_id", payload_bytes=256)
    out = decode_media(with_media, fake=True, feature_dim=8, concurrency=2, batch_size=4)
    df = out.to_pandas().sort_values("item_id")
    assert "media" not in df.columns  # payload dropped after decode
    assert all(len(f) == 8 for f in df["media_features"])
    # deterministic features
    df2 = decode_media(
        attach_fake_media(ds.repartition(3), "item_id", payload_bytes=256),
        fake=True, feature_dim=8,
    ).to_pandas().sort_values("item_id")
    assert all(
        np.array_equal(x, y) for x, y in zip(df["media_features"], df2["media_features"])
    )


def test_multimodal_real_decode_is_gated():
    from anonymization_ray.extras.multimodal import MediaDecoder

    dec = MediaDecoder(fake=False)
    with pytest.raises(NotImplementedError):
        dec._decode(b"payload")


def test_png_roundtrip_and_header_probe():
    from anonymization_ray.extras.multimodal import (
        attach_media,
        decode_png_gray,
        encode_png_gray,
        parse_image_header,
        probe_media_meta,
    )

    # pixel-exact pure-python PNG round trip
    rng = np.random.Generator(np.random.Philox(key=9))
    px = rng.integers(0, 256, (17, 23), dtype=np.uint8)
    payload = encode_png_gray(px)
    assert parse_image_header(payload) == {
        "mime": "image/png", "width": 23, "height": 17, "duration_ms": 0
    }
    assert np.array_equal(decode_png_gray(payload), px)
    # GIF + JPEG header probing (hand-built headers)
    import struct

    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10
    assert parse_image_header(gif)["width"] == 320
    jpeg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 10
    jpeg += b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", 240, 360) + b"\x00" * 4
    got = parse_image_header(jpeg)
    assert (got["mime"], got["width"], got["height"]) == ("image/jpeg", 360, 240)

    # Ray stages: attach real PNGs -> probe headers -> REAL decode features
    from anonymization_ray.extras.multimodal import decode_media

    ds = rd.from_arrow(pa.table({"item_id": pa.array(range(6), pa.int64())}))
    media = attach_media(ds, "item_id", width=24, height=16)
    probed = probe_media_meta(media).to_pandas().sort_values("item_id")
    assert all(m["mime"] == "image/png" for m in probed["media_meta"])
    assert all(m["width"] == 24 and m["height"] == 16 for m in probed["media_meta"])
    # fake=False: PNG decode is real (no codec needed), so no gate trips
    feats = decode_media(
        attach_media(ds, "item_id", width=24, height=16), fake=False, feature_dim=9
    ).to_pandas().sort_values("item_id")
    assert all(len(f) == 9 for f in feats["media_features"])
    assert all(0.0 <= v <= 1.0 for f in feats["media_features"] for v in f)


def test_jpeg_flat_blocks_decode_to_closed_form():
    from anonymization_ray.extras.jpeg import decode_jpeg_gray, encode_jpeg_gray

    for doc_id in (0, 1, 7, 123456, 10**9 + 7):
        px = np.empty((16, 16), dtype=np.uint8)
        expected = np.empty((16, 16), dtype=np.int64)
        for b in range(4):
            r, c = divmod(b, 2)
            g = (doc_id * 37 + b * 59) % 256
            px[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = g
            expected[r * 8:(r + 1) * 8, c * 8:(c + 1) * 8] = int(
                np.clip(3 * round((g - 128) / 3) + 128, 0, 255)
            )
        out = decode_jpeg_gray(encode_jpeg_gray(px))
        assert np.array_equal(out.astype(np.int64), expected)


def test_jpeg_roundtrip_bounded_error_and_probe():
    from anonymization_ray.extras.jpeg import decode_jpeg_gray, encode_jpeg_gray
    from anonymization_ray.extras.multimodal import parse_image_header

    # smooth content survives quantization with small error; shape preserved
    y, x = np.mgrid[0:24, 0:32]
    img = ((y * 5 + x * 3) % 256).astype(np.uint8)
    payload = encode_jpeg_gray(img)
    out = decode_jpeg_gray(payload)
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 12
    # the encoder's own output header-probes correctly
    got = parse_image_header(payload)
    assert (got["mime"], got["width"], got["height"]) == ("image/jpeg", 32, 24)


def test_jpeg_progressive_and_color_still_gated():
    from anonymization_ray.extras.jpeg import decode_jpeg_gray, encode_jpeg_gray
    from anonymization_ray.extras.multimodal import MediaDecoder
    import struct

    # progressive (SOF2) trips the honest codec gate
    sof2 = (b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 11) + b"\x08"
            + struct.pack(">HH", 8, 8) + b"\x01\x01\x11\x00" + b"\xff\xd9")
    with pytest.raises(NotImplementedError):
        decode_jpeg_gray(sof2)
    # fake=False MediaDecoder: baseline grayscale JPEG decodes FOR REAL,
    # progressive falls through to the gate
    dec = MediaDecoder(fake=False, feature_dim=4)
    feats = dec._decode(encode_jpeg_gray(np.full((8, 8), 200, dtype=np.uint8)))
    assert len(feats) == 4 and all(0.0 <= v <= 1.0 for v in feats)
    with pytest.raises(NotImplementedError):
        dec._decode(sof2)


def test_jpeg_stats_stage_matches_closed_form():
    from anonymization_ray.extras.multimodal import (
        attach_media_jpeg_flat,
        decode_media_stats,
    )

    ds = rd.from_arrow(pa.table({"item_id": pa.array(range(12), pa.int64())}))
    df = (
        decode_media_stats(attach_media_jpeg_flat(ds.repartition(3), "item_id"))
        .to_pandas()
        .sort_values("item_id")
    )
    assert "media" not in df.columns
    for _, row in df.iterrows():
        i = int(row["item_id"])
        want = sum(
            64 * int(np.clip(3 * round(((i * 37 + b * 59) % 256 - 128) / 3) + 128, 0, 255))
            for b in range(4)
        )
        assert (row["width"], row["height"], row["pixel_sum"]) == (16, 16, want)


def test_topk_per_key_matches_pandas():
    from anonymization_ray.util import topk_per_key

    rng = np.random.Generator(np.random.Philox(key=17))
    n = 50_000
    keys = rng.integers(0, 700, n)
    vals = rng.random(n)
    ids = np.arange(n)
    t = pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.float64()),
                  "i": pa.array(ids, pa.int64())})
    got = (
        topk_per_key(rd.from_arrow(t).repartition(16), "k", "v", 5, descending=True, tie_col="i")
        .to_pandas().sort_values(["k", "v", "i"], ascending=[True, False, True]).reset_index(drop=True)
    )
    import pandas as pd
    df = t.to_pandas().sort_values(["k", "v", "i"], ascending=[True, False, True])
    want = df.groupby("k", as_index=False).head(5).reset_index(drop=True)
    assert got.equals(want)


def test_lsh_ann_join_planted_top1():
    from anonymization_ray.extras.similarity import lsh_ann_join

    rng = np.random.Generator(np.random.Philox(key=23))
    base = rng.standard_normal((60, 16))
    ids = list(range(60)) + [i + 1000 for i in range(60)]
    vecs = np.concatenate([base, base * 2.0])
    ds = rd.from_arrow(
        pa.table({"vec_id": pa.array(ids, pa.int64()),
                  "embedding": pa.array(list(vecs), pa.list_(pa.float64()))})
    ).repartition(4)
    got = lsh_ann_join(ds, k=1).to_pandas()
    # every vector's top-1 neighbor is its exact-direction twin
    m = dict(zip(got["query_id"], got["vec_id"]))
    assert len(m) == 120
    assert all(m[i] == i + 1000 and m[i + 1000] == i for i in range(60))


def test_hll_distinct_within_error():
    from anonymization_ray.extras.stats import count_distinct_exact, hll_count_distinct

    rng = np.random.Generator(np.random.Philox(key=31))
    vals = rng.integers(0, 40_000, 120_000)
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.int64())})).repartition(8)
    exact = count_distinct_exact(ds, "v")
    est = hll_count_distinct(ds, "v", p=12)
    assert exact == len(np.unique(vals))
    # HLL std error ~1.04/sqrt(2^12) ≈ 1.6%; allow 5%
    assert abs(est - exact) / exact < 0.05
    # merge is partitioning-independent
    est2 = hll_count_distinct(ds.repartition(3), "v", p=12)
    assert est == est2


def test_exact_quantiles_duckdb_semantics():
    from anonymization_ray.extras.stats import exact_quantiles

    vals = [5.0, 1.0, 3.0, 2.0, 4.0]
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64()),
                                 "i": pa.array(range(5), pa.int64())}))
    t = exact_quantiles(ds, "v", [0.0, 0.25, 0.5, 0.9, 1.0], id_col="i")
    assert t.column("value").to_pylist() == [1.0, 2.0, 3.0, 5.0, 5.0]


def test_minhash_skew_valve_caps_giant_buckets():
    # 120 identical docs share every band -> one giant bucket per band;
    # the cap drops them from pair generation (exact_dedup owns exact dups)
    # while planted near-dups elsewhere are still found
    texts = [f"unique words number {i} with some shared filler tokens here ok" for i in range(12)]
    texts += [t + " tail" for t in texts[:3]]  # near-dups of 0-2
    texts += ["the same exact giant cluster document body repeated"] * 120
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})).repartition(6)
    capped = minhash_lsh_pairs(ds, "text", "doc_id", bands=32, verify_threshold=0.5,
                               max_bucket=50).to_pandas()
    s = set(map(tuple, capped[["id_a", "id_b"]].values.tolist()))
    for i in range(3):
        assert (i, 12 + i) in s  # near-dups survive the valve
    giant = [p for p in s if p[0] >= 15 and p[1] >= 15]
    assert giant == []  # giant-cluster pairs dropped, not exploded
    # without the cap the giant cluster explodes into 120*119/2 pairs
    uncapped = minhash_lsh_pairs(ds, "text", "doc_id", bands=32, verify_threshold=0.5,
                                 max_bucket=None).to_pandas()
    assert len(uncapped) >= 120 * 119 // 2


def test_asof_join_matches_pandas_merge_asof():
    import pandas as pd
    from anonymization_ray.extras.asof import asof_join

    rng = np.random.Generator(np.random.Philox(key=41))
    nl, nr = 4000, 2500
    ldf = pd.DataFrame({
        "lid": np.arange(nl),
        "k": rng.integers(0, 37, nl),
        "t": rng.integers(0, 50_000, nl),
    })
    rdf = pd.DataFrame({"k": rng.integers(0, 37, nr), "t": rng.integers(0, 50_000, nr)})
    rdf = rdf.drop_duplicates(["k", "t"]).reset_index(drop=True)
    rdf["rv"] = rng.random(len(rdf)).round(4)
    left = rd.from_arrow(pa.Table.from_pandas(ldf, preserve_index=False)).repartition(7)
    right = rd.from_arrow(pa.Table.from_pandas(rdf, preserve_index=False)).repartition(5)
    got = (
        asof_join(left, right, key_col="k", time_col="t", right_cols=["rv"], left_cols=["lid"])
        .to_pandas().sort_values("lid").reset_index(drop=True)
    )
    want = (
        pd.merge_asof(ldf.sort_values("t"), rdf.sort_values("t"), on="t", by="k",
                      direction="backward")
        .sort_values("lid").reset_index(drop=True)
    )
    assert len(got) == len(want)
    assert ((got["rv"].isna() & want["rv"].isna()) | (got["rv"] == want["rv"])).all()


def test_ivf_topk_full_probe_equals_brute_force():
    """nprobe == nlist probes every inverted list, so the IVF machinery must
    reproduce exact brute force bit-for-bit."""
    import pyarrow.parquet as pq
    from anonymization_ray.extras.similarity import ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    ds = rd.from_arrow(t).repartition(4)
    q = np.stack(t.column("embedding").to_pylist()[:5])
    qids = np.array(t.column("vec_id").to_pylist()[:5])
    bf = (
        brute_force_topk(ds, q, qids, k=10).to_pandas()
        .sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    ivf = (
        ivf_topk(ds, q, qids, k=10, nlist=8, nprobe=8).to_pandas()
        .sort_values(["query_id", "vec_id"]).reset_index(drop=True)
    )
    import pandas as pd
    pd.testing.assert_frame_equal(ivf, bf)


def test_ivf_topk_pruned_recall():
    """Small-nprobe IVF on near-uniform random embeddings: recall well above
    random, and every query's planted twin (same direction => same nearest
    centroid) is found even at nprobe=1."""
    import pyarrow.parquet as pq
    from anonymization_ray.extras.similarity import ivf_topk

    t = pq.read_table(f"{SF}/embeddings.parquet")
    base_ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    twins = pa.table({
        "vec_id": pa.array([i + 1_000_000 for i in base_ids[:5]], pa.int64()),
        "embedding": pa.array([[x * 2.0 for x in v] for v in vecs[:5]],
                              t.column("embedding").type),
    })
    ds = rd.from_arrow(pa.concat_tables([t.select(["vec_id", "embedding"]), twins])).repartition(4)
    q = np.stack(vecs[:5])
    qids = np.array(base_ids[:5])
    got = ivf_topk(ds, q, qids, k=10, nlist=16, nprobe=1).to_pandas()
    for qid in qids:
        assert qid + 1_000_000 in set(got[got.query_id == qid]["vec_id"])
    # pruned recall vs brute force stays far above the ~2% random floor
    bf = brute_force_topk(ds, q, qids, k=10).to_pandas()
    ap = ivf_topk(ds, q, qids, k=10, nlist=16, nprobe=4).to_pandas()
    recalls = []
    for qid in qids:
        want = set(bf[bf.query_id == qid]["vec_id"])
        recalls.append(len(want & set(ap[ap.query_id == qid]["vec_id"])) / len(want))
    assert np.mean(recalls) >= 0.4


def test_group_quantiles_matches_pandas():
    """Randomized per-key quantiles vs pandas groupby.quantile(lower), with
    few keys over many small blocks so key runs SPAN block boundaries (the
    re-gather path), plus nulls/NaNs dropped."""
    import pandas as pd
    from anonymization_ray.extras.stats import group_quantiles

    rng = np.random.Generator(np.random.Philox(key=77))
    n = 20_000
    df = pd.DataFrame({
        "k": rng.integers(0, 7, n),        # 7 keys, every one spans blocks
        "v": rng.random(n).round(6),
    })
    df.loc[rng.choice(n, 300, replace=False), "v"] = np.nan
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(16)
    qs = [0.25, 0.5, 0.75]
    got = (
        group_quantiles(ds, "k", "v", qs).to_pandas()
        .sort_values(["k", "q"]).reset_index(drop=True)
    )
    want_rows = []
    for k, g in df.dropna().groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        for q in qs:
            want_rows.append((k, q, vals[max(0, int(np.ceil(q * len(vals))) - 1)]))
    want = pd.DataFrame(want_rows, columns=["k", "q", "value"]).sort_values(
        ["k", "q"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got.astype({"k": "int64"}), want.astype({"k": "int64"}))


def test_semi_anti_join_paths_agree():
    """Broadcast and shuffle paths give identical membership results; null
    keys never match (SQL IN semantics) and null left keys survive only
    anti."""
    import pandas as pd
    from anonymization_ray.extras.joins import semi_anti_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, None, 6], pa.int64()),
        "v": pa.array(list("abcdef")),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, None, 7], pa.int64()),
    })).repartition(2)

    def run(anti, broadcast):
        return (
            semi_anti_join(left, right, on="k", right_on="rk",
                           anti=anti, broadcast=broadcast)
            .to_pandas().sort_values("v").reset_index(drop=True)
        )

    semi_b = run(False, True)
    assert semi_b["v"].tolist() == ["b", "d"]
    anti_b = run(True, True)
    assert anti_b["v"].tolist() == ["a", "c", "e", "f"]  # null left key kept
    pd.testing.assert_frame_equal(semi_b, run(False, False))
    # Ray's native left_anti drops null left keys; the broadcast path follows
    # SQL NOT EXISTS (null can't match => kept) — compare on non-null keys
    anti_s = run(True, False)
    assert set(anti_s["v"]) - {"e"} == {"a", "c", "f"}

    # real-table agreement at sf: customers with no high-value order
    import pyarrow.compute as pc
    cust = rd.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey"])
    orders = rd.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t.column("o_totalprice"), 300000.0)),
        batch_format="pyarrow",
    )
    a = sorted(r["c_custkey"] for r in semi_anti_join(
        cust, orders, on="c_custkey", right_on="o_custkey", anti=True).take_all())
    b = sorted(r["c_custkey"] for r in semi_anti_join(
        cust, orders, on="c_custkey", right_on="o_custkey", anti=True,
        broadcast=False).take_all())
    assert a == b and len(a) > 0


def test_interval_join_matches_bruteforce():
    import pandas as pd
    from anonymization_ray.extras.asof import interval_join

    rng = np.random.Generator(np.random.Philox(key=43))
    npts, niv = 3000, 800
    pdf = pd.DataFrame({
        "pid": np.arange(npts),
        "k": rng.integers(0, 29, npts),
        "ts": rng.integers(0, 100_000, npts),
    })
    ivdf = pd.DataFrame({
        "iid": np.arange(niv),
        "k": rng.integers(0, 29, niv),
        "start": rng.integers(0, 100_000, niv),
    })
    # spans from sub-granule to several granules (granule=1000) + some empty
    ivdf["end"] = ivdf["start"] + rng.integers(-50, 3500, niv)
    pts = rd.from_arrow(pa.Table.from_pandas(pdf, preserve_index=False)).repartition(6)
    ivs = rd.from_arrow(pa.Table.from_pandas(ivdf, preserve_index=False)).repartition(4)
    got = (
        interval_join(pts, ivs, key_col="k", ts_col="ts", start_col="start",
                      end_col="end", granule_us=1000, num_partitions=4)
        .to_pandas()[["pid", "iid"]]
        .sort_values(["pid", "iid"]).reset_index(drop=True)
    )
    want = (
        pdf.merge(ivdf, on="k")
        .query("ts >= start and ts < end")[["pid", "iid"]]
        .sort_values(["pid", "iid"]).reset_index(drop=True)
    )
    assert len(want) > 500  # the fixture actually exercises the join
    pd.testing.assert_frame_equal(got, want)


def test_ngram_jaccard_exact_pairs_and_df_valve():
    from anonymization_ray.extras.dedup import ngram_jaccard_pairs

    ds = _docs_with_planted_dups()
    # this corpus is mostly shared boilerplate (docs differ only in their
    # docN shingles), so at 0.9 ONLY the planted near/exact dups qualify:
    # (i, 20+i) for i<5, plus the exact copy (0, 25) and its transitive
    # near-pair (20, 25)
    pairs = ngram_jaccard_pairs(ds, "text", "doc_id", threshold=0.9).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert got == {(i, 20 + i) for i in range(5)} | {(0, 25), (20, 25)}
    # exact dup pair must have jaccard exactly 1.0
    j = pairs.set_index(["id_a", "id_b"])["jaccard"]
    assert j[(0, 25)] == 1.0
    assert j[(1, 21)] < 1.0  # near-dup, not exact

    # df valve: every shingle here is shared by >= the dup fan-in; with a
    # df cap of 1 all shingles drop and no pairs survive — the valve is an
    # explicit exactness deviation, applied only when requested
    none = ngram_jaccard_pairs(
        ds, "text", "doc_id", threshold=0.5, max_shingle_df=1
    ).to_pandas()
    assert len(none) == 0


def test_cluster_keepers_transitive_chains():
    # chains A-B, B-C, C-D must all resolve to min(A) even though no direct
    # pair links the endpoints — the oracle corpus only plants size-2
    # clusters, so transitivity is covered here. Both component paths
    # (driver union-find and distributed contraction) must agree.
    from anonymization_ray.extras.dedup import cluster_keepers

    ids = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(10)), pa.int64())}))
    # components: {0,1,2,3} (chain), {5,7} (pair), singletons 4,6,8,9
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2, 3, 7], pa.int64()),
                "id_b": pa.array([0, 1, 2, 5], pa.int64()),
            }
        )
    )
    expect = {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 6, 7: 5, 8: 8, 9: 9}
    got = {
        r["doc_id"]: r["keeper_id"]
        for r in cluster_keepers(ids, pairs, id_col="doc_id").take_all()
    }
    assert got == expect


def test_clean_corpus_gate_and_dedup():
    from anonymization_ray.extras.cleanse import clean_corpus

    # per-doc unique vocabulary so unrelated docs share no shingles
    texts = [" ".join(f"w{i}x{j}" for j in range(44)) for i in range(8)]
    texts += [t + " tail" for t in texts[:3]]  # near-dups of 0-2 (45 tokens)
    texts += ["short text"]  # fails the min_tokens gate
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts}))
    out = clean_corpus(ds, "text", "doc_id", min_tokens=30).to_pandas()
    kept = sorted(out["doc_id"])
    assert kept == list(range(8))  # dups 8-10 dropped, short doc 11 gated
    assert (out.set_index("doc_id")["n_tokens"].loc[list(range(8))] == 44).all()


def test_per_key_window_carry_across_blocks():
    # one hot key spanning several sorted blocks exercises the driver-chained
    # carry (rn / running-sum offsets and the lag halo at block boundaries)
    from anonymization_ray.extras.window import per_key_window
    import pandas as pd

    n = 5000
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "user_id": np.where(np.arange(n) % 10 < 8, 1, np.arange(n) % 10),
            "ts": pd.to_datetime("2024-01-01") + pd.to_timedelta((np.arange(n) * 7919) % 100000, unit="s"),
            "cents": ((np.arange(n) * 37) % 1000).astype(np.int64),
        }
    )
    ds = rd.from_pandas(df).repartition(8)
    got = (
        per_key_window(ds, "user_id", "ts", "event_id", "cents")
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    exp = df.sort_values(["user_id", "ts", "event_id"]).copy()
    g = exp.groupby("user_id", sort=False)
    exp["rn"] = g.cumcount() + 1
    exp["lag_us"] = (exp["ts"] - g["ts"].shift(1)).dt.total_seconds() * 1e6
    exp["cum_val"] = g["cents"].cumsum()
    exp = exp.sort_values("event_id").reset_index(drop=True)
    assert (got["rn"].to_numpy() == exp["rn"].to_numpy()).all()
    assert (got["cum_val"].to_numpy() == exp["cum_val"].to_numpy()).all()
    lg, le = got["lag_us"].to_numpy(dtype=float), exp["lag_us"].to_numpy(dtype=float)
    assert ((np.isnan(lg) & np.isnan(le)) | (lg == le)).all()


def test_cluster_keepers_distributed_path_agrees():
    # the zero-padded int64 key encoding must survive the distributed
    # min-label contraction identically to the driver union-find
    from anonymization_ray.extras.dedup import cluster_keepers

    ids = rd.from_arrow(pa.table({"doc_id": pa.array(list(range(10)), pa.int64())}))
    pairs = rd.from_arrow(
        pa.table(
            {
                "id_a": pa.array([1, 2, 3, 7], pa.int64()),
                "id_b": pa.array([0, 1, 2, 5], pa.int64()),
            }
        )
    )
    drv = {
        r["doc_id"]: r["keeper_id"]
        for r in cluster_keepers(ids, pairs, id_col="doc_id").take_all()
    }
    dist = {
        r["doc_id"]: r["keeper_id"]
        for r in cluster_keepers(
            ids, pairs, id_col="doc_id", force_distributed=True
        ).take_all()
    }
    assert drv == dist == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 6, 7: 5, 8: 8, 9: 9}


def test_pack_sequences_greedy_edges():
    from anonymization_ray.extras.pack import pack_sequences

    # single shard; lens: exact fit, overflow start, oversized doc alone
    lens = [300, 212, 100, 600, 512, 1]
    ids = [10, 20, 30, 40, 50, 60]
    ds = rd.from_arrow(
        pa.table({"i": pa.array(ids, pa.int64()), "L": pa.array(lens, pa.int64())})
    )
    out = (
        pack_sequences(ds, "i", "L", budget=512, num_shards=1)
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # 300+212 = 512 exact fit -> bin 0; 100 opens bin 1; 600 oversized alone
    # in bin 2; 512 exactly fills bin 3; 1 opens bin 4
    assert out["bin"].tolist() == [0, 0, 1, 2, 3, 4]
    assert out["pos"].tolist() == [0, 1, 0, 0, 0, 0]
    assert (out["shard"] == 0).all()


def test_sum_per_key_matches_pandas():
    from anonymization_ray.extras.graph import sum_per_key

    rng = np.random.default_rng(9)
    n = 5000
    keys = rng.integers(0, 800, n)
    vals = rng.integers(-50, 50, n)
    ds = rd.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64()), "v": pa.array(vals, pa.int64())})
    ).repartition(7)
    got = sum_per_key(ds, "k", "v").to_pandas().sort_values("k").reset_index(drop=True)
    import pandas as pd

    want = (
        pd.DataFrame({"k": keys, "v": vals}).groupby("k", as_index=False)["v"].sum()
        .sort_values("k").reset_index(drop=True)
    )
    assert got["k"].tolist() == want["k"].tolist()
    assert got["v"].tolist() == want["v"].tolist()


def test_pagerank_int_matches_numpy_reference():
    """Distributed integer PageRank == the sequential integer recurrence on a
    random sparse digraph (exact int equality — that's the point of the
    integer formulation)."""
    from anonymization_ray.extras.graph import PR_SCALE, pagerank_int

    rng = np.random.default_rng(4)
    n, m = 60, 300
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(5)
    got = (
        pagerank_int(edges, iterations=3)
        .to_pandas().sort_values("node").reset_index(drop=True)
    )

    nodes = np.unique(np.concatenate([src, dst]))
    outdeg = {u: 0 for u in nodes}
    for u in src:
        outdeg[u] += 1
    r = {u: PR_SCALE for u in nodes}
    base = (15 * PR_SCALE) // 100
    for _ in range(3):
        s = {u: 0 for u in nodes}
        for u, v in zip(src, dst):
            s[v] += r[u] // outdeg[u]
        r = {u: base + (85 * s[u]) // 100 for u in nodes}
    want = {int(u): int(r[u]) for u in nodes}
    assert len(got) == len(nodes)
    assert {int(a): int(b) for a, b in zip(got["node"], got["rank"])} == want


def test_triangle_count_sparse_matches_bruteforce():
    from itertools import combinations

    from anonymization_ray.extras.graph import triangle_count

    rng = np.random.default_rng(11)
    n = 40
    pairs = [(a, b) for a, b in combinations(range(n), 2) if rng.random() < 0.15]
    adj = set(pairs)
    want = sum(
        1
        for x, y, z in combinations(range(n), 3)
        if (x, y) in adj and (y, z) in adj and (x, z) in adj
    )
    a = np.array([p[0] for p in pairs], np.int64)
    b = np.array([p[1] for p in pairs], np.int64)
    edges = rd.from_arrow(pa.table({"a": pa.array(a), "b": pa.array(b)})).repartition(4)
    got = triangle_count(edges).to_pandas()["triangles"].iloc[0]
    assert want > 0 and int(got) == want


def test_bm25_postings_and_ranking():
    """Postings match a per-doc Python tokenize; integer BM25 ranks by the
    float reference ordering on a planted corpus (rare term dominates)."""
    from collections import Counter

    from anonymization_ray.extras.retrieval import bm25_topk, build_postings

    texts = [
        "needle haystack common words common words",
        "needle needle haystack common",
        "common words only here today",
        "haystack haystack common words here",
        "needle alone",
    ]
    ids = list(range(len(texts)))
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})).repartition(2)

    got = build_postings(ds, "text", "doc_id").to_pandas()
    for i, t in enumerate(texts):
        want = Counter(t.lower().split())
        sub = got[got.doc_id == i]
        assert dict(zip(sub.term, sub.tf)) == dict(want)
        assert (sub.dl == len(t.split())).all()

    top = bm25_topk(ds, ["needle"], k=3).to_pandas()
    # float BM25 (Lucene idf) reference ordering
    import math as m

    n, L = 5, sum(len(t.split()) for t in texts)
    df = 3
    idf = m.log(1 + (n - df + 0.5) / (df + 0.5))
    def score(i):
        tf = texts[i].split().count("needle")
        dl = len(texts[i].split())
        return idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl * n / L))
    want_order = sorted((i for i in ids if "needle" in texts[i].split()),
                        key=lambda i: (-score(i), i))[:3]
    assert top["doc_id"].tolist() == want_order
    assert (top["score"] > 0).all()


def test_repetition_stats_counts():
    """Exact bigram totals/distincts per doc; <2-token docs emit no row;
    counts are case-insensitive and whitespace-normalized."""
    from anonymization_ray.extras.textstats import repetition_stats

    texts = [
        "the cat sat the cat sat",  # bigrams: the-cat, cat-sat, sat-the, the-cat, cat-sat -> 5 total, 3 distinct
        "a b a b a",  # a-b, b-a, a-b, b-a -> 4 total, 2 distinct
        "one",  # no bigrams
        "  Mixed   CASE mixed case ",  # mixed-case, case-mixed, mixed-case -> 3 total, 2 distinct
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(4), pa.int64()), "text": texts})
    ).repartition(2)
    got = (
        repetition_stats(ds, "text", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [0, 1, 3]
    assert got.n_bigrams.tolist() == [5, 4, 3]
    assert got.n_distinct.tolist() == [3, 2, 2]
    assert got.n_dup.tolist() == [2, 2, 1]


def test_redact_text_pii_rules():
    """Planted PII of every default-rule kind is scrubbed; counts equal the
    number of replacements; clean text passes through byte-identical."""
    from anonymization_ray.extras.redact import PII_RULES, redact_text

    texts = [
        "contact john.doe+spam@example.co.uk or jane@x.io today",
        "ssn 123-45-6789 leaked next to phone +1 (650) 555-0199",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "nothing sensitive in this sentence at all",
        "call 0043 1 5320444 now",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(5), pa.int64()), "text": texts})
    ).repartition(2)
    got = (
        redact_text(ds, PII_RULES).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.text_redacted[0] == "contact <EMAIL> or <EMAIL> today"
    assert got.text_redacted[1] == "ssn <SSN> leaked next to phone <PHONE>"
    assert got.text_redacted[2] == "server at <IP> and <IP> responded"
    assert got.text_redacted[3] == texts[3]
    assert got.text_redacted[4] == "call <PHONE> now"
    assert got.n_redactions.tolist() == [2, 2, 2, 0, 1]


def test_decontaminate_trigram_hits():
    """Docs sharing a trigram with the benchmark set are flagged with exact
    occurrence counts; clean docs emit no row; n-grams never span docs."""
    from anonymization_ray.extras.decontaminate import decontaminate, ngram_set

    bench = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0], pa.int64()),
                "text": ["the quick brown fox jumps"],
            }
        )
    )
    corpus = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": [
                    # "the quick brown" + "quick brown fox" -> 2 hits
                    "see the quick brown fox run",
                    # same trigram twice -> counts occurrences, not distinct
                    "brown fox jumps and brown fox jumps",
                    "totally unrelated words here",
                    # case/whitespace normalization matches
                    "  THE   Quick BROWN  fox  ",
                ],
            }
        )
    ).repartition(2)
    grams = ngram_set(bench, "text", 3)
    assert len(grams) == 3  # quick-brown-fox window of a 5-token doc
    got = (
        decontaminate(corpus, grams, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 2, 4]
    # doc1: "the quick brown","quick brown fox" = 2; doc2: "brown fox jumps" x2
    assert got.n_hits.tolist() == [2, 2, 2]


def test_deterministic_shuffle_is_partition_invariant_bijection():
    from anonymization_ray.extras.shuffle import deterministic_shuffle

    ids = pa.table({"doc_id": pa.array(range(200), pa.int64())})
    a = (
        deterministic_shuffle(rd.from_arrow(ids), "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        deterministic_shuffle(rd.from_arrow(ids).repartition(7), "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert a.pos.tolist() == b.pos.tolist()  # pure function of ids
    assert sorted(a.pos) == list(range(1, 201))  # bijection onto 1..N
    assert a.pos.tolist() != list(range(1, 201))  # actually shuffled
    # a different salt produces a different order
    c = deterministic_shuffle(rd.from_arrow(ids), "doc_id", salt=1).to_pandas()
    c = c.sort_values("doc_id").reset_index(drop=True)
    assert c.pos.tolist() != a.pos.tolist()


def test_split_assign_stable_and_proportional():
    from anonymization_ray.extras.shuffle import split_assign

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    ids = pa.table({"doc_id": pa.array(range(5000), pa.int64())})
    a = (
        split_assign(rd.from_arrow(ids), "doc_id", fr, salt=7)
        .to_pandas().set_index("doc_id")["split"]
    )
    counts = a.value_counts()
    assert 0.77 < counts["train"] / 5000 < 0.83
    assert 0.07 < counts["val"] / 5000 < 0.13
    # growing the corpus never moves an existing doc between splits
    ids2 = pa.table({"doc_id": pa.array(range(8000), pa.int64())})
    b = (
        split_assign(rd.from_arrow(ids2).repartition(5), "doc_id", fr, salt=7)
        .to_pandas().set_index("doc_id")["split"]
    )
    assert (b.loc[a.index] == a).all()


def test_chunk_documents_windows():
    from anonymization_ray.extras.chunk import chunk_documents

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a b c d e f g",  # 7 tokens
                "x y",  # fits in one chunk
                "",  # no tokens -> no row
            ],
        }
    )
    # non-overlapping size 3: doc1 -> [a b c][d e f][g]
    got = (
        chunk_documents(rd.from_arrow(t).repartition(2), size=3)
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 1, 1, 2]
    assert got.chunk_text.tolist() == ["a b c", "d e f", "g", "x y"]
    assert got.n_tokens.tolist() == [3, 3, 1, 2]
    # stride 2 < size 3: windows [a b c][c d e][e f g] — last window reaches
    # the end, no degenerate tail
    ov = (
        chunk_documents(rd.from_arrow(t), size=3, stride=2)
        .to_pandas().sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
    )
    assert ov[ov.doc_id == 1].chunk_text.tolist() == ["a b c", "c d e", "e f g"]


def test_mixture_sample_weights_and_determinism():
    from anonymization_ray.extras.shuffle import mixture_sample

    t = pa.table(
        {
            "doc_id": pa.array(range(4000), pa.int64()),
            "source": pa.array(
                ["a", "b", "c", "d"] * 1000, pa.string()
            ),
        }
    )
    w = {"a": 3.0, "b": 0.5, "c": 0.0}  # d takes the default 1.0
    got = (
        mixture_sample(rd.from_arrow(t), "source", w, "doc_id", default=1.0)
        .to_pandas()
    )
    by = got.groupby("source").size()
    assert by["a"] == 3000  # integral weight: exactly floor(w) copies each
    assert "c" not in by.index  # weight 0 drops the source entirely
    assert by["d"] == 1000
    assert 350 < by["b"] < 650  # ~half kept by hash threshold
    # copy_idx enumerates copies 0..cnt-1
    a_copies = got[got.source == "a"].groupby("doc_id").copy_idx.apply(sorted)
    assert all(c == [0, 1, 2] for c in a_copies)
    # pure function of (id, source): re-sharding changes nothing
    got2 = (
        mixture_sample(
            rd.from_arrow(t).repartition(7), "source", w, "doc_id", default=1.0
        )
        .to_pandas()
    )
    key = ["doc_id", "source", "copy_idx"]
    assert (
        got.sort_values(key).reset_index(drop=True)[key]
        .equals(got2.sort_values(key).reset_index(drop=True)[key])
    )


def test_duplicate_span_stats_first_occurrence_wins():
    from anonymization_ray.extras.dedup import duplicate_span_stats

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": [
                "a b c d e",        # grams: "a b c", "b c d", "c d e" — all first
                "a b c x y z",      # "a b c" dups doc1; others new
                "a b c d e f",      # "a b c","b c d","c d e" dup; "d e f" new
            ],
        }
    )
    got = (
        duplicate_span_stats(rd.from_arrow(t).repartition(3), "text", "doc_id", n=3)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    assert got.doc_id.tolist() == [1, 2, 3]
    assert got.n_grams.tolist() == [3, 4, 4]
    assert got.n_dup.tolist() == [0, 1, 3]
    # within-doc repeats beyond the first occurrence also count
    t2 = pa.table(
        {"doc_id": pa.array([7], pa.int64()), "text": ["p q r p q r p q r"]}
    )
    one = duplicate_span_stats(rd.from_arrow(t2), "text", "doc_id", n=3).to_pandas()
    # grams: pqr qrp rpq pqr qrp rpq pqr -> 7 total, 3 distinct firsts, 4 dups
    assert one.n_grams.tolist() == [7]
    assert one.n_dup.tolist() == [4]


def test_semi_anti_join_empty_right():
    """Empty right side: anti keeps every left row, semi keeps none —
    regression test for the schema-less empty-dataset path."""
    from anonymization_ray.extras.joins import semi_anti_join

    left = rd.from_arrow(
        pa.table({"k": pa.array([1, 2, 3], pa.int64()), "v": ["a", "b", "c"]})
    )
    empty = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())})).filter(
        lambda r: False
    )
    kept = semi_anti_join(left, empty, on="k", anti=True).to_pandas()
    assert sorted(kept.k) == [1, 2, 3]
    none = semi_anti_join(left, empty, on="k").to_pandas()
    assert len(none) == 0


def test_normalize_text_kernels():
    from anonymization_ray.extras.textstats import normalize_text

    texts = [
        "Café   du\tmonde\r\n",  # combining accent -> NFC, ws collapse
        "ok already",
        "ctrl\x00chars\x07here",
    ]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": texts})
    )
    got = normalize_text(ds, "text", "doc_id").to_pandas().sort_values("doc_id")
    want0 = "Café du monde"  # COMPOSED e-acute: NFC must compose the input
    assert [s.encode("unicode_escape") for s in got.text_norm] == [
        want0.encode("unicode_escape"),
        b"ok already",
        b"ctrlcharshere",
    ]
    assert got.changed.tolist() == [1, 0, 1]


def test_unigram_nll_matches_python():
    import math

    from anonymization_ray.extras.textstats import unigram_nll

    texts = ["a a b", "b c", ""]
    # corpus counts: a=2, b=2, c=1; N=5
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array(range(3), pa.int64()), "text": texts})
    ).repartition(2)
    got = (
        unigram_nll(ds, "text", "doc_id")
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    def tok_nll(c, n=5):
        return math.floor(1_000_000 * (math.log(float(n)) - math.log(float(c))))
    want0 = 2 * tok_nll(2) + tok_nll(2)   # a a b
    want1 = tok_nll(2) + tok_nll(1)       # b c
    assert got.doc_id.tolist() == [0, 1]  # empty doc emits no row
    assert got.n_tokens.tolist() == [3, 2]
    assert got.nll_micro.tolist() == [want0, want1]


def test_unigram_nll_zero_token_corpus():
    from anonymization_ray.extras.textstats import unigram_nll

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["   ", ""]})
    )
    got = unigram_nll(ds, "text", "doc_id").to_pandas()
    assert len(got) == 0


def test_split_assign_degenerate_trailing_zero_fraction():
    from anonymization_ray.extras.shuffle import split_assign

    ids = pa.table({"doc_id": pa.array(list(range(50)), pa.int64())})
    got = (
        split_assign(rd.from_arrow(ids), "doc_id", {"train": 1.0, "val": 0.0}, salt=3)
        .to_pandas()
    )
    assert (got["split"] == "train").all()


def test_duplicate_span_stats_rejects_oversized_ids():
    import pytest as _pytest

    from anonymization_ray.extras.dedup import duplicate_span_stats

    big = (1 << 62) + 5
    t = pa.table(
        {
            "doc_id": pa.array([big], pa.int64()),
            "text": ["a b c d e f g"],
        }
    )
    with _pytest.raises(Exception, match="doc ids"):
        duplicate_span_stats(rd.from_arrow(t), "text", "doc_id", n=3).to_pandas()


def test_bfs_hops_frontier_semantics():
    from anonymization_ray.extras.graph import bfs_hops

    # path 1-2-3-4-5 plus an unreachable 9-10 component; undirected
    und = [(1, 2), (2, 3), (3, 4), (4, 5), (9, 10)]
    src = [a for a, b in und] + [b for a, b in und]
    dst = [b for a, b in und] + [a for a, b in und]
    edges = rd.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    )
    got = bfs_hops(edges, [1], 3).to_pandas().set_index("node")["dist"].to_dict()
    # max_hops bound: node 5 (dist 4) absent; other component absent
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}

    # multi-seed takes the minimum distance over seeds
    got2 = bfs_hops(edges, [1, 5], 3).to_pandas().set_index("node")["dist"].to_dict()
    assert got2 == {1: 0, 5: 0, 2: 1, 4: 1, 3: 2}


def test_dsir_logweights_target_shift():
    from anonymization_ray.extras.textstats import dsir_logweights

    # target rows favour the token "good"; raw adds "bad"-heavy rows
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": ["good good", "good bad", "bad bad", "good"],
            "lang": ["en", "en", "xx", "xx"],
        }
    )
    got = (
        dsir_logweights(rd.from_arrow(t), "text", "doc_id", "lang", "en")
        .to_pandas()
        .set_index("doc_id")
    )
    assert got.loc[1, "n_tokens"] == 2 and got.loc[3, "n_tokens"] == 2
    # "good"-docs score strictly higher than "bad"-docs; same doc-length
    assert got.loc[1, "logw_micro"] > got.loc[3, "logw_micro"]
    # per-term weights are integers summed per doc: doc 4 = half of doc 1
    assert got.loc[1, "logw_micro"] == 2 * got.loc[4, "logw_micro"]


def test_wav_roundtrip_probe_and_gates():
    import numpy as np
    import struct as _struct

    from anonymization_ray.extras.multimodal import (
        decode_wav_pcm16,
        encode_wav_pcm16,
        parse_wav_header,
        probe_media_meta,
    )

    s = ((np.arange(123) * 91) % 4001 - 2000).astype(np.int16)
    payload = encode_wav_pcm16(s, rate=16000)
    back, rate = decode_wav_pcm16(payload)
    assert rate == 16000 and np.array_equal(back, s)

    meta = parse_wav_header(payload)
    assert meta["mime"] == "audio/wav"
    assert meta["duration_ms"] == 123 * 1000 // 16000

    # probe stage dispatches WAV alongside the image formats
    t = pa.table({"doc_id": pa.array([1], pa.int64()), "media": pa.array([payload], pa.binary())})
    got = probe_media_meta(rd.from_arrow(t)).to_pandas()["media_meta"][0]
    assert got["mime"] == "audio/wav"

    # honest gate: stereo / non-PCM payloads refuse rather than fake
    fmt = _struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)  # 2 channels
    body = b"WAVE" + b"fmt " + _struct.pack("<I", len(fmt)) + fmt
    body += b"data" + _struct.pack("<I", 4) + b"\x00\x00\x00\x00"
    stereo = b"RIFF" + _struct.pack("<I", len(body)) + body
    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(stereo)
    assert parse_wav_header(stereo) is None
    with pytest.raises(ValueError):
        decode_wav_pcm16(b"RIFX1234")


def test_y4m_roundtrip_framesample_and_gates():
    import numpy as np

    from anonymization_ray.extras.multimodal import (
        decode_y4m_gray,
        encode_y4m_gray,
        sample_video_frames,
    )

    frames = ((np.arange(5 * 8 * 8) * 7) % 256).astype(np.uint8).reshape(5, 8, 8)
    payload = encode_y4m_gray(frames, fps=30)
    back, fps = decode_y4m_gray(payload)
    assert fps == 30 and np.array_equal(back, frames)

    t = pa.table({"doc_id": pa.array([1], pa.int64()), "media": pa.array([payload], pa.binary())})
    got = sample_video_frames(rd.from_arrow(t), stride=2).to_pandas().iloc[0]
    assert got["n_frames"] == 5 and got["frames_sampled"] == 3
    assert got["sampled_pixel_sum"] == int(frames[::2].astype(np.int64).sum())

    # honest gate: chroma-subsampled stream refuses rather than fakes
    c420 = b"YUV4MPEG2 W8 H8 F25:1 Ip A1:1 C420\n" + b"FRAME\n" + bytes(96)
    with pytest.raises(NotImplementedError):
        decode_y4m_gray(c420)
    # default colorspace (no C tag) is 4:2:0 -> also gated
    nodefault = b"YUV4MPEG2 W8 H8 F25:1\n" + b"FRAME\n" + bytes(96)
    with pytest.raises(NotImplementedError):
        decode_y4m_gray(nodefault)
    with pytest.raises(ValueError):
        decode_y4m_gray(b"MPEG4 blah")


def test_paragraph_dedup_first_occurrence_and_reassembly():
    """CCNet chunk dedup: corpus-wide first occurrence survives, later
    repeats (cross-doc AND within-doc) drop, all-repeat docs vanish, and
    per-doc reassembly preserves position order across sorted-block
    boundaries (forced tiny blocks)."""
    from anonymization_ray.extras.dedup import paragraph_dedup

    w1 = "a b c d"          # chunk of 4 (window=4)
    w2 = "e f g h"
    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    f"{w1} {w2}",        # both chunks first occurrences
                    f"{w1} {w2}",        # exact repeat -> dropped entirely
                    f"{w2} x y z q",     # first chunk repeat, second new
                    f"{w1} {w1}",        # within-doc repeat of a repeat
                ],
                pa.string(),
            ),
        }
    )
    ds = rd.from_arrow(docs).repartition(4)
    out = (
        paragraph_dedup(ds, "text", "doc_id", window_words=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 3]
    assert out["text_dedup"].tolist() == [f"{w1} {w2}", "x y z q"]
    assert out["n_chunks"].tolist() == [2, 1]

    # id-range guard
    bad = pa.table(
        {
            "doc_id": pa.array([1 << 50], pa.int64()),
            "text": pa.array(["a b"], pa.string()),
        }
    )
    with pytest.raises(Exception):
        paragraph_dedup(rd.from_arrow(bad), "text", "doc_id").to_pandas()


def test_kmeans_int_deterministic_and_separates_planted_clusters():
    """Integer k-means: planted well-separated clusters are recovered, the
    smallest-id init and lowest-cluster tie-break are deterministic, and a
    repeat run is bit-identical."""
    from anonymization_ray.extras.cluster import kmeans_int

    rng = np.random.default_rng(7)
    centers = np.array([[0.0] * 8, [1.0] * 8, [-1.0] * 8])
    vecs = np.concatenate(
        [c + rng.normal(0, 0.01, (20, 8)) for c in centers]
    ).astype(np.float32)
    ids = np.arange(60, dtype=np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.reshape(-1), pa.float32()), 8
            ),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    out = kmeans_int(ds, "embedding", "vec_id", k=3, iters=4).to_pandas()
    out = out.sort_values("vec_id").reset_index(drop=True)
    # planted groups land in one cluster each (ids 0-19 / 20-39 / 40-59)
    groups = [set(out.cluster[i * 20 : (i + 1) * 20]) for i in range(3)]
    assert all(len(g) == 1 for g in groups)
    assert len(set().union(*groups)) == 3
    out2 = (
        kmeans_int(ds, "embedding", "vec_id", k=3, iters=4)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_rank_sketch_error_bound_and_exactness_at_stride_one():
    """The eps-rank summary honors its deterministic bound on a skewed
    input; with eps small enough that every block stride is 1 the sketch
    degenerates to the exact quantile."""
    from anonymization_ray.extras.stats import exact_quantiles, rank_sketch_quantiles

    vals = np.concatenate(
        [np.zeros(5000), np.arange(1, 101, dtype=np.float64), np.full(300, 1e6)]
    )
    ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.float64())})).repartition(4)
    qs = [0.25, 0.5, 0.95]
    est, total, blocks = rank_sketch_quantiles(ds, "v", qs, eps=0.01)
    assert total == len(vals)
    sv = np.sort(vals)
    bound = 0.01 * total + blocks
    for q, v in zip(qs, est.column("value").to_pylist()):
        target = int(np.ceil(q * total)) - 1
        # exact rank window of the estimate
        lo = np.searchsorted(sv, v, side="left")
        hi = np.searchsorted(sv, v, side="right") - 1
        err = 0 if lo <= target <= hi else min(abs(target - lo), abs(target - hi))
        assert err <= bound
    # stride-1 degenerate case: eps so small the summary keeps everything
    exact, _, _ = rank_sketch_quantiles(ds, "v", qs, eps=1e-9)
    ref = exact_quantiles(ds, "v", qs)
    assert exact.column("value").to_pylist() == ref.column("value").to_pylist()


def test_rank_sketch_empty():
    from anonymization_ray.extras.stats import rank_sketch_quantiles

    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.float64())}))
    est, total, blocks = rank_sketch_quantiles(ds, "v", [0.5])
    assert total == 0 and est.column("value")[0].as_py() is None


def test_ks_two_sample_identical_and_disjoint():
    """Identical samples give D = 0; disjoint ranges give D = 1 (numerator
    n_a * n_b); a tie at a block boundary never evaluates mid-value."""
    from anonymization_ray.extras.stats import ks_two_sample

    a = np.arange(100, dtype=np.float64)
    t = pa.table(
        {
            "v": pa.array(np.concatenate([a, a]), pa.float64()),
            "g": pa.array(["x"] * 100 + ["y"] * 100),
        }
    )
    out = ks_two_sample(rd.from_arrow(t).repartition(5), "v", "g", "x", "y")
    assert out.column("d_num")[0].as_py() == 0
    t2 = pa.table(
        {
            "v": pa.array(np.concatenate([a, a + 1000.0]), pa.float64()),
            "g": pa.array(["x"] * 100 + ["y"] * 100),
        }
    )
    out2 = ks_two_sample(rd.from_arrow(t2).repartition(5), "v", "g", "x", "y")
    assert out2.column("d_num")[0].as_py() == 100 * 100


def test_split_leakage_unique_corpus_leaks_nothing():
    """A corpus of all-distinct texts has zero cross-split leakage, and the
    split sizes sum to the corpus."""
    from anonymization_ray.extras.shuffle import split_leakage

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(500), pa.int64()),
            "text": pa.array([f"unique document {i}" for i in range(500)]),
        }
    )
    out = split_leakage(rd.from_arrow(t).repartition(3), "doc_id", "text")
    n_train = out.column("n_train")[0].as_py()
    n_eval = out.column("n_eval")[0].as_py()
    assert n_train + n_eval == 500
    assert out.column("n_leaked")[0].as_py() == 0


def test_quantize_int8_constant_dim_and_range():
    """A constant dimension codes to 0 everywhere; codes stay in [0, 255]
    (checksum of the all-min / all-max vectors hits the exact bounds)."""
    from anonymization_ray.extras.similarity import quantize_int8

    vecs = np.array(
        [[0.0, 5.0, -1.0], [0.0, 10.0, 3.0], [0.0, 7.5, 1.0]], dtype=np.float32
    )
    t = pa.table(
        {
            "vec_id": pa.array([1, 2, 3], pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    out = (
        quantize_int8(rd.from_arrow(t).repartition(2), "embedding", "vec_id")
        .to_pandas()
        .sort_values("vec_id")
    )
    # dim1 constant -> 0; vec 1 is the min on dims 2,3 -> codes 0; vec 2 the
    # max -> codes 255: checksums are 0*1+0*2+0*3 = 0 and 0+255*2+255*3
    sums = dict(zip(out.vec_id, out.code_sum))
    assert sums[1] == 0
    assert sums[2] == 255 * 2 + 255 * 3
    assert 0 < sums[3] < 255 * 5


def test_temperature_upsample_weights_and_determinism():
    """The largest source keeps exactly one copy per doc; a 4x smaller
    source gets sqrt(4)=2 copies per doc exactly; re-running with different
    partitioning is bit-identical."""
    from anonymization_ray.extras.shuffle import temperature_upsample

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(100), pa.int64()),
            "src": pa.array(["big"] * 80 + ["small"] * 20),
        }
    )
    out = (
        temperature_upsample(rd.from_arrow(t).repartition(4), "src", "doc_id")
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    per_doc = out.groupby("doc_id").size()
    big_ids = np.arange(80)
    assert (per_doc.loc[big_ids] == 1).all()
    # sqrt(80/20) = 2.0 exactly -> base 2, zero fractional threshold
    assert (per_doc.loc[np.arange(80, 100)] == 2).all()
    out2 = (
        temperature_upsample(rd.from_arrow(t).repartition(7), "src", "doc_id")
        .to_pandas()
        .sort_values(["doc_id", "copy_idx"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)


def test_corpus_version_diff_classes():
    """Hand-built two-version corpus hits every class exactly once."""
    from anonymization_ray.extras.diff import corpus_version_diff

    v1 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["same", "edited v1", "gone"]),
            }
        )
    ).repartition(2)
    v2 = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 4], pa.int64()),
                "text": pa.array(["same", "edited v2", "new"]),
            }
        )
    ).repartition(2)
    out = corpus_version_diff(v1, v2, "doc_id", "text").to_pandas()
    got = dict(zip(out.change_type, out.n))
    assert got == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}


def test_profile_columns_nulls_and_nan_as_missing():
    """NaN counts as missing for extrema (repo-wide convention); null count
    reflects Arrow nulls; distinct is exact."""
    from anonymization_ray.extras.stats import profile_columns

    t = pa.table(
        {
            "a": pa.array([1.0, np.nan, 3.0, None, 3.0], pa.float64()),
            "b": pa.array([5, 5, 5, 5, 5], pa.int64()),
        }
    )
    out = profile_columns(rd.from_arrow(t).repartition(2), ["a", "b"]).to_pandas()
    row_a = out[out.column == "a"].iloc[0]
    assert row_a.n_nulls == 1
    assert row_a.min_v == 1.0 and row_a.max_v == 3.0
    row_b = out[out.column == "b"].iloc[0]
    assert row_b.n_distinct == 1 and row_b.min_v == 5.0 == row_b.max_v


def test_pq_topk_twin_recall_and_determinism():
    """PQ ANN: an exact-copy twin encodes to the query's own code and must
    rank in the top-k; a repartitioned rerun is bit-identical (deterministic
    codebooks + stable tie-breaks)."""
    from anonymization_ray.extras.similarity import pq_topk

    rng = np.random.default_rng(3)
    base = rng.normal(size=(120, 16)).astype(np.float32)
    vecs = np.concatenate([base, base[:5]])  # twins of the first 5
    ids = np.concatenate([np.arange(120), np.arange(1000, 1005)]).astype(np.int64)
    t = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([list(map(float, v)) for v in vecs],
                                  pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(t).repartition(3)
    q, qids = base[:5].astype(np.float64), np.arange(5)
    out = (
        pq_topk(ds, q, qids, k=10, m=4, ksub=8, train_size=64)
        .to_pandas()
        .sort_values(["query_id", "adc_score", "vec_id"])
        .reset_index(drop=True)
    )
    hits = set(zip(out.query_id, out.vec_id))
    for qid in qids:
        assert (qid, qid + 1000) in hits
    out2 = (
        pq_topk(rd.from_arrow(t).repartition(5), q, qids, k=10, m=4, ksub=8,
                train_size=64)
        .to_pandas()
        .sort_values(["query_id", "adc_score", "vec_id"])
        .reset_index(drop=True)
    )
    assert out.equals(out2)
