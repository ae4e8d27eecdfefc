"""Wave-107 units: N-Quads interchange, feature engineering, PGM codec."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.feature import hashing_features, target_encode
from anonymization_ray.extras.multimodal import decode_pgm_gray, encode_pgm_gray
from anonymization_ray.kg.nquads import (
    parse_quad_lines,
    read_nquads,
    render_quad_lines,
    write_nquads,
)


def test_nquads_roundtrip_with_and_without_graph(tmp_path):
    t = pa.table(
        {
            "subj": ["urn:s:1", "urn:s:2", "urn:s:3"],
            "pred": ["p", "p", "q"],
            "obj": ['he said "hi"\n', "3.5", "urn:o:1"],
            "obj_kind": ["string", "double", "iri"],
            "graph": ["urn:g:a", None, "urn:g:b"],
        }
    )
    out = str(tmp_path / "nq")
    n_files = write_nquads(rd.from_arrow(t).materialize(), out)
    assert n_files >= 1
    back = read_nquads(out).to_pandas().sort_values("subj").reset_index(drop=True)
    assert list(back["graph"]) == ["urn:g:a", "", "urn:g:b"]
    assert back.loc[0, "obj"] == 'he said "hi"\n'  # escaping round-trips
    assert back.loc[1, "obj_kind"] == "double"


def test_nquads_parses_plain_ntriples_lines():
    lines = pa.table(
        {"text": ['<urn:s:1> <urn:p> "x" .', "# comment", ""]}
    )
    t = parse_quad_lines(lines)
    assert t.num_rows == 1
    assert t.column("graph").to_pylist() == [""]


def test_render_without_graph_column():
    t = pa.table(
        {
            "subj": ["urn:s:1"],
            "pred": ["p"],
            "obj": ["v"],
            "obj_kind": ["string"],
        }
    )
    lines = render_quad_lines(t).column("line").to_pylist()
    assert lines[0].endswith('"v" .')  # no graph term


def test_target_encode_matches_closed_form():
    t = pa.table(
        {
            "g": ["a", "a", "b", "b", "b"],
            "seg": ["x", "x", "x", "x", "x"],
            "v": [1.0, 3.0, 10.0, 20.0, 30.0],
        }
    )
    out = (
        target_encode(rd.from_arrow(t), ["g", "seg"], "v", m=2)
        .to_pandas()
        .sort_values("cat")
        .reset_index(drop=True)
    )
    # cents: a=(100,300) sum 400 n 2; b=6000 n 3; mean=6400/5=1280
    assert list(out["cat"]) == ["a|x", "b|x"]
    assert list(out["n"]) == [2, 3]
    assert out.loc[0, "enc"] == (400 + 2 * 1280.0) / 4
    assert out.loc[1, "enc"] == (6000 + 2 * 1280.0) / 5


def test_hashing_features_signed_counts_and_dedup():
    t = pa.table({"doc_id": [1, 2], "text": ["cat cat dog", "cat"]})
    out = hashing_features(rd.from_arrow(t), "doc_id", "text", k=8).to_pandas()
    by_doc = out.groupby("doc_id")["val"].apply(lambda s: sorted(s.abs())).to_dict()
    # doc 1: cat twice (same bucket, same sign -> |val|=2), dog once
    assert by_doc[1] == [1, 2]
    assert by_doc[2] == [1]
    # same token -> same bucket across docs
    cat1 = out[(out.doc_id == 1) & (out.val.abs() == 2)]["bucket"].iloc[0]
    cat2 = out[out.doc_id == 2]["bucket"].iloc[0]
    assert cat1 == cat2


def test_pgm_refusals_and_comments():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    assert (decode_pgm_gray(encode_pgm_gray(px)) == px).all()
    commented = b"P5\n# made by test\n4 4\n255\n" + px.tobytes()
    assert (decode_pgm_gray(commented) == px).all()
    with pytest.raises(NotImplementedError, match="P2"):
        decode_pgm_gray(b"P2\n1 1\n255\n0")
    with pytest.raises(NotImplementedError, match="maxval"):
        decode_pgm_gray(b"P5\n1 1\n65535\n\x00\x00")
    with pytest.raises(ValueError, match="not a PGM"):
        decode_pgm_gray(b"P6\n1 1\n255\nxxx")


def test_ohlc_bars_known_values():
    from anonymization_ray.extras.window import ohlc_bars

    us = 1_000_000
    t = pa.table(
        {
            "u": [1, 1, 1, 2],
            "ts": pa.array(
                [10 * us, 20 * us, 30 * us, 15 * us], pa.timestamp("us")
            ),
            "v": [5.0, 1.0, 3.0, 7.0],
        }
    )
    out = (
        ohlc_bars(rd.from_arrow(t), "u", "ts", "v", bucket_us=60 * us)
        .to_pandas()
        .sort_values("u")
        .reset_index(drop=True)
    )
    # user 1: open=500 (first), high=500, low=100, close=300 (last)
    assert list(out.loc[0, ["open_c", "high_c", "low_c", "close_c", "n"]]) == [
        500, 500, 100, 300, 3,
    ]
    assert list(out.loc[1, ["open_c", "close_c", "n"]]) == [700, 700, 1]


def test_benford_exact_on_known_digits():
    from anonymization_ray.extras.stats import benford_audit

    # cents: 100, 19, 25, 31 -> digits 1, 1, 2, 3 of 4 values
    t = pa.table({"v": [1.0, 0.19, 0.25, 0.31]})
    out = benford_audit(rd.from_arrow(t), "v").to_pandas()
    got = dict(zip(out["digit"], out["n"]))
    assert got[1] == 2 and got[2] == 1 and got[3] == 1 and got[9] == 0
    d1 = out[out.digit == 1].iloc[0]
    assert d1["dev_micro"] == abs(2 * 1_000_000 - 4 * 301030)


def test_wav_stereo_downmix_floor_semantics():
    from anonymization_ray.extras.multimodal import (
        decode_wav_pcm16_stereo,
        encode_wav_pcm16_stereo,
    )

    l = np.array([-3, 5, 0], np.int16)
    r = np.array([2, 5, -1], np.int16)
    payload = encode_wav_pcm16_stereo(l, r)
    dl, dr, rate = decode_wav_pcm16_stereo(payload)
    assert (dl == l).all() and (dr == r).all() and rate == 8000
    mono = (dl.astype(np.int64) + dr.astype(np.int64)) // 2
    assert list(mono) == [-1, 5, -1]  # floor division, -1//2 == -1
    # mono decoder refuses stereo and vice versa
    from anonymization_ray.extras.multimodal import decode_wav_pcm16

    with pytest.raises(NotImplementedError):
        decode_wav_pcm16(payload)


def test_contingency_exact_small():
    from anonymization_ray.extras.stats import contingency_table

    t = pa.table({"a": ["x", "x", "y", "y", "y"], "b": ["1", "2", "1", "1", "2"]})
    out = (
        contingency_table(rd.from_arrow(t), "a", "b")
        .to_pandas()
        .sort_values(["a", "b"])
        .reset_index(drop=True)
    )
    # N=5; cell (y,1): o=2, row_n=3, col_n=3 -> diff = 10 - 9 = 1
    y1 = out[(out.a == "y") & (out.b == "1")].iloc[0]
    assert (y1["o"], y1["row_n"], y1["col_n"], y1["diff"]) == (2, 3, 3, 1)
    assert out["o"].sum() == 5


def test_mann_whitney_exact_small():
    from anonymization_ray.extras.stats import mann_whitney_u2

    # A = [1, 3], B = [2, 3]: pairs (1,2) L, (1,3) L, (3,2) W, (3,3) tie
    # U_A = 1 + 0.5 = 1.5 -> u2_a = 3
    t = pa.table(
        {
            "g": ["a", "a", "b", "b", "x"],
            "v": [0.01, 0.03, 0.02, 0.03, 9.99],
        }
    )
    out = mann_whitney_u2(rd.from_arrow(t), "g", "v", "a", "b").to_pandas()
    assert (
        int(out.loc[0, "n_a"]),
        int(out.loc[0, "n_b"]),
        int(out.loc[0, "u2_a"]),
    ) == (2, 2, 3)


def test_tile_extractor_refuses_ragged_and_sums_exactly():
    from anonymization_ray.extras.multimodal import (
        TileExtractor,
        encode_pgm_gray,
    )

    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    t = pa.table(
        {"doc_id": [7], "media": [encode_pgm_gray(px)]}
    )
    out = TileExtractor(tile=4)(t)
    assert out.num_rows == 4
    got = {
        (r["tile_y"], r["tile_x"]): r["tile_sum"] for r in out.to_pylist()
    }
    g = px.astype(np.int64).reshape(2, 4, 2, 4).sum(axis=(1, 3))
    assert got == {(y, x): int(g[y, x]) for y in range(2) for x in range(2)}
    with pytest.raises(NotImplementedError, match="does not divide"):
        TileExtractor(tile=5)(t)


def test_literal_canonicalize_refuses_corrupt_integer():
    from anonymization_ray.kg.literals import canonicalize_literals

    bad = pa.table(
        {
            "subj": ["s"],
            "pred": ["p"],
            "obj": ["12abc"],
            "obj_kind": ["integer"],
        }
    )
    with pytest.raises(Exception, match="non-numeric|invalid|Failed"):
        canonicalize_literals(rd.from_arrow(bad)).take_all()
    ok = pa.table(
        {
            "subj": ["s", "s", "s"],
            "pred": ["p", "p", "p"],
            "obj": ["007", "True", "hello"],
            "obj_kind": ["integer", "boolean", "string"],
        }
    )
    out = canonicalize_literals(rd.from_arrow(ok)).to_pandas()
    assert list(out["obj"]) == ["7", "true", "hello"]
    assert list(out["changed"]) == [1, 1, 0]


def test_band_join_covers_neighbors_and_excludes_far():
    from anonymization_ray.extras.joins import band_join

    left = pa.table({"lv": [100, 1000], "lid": [1, 2]})
    right = pa.table({"rv": [550, 99, 5000], "rid": [10, 11, 12]})
    out = band_join(
        rd.from_arrow(left),
        rd.from_arrow(right),
        left_val="lv",
        right_val="rv",
        band=500,
        left_keep=["lid"],
        right_keep=["rid"],
    ).to_pandas()
    got = sorted(zip(out["lid"], out["rid"]))
    # |100-550|=450 ok (neighbor cell), |100-99|=1 ok, 5000 excluded;
    # lid=2 (1000): |1000-550|=450 ok, |1000-99|=901 excluded
    assert got == [(1, 10), (1, 11), (2, 10)]


def test_mondrian_k_invariant_and_split_paths():
    from anonymization_ray.extras.privacy import mondrian_partition

    rng = np.random.default_rng(0)
    t = pa.table(
        {
            "xc": rng.integers(0, 1000, 200).astype(np.int64),
            "yc": rng.integers(0, 10, 200).astype(np.int64),
        }
    )
    out = mondrian_partition(
        rd.from_arrow(t), "xc", "yc", k=20, rounds=3
    ).to_pandas()
    # every final region is k-anonymous and labels are 3-cut paths
    assert (out["n"] >= 20).all()
    assert set(out["region"].str.len()) == {3}
    assert out["n"].sum() == 200
    # at least one actual split happened (not all '===')
    assert any(c in "LR" for r in out["region"] for c in r)


def test_interval_coalesce_block_spanning_islands():
    """Randomized cross-check vs a brute-force reference, with forced
    8-block partitioning so islands span blocks (the carry-chain case a
    naive edge-stitch gets wrong when one long island swallows interior
    islands of a later block)."""
    from collections import defaultdict

    from anonymization_ray.extras.asof import interval_coalesce

    def brute(rows):
        by = defaultdict(list)
        for k, f, t in rows:
            by[k].append((f, t))
        out = []
        for k, iv in by.items():
            iv.sort()
            cur = None
            for f, t in iv:
                if cur is None or f > cur[1]:
                    if cur:
                        out.append((k, cur[0], cur[1], cur[2]))
                    cur = [f, t, 1]
                else:
                    cur[1] = max(cur[1], t)
                    cur[2] += 1
            if cur:
                out.append((k, cur[0], cur[1], cur[2]))
        return sorted(out)

    rng = np.random.default_rng(7)
    for _ in range(5):
        n = int(rng.integers(50, 300))
        rows = [
            (f"k{int(k)}", int(f), int(f + l))
            for k, f, l in zip(
                rng.integers(0, 3, n),
                rng.integers(0, 200, n),
                rng.integers(1, 80, n),
            )
        ]
        t = pa.table(
            {
                "key": [r[0] for r in rows],
                "f": [r[1] for r in rows],
                "t": [r[2] for r in rows],
            }
        )
        got = sorted(
            (r["key"], r["c_from"], r["c_to"], r["n_merged"])
            for r in interval_coalesce(
                rd.from_arrow(t).repartition(8), "key", "f", "t"
            ).take_all()
        )
        assert got == brute(rows)
