"""Round-5 guard/robustness regressions (advisor items + verdict tasks 4-5):
curriculum bands overflow refusal, BMP color-palette refusal, theta_union
empty union, BPE unbounded-vocab refusal, dag_layers explicit-universe
containment, and the vectorized fuzzy-link kernel's None/empty handling."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from anonymization_ray.extras.bpe import bpe_merges
from anonymization_ray.extras.er import fuzzy_link
from anonymization_ray.extras.graph import dag_layers
from anonymization_ray.extras.multimodal import decode_bmp_gray
from anonymization_ray.extras.shuffle import curriculum_order
from anonymization_ray.extras.stats import theta_union


def test_curriculum_order_refuses_overflowing_bands():
    ds = rd.from_arrow(pa.table({"id": [1, 2, 3], "d": [1.0, 2.0, 3.0]}))
    with pytest.raises(ValueError, match=r"bands must be in \[1, 4\]"):
        curriculum_order(ds, "id", "d", bands=5)
    # the safe maximum still works
    out = curriculum_order(ds, "id", "d", bands=4).to_pandas()
    assert sorted(out["pos"]) == [0, 1, 2]


def _bmp_8bit(pal: np.ndarray, px: np.ndarray) -> bytes:
    import struct

    h, w = px.shape
    stride = (w + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w] = px[::-1]  # bottom-up
    data = rows.tobytes()
    off = 14 + 40 + 256 * 4
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(data), 0, 0, 256, 0)
    return header + dib + pal.astype(np.uint8).tobytes() + data


def test_decode_bmp_refuses_color_palette():
    px = np.arange(16, dtype=np.uint8).reshape(4, 4)
    gray_pal = np.repeat(np.arange(256, dtype=np.uint8)[:, None], 4, axis=1)
    gray_pal[:, 3] = 0
    assert (decode_bmp_gray(_bmp_8bit(gray_pal, px)) == px).all()
    color_pal = gray_pal.copy()
    color_pal[7, 0] = 99  # B != G at index 7 -> a COLOR palette
    with pytest.raises(NotImplementedError, match="grayscale-palette"):
        decode_bmp_gray(_bmp_8bit(color_pal, px))


def test_theta_union_empty_is_zero():
    assert theta_union({}) == 0.0


def test_bpe_refuses_unbounded_vocab_above_cap(monkeypatch):
    import anonymization_ray.extras.bpe as bpe_mod

    monkeypatch.setattr(bpe_mod, "BPE_VOCAB_GATHER_CAP", 2)
    ds = rd.from_arrow(pa.table({"text": ["aa bb cc dd", "ee ff"]}))
    with pytest.raises(ValueError, match="above the driver-gather cap"):
        bpe_merges(ds, "text", rounds=1, max_vocab=None)
    # an explicit max_vocab bypasses the gather cap (bounded by construction)
    out = bpe_merges(ds, "text", rounds=1, max_vocab=3)
    assert out.num_rows == 1


def test_dag_layers_respects_explicit_universe():
    # edge b -> z leaves the declared universe {a, b, c}; z must neither
    # appear in the output nor relay (z -> c would give c layer 2)
    edges = rd.from_arrow(
        pa.table({"u": ["a", "b", "z"], "v": ["b", "z", "c"]})
    )
    nodes = rd.from_arrow(pa.table({"node": ["a", "b", "c"]}))
    out = dag_layers(edges, rounds=3, nodes=nodes).to_pandas()
    got = dict(zip(out["node"], out["layer"]))
    assert got == {"a": 0, "b": 1, "c": 0}


def test_fuzzy_link_vectorized_kernel_matches_semantics():
    ds = rd.from_arrow(
        pa.table(
            {
                "m": ["acme", "acm", "acme", None, "zzz", "acmee", "a"],
                "rid": [0, 1, 2, 3, 4, 5, 6],
            }
        )
    )
    out = fuzzy_link(ds, "m", ["acme", "b"], keep_cols=["rid"]).to_pandas()
    got = sorted(zip(out["rid"], out["match"], out["dist"]))
    # "a" matches "b" at d=1 (single-char substitution); "acm"/"acmee" at
    # d=1 to "acme"; exact "acme" rows at d=0; None and "zzz" drop
    assert got == [
        (0, "acme", 0),
        (1, "acme", 1),
        (2, "acme", 0),
        (5, "acme", 1),
        (6, "b", 1),
    ]


def test_fuzzy_link_duplicate_mentions_expand_per_row():
    ds = rd.from_arrow(pa.table({"m": ["ab"] * 5, "rid": list(range(5))}))
    out = fuzzy_link(ds, "m", ["ab", "ac", "xb"], keep_cols=["rid"]).to_pandas()
    # every row matches all three names (d 0/1/1), in sorted-name order
    assert len(out) == 15
    per_row = out.groupby("rid")["match"].apply(list).to_dict()
    assert all(v == ["ab", "ac", "xb"] for v in per_row.values())
