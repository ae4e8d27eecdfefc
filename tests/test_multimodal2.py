"""pHash fixed-point DCT unit tests (wave 71)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.multimodal import (
    MediaPHasher,
    attach_media_affine,
    encode_png_gray,
    phash_basis,
    phash_media,
)


def test_basis_is_symmetric_and_bounded():
    b = phash_basis()
    assert b.shape == (8, 16)
    assert b[0].min() == b[0].max() == 16384  # k=0 row: cos(0)
    assert np.abs(b).max() <= 16384


def test_phash_brightness_invariance(ray_session):
    # uniform brightness shift leaves every AC coefficient's ORDER intact
    # (shift only moves the DC term), so the fingerprint is unchanged —
    # the property aHash lacks
    rng_px = (np.arange(256, dtype=np.int64).reshape(16, 16) * 7) % 200
    shifted = rng_px + 50
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "media": pa.array(
                [
                    encode_png_gray(rng_px.astype(np.uint8)),
                    encode_png_gray(shifted.astype(np.uint8)),
                ],
                pa.binary(),
            ),
        }
    )
    out = phash_media(rd.from_arrow(t)).to_pandas()
    assert out["hash_hi"][0] == out["hash_hi"][1]
    assert out["hash_lo"][0] == out["hash_lo"][1]


def test_phash_distinguishes_structures(ray_session):
    a = np.zeros((16, 16), np.uint8)
    a[:, :8] = 255  # vertical edge
    b = np.zeros((16, 16), np.uint8)
    b[:8, :] = 255  # horizontal edge
    t = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "media": pa.array(
                [encode_png_gray(a), encode_png_gray(b)], pa.binary()
            ),
        }
    )
    out = phash_media(rd.from_arrow(t)).to_pandas()
    assert (out["hash_hi"][0], out["hash_lo"][0]) != (
        out["hash_hi"][1], out["hash_lo"][1]
    )


def test_bmp_roundtrip_all_shapes():
    import numpy as np

    from anonymization_ray.extras.multimodal import (
        decode_bmp_gray,
        encode_bmp_gray,
    )

    rng = np.random.default_rng(3)
    for h, w in [(16, 16), (5, 7), (1, 1), (3, 4)]:
        px = rng.integers(0, 256, (h, w)).astype(np.uint8)
        back = decode_bmp_gray(encode_bmp_gray(px))
        assert back.shape == (h, w) and (back == px).all()


def test_bmp_decode_refuses_unsupported():
    import struct

    import pytest

    from anonymization_ray.extras.multimodal import decode_bmp_gray

    with pytest.raises(ValueError):
        decode_bmp_gray(b"nope")
    # 24-bit BMP header refuses loudly
    info = struct.pack("<IiiHHI", 40, 2, 2, 1, 24, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 100, 0, 0, 54)
    with pytest.raises(NotImplementedError):
        decode_bmp_gray(hdr + info + b"\x00" * 46)
