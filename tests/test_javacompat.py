"""Unit tests for the java.util.Random / HashMap-order replication layer.

The authoritative validation is the byte-exact golden conformance
(test_conformance.py, test_jsonld_conformance.py) — these tests pin the
primitives so a regression is caught at the unit level.
"""

import numpy as np

from anonymization_ray.javacompat import (
    JavaRandom,
    java_entry_rank,
    java_string_hash,
    java_table_size,
    randomize_sorted_java,
)


def test_java_string_hash_known_values():
    # java.lang.String.hashCode reference values
    assert java_string_hash("") == 0
    assert java_string_hash("a") == 97
    assert java_string_hash("abc") == 96354
    assert java_string_hash("hello") == 99162322


def test_java_random_nextdouble_stream_deterministic():
    r1, r2 = JavaRandom(1234), JavaRandom(1234)
    seq1 = [r1.next_double() for _ in range(8)]
    seq2 = [r2.next_double() for _ in range(8)]
    assert seq1 == seq2
    assert all(0.0 <= x < 1.0 for x in seq1)
    # first draw of java.util.Random(1234).nextDouble(), derived by explicit
    # LCG arithmetic (integer-exact, bit-identical to the JVM's)
    mask = (1 << 48) - 1
    s = (1234 ^ 0x5DEECE66D) & mask
    s = (s * 0x5DEECE66D + 0xB) & mask
    hi = s >> 22
    s = (s * 0x5DEECE66D + 0xB) & mask
    lo = s >> 21
    assert seq1[0] == ((hi << 27) + lo) * (2.0 ** -53)


def test_java_random_gaussian_pairing():
    r = JavaRandom(99)
    g = [r.next_gaussian() for _ in range(100)]
    # polar method: plausible standard normal sample
    assert abs(np.mean(g)) < 0.5
    assert 0.5 < np.std(g) < 1.6


def test_java_table_size_resize_ladder():
    assert java_table_size(12) == 16
    assert java_table_size(13) == 32  # 13 > 0.75*16
    assert java_table_size(96) == 128
    assert java_table_size(100) == 256
    assert java_table_size(768) == 1024
    assert java_table_size(1000) == 2048


def test_java_entry_rank_golden_tie_order():
    # the split tie groups observed in the reference goldens (flat cases 12
    # and 14, jsonld cases 12 and 14) — the derivation evidence for the
    # uri.hashCode()+hashURI bucket formula
    P = "https://soya.ownyourdata.eu/AnonymisationDemo/"
    uris = [f"{P}object35", f"{P}object38"]
    r = java_entry_rank(uris, full_count=100)
    assert r[1] < r[0]  # object38 (flat ID 39) draws first
    uris2 = [f"{P}36", f"{P}39"]
    r2 = java_entry_rank(uris2, full_count=100)
    assert r2[0] < r2[1]  # jsonld node 36 draws first


def test_randomize_sorted_java_bounds_and_determinism():
    v = np.sort(np.random.default_rng(7).uniform(-50, 50, 200))
    out1 = randomize_sorted_java("numeric", v, w=20, seed=1234)
    out2 = randomize_sorted_java("numeric", v, w=20, seed=1234)
    assert np.array_equal(out1, out2)
    assert out1.min() >= v.min() - 1e-9 and out1.max() <= v.max() + 1e-9


def test_randomize_sorted_java_datetime_second_granularity():
    millis = np.sort(
        np.random.default_rng(3).integers(1_600_000_000_000, 1_700_000_000_000, 50)
    )
    out = randomize_sorted_java("datetime", millis, w=5, seed=42)
    # noise is whole seconds added to the original millis value
    assert np.all((out.astype(np.int64) - millis) % 1000 == 0)
