import pytest

from anonymization_ray.config import (
    AnonymizationConfig,
    AttributeConfig,
    ConfigError,
    calculate_num_buckets,
)


def test_bucket_formula_reference_values():
    # k=100, n=1 -> 11 buckets (fixture 13-generalization-address: nrBuckets=11)
    assert calculate_num_buckets(100, 1) == 11
    # monotone-ish sanity
    assert calculate_num_buckets(10, 1) >= 1
    assert calculate_num_buckets(1000, 3) >= 1
    # degenerate guards (reference would crash; we clamp)
    assert calculate_num_buckets(0, 1) == 1
    assert calculate_num_buckets(1, 1) == 1
    assert calculate_num_buckets(5, 0) == 1


def test_bucket_formula_matches_closed_form():
    import math

    for k in (2, 7, 10, 100, 1000, 12345):
        for n in (1, 2, 3, 8):
            inner = 1.0 - (1.0 - 0.99 ** (1.0 / k)) ** (1.0 / k)
            expect = math.floor(1.0 / inner ** (1.0 / n))
            got = calculate_num_buckets(k, n)
            assert got == max(1, min(expect, k))


def test_duplicate_attribute_across_types_rejected():
    # reference ConfigurationService.java:109-114
    with pytest.raises(ConfigError):
        AnonymizationConfig(
            (
                AttributeConfig("T1", "a", "double", "masking"),
                AttributeConfig("T2", "a", "double", "masking"),
            )
        )


def test_string_generalization_rejected():
    # reference Configuration.java:40-44
    with pytest.raises(ConfigError):
        AnonymizationConfig((AttributeConfig("T", "a", "string", "generalization"),))
    with pytest.raises(ConfigError):
        AnonymizationConfig((AttributeConfig("T", "a", "string", "randomization"),))
    # masking on string is fine
    AnonymizationConfig((AttributeConfig("T", "a", "string", "masking"),))


def test_object_randomization_rejected():
    with pytest.raises(ConfigError):
        AnonymizationConfig((AttributeConfig("T", "a", "Address", "randomization"),))


def test_num_anonymize_attributes():
    cfg = AnonymizationConfig(
        (
            AttributeConfig("T", "m", "string", "masking"),
            AttributeConfig("T", "g", "double", "generalization"),
            AttributeConfig("T", "r", "double", "randomization"),
        )
    )
    assert cfg.num_anonymize_attributes("T") == 2
    assert cfg.num_anonymize_attributes("T", present={"m", "g"}) == 1
