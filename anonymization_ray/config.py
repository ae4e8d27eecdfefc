"""Anonymization configuration model.

Mirrors the semantics of the reference configuration graph (a SOyA ontology
fetched per request, reference ``service/ConfigurationService.java:36-131`` and
``entities/Configuration.java:21-66``), vendored as plain data:

    (object_type, attribute, datatype, method[, attribute_order])

Validation rules replicated from the reference:
- duplicate attribute across object types -> error
  (``ConfigurationService.java:109-114``, OntologyException)
- generalization/randomization on ``string`` -> error
  (``Configuration.java:40-44,56-58``)
- object-valued (non-primitive) datatypes support generalization (hierarchy
  walk) and masking only (``ConfigurationService.java:141-148``).

The bucket-count formula is ``calculate_num_buckets`` — the reference's
``Anonymization.java:77-82`` (the README's sqrt(n) claim does not match the
code; the code is authoritative).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

MASKING = "masking"
GENERALIZATION = "generalization"
RANDOMIZATION = "randomization"
METHODS = (MASKING, GENERALIZATION, RANDOMIZATION)

PRIMITIVE_DATATYPES = ("integer", "double", "float", "decimal", "date", "dateTime", "string")

MASK_VALUE = "*****"  # reference Masking.java:23, GeneralizationObject.java:48

# suffix per method, reference AnonymizationService.java:169-173
SUFFIX = {
    MASKING: "_masked",
    GENERALIZATION: "_generalized",
    RANDOMIZATION: "_randomized",
}


class ConfigError(ValueError):
    """Invalid anonymization configuration (reference OntologyException)."""


@dataclass(frozen=True)
class AttributeConfig:
    """One attribute's anonymization rule.

    ``attribute_order`` (lowest level first) only applies to object-valued
    generalization (reference ``entities/ObjectGeneralizationConfig.java``).
    """

    object_type: str
    attribute: str
    datatype: str  # integer|double|date|dateTime|string | <object type name>
    method: str  # masking|generalization|randomization
    attribute_order: tuple[str, ...] = field(default=())
    # full IRIs when parsed from a SOyA config graph (soya.parse_soya_config);
    # the request surface matches prefix+name against these like the
    # reference matches Jena Property IRIs (FaltJsonService.java:40-91)
    object_iri: str | None = field(default=None, compare=False)
    attribute_iri: str | None = field(default=None, compare=False)

    @property
    def is_object(self) -> bool:
        return self.datatype not in PRIMITIVE_DATATYPES

    @property
    def counts_for_buckets(self) -> bool:
        # n = #attributes with generalization or randomization
        # (reference AnonymizationService.java:128-137)
        return self.method in (GENERALIZATION, RANDOMIZATION)

    def validate(self) -> None:
        if self.method not in METHODS:
            raise ConfigError(
                f"unknown anonymization method {self.method!r} for "
                f"{self.object_type}.{self.attribute}"
            )
        if self.datatype == "string" and self.method in (GENERALIZATION, RANDOMIZATION):
            # reference Configuration.java:40-44,56-58
            raise ConfigError(
                f"No {self.method} possible for type string "
                f"({self.object_type}.{self.attribute})"
            )
        if self.is_object and self.method == RANDOMIZATION:
            raise ConfigError(
                f"No randomization possible for object type {self.datatype} "
                f"({self.object_type}.{self.attribute})"
            )
        if self.is_object and self.method == GENERALIZATION and not self.attribute_order:
            raise ConfigError(
                f"object generalization for {self.object_type}.{self.attribute} "
                "requires attribute_order (soya:attributeOrder)"
            )


@dataclass(frozen=True)
class AnonymizationConfig:
    """Full configuration: all attributes across all object types."""

    attributes: tuple[AttributeConfig, ...]

    def __post_init__(self) -> None:
        seen: dict[str, str] = {}
        for a in self.attributes:
            a.validate()
            # duplicate attribute across object types is an error
            # (reference ConfigurationService.java:109-114)
            if a.attribute in seen and seen[a.attribute] != a.object_type:
                raise ConfigError(
                    f"attribute {a.attribute!r} configured for multiple object "
                    f"types ({seen[a.attribute]}, {a.object_type})"
                )
            if (a.attribute, a.object_type) in {
                (b.attribute, b.object_type) for b in self.attributes if b is not a
            }:
                raise ConfigError(
                    f"attribute {a.attribute!r} configured twice for "
                    f"{a.object_type}"
                )
            seen[a.attribute] = a.object_type

    def for_type(self, object_type: str) -> list[AttributeConfig]:
        return [a for a in self.attributes if a.object_type == object_type]

    @property
    def object_types(self) -> list[str]:
        out: list[str] = []
        for a in self.attributes:
            if a.object_type not in out:
                out.append(a.object_type)
        return out

    def num_anonymize_attributes(self, object_type: str, present: set[str] | None = None) -> int:
        """n for the bucket formula: generalization+randomization attrs of the
        type that are actually present in the data
        (reference AnonymizationService.java:128-137; presence probe
        QueryService.java:139-156)."""
        attrs = self.for_type(object_type)
        if present is not None:
            attrs = [a for a in attrs if a.attribute in present]
        return sum(1 for a in attrs if a.counts_for_buckets)


def calculate_num_buckets(data_size: int, number_attributes: int) -> int:
    """g = floor(1 / (1 - (1 - 0.99^(1/k))^(1/k))^(1/n)).

    Exact formula from reference ``Anonymization.java:77-82`` (StrictMath).
    k = non-null count for the attribute, n = number of generalization +
    randomization attributes on the object type. Clamped to [1, max(k,1)]
    (the reference would raise on degenerate inputs; we guard).
    """
    k, n = data_size, number_attributes
    if k <= 0 or n <= 0:
        return 1
    inner = 1.0 - (1.0 - 0.99 ** (1.0 / k)) ** (1.0 / k)
    if inner <= 0.0:
        return max(1, k)
    g = int(math.floor(1.0 / inner ** (1.0 / n)))
    return max(1, min(g, k))
