"""Driver contract for the Ray-Data-native anonymization + KG engine.

Ray is initialised by the driver BEFORE this module is imported; nothing here
(or in ``anonymization_ray``) calls ``ray.init``/``ray.shutdown``.

- ``entry()`` — flagship pipeline on /root/testdata/sf0.001
- ``queries()`` — one callable per implemented operator (SURVEY.md §2 +
  §2.6): 116 entries
- ``oracle_sql()`` — DuckDB-equivalent SQL for ALL 116 queries; the seeded
  randomization streams run ``rng_mode="splitmix"`` (SplitMix64 counter RNG,
  partition-independent) whose draws the oracle replicates bit-for-bit with
  HUGEINT mod-2^64 arithmetic (``anonymization_ray/sqlrng.py``)
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship: the full KG-construction pipeline — synthesized web pages ->
    mention extraction (actor pool) -> entity linking -> union-find
    canonicalization -> anonymization (bucket generalization + skolemization)
    -> canonical triple stream."""
    from anonymization_ray.queries import REGISTRY

    return REGISTRY["kg_anonymized_triples"].fn(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from anonymization_ray.queries import REGISTRY

    return {name: qd.fn for name, qd in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    from anonymization_ray.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
