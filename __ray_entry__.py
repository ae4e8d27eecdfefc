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


def _retry_shuffle_schema_race(fn: Callable[[str], Any]) -> Callable[[str], Any]:
    """Harden a query callable against a known Ray 2.49 hash-shuffle race:
    join/aggregate schemas broadcast to the shuffle aggregators only from
    the FIRST shuffle task of each input, so under heavy load (worker
    restarts) a partition can finalize with a schema-less empty table and
    the Arrow join dies with "No match or multiple matches for key field".
    The failure is a scheduling race, not data-dependent — materializing
    the result with one retry absorbs it (retry hit rate observed only
    under co-tenant CPU pressure; the retried run recomputes from the lazy
    plan, results are deterministic either way)."""

    def _run(sf_dir: str) -> Any:
        import time

        res = fn(sf_dir)
        if not hasattr(res, "materialize"):
            return res
        last = None
        for attempt in range(3):
            try:
                return res.materialize()
            except Exception as e:  # noqa: BLE001 — match on the signature
                if "No match or multiple matches for key field" not in str(e):
                    raise
                last = e
                time.sleep(1 + attempt)
                res = fn(sf_dir)  # rebuild the lazy plan; refs may be GC'd
        raise last

    return _run


def queries() -> dict[str, Callable[[str], Any]]:
    from anonymization_ray.queries import REGISTRY

    return {
        name: _retry_shuffle_schema_race(qd.fn) for name, qd in REGISTRY.items()
    }


def oracle_sql() -> dict[str, str]:
    from anonymization_ray.queries import REGISTRY

    return {name: qd.sql for name, qd in REGISTRY.items() if qd.sql is not None}
