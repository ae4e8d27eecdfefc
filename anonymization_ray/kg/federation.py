"""SPARQL 1.1 SERVICE — federated pattern evaluation against a second
endpoint's graph (the reference is a single Jena service, but SPARQL's
federation surface is how such services compose; the endpoint here is an
injectable triples provider, same pattern as the SOyA config fetcher in
``api.py`` — a test injects a local Dataset, production wires an actual
remote store's export).

Execution is the FedX-style BOUND join (Schwarte et al., ISWC 2011 —
public algorithm): rather than evaluating the remote pattern unrestricted
and shipping every remote solution, the local bindings' shared-variable
values are gathered distinct (bounded by the binding stream's key
cardinality, the same cap as every broadcast in this repo) and pushed into
the remote scan as a VALUES restriction — one vectorized ``is_in`` per
remote batch. The remote side then returns only joinable solutions, and
the final join runs hash-partitioned on the shared variable.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd

from ..util import default_num_partitions, hash_join
from .bgp import _arm

# remote solutions above this row count refuse the map-side broadcast and
# must take the hash-join path explicitly
BROADCAST_ROW_CAP = 2_000_000


def service_join(
    local: rd.Dataset,
    endpoint_triples: rd.Dataset,
    pattern: tuple[str, str, str],
    *,
    shared: str,
    push_values: bool = True,
    broadcast_remote: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Join the ``local`` binding stream with ``SERVICE { pattern }``
    evaluated over ``endpoint_triples``, on the single shared variable
    ``shared`` (no leading ``?``). Inner-join solution semantics.

    ``push_values=True`` applies the bound-join optimization: the local
    stream's distinct ``shared`` values broadcast into the remote scan so
    unjoinable remote solutions never leave the endpoint.

    The join itself is MAP-SIDE by default (``broadcast_remote=True``):
    the values-pushed remote solution table gathers once (guarded by
    ``BROADCAST_ROW_CAP``), goes to the object store via ``ray.put``, and
    every local batch inner-joins against it in-memory — no shuffle of the
    local stream, and no hash-partitioned join over a dimension-like
    shared variable (whose few distinct keys would leave most partitions
    empty — the documented ``hash_join`` quirk). Pass
    ``broadcast_remote=False`` for endpoint-sized remote results, which
    takes the hash-partitioned path instead."""
    from ..extras.joins import semi_anti_join

    arm, arm_vars = _arm(endpoint_triples, pattern)
    # _arm binds columns under their '?'-prefixed names; local streams use
    # stripped names (match_bgp's output contract) — normalize to stripped
    if f"?{shared}" not in arm_vars:
        raise ValueError(
            f"shared variable {shared!r} is not bound by the SERVICE "
            f"pattern (binds {arm_vars})"
        )
    arm = arm.rename_columns({v: v.lstrip("?") for v in arm_vars})
    arm_vars = [v.lstrip("?") for v in arm_vars]
    if push_values:
        arm = semi_anti_join(
            arm, local.select_columns([shared]), on=shared, right_on=shared
        )
    if broadcast_remote:
        blocks = [b for b in ray.get(arm.materialize().to_arrow_refs()) if b.num_rows]
        if not blocks:
            # no joinable remote solution: inner join result is empty, with
            # the local schema + the remote pattern's other variables —
            # built as ONE explicit Arrow block (a lazy map over an empty
            # dataset would drop the schema again)
            sch = local.materialize().schema()
            cols = {}
            for n, t in zip(sch.names, sch.types):
                if not isinstance(t, pa.DataType):
                    import numpy as np

                    t = pa.from_numpy_dtype(np.dtype(t))
                cols[n] = pa.array([], t)
            for v in arm_vars:
                if v not in cols:
                    cols[v] = pa.array([], pa.string())
            return rd.from_arrow(pa.table(cols))
        tbl = pa.concat_tables(blocks).combine_chunks()
        if tbl.num_rows > BROADCAST_ROW_CAP:
            raise ValueError(
                f"remote solution table has {tbl.num_rows} rows — above "
                f"BROADCAST_ROW_CAP ({BROADCAST_ROW_CAP}); pass "
                "broadcast_remote=False"
            )
        ref = ray.put(tbl)

        def _join(b: pa.Table) -> pa.Table:
            t = ray.get(ref)
            return b.join(t, keys=[shared], join_type="inner")

        return local.map_batches(_join, batch_format="pyarrow")
    nparts = num_partitions or max(2, min(default_num_partitions(), 8))
    return hash_join(
        local, arm.materialize(), on=shared, join_type="inner",
        num_partitions=nparts,
    )
