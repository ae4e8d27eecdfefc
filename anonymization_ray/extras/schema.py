"""Schema harmonization — union datasets whose parquet schemas drifted
(a recrawl added a column, an old shard lacks one, an int column widened).
At 100 TB a corpus is written over months by evolving jobs; requiring
byte-identical schemas across every shard is not realistic, and Ray's
``union`` simply fails on mismatch. ``harmonize_union`` computes the
unified schema ONCE on the driver (pyarrow ``unify_schemas`` — permissive
numeric widening, the parquet-merge rule set) and gives each input one
stateless vectorized pass that null-fills absent columns, casts widened
ones, and reorders — each stream stays lazy, nothing shuffles.

No reference counterpart (the reference reads one request payload at a
time); this is corpus-lifecycle plumbing the Ray engine needs.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def harmonize_union(datasets: list[rd.Dataset]) -> rd.Dataset:
    """Union by NAME with type promotion: the output schema is the
    permissive unification of all input schemas (missing columns become
    nulls; int32+int64 -> int64, float mixes -> float64 per Arrow's
    promotion table). Column order = first appearance across inputs."""
    if not datasets:
        raise ValueError("harmonize_union needs at least one dataset")
    schemas = [ds.schema().base_schema for ds in datasets]
    unified = pa.unify_schemas(schemas, promote_options="permissive")

    def _align(batch: pa.Table, target: pa.Schema = unified) -> pa.Table:
        cols = []
        for field in target:
            if field.name in batch.column_names:
                col = batch.column(field.name)
                if col.type != field.type:
                    col = col.cast(field.type)
                cols.append(col)
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        return pa.table(dict(zip(target.names, cols)))

    aligned = [
        ds.map_batches(_align, batch_format="pyarrow") for ds in datasets
    ]
    out = aligned[0]
    for ds in aligned[1:]:
        out = out.union(ds)
    return out
