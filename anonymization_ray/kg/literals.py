"""XSD literal canonicalization — the hygiene pass a KG ingesting
third-party triples runs before dedup/join: equal VALUES must have equal
LEXICAL forms or exact-match machinery (dictionary encoding, sort-based
dedup, join keys) treats "007", "+7" and "7" as three entities.

Canonical forms implemented (vectorized pyarrow casts, no row loop):
- integer: strip sign noise / leading zeros via int64 round-trip
  ("007" / "+7" -> "7"); non-numeric lexicals refuse loudly (a silent
  pass-through would hide corrupt data past the hygiene gate);
- boolean: {"1", "true", "TRUE", "True"} -> "true", {"0", "false", ...}
  -> "false";
- everything else (strings, dates already ISO in this engine, doubles —
  whose XSD canonical scientific form is a POLICY choice) passes through
  unchanged.

Reference analog: Jena normalizes typed literals on ingest
(``model.createTypedLiteral``); this is the batch equivalent over the
columnar triple stream.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd


def canonicalize_literals(ds: rd.Dataset) -> rd.Dataset:
    """(subj, pred, obj, obj_kind) stream -> same stream with canonical
    integer/boolean lexical forms plus a ``changed`` flag column (int64
    0/1) so the hygiene report is one fold away."""

    def _canon(b: pa.Table) -> pa.Table:
        obj = b.column("obj").combine_chunks()
        kind = b.column("obj_kind").combine_chunks()
        is_int = pc.equal(kind, "integer")
        is_bool = pc.equal(kind, "boolean")

        # integer: int64 round-trip; a failed cast on an integer-kinded
        # literal is corrupt data — refuse loudly
        ints = pc.if_else(is_int, obj, "0")
        try:
            canon_int = pc.cast(pc.cast(ints, pa.int64()), pa.string())
        except pa.ArrowInvalid as e:
            raise ValueError(
                f"non-numeric lexical in an integer-kinded literal: {e}"
            ) from None

        low = pc.utf8_lower(obj)
        canon_bool = pc.if_else(
            pc.is_in(low, value_set=pa.array(["1", "true"])), "true", "false"
        )

        out = pc.if_else(is_int, canon_int, pc.if_else(is_bool, canon_bool, obj))
        changed = pc.cast(
            pc.invert(pc.equal(out, obj)), pa.int64()
        )
        return pa.table(
            {
                "subj": b.column("subj").combine_chunks(),
                "pred": b.column("pred").combine_chunks(),
                "obj": out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out,
                "obj_kind": kind,
                "changed": changed.combine_chunks()
                if isinstance(changed, pa.ChunkedArray)
                else changed,
            }
        )

    return ds.map_batches(_canon, batch_format="pyarrow")
