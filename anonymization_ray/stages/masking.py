"""Masking — add ``<attr>_masked = "*****"`` for every non-null value.

Reference semantics: ``service/anonymizer/Masking.java:19-25`` (any datatype;
null values get no masked triple). Stateless, zero-shuffle: a single
``map_batches`` over Arrow batches.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import MASK_VALUE


def mask_column(
    ds: ray.data.Dataset,
    col: str,
    out_col: str | None = None,
) -> ray.data.Dataset:
    out = out_col or f"{col}_masked"

    def _mask(batch: pa.Table) -> pa.Table:
        src = batch.column(col)
        masked = pc.if_else(
            pc.is_valid(src), pa.scalar(MASK_VALUE, type=pa.string()), pa.scalar(None, pa.string())
        )
        if out in batch.column_names:
            batch = batch.drop_columns([out])
        return batch.append_column(out, masked)

    return ds.map_batches(_mask, batch_format="pyarrow")
