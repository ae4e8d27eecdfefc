"""Object generalization — walk an attribute hierarchy until groups are
anonymous enough.

Reference semantics (``service/anonymizer/GeneralizationObject.java:27-58``):

- data = records that *have* the object-valued property; k = their count
- for each level in ``attributeOrder`` (lowest first,
  ``entities/ObjectGeneralizationConfig.java:14-34``): project each record's
  object to that level's literal (missing -> "")
- accept the level iff  #distinctGroups <= g  AND  min(groupCount) > k*0.5/g
  (strict; the README's "≥3 per group" does not match the code)
- on accept write ``<attr>_generalized = levelLiteral``; if no level passes,
  mask with "*****" (``GeneralizationObject.java:43-48``).

Scale design: each level check is one small ``groupby(level).count()`` followed
by a driver-side aggregate over the (tiny) per-level group counts — a loop of
cheap wide aggregates, never a full materialization. The accepted level is then
written by a stateless ``map_batches``.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Min

from ..config import MASK_VALUE, calculate_num_buckets


@dataclass
class ObjectGeneralizationResult:
    attribute: str
    out_col: str
    g: int
    k: int
    accepted_level: str | None  # level column name, or None -> masked


def _level_values(batch: pa.Table, level_col: str, presence_col: str | None) -> pa.Table:
    """Present rows only, with the level literal (null -> "")."""
    if presence_col is not None:
        batch = batch.filter(pc.is_valid(batch.column(presence_col)))
    vals = pc.coalesce(pc.cast(batch.column(level_col), pa.string()), pa.scalar("", pa.string()))
    return pa.table({"level_value": vals})


def generalize_object_column(
    ds: ray.data.Dataset,
    attribute: str,
    level_cols: list[str],
    *,
    num_attrs: int,
    presence_col: str | None = None,
    out_col: str | None = None,
) -> tuple[ray.data.Dataset, ObjectGeneralizationResult]:
    """``level_cols`` are the hierarchy columns, lowest level first (e.g.
    ["addr_city", "addr_state", "addr_country"]). ``presence_col``: rows where
    this column is null are treated as lacking the object (skipped; output
    null). None -> all rows present."""
    out = out_col or f"{attribute}_generalized"

    if presence_col is None:
        k = ds.count()
    else:
        def _present(batch: pa.Table) -> pa.Table:
            return pa.table(
                {"present": pc.is_valid(batch.column(presence_col))}
            )

        k = int(
            ds.map_batches(_present, batch_format="pyarrow").sum("present") or 0
        )

    g = calculate_num_buckets(k, num_attrs)
    accepted: str | None = None
    if k > 0:
        threshold = k * 0.5 / g
        for level in level_cols:
            grouped = (
                ds.map_batches(
                    lambda b, lc=level: _level_values(b, lc, presence_col),
                    batch_format="pyarrow",
                )
                .groupby("level_value")
                .count()
            )
            stats = grouped.aggregate(Count(), Min("count()"))
            n_groups = stats["count()"]
            min_count = stats["min(count())"]
            if n_groups <= g and min_count > threshold:
                accepted = level
                break

    def _write(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if presence_col is not None:
            present = pc.is_valid(batch.column(presence_col))
        else:
            present = pa.array([True] * n, pa.bool_())
        if accepted is not None:
            vals = pc.coalesce(
                pc.cast(batch.column(accepted), pa.string()), pa.scalar("", pa.string())
            )
        else:
            vals = pa.array([MASK_VALUE] * n, pa.string())
        col_arr = pc.if_else(present, vals, pa.scalar(None, pa.string()))
        if out in batch.column_names:
            batch = batch.drop_columns([out])
        return batch.append_column(out, col_arr)

    res = ObjectGeneralizationResult(
        attribute=attribute, out_col=out, g=g, k=k, accepted_level=accepted
    )
    return ds.map_batches(_write, batch_format="pyarrow"), res
