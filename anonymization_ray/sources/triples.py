"""Triple-store <-> wide-table conversion (Q3's triple-store form).

The reference's data extraction pivots SPARQL row bindings into per-entity
rows (``QueryBuildingService.java:31-46``, ``QueryService.java:72-97``,
horizontal pivot ``AnonymizationService.java:118-126``). In triple form that
is: hash-partition by subject, then pivot each subject group's (pred, obj)
pairs into one wide row — implemented as ``groupby(subj).map_groups`` with a
vectorized in-group pivot. Duplicate (subj, pred) keeps the first obj in
(pred, obj) order (SPARQL row bindings are unordered; we fix a deterministic
choice).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd


def pivot_triples_to_wide(
    triples: rd.Dataset,
    predicates: list[str],
    *,
    subj_col: str = "subj",
    pred_col: str = "pred",
    obj_col: str = "obj",
) -> rd.Dataset:
    """Dataset[(subj, pred, obj)] -> Dataset[(subj, <pred1>, <pred2>, ...)].

    The shuffle key is the subject hash; each group pivots vectorized. Fixed
    ``predicates`` give the output schema (absent predicate -> null).
    """
    pred_set = pa.array(sorted(set(predicates)))

    def _slim(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        m = pc.is_in(batch.column(pred_col), value_set=pred_set)
        return pa.table(
            {
                "subj": batch.column(subj_col).combine_chunks(),
                "pred": batch.column(pred_col).combine_chunks(),
                "obj": batch.column(obj_col).combine_chunks(),
            }
        ).filter(m)

    slim = triples.map_batches(_slim, batch_format="pyarrow")

    def _pivot(group: pa.Table) -> pa.Table:
        import numpy as np

        preds = group.column("pred").to_numpy(zero_copy_only=False)
        objs = group.column("obj").to_numpy(zero_copy_only=False)
        order = np.lexsort((objs, preds))
        row = {"subj": [group.column("subj")[0].as_py()]}
        chosen: dict[str, str] = {}
        for i in order:
            chosen.setdefault(preds[i], objs[i])
        for p in predicates:
            row[p] = [chosen.get(p)]
        return pa.table({k: pa.array(v, pa.string()) if k != "subj" else pa.array(v) for k, v in row.items()})

    return slim.groupby("subj").map_groups(_pivot, batch_format="pyarrow")


def wide_to_triples(
    ds: rd.Dataset,
    id_col: str,
    value_cols: list[str],
    *,
    subj_prefix: str = "",
) -> rd.Dataset:
    """Wide rows -> (subj, pred, obj string) triples (nulls skipped)."""
    import pyarrow.compute as pc

    def _explode(batch: pa.Table) -> pa.Table:
        subj = pc.cast(batch.column(id_col), pa.string())
        if subj_prefix:
            subj = pc.binary_join_element_wise(
                pa.array([subj_prefix] * batch.num_rows), subj, ""
            )
        from ..util import format_double

        parts = []
        for c in value_cols:
            vals = batch.column(c).combine_chunks()
            mask = pc.is_valid(vals)
            lex = (
                format_double(vals)
                if pa.types.is_floating(vals.type)
                else pc.cast(vals, pa.string())
            )
            parts.append(
                pa.table(
                    {
                        "subj": subj.filter(mask) if isinstance(subj, pa.Array) else subj.combine_chunks().filter(mask),
                        "pred": pa.array([c] * batch.num_rows).filter(mask),
                        "obj": lex.filter(mask),
                    }
                )
            )
        return pa.concat_tables(parts)

    return ds.map_batches(_explode, batch_format="pyarrow")
