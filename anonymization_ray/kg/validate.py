"""SHACL-lite cardinality validation (sh:minCount / sh:maxCount) — the
structural companion to the wave-18 domain/range/datatype rules: for every
focus node (subjects bearing ``focus_pred``), the number of ``pred``
triples must fall inside [min_count, max_count].

Shape: one filtered scan per predicate, counts via ``fold_per_key`` (no
per-group UDF), missing focus nodes recovered by an anti semi-join of the
focus set against the count keys — the store streams, only per-key count
rows and violation rows materialize.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import distinct_rows, fold_per_key


def validate_cardinality(
    triples: rd.Dataset,
    *,
    focus_pred: str,
    pred: str,
    min_count: int = 1,
    max_count: int | None = None,
) -> rd.Dataset:
    """(focus, got, rule) rows for every focus node violating the
    cardinality constraint on ``pred``. Focus nodes are the distinct
    subjects of ``focus_pred``."""
    from ..extras.joins import semi_anti_join

    rule = (
        f"count({pred}) in [{min_count}, "
        f"{'inf' if max_count is None else max_count}]"
    )

    def _scan(p: str, out: str):
        def _f(b: pa.Table) -> pa.Table:
            t = b.filter(pc.equal(b.column("pred"), p))
            return pa.table({out: t.column("subj").combine_chunks()})

        return triples.map_batches(_f, batch_format="pyarrow")

    focus = distinct_rows(_scan(focus_pred, "focus"), ["focus"])
    counts = fold_per_key(
        _scan(pred, "focus"), "focus", {"got": ("count", None)}
    ).materialize()

    parts: list[rd.Dataset] = []
    if min_count > 0:
        # focus nodes with ZERO pred triples never appear in counts
        missing = semi_anti_join(focus, counts, on="focus", anti=True,
                                 broadcast=False)
        parts.append(
            missing.map_batches(
                lambda b: b.append_column(
                    "got", pa.array([0] * b.num_rows, pa.int64())
                ),
                batch_format="pyarrow",
            )
        )
    # present-but-out-of-range (only focus nodes count — a subject bearing
    # pred without focus_pred is out of the shape's scope)
    lo, hi = min_count, max_count

    def _bad(b: pa.Table) -> pa.Table:
        g = b.column("got")
        m = pc.less(g, lo)
        if hi is not None:
            m = pc.or_(m, pc.greater(g, hi))
        return b.filter(m)

    in_scope = semi_anti_join(counts, focus, on="focus", broadcast=False)
    parts.append(in_scope.map_batches(_bad, batch_format="pyarrow"))

    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.map_batches(
        lambda b: b.append_column(
            "rule", pa.array([rule] * b.num_rows, pa.string())
        ),
        batch_format="pyarrow",
    )
