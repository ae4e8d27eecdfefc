"""Basic-graph-pattern matching over a triple Dataset — the SPARQL-shaped
read path a triple store exists for (the reference serves its graph from
Jena, whose query surface is BGPs; reference pytest queries are all
single-property probes, SELECT-shaped: see `SURVEY.md §2.2`).

A pattern is a (subj, pred, obj) string triple where elements starting with
``?`` are variables and everything else is a constant, e.g.::

    match_bgp(triples, [
        ("?c", "basedIn", "?n"),
        ("?n", "partOf", "urn:region:0"),
        ("?c", "hasAccountBalance", "?b"),
    ], select=["?c", "?n", "?b"])

Execution shape (Ray-Data-first, no triple-store index server):

- each pattern becomes ONE filtered projection of the triple stream
  (vectorized ``pc.equal`` masks; constants prune early so an arm's binding
  table is already variable-width-narrow when it leaves the scan);
- arms join LEFT-DEEP in the given order on their shared variables via
  Ray's hash-partitioned join (multi-key tuples supported). Order patterns
  most-selective-first — the classic BGP planning rule — because the
  intermediate binding table is the thing that must stay small; partition
  counts are clamped for small inputs the same way the other join plans do;
- a repeated variable inside one pattern (``(?x, p, ?x)``) becomes an
  in-scan equality filter, never a join.

At 100 TB the SPO/POS layouts make each arm's scan index-aware: a constant
predicate reads only its row-group range of the POS layout
(``materialize.read_pred``), a constant subject the SPO range — the caller
passes whichever projection of the store it wants to scan.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import default_num_partitions, hash_join

_POS_COLS = ("subj", "pred", "obj")


def _is_var(x: str) -> bool:
    return x.startswith("?")


def _arm(triples: rd.Dataset, pattern: tuple[str, str, str]) -> tuple[rd.Dataset, list[str]]:
    """One pattern -> (bindings Dataset, its variable names)."""
    consts = [(c, v) for c, v in zip(_POS_COLS, pattern) if not _is_var(v)]
    out_vars: dict[str, str] = {}  # var name -> source col (first occurrence)
    eq_pairs: list[tuple[str, str]] = []
    for c, v in zip(_POS_COLS, pattern):
        if _is_var(v):
            if v in out_vars:
                eq_pairs.append((out_vars[v], c))
            else:
                out_vars[v] = c

    def _scan(b: pa.Table) -> pa.Table:
        mask = None
        for col, val in consts:
            m = pc.equal(b.column(col), val)
            mask = m if mask is None else pc.and_(mask, m)
        for c1, c2 in eq_pairs:
            m = pc.equal(b.column(c1), b.column(c2))
            mask = m if mask is None else pc.and_(mask, m)
        t = b.filter(pc.fill_null(mask, False)) if mask is not None else b
        return pa.table(
            {v: t.column(col).combine_chunks() for v, col in out_vars.items()}
        )

    return triples.map_batches(_scan, batch_format="pyarrow"), list(out_vars)


def match_bgp(
    triples: rd.Dataset,
    patterns: list[tuple[str, str, str]],
    *,
    select: list[str] | None = None,
    num_partitions: int | None = None,
    optional: list[list[tuple[str, str, str]]] | None = None,
) -> rd.Dataset:
    """Match a conjunction of triple patterns; returns one row per variable
    binding (bag semantics, like SPARQL SELECT without DISTINCT). Joins run
    left-deep in pattern order — put the most selective pattern first.

    ``optional`` adds SPARQL OPTIONAL groups: each group is a pattern list
    joined inner internally (left-deep, same rules), then LEFT-OUTER joined
    to the required bindings on its shared variables — unmatched bindings
    keep their row with the group's new variables null, exactly the SPARQL
    left-join semantics (well-designed patterns only: a group's shared vars
    must be bound by the REQUIRED block)."""
    if not patterns:
        raise ValueError("empty pattern list")
    nparts = num_partitions or max(2, min(default_num_partitions(), 8))

    bound, bound_vars = _arm(triples, patterns[0])
    for pat in patterns[1:]:
        arm, arm_vars = _arm(triples, pat)
        shared = [v for v in arm_vars if v in bound_vars]
        if not shared:
            raise ValueError(
                f"pattern {pat} shares no variable with the bound set "
                f"{bound_vars} — reorder patterns (cartesian products are "
                "not supported)"
            )
        # hash_join (not raw .join): both sides materialized, so empty
        # blocks are compacted away and the partition count clamps to the
        # smaller side — a zero-row first block would otherwise skip Ray's
        # one-shot schema broadcast and crash the aggregator (util.hash_join)
        bound = hash_join(
            bound.materialize(),
            arm.materialize(),
            on=tuple(shared),
            join_type="inner",
            num_partitions=nparts,
        )
        bound_vars = bound_vars + [v for v in arm_vars if v not in bound_vars]
    for group in optional or []:
        if not group:
            continue
        g_bound, g_vars = _arm(triples, group[0])
        for pat in group[1:]:
            arm, arm_vars = _arm(triples, pat)
            shared = [v for v in arm_vars if v in g_vars]
            if not shared:
                raise ValueError(
                    f"optional pattern {pat} shares no variable inside its group"
                )
            g_bound = hash_join(
                g_bound.materialize(),
                arm.materialize(),
                on=tuple(shared),
                join_type="inner",
                num_partitions=nparts,
            )
            g_vars = g_vars + [v for v in arm_vars if v not in g_vars]
        shared = [v for v in g_vars if v in bound_vars]
        if not shared:
            raise ValueError(
                f"optional group {group} shares no variable with the required "
                f"bindings {bound_vars}"
            )
        bound = hash_join(
            bound.materialize(),
            g_bound.materialize(),
            on=tuple(shared),
            join_type="left_outer",
            num_partitions=nparts,
        )
        bound_vars = bound_vars + [v for v in g_vars if v not in bound_vars]
    if select:
        missing = [v for v in select if v not in bound_vars]
        if missing:
            raise ValueError(f"select variables {missing} not bound by any pattern")
        bound = bound.select_columns(select)
    # strip the '?' for writable/SQL-comparable column names
    return bound.rename_columns({v: v.lstrip("?") for v in (select or bound_vars)})


def optimize_pattern_order(
    triples: rd.Dataset,
    patterns: list[tuple[str, str, str]],
    *,
    pred_counts: dict[str, int] | None = None,
) -> list[tuple[str, str, str]]:
    """Cost-based join ordering for a BGP conjunction (the ARQ-style
    optimization the docstring of :func:`match_bgp` asks callers to do by
    hand): estimate each pattern's arm cardinality — a constant-predicate
    pattern scans exactly its predicate's triple count, a variable-predicate
    pattern scans the whole stream — then greedily pick the smallest
    CONNECTED pattern next (left-deep joins must share a variable with the
    bound set; the first pick is the global smallest). Extra constants on
    subj/obj halve the estimate per bound position (a coarse but monotone
    selectivity prior).

    ``pred_counts`` may be supplied (e.g. from a stats table kept alongside
    the store); otherwise ONE narrow fold over the pred column computes it —
    predicate cardinality is vocabulary-sized, never corpus-sized."""
    if pred_counts is None:
        from ..extras.stats import exact_value_counts

        proj = triples.map_batches(
            lambda b: pa.table({"pred": b.column("pred")}), batch_format="pyarrow"
        )
        pred_counts = {
            r["pred"]: int(r["n"]) for r in exact_value_counts(proj, "pred").take_all()
        }
    total = sum(pred_counts.values()) or 1

    def _cost(pat: tuple[str, str, str]) -> float:
        s, p, o = pat
        base = float(pred_counts.get(p, 0)) if not _is_var(p) else float(total)
        for term in (s, o):
            if not _is_var(term):
                base /= 2.0
        return base

    def _vars(pat) -> set[str]:
        return {t for t in pat if _is_var(t)}

    remaining = list(patterns)
    ordered: list[tuple[str, str, str]] = []
    bound: set[str] = set()
    while remaining:
        connected = [
            p for p in remaining if not ordered or (_vars(p) & bound)
        ]
        pool = connected if connected else remaining  # cartesian-free inputs
        pick = min(pool, key=lambda p: (_cost(p), remaining.index(p)))
        ordered.append(pick)
        remaining.remove(pick)
        bound |= _vars(pick)
    return ordered
