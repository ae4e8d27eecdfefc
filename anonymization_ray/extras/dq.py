"""Data-quality audit operators — the constraint checks every production
ingest gates on before training or serving: referential integrity (orphan
foreign keys), primary-key uniqueness, and null/NaN completeness. Each check
returns its VIOLATIONS (not a boolean), so the caller can quarantine rows or
fail the batch with evidence.

Scale shapes: FK orphans are a broadcast-or-join anti semi-join on the
(distinct) key sets — the fact table streams, only keys move; PK duplicates
reuse the sort+boundary-scan dup detection (no per-group aggregate); null
profiling is one partial-agg scan folded on the driver (column-count-bounded).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def fk_orphans(
    fact: rd.Dataset,
    fk_col: str,
    dim: rd.Dataset,
    pk_col: str,
) -> rd.Dataset:
    """Fact rows whose ``fk_col`` has no match in ``dim.pk_col`` (nulls are
    violations too — a null FK never joins). The dimension's distinct key
    set reduces first; the fact table streams through one vectorized anti
    ``is_in`` when the key set fits a broadcast, else the semi-anti join."""
    from ..extras.joins import semi_anti_join
    from ..util import distinct_rows

    keys = distinct_rows(
        dim.select_columns([pk_col]).map_batches(
            lambda b: pa.table({pk_col: pc.cast(b.column(pk_col), pa.int64())}),
            batch_format="pyarrow",
        ),
        [pk_col],
    )
    n_keys = keys.count()
    if n_keys <= 5_000_000:
        key_tbl = pa.concat_tables(
            [t for t in ray.get(keys.to_arrow_refs()) if t.num_rows]
        )
        kref = ray.put(key_tbl.column(pk_col).combine_chunks())

        def _anti(b: pa.Table) -> pa.Table:
            fk = pc.cast(b.column(fk_col), pa.int64())
            ok = pc.is_in(fk, value_set=ray.get(kref))
            # null fk -> is_in null -> treated as no-match (violation)
            bad = pc.invert(pc.fill_null(ok, False))
            return b.filter(bad)

        return fact.map_batches(_anti, batch_format="pyarrow")
    return semi_anti_join(fact, keys, on=fk_col, right_on=pk_col, anti=True)


def pk_duplicates(ds: rd.Dataset, pk_col: str) -> rd.Dataset:
    """(pk, n) for every primary-key value appearing more than once — the
    uniqueness constraint's violation list via ``exact_value_counts``
    (per-block partials + one narrow sort, any cardinality)."""
    from ..extras.stats import exact_value_counts

    counts = exact_value_counts(ds.select_columns([pk_col]), pk_col)
    return counts.map_batches(
        lambda b: b.filter(pc.greater(b.column("n"), 1)),
        batch_format="pyarrow",
    )


def null_profile(ds: rd.Dataset, cols: list[str]) -> pa.Table:
    """(column, n_null, n_total) per audited column in ONE streaming pass
    (NaN counts as null, matching the library-wide missing convention);
    per-block partials fold on the driver — output is column-count-bounded."""
    def _partial(b: pa.Table) -> pa.Table:
        names, nulls, totals = [], [], []
        for c in cols:
            col = b.column(c)
            n_null = col.null_count
            if pa.types.is_floating(col.type):
                n_null += int(
                    pc.sum(pc.is_nan(pc.drop_null(col))).as_py() or 0
                )
            names.append(c)
            nulls.append(n_null)
            totals.append(len(col))
        return pa.table(
            {
                "column": pa.array(names, pa.string()),
                "n_null": pa.array(nulls, pa.int64()),
                "n_total": pa.array(totals, pa.int64()),
            }
        )

    parts = ds.select_columns(cols).map_batches(
        _partial, batch_format="pyarrow"
    ).take_all()
    agg: dict[str, list[int]] = {c: [0, 0] for c in cols}
    for r in parts:
        agg[r["column"]][0] += r["n_null"]
        agg[r["column"]][1] += r["n_total"]
    return pa.table(
        {
            "column": pa.array(cols, pa.string()),
            "n_null": pa.array([agg[c][0] for c in cols], pa.int64()),
            "n_total": pa.array([agg[c][1] for c in cols], pa.int64()),
        }
    )


def weighted_median_per_group(
    ds: rd.Dataset,
    group_col: str,
    val_col: str,
    weight_col: str,
) -> pa.Table:
    """Exact lower weighted median per group: the smallest value v such that
    the cumulative weight of rows <= v reaches half the group's total
    (2*cum >= total, integer arithmetic — no float thresholds). ONE range
    sort by (group, value); per-block weight partials chain into boundary
    carries on the driver (metadata-sized), then each block resolves its
    groups' threshold rows locally. Output is group-cardinality-bounded and
    gathered (use for domain-bounded group columns)."""
    from ..util import coalesce_blocks

    s = (
        coalesce_blocks(
            ds.select_columns([group_col, val_col, weight_col]).materialize()
        )
        .sort([group_col, val_col])
        .materialize()
    )
    refs = list(s.to_arrow_refs())

    @ray.remote(num_cpus=0.25)
    def _sums(t: pa.Table):
        """Per-group weight sums within the block, in group order —
        vectorized run detection + ``np.add.reduceat`` (the loop below is
        over the block's RUNS, never its rows)."""
        if t.num_rows == 0:
            return None
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        starts = np.nonzero(new)[0]
        run_sums = np.add.reduceat(w, starts)
        return [(g[i], int(s)) for i, s in zip(starts, run_sums)]

    sums = ray.get([_sums.remote(r) for r in refs])
    refs = [r for r, m in zip(refs, sums) if m is not None]
    sums = [m for m in sums if m is not None]
    totals: dict = {}
    for block in sums:
        for gi, wi in block:
            totals[gi] = totals.get(gi, 0) + wi
    # carry entering each block: cumulative weight already seen for the
    # block's FIRST group in earlier blocks
    carries = []
    run: dict = {}
    for block in sums:
        carries.append(run.get(block[0][0], 0))
        for gi, wi in block:
            run[gi] = run.get(gi, 0) + wi

    tot_ref = ray.put(totals)

    @ray.remote(num_cpus=0.5)
    def _resolve(t: pa.Table, carry: int):
        """Groups whose threshold row (first 2*cum >= total) falls in this
        block."""
        if t.num_rows == 0:
            return []
        g = np.asarray(t.column(group_col).to_pylist(), dtype=object)
        v = t.column(val_col).to_numpy(zero_copy_only=False)
        w = t.column(weight_col).to_numpy(zero_copy_only=False).astype(np.int64)
        tot = ray.get(tot_ref)
        new = np.empty(len(g), dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        seg_start = np.nonzero(new)[0][np.cumsum(new) - 1]
        cw = np.cumsum(w)
        cum = cw - (cw[seg_start] - w[seg_start])
        cum[np.cumsum(new) - 1 == 0] += carry  # first segment continues
        totals_row = np.array([tot[x] for x in g], dtype=np.int64)
        hit = 2 * cum >= totals_row
        # first hit per segment; a segment whose hit happened in an earlier
        # block has hit[seg_start] True with carry-included cum — exclude by
        # requiring cum - w < total/2 at the hit row (i.e. THIS row crosses)
        crosses = hit & (2 * (cum - w) < totals_row)
        if not crosses.any():
            return []
        first = np.zeros(len(g), dtype=bool)
        seg_id = np.cumsum(new) - 1
        seen = set()
        out = []
        idxs = np.nonzero(crosses)[0]
        for i in idxs:
            sid = seg_id[i]
            if sid not in seen:
                seen.add(sid)
                out.append((g[i], v[i]))
        return out

    rows = []
    for r, c in zip(refs, carries):
        rows.append(_resolve.remote(r, c))
    got = [x for part in ray.get(rows) for x in part]
    # a group's crossing row is unique (first row where cum crosses half),
    # so concatenation needs no dedup
    got.sort(key=lambda x: x[0])
    return pa.table(
        {
            group_col: pa.array([x[0] for x in got]),
            "wmedian": pa.array([int(x[1]) for x in got], pa.int64()),
        }
    )
