"""Entity-resolution fuzzy linking — match a corpus-scale stream of messy
surface forms against a broadcast canonical dictionary at edit distance <= 1
(the dominant typo class: one substitution, insertion or deletion).

Scale shape: the dictionary rides the object store ONCE (`ray.put`); each
batch dedups its mentions locally (`pd.factorize` — repeated surface forms
are the norm in web text), prunes candidates with vectorized length-band +
first/last-char filters, and only the surviving (mention, name) pairs pay
the O(len) banded distance check. The corpus never shuffles. Blocking for
larger distances is a different algorithm (q-gram / LSH — see dedup.py);
this operator is deliberately exact and d<=1.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def _within1(a: str, b: str) -> int | None:
    """Edit distance if <= 1 else None (banded check, O(len))."""
    la, lb = len(a), len(b)
    if a == b:
        return 0
    if la == lb:
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if abs(la - lb) != 1:
        return None
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # a is shorter: one skip allowed in b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1 :] else None


def fuzzy_link(
    ds: rd.Dataset,
    col: str,
    names: list[str],
    *,
    keep_cols: list[str] | None = None,
    out_col: str = "match",
    dist_col: str = "dist",
) -> rd.Dataset:
    """Rows of ``ds`` linked to every dictionary name within edit distance 1
    of ``ds[col]`` (one output row per (row, matching name); non-matching
    rows drop — semi-join semantics)."""
    arr = sorted(set(names))
    lens = np.array([len(n) for n in arr], np.int64)
    firsts = np.array([n[0] if n else "" for n in arr])
    lasts = np.array([n[-1] if n else "" for n in arr])
    ref = ray.put((arr, lens, firsts, lasts))
    keep = keep_cols or []

    def _link(b: pa.Table) -> pa.Table:
        names_, lens_, firsts_, lasts_ = ray.get(ref)
        vals = b.column(col).to_pandas()
        codes, uniq = pd.factorize(vals)
        hits: dict[int, list[tuple[str, int]]] = {}
        for u_idx, m in enumerate(uniq):
            if m is None:
                continue
            lm = len(m)
            # a d<=1 pair always keeps its first OR last char equal, except
            # when either side is a single char (substitution moves both ends)
            cand = np.flatnonzero(
                (np.abs(lens_ - lm) <= 1)
                & ((firsts_ == m[0]) | (lasts_ == m[-1]) | (lens_ <= 1) | (lm <= 1))
            )
            out = []
            for ci in cand:
                d = _within1(m, names_[ci])
                if d is not None:
                    out.append((names_[ci], d))
            if out:
                hits[u_idx] = out
        rows, matches, dists = [], [], []
        for i, c in enumerate(codes):
            for nm, d in hits.get(c, ()):
                rows.append(i)
                matches.append(nm)
                dists.append(d)
        idx = pa.array(rows, pa.int64())
        cols = {c: b.column(c).take(idx) for c in keep}
        cols[col] = b.column(col).take(idx)
        cols[out_col] = pa.array(matches, pa.string())
        cols[dist_col] = pa.array(dists, pa.int64())
        return pa.table(cols)

    return ds.map_batches(_link, batch_format="pyarrow")


def survivorship_merge(
    ds: rd.Dataset,
    *,
    entity_col: str,
    priority_col: str,
    value_cols: list[str],
) -> rd.Dataset:
    """Golden-record survivorship (the MDM step after `fuzzy_link`
    matching): per entity and per attribute INDEPENDENTLY, the surviving
    value is the non-null one from the best (lowest) source priority —
    the "first non-null by trust order" rule every master-data tool
    defaults to. (entity, priority) pairs must be unique; entities with
    no non-null value for an attribute surface it as null.

    Scale shape, per attribute: drop nulls -> `min_per_key` winning
    priority (range sort + boundary scan, no per-group aggregate) -> one
    entity-keyed hash join fetches the winning value. Attribute results
    re-join on the entity key — the SAME partitioning key throughout, so
    a co-partitioning executor reuses one shuffle; no stage ever holds
    more than (entity, priority, one attribute)."""
    from ..util import hash_join, min_per_key

    # seed with the entity universe so an entity whose every source left an
    # attribute null still surfaces (with that attribute null) — the
    # per-attribute null-drop below cannot resurrect it
    golden: rd.Dataset = min_per_key(
        ds.select_columns([entity_col, priority_col]), entity_col, priority_col
    ).select_columns([entity_col])
    for c in value_cols:
        nn = ds.select_columns([entity_col, priority_col, c]).map_batches(
            lambda b, col=c: b.filter(pc.is_valid(b.column(col))),
            batch_format="pyarrow",
        )
        win = min_per_key(nn, entity_col, priority_col).rename_columns(
            {priority_col: "_pmin"}
        )
        picked = hash_join(nn, win, on=entity_col, join_type="inner")
        part = picked.map_batches(
            lambda b, col=c: b.filter(
                pc.equal(b.column(priority_col), b.column("_pmin"))
            ).select([entity_col, col]),
            batch_format="pyarrow",
        )
        golden = hash_join(golden, part, on=entity_col, join_type="left_outer")
    return golden
