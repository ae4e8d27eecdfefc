#!/usr/bin/env python
"""A/B: fuzzy-link batch kernel — the round-4 per-unique-mention Python loop
vs the chunked candidate-matrix vectorized kernel now in
``extras/er.link_batch``. Same inputs (sf0.1 customer mentions x nation
dictionary, the ``er_fuzzy_link`` registry shape), outputs compared exactly,
wall time measured kernel-vs-kernel over the same materialized batches so
Ray scheduling noise is out of the picture. Result recorded in BASELINE.md
(round-3 simhash A/B template)."""

import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

sys.path.insert(0, ".")


def old_kernel(b, col, names_, lens_, firsts_, lasts_, keep):
    """Round-4 kernel: Python loop over each batch's factorized unique
    mentions (kept verbatim as the A/B baseline)."""
    from anonymization_ray.extras.er import _within1

    vals = b.column(col).to_pandas()
    codes, uniq = pd.factorize(vals)
    hits = {}
    for u_idx, m in enumerate(uniq):
        if not isinstance(m, str):
            continue
        lm = len(m)
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
    cols["match"] = pa.array(matches, pa.string())
    cols["dist"] = pa.array(dists, pa.int64())
    return pa.table(cols)


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ray.init(
        address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from anonymization_ray.extras.er import link_batch
    from anonymization_ray.queries_extras import load

    nat = load(sf, "nation", ["n_nationkey", "n_name"]).to_pandas()
    names = {int(k): str(v) for k, v in zip(nat["n_nationkey"], nat["n_name"])}
    cust = load(sf, "customer", ["c_custkey", "c_nationkey"])

    def _mention(b: pa.Table) -> pa.Table:
        ck = b.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = b.column("c_nationkey").to_numpy(zero_copy_only=False)
        out = []
        for c, n in zip(ck, nk):
            nm = names[int(n)]
            p = (7 * int(c) + 3) % len(nm)
            out.append(nm[:p] + nm[p + 1 :])
        return pa.table(
            {
                "c_custkey": b.column("c_custkey").combine_chunks(),
                "mention": pa.array(out, pa.string()),
            }
        )

    batches = list(
        cust.map_batches(_mention, batch_format="pyarrow").iter_batches(
            batch_size=4096, batch_format="pyarrow"
        )
    )
    dict_names = sorted(set(names.values()))
    lens_ = np.array([len(n) for n in dict_names], np.int64)
    firsts_ = np.array([n[0] if n else "" for n in dict_names])
    lasts_ = np.array([n[-1] if n else "" for n in dict_names])
    keep = ["c_custkey"]

    def run(kern):
        outs = [
            kern(b, "mention", dict_names, lens_, firsts_, lasts_, keep)
            for b in batches
        ]
        return pa.concat_tables(outs).to_pandas()

    def new_kern(*a):
        return link_batch(*a, "match", "dist")

    def best(kern):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(kern)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_old, t_new = best(old_kernel), best(new_kern)
    key = ["c_custkey", "match", "dist"]
    a = run(old_kernel)[key].sort_values(key).reset_index(drop=True)
    b = run(new_kern)[key].sort_values(key).reset_index(drop=True)
    n_rows = sum(t.num_rows for t in batches)
    print(
        f"rows={n_rows} dict={len(dict_names)} old={t_old:.3f}s new={t_new:.3f}s "
        f"speedup={t_old / t_new:.2f}x match={a.equals(b)} out_rows={len(a)}"
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
