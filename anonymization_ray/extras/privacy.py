"""Differential-privacy mechanisms over Ray Data — randomized response.

Warner-style randomized response (Warner 1965; the categorical local-DP
mechanism, see also Erlingsson et al.'s RAPPOR) over a boolean attribute:
each row reports its TRUE bit with probability 3/4 and the lie with
probability 1/4, giving epsilon = ln(3) local DP. The coin is the SplitMix64
hash of the row id (seeded, partition-independent), so the mechanism is a
pure function of (id, truth) — reproducible at any parallelism and
replicable bit-for-bit by the HUGEINT SQL chain (``extras.shuffle.
sql_sm64_chain``), which is what makes an EXACT oracle possible for a
"randomized" operator.

The per-group unbiased estimator of the true positive count tau solves
E[reported_pos] = tau*3/4 + (n-tau)/4, i.e. tau_hat = (4*reported_pos - n)/2;
``est2 = 4*reported_pos - n`` (= 2*tau_hat) is emitted as an exact integer so
no division enters the compare.

Scale shape: stateless vectorized map_batches (hash + flip + per-batch
partial group counts), then one sort-based ``sum_per_key`` per output sum at
group cardinality. The corpus never shuffles; only (group, partial-count)
rows move.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .shuffle import sm64_key

# report truth iff hash < TRUTH_THRESHOLD  (3/4 of the uint64 space)
TRUTH_THRESHOLD = 3 << 62  # 13835058055282163712


def randomized_response_counts(
    ds: rd.Dataset,
    id_col: str,
    truth_col: str,
    group_col: str,
    *,
    salt: int = 0,
) -> rd.Dataset:
    """Dataset[(group_col, n, reported_pos, est2)] — per-group randomized-
    response counts. ``truth_col`` must be int-like 0/1 (nulls count as 0);
    ``id_col`` must be unique int64 (the per-row coin is keyed on it)."""
    from ..extras.graph import sum_per_key

    def _flip(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        truth = (
            pc.fill_null(pc.cast(b.column(truth_col), pa.int64()), 0)
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        h = sm64_key(ids, salt)
        lie = h >= np.uint64(TRUTH_THRESHOLD)
        rep = np.where(lie, 1 - truth, truth)
        t = pa.table(
            {
                "grp": pc.cast(b.column(group_col), pa.string()).combine_chunks(),
                "one": pa.array(np.ones(len(ids), np.int64)),
                "rep": pa.array(rep, pa.int64()),
            }
        )
        # per-batch partial: (grp, n, reported) — blocks emit group-sized rows
        g = t.group_by(["grp"]).aggregate([("one", "sum"), ("rep", "sum")])
        return g.rename_columns(["grp", "n", "reported_pos"])

    partials = ds.map_batches(_flip, batch_format="pyarrow").materialize()
    n = sum_per_key(partials.select_columns(["grp", "n"]), "grp", "n")
    rp = sum_per_key(
        partials.select_columns(["grp", "reported_pos"]), "grp", "reported_pos"
    )

    from ..util import hash_join

    j = hash_join(n, rp, on="grp")

    def _final(b: pa.Table) -> pa.Table:
        nn = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        rr = b.column("reported_pos").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                group_col: b.column("grp").combine_chunks(),
                "n": pa.array(nn, pa.int64()),
                "reported_pos": pa.array(rr, pa.int64()),
                "est2": pa.array(4 * rr - nn, pa.int64()),
            }
        )

    return j.map_batches(_final, batch_format="pyarrow")


def pseudonymize_column(
    ds: rd.Dataset, col: str, *, salt: str, prefix: str = "P_"
) -> rd.Dataset:
    """Keyed deterministic pseudonymization: value -> ``prefix`` +
    md5-64(value || '|' || salt) mod 2^32 — the reversible-only-with-table
    masking variant (same value + salt => same pseudonym, so joins on the
    pseudonym still work across tables; rotate the salt to unlink releases).
    md5-64 is the little-endian first-8-bytes convention shared with
    simhash, which is what makes the DuckDB oracle exact
    (``md5_number_upper``). Nulls stay null. Stateless vectorized
    map_batches with the batch's UNIQUE values hashed once."""
    import pandas as pd

    from .dedup import _md5_64

    out_col = f"{col}_pseudonym"

    def _p(b: pa.Table) -> pa.Table:
        v = b.column(col).combine_chunks()
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        sv = v.to_numpy(zero_copy_only=False)
        codes, uniq = pd.factorize(sv[valid])
        uh = np.fromiter(
            (_md5_64(f"{u}|{salt}") % (1 << 32) for u in uniq),
            dtype=np.int64,
            count=len(uniq),
        )
        out = np.full(len(sv), None, dtype=object)
        hv = uh[codes]
        out[valid] = [f"{prefix}{h}" for h in hv]
        return b.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(_p, batch_format="pyarrow")


def suppress_small_cells(
    ds: rd.Dataset, cols: list[str], min_count: int, *, sentinel: str = "*****"
) -> rd.Dataset:
    """Cell suppression: rows whose combination of ``cols`` values occurs
    fewer than ``min_count`` times get those columns replaced by the
    sentinel — the enforcement-side complement of the k-anonymity KPI
    (small equivalence classes are suppressed instead of merely reported).

    Shape: exact cell counts via per-batch partial group_by + sort-based
    ``sum_per_key`` (cells bounded by the attribute-domain product —
    documented contract), small cells broadcast as a sorted key set, then
    one vectorized membership pass over the stream. ``cols`` must be
    non-null strings."""
    from .graph import sum_per_key

    SEP = "\x1f"

    def _pairs(b: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            *[pc.cast(b.column(c), pa.string()) for c in cols], SEP
        )
        t = pa.table({"k": key, "one": pa.array(np.ones(b.num_rows, np.int64))})
        g = t.group_by(["k"]).aggregate([("one", "sum")])
        return g.rename_columns(["k", "one"])

    counts = sum_per_key(
        ds.map_batches(_pairs, batch_format="pyarrow"), "k", "one"
    )
    small = counts.map_batches(
        lambda b: b.filter(pc.less(b.column("one"), min_count)).select(["k"]),
        batch_format="pyarrow",
    ).take_all()  # bounded by cell-domain size
    small_keys = np.sort(np.array([r["k"] for r in small], dtype=object).astype(str))

    def _mask(b: pa.Table) -> pa.Table:
        key = (
            pc.binary_join_element_wise(
                *[pc.cast(b.column(c), pa.string()) for c in cols], SEP
            )
            .to_numpy(zero_copy_only=False)
            .astype(str)
        )
        if len(small_keys):
            pos = np.searchsorted(small_keys, key)
            pos[pos >= len(small_keys)] = len(small_keys) - 1
            hit = small_keys[pos] == key
        else:
            hit = np.zeros(len(key), dtype=bool)
        for c in cols:
            orig = pc.cast(b.column(c), pa.string()).to_numpy(zero_copy_only=False)
            vals = np.where(hit, sentinel, orig)
            i = b.column_names.index(c)
            b = b.set_column(i, c, pa.array(vals, pa.string()))
        return b

    return ds.map_batches(_mask, batch_format="pyarrow")


def delta_presence(
    population: rd.Dataset,
    *,
    class_col: str,
    sample_col: str,
) -> rd.Dataset:
    """δ-presence per equivalence class (Nergiz/Atzori/Clifton 2007): for a
    private sample S of a PUBLIC population table, the per-class presence
    probability |S ∩ C| / |P ∩ C| bounds what an attacker who knows the
    population learns about sample membership. Complements the engine's
    k-anonymity / l-diversity / t-closeness KPI family (reference KPI frame
    `Anonymization.java:60-75`): k-anonymity protects identity within the
    RELEASED table, δ-presence protects MEMBERSHIP when the population is
    public.

    ``class_col``: int64 equivalence-class key (pack multi-attribute QI
    classes upstream). ``sample_col``: int64 0/1 membership flag. Returns
    (class_key, n_pop, n_sample, delta_micro) with
    delta_micro = 10^6 · n_sample // n_pop — exact integers end to end.

    Scale shape: ONE `fold_per_key` pass (per-batch Arrow partials, one
    narrow sort, block-spanning edge merge) — the full population never
    shuffles wide, there is no Ray groupby at class cardinality."""
    from ..util import fold_per_key

    folded = fold_per_key(
        population.select_columns([class_col, sample_col]),
        class_col,
        {"n_pop": ("count", None), "n_sample": ("sum", sample_col)},
    )

    def _delta(b: pa.Table) -> pa.Table:
        npop = b.column("n_pop").to_numpy(zero_copy_only=False)
        nsmp = b.column("n_sample").to_numpy(zero_copy_only=False)
        return b.append_column(
            "delta_micro",
            pa.array((1_000_000 * nsmp) // npop, pa.int64()),
        )

    return folded.map_batches(_delta, batch_format="pyarrow")


def mondrian_partition(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
    *,
    k: int,
    rounds: int,
) -> rd.Dataset:
    """Mondrian multidimensional k-anonymity (LeFevre et al. 2006), the
    median-cut greedy partitioner, bounded-round: each round every region
    picks its WIDER attribute (x on ties), computes the lower median
    (DuckDB ``quantile_disc`` semantics — rank ceil(n/2)), and splits into
    v <= med / v > med halves IFF both halves keep >= k rows; regions that
    cannot split are stamped '=' and stay intact. After ``rounds`` rounds
    the region label is the cut path ('LRL=' ...), and every region is a
    k-anonymous box. Returns (region, n) — the class table.

    Scale shape per round: one `fold_per_key` (ranges + size) and one
    `group_quantiles` median pass at REGION cardinality, one fold for the
    below-median counts, then one region-cardinality hash join stamps the
    row stream — the data never gathers; per-round state is region-sized.
    Inputs must be integer units (cents) — float medians would not be
    value-exact."""
    from ..extras.stats import group_quantiles
    from ..util import fold_per_key, hash_join

    work = ds.map_batches(
        lambda b: pa.table(
            {
                "region": pa.array([""] * b.num_rows, pa.string()),
                "x": pc.cast(b.column(x_col), pa.int64()).combine_chunks(),
                "y": pc.cast(b.column(y_col), pa.int64()).combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    for _ in range(rounds):
        ranges = fold_per_key(
            work.map_batches(
                lambda b: pa.table(
                    {
                        "region": b.column("region").combine_chunks(),
                        "minx": b.column("x").combine_chunks(),
                        "maxx": b.column("x").combine_chunks(),
                        "miny": b.column("y").combine_chunks(),
                        "maxy": b.column("y").combine_chunks(),
                        "one": pa.array(np.ones(b.num_rows, np.int64)),
                    }
                ),
                batch_format="pyarrow",
            ),
            "region",
            {
                "minx": ("min", "minx"),
                "maxx": ("max", "maxx"),
                "miny": ("min", "miny"),
                "maxy": ("max", "maxy"),
                "n": ("sum", "one"),
            },
        ).take_all()
        info = {
            r["region"]: (
                int(r["maxx"]) - int(r["minx"]) >= int(r["maxy"]) - int(r["miny"]),
                int(r["n"]),
            )
            for r in ranges
        }

        def _val(b: pa.Table, info=info) -> pa.Table:
            # factorize region ONCE per batch, then numpy gathers — no
            # per-row dict lookups in the kernel
            import pandas as pd

            codes, uniq = pd.factorize(
                b.column("region").to_numpy(zero_copy_only=False)
            )
            wide_u = np.array([info[r][0] for r in uniq], bool)
            wide_x = wide_u[codes]
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "region": b.column("region").combine_chunks(),
                    "val": pa.array(np.where(wide_x, x, y).astype(np.int64)),
                }
            )

        vals = work.map_batches(_val, batch_format="pyarrow").materialize()
        med = {
            r["region"]: int(r["value"])
            for r in group_quantiles(vals, "region", "val", [0.5]).take_all()
        }

        def _below(b: pa.Table, med=med) -> pa.Table:
            import pandas as pd

            codes, uniq = pd.factorize(
                b.column("region").to_numpy(zero_copy_only=False)
            )
            med_u = np.array([med[r] for r in uniq], np.int64)
            lo = (
                b.column("val").to_numpy(zero_copy_only=False) <= med_u[codes]
            ).astype(np.int64)
            return pa.table(
                {
                    "region": b.column("region").combine_chunks(),
                    "lo": pa.array(lo),
                }
            )

        low = fold_per_key(
            vals.map_batches(_below, batch_format="pyarrow"),
            "region",
            {"n_lo": ("sum", "lo")},
        ).take_all()
        n_lo = {r["region"]: int(r["n_lo"]) for r in low}
        split = {
            r: min(n_lo[r], info[r][1] - n_lo[r]) >= k for r in info
        }

        def _stamp(b: pa.Table, info=info, med=med, split=split) -> pa.Table:
            import pandas as pd

            regs = b.column("region").to_numpy(zero_copy_only=False)
            codes, uniq = pd.factorize(regs)
            wide_u = np.array([info[r][0] for r in uniq], bool)
            med_u = np.array([med[r] for r in uniq], np.int64)
            split_u = np.array([split[r] for r in uniq], bool)
            x = b.column("x").to_numpy(zero_copy_only=False)
            y = b.column("y").to_numpy(zero_copy_only=False)
            v = np.where(wide_u[codes], x, y)
            suffix = np.where(
                split_u[codes],
                np.where(v <= med_u[codes], "L", "R"),
                "=",
            )
            out = np.char.add(regs.astype(str), suffix)
            return pa.table(
                {
                    "region": pa.array(out),
                    "x": b.column("x").combine_chunks(),
                    "y": b.column("y").combine_chunks(),
                }
            )

        work = work.map_batches(_stamp, batch_format="pyarrow").materialize()

    out = fold_per_key(
        work.map_batches(
            lambda b: pa.table(
                {
                    "region": b.column("region").combine_chunks(),
                    "one": pa.array(np.ones(b.num_rows, np.int64)),
                }
            ),
            batch_format="pyarrow",
        ),
        "region",
        {"n": ("sum", "one")},
    )
    return out
