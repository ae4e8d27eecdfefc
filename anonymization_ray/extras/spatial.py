"""Spatial grid-partitioned radius join — all point pairs within distance R.

The spatial analogue of the dedup family's banded self-join
(`extras/dedup.py:minhash_lsh_pairs`): partition the plane into R×R grid
cells, key every point by its cell, and self-join on the cell key so that
only points in the same or adjacent cells ever meet. Each unordered pair of
nearby points is examined EXACTLY once:

- same-cell pairs come from the unshifted join leg with an ``id_a < id_b``
  filter;
- cross-cell pairs come from four half-space neighbor offsets
  ``{(1,-1), (1,0), (1,1), (0,1)}`` — the set H with H ∪ −H = all 8
  neighbors and H ∩ −H = ∅, so a pair spanning cells (C, D) is generated
  from exactly one side.

No distinct pass is needed downstream (contrast LSH, where a pair shares
many bands). 100-TB shape: the one shuffle keys on the cell id (spatial
locality — the natural partitioning for any follow-up stage), candidate
volume is Σ over adjacent cell pairs of |A|·|B| — bounded by point DENSITY,
never corpus size, because cell side = R. ``max_cell`` is the skew valve
for pathological hot cells (the city-center cell of a web-scale check-in
table), mirroring ``max_bucket``: oversized cells are dropped from pair
generation loudly-by-contract rather than detonating one partition.

Reference parity note: the reference engine has no spatial operator; this
extends the engine's join family (cited inventory `SURVEY.md §2`) the same
way ANN/dedup extend it, as a first-class training-data/link-analysis op.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# half-space neighbor offsets: H ∪ −H = the 8 neighbors, H ∩ −H = ∅
_HALF_OFFSETS = ((1, -1), (1, 0), (1, 1), (0, 1))
_CELL_BITS = 31


def _cells(x: np.ndarray, y: np.ndarray, radius: int) -> tuple[np.ndarray, np.ndarray]:
    if x.min(initial=0) < 0 or y.min(initial=0) < 0:
        raise ValueError(
            "grid_radius_join requires non-negative planar coordinates; "
            "shift the frame before joining"
        )
    cx, cy = x // radius, y // radius
    cap = np.int64(1) << np.int64(_CELL_BITS)
    # +1 headroom: probe copies shift cy by ±1 / cx by +1
    if cx.max(initial=0) + 1 >= cap or cy.max(initial=0) + 1 >= cap:
        raise ValueError("cell index exceeds 2^31; coarsen radius or rescale")
    return cx, cy


def _pack(cx: np.ndarray, cy: np.ndarray) -> np.ndarray:
    return (cx << np.int64(_CELL_BITS)) + cy


def grid_radius_join(
    points: rd.Dataset,
    *,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_cell: int | None = None,
) -> rd.Dataset:
    """(id_a < id_b, dist2) for every point pair with squared euclidean
    distance ``dist2 <= radius**2``. Coordinates must be non-negative
    int64; all arithmetic is integer, so results are value-exact."""
    from ..util import default_num_partitions

    r2 = int(radius) * int(radius)
    points = points.select_columns([id_col, x_col, y_col])

    def _home(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cx, cy = _cells(x, y, int(radius))
        return pa.table(
            {
                "cell": pa.array(_pack(cx, cy), pa.int64()),
                "id_a": batch.column(id_col),
                "x_a": pa.array(x, pa.int64()),
                "y_a": pa.array(y, pa.int64()),
            }
        )

    home = points.map_batches(_home, batch_format="pyarrow")

    bad: pa.Array | None = None
    if max_cell is not None:
        # cell census with the no-groupby exact counter; oversized cells
        # broadcast as a filter. Points of a dropped cell leave BOTH legs
        # (home and probe), so no pair touching the hot cell is emitted —
        # the same conservative contract as max_bucket.
        from .stats import exact_value_counts

        totals = exact_value_counts(home.select_columns(["cell"]), "cell")
        big = totals.map_batches(
            lambda b: b.filter(pc.greater(b.column("n"), max_cell)).select(
                ["cell"]
            ),
            batch_format="pyarrow",
        ).take_all()
        if big:
            bad = pa.array(sorted({r["cell"] for r in big}), pa.int64())

            def _drop_big(b: pa.Table) -> pa.Table:
                return b.filter(
                    pc.invert(pc.is_in(b.column("cell"), value_set=bad))
                )

            home = home.map_batches(_drop_big, batch_format="pyarrow")

    # probe stream: the point visible from its own cell (same=1) and from
    # the four half-space neighbor cells (same=0) — 5× narrow rows, built
    # in one vectorized pass
    def _probe(batch: pa.Table) -> pa.Table:
        x = batch.column(x_col).to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch.column(y_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ids = batch.column(id_col)
        cx, cy = _cells(x, y, int(radius))
        if bad is not None:
            ok = np.asarray(
                pc.invert(
                    pc.is_in(pa.array(_pack(cx, cy), pa.int64()), value_set=bad)
                )
            )
            x, y, cx, cy = x[ok], y[ok], cx[ok], cy[ok]
            ids = pc.take(ids, pa.array(np.flatnonzero(ok), pa.int64()))
        cells = [_pack(cx, cy)]
        same = [np.ones(len(x), dtype=np.int8)]
        for dx, dy in _HALF_OFFSETS:
            cells.append(_pack(cx + dx, cy + dy))
            same.append(np.zeros(len(x), dtype=np.int8))
        n = len(_HALF_OFFSETS) + 1
        idx = pa.array(np.tile(np.arange(len(x)), n), pa.int64())
        return pa.table(
            {
                "cell": pa.array(np.concatenate(cells), pa.int64()),
                "id_b": pc.take(ids, idx),
                "x_b": pa.array(np.tile(x, n), pa.int64()),
                "y_b": pa.array(np.tile(y, n), pa.int64()),
                "same": pa.array(np.concatenate(same), pa.int8()),
            }
        )

    probe = points.map_batches(_probe, batch_format="pyarrow")
    nparts = max(2, default_num_partitions() // 2)
    cand = home.join(probe, join_type="inner", num_partitions=nparts, on=("cell",))

    def _emit(batch: pa.Table) -> pa.Table:
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        xa = batch.column("x_a").to_numpy(zero_copy_only=False)
        ya = batch.column("y_a").to_numpy(zero_copy_only=False)
        xb = batch.column("x_b").to_numpy(zero_copy_only=False)
        yb = batch.column("y_b").to_numpy(zero_copy_only=False)
        same = batch.column("same").to_numpy(zero_copy_only=False)
        dx, dy = xa - xb, ya - yb
        d2 = dx * dx + dy * dy
        keep = (d2 <= r2) & np.where(same == 1, ia < ib, ia != ib)
        lo = np.minimum(ia[keep], ib[keep])
        hi = np.maximum(ia[keep], ib[keep])
        return pa.table(
            {
                "id_a": pa.array(lo, pa.int64()),
                "id_b": pa.array(hi, pa.int64()),
                "dist2": pa.array(d2[keep], pa.int64()),
            }
        )

    return cand.map_batches(_emit, batch_format="pyarrow")
