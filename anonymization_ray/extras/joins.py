"""Semi / anti join — the filter-join shapes a 100-TB pipeline uses to
subset one table by membership in another (e.g. keep only documents whose
url survived dedup; drop customers that appear in an opt-out list).

Two execution paths, chosen by the small-side size:

- **broadcast** (default when the right side is small): the DISTINCT right
  keys are reduced per-block (``pc.unique`` partials, so only the distinct
  stream — not the raw rows — ever reaches the driver), ``ray.put`` ONCE,
  and every left batch filters with one vectorized ``pc.is_in``. No shuffle
  of the big side at all — the left stream never moves.
- **shuffle**: Ray Data's native hash-partitioned ``left_semi`` /
  ``left_anti`` join for when both sides are large.

The broadcast path is the one that matters at scale: an anti join against a
dimension-sized exclusion list must not pay an all-to-all exchange of the
fact table.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

# above this many DISTINCT right keys the broadcast array stops being
# "dimension-scale" (100M int64 keys ~ 800MB per node) — callers with a
# bigger small side should take the shuffle path
BROADCAST_KEY_CAP = 100_000_000


def semi_anti_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    on: str,
    right_on: str | None = None,
    anti: bool = False,
    broadcast: bool = True,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Rows of ``left`` whose ``on`` value does (semi) / does not (anti)
    appear in ``right[right_on]``. Left schema is preserved either way;
    each left row appears at most once (membership, not multiplication)."""
    right_on = right_on or on
    if broadcast:
        # distinct-reduce BEFORE gathering: per-block unique partials make
        # the driver-side take_all proportional to key cardinality, not row
        # count; nulls never match (SQL IN semantics)
        partials = right.map_batches(
            lambda b: pa.table({right_on: pc.unique(pc.drop_null(b.column(right_on)))}),
            batch_format="pyarrow",
        )
        blocks = [b for b in ray.get(partials.to_arrow_refs()) if b.num_rows]
        if not blocks:
            # empty right side: anti keeps everything, semi keeps nothing
            # (avoids type fishing on a possibly schema-less empty dataset)
            return left if anti else left.limit(0)
        keys = pc.unique(pa.concat_tables(blocks).column(right_on).combine_chunks())
        if len(keys) > BROADCAST_KEY_CAP:
            raise ValueError(
                f"{len(keys)} distinct keys exceeds the broadcast cap "
                f"({BROADCAST_KEY_CAP}); use broadcast=False"
            )
        key_ref = ray.put(keys)

        def _filter(batch: pa.Table) -> pa.Table:
            ks = ray.get(key_ref)
            m = pc.is_in(batch.column(on), value_set=ks)
            m = pc.fill_null(m, False)
            if anti:
                m = pc.invert(m)
            return batch.filter(m)

        return left.map_batches(_filter, batch_format="pyarrow")

    from ..util import default_num_partitions

    if num_partitions is None:
        n_r = right.count()
        num_partitions = max(2, min(default_num_partitions() // 2, n_r // 2000 + 1))
    return left.join(
        right.select_columns([right_on]),
        join_type="left_anti" if anti else "left_semi",
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on,),
    )
