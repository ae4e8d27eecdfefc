"""Feature-engineering operators for training-data pipelines: smoothed
target encoding and the hashing trick (feature hashing).

Both are classic tabular/text featurizers a corpus-scale training pipeline
runs before model fitting:

- ``target_encode``: per-category smoothed mean of a target —
  enc(c) = (sum(c) + m·global_mean) / (n(c) + m) — the standard leakage-
  controlled categorical encoder. Sums ride in exact integer cents (the
  engine's float-determinism idiom), so the only float ops are the two
  final divisions, performed in the same order the SQL oracle performs
  them — value-hash exact.
- ``hashing_features``: sparse signed token-count vectors via the hashing
  trick (Weinberger et al. 2009): bucket = md5(token) mod k, sign from an
  independent hash nibble. md5 is content-defined and available in DuckDB,
  so the oracle replays the exact bucket/sign assignment.

Scale shapes: target_encode is one ``fold_per_key`` (per-batch Arrow
partials, narrow range sort, boundary merge — no Ray groupby) at category
cardinality; hashing_features is stateless per batch (hash the batch's
UNIQUE tokens once via factorize, in-batch partial aggregation) followed by
one ``sum_per_key`` at (doc, bucket) cardinality. Neither gathers the
corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..util import fold_per_key


def target_encode(
    ds: rd.Dataset,
    cat_cols: list[str],
    target_col: str,
    *,
    m: int = 10,
    sep: str = "|",
) -> rd.Dataset:
    """-> (category key cols joined by ``sep`` as 'cat', n, enc) where
    ``enc`` is the m-smoothed mean of the target in CENTS (double).
    ``target_col`` must be a float currency-like column; cents conversion is
    floor(v*100 + 0.5), matching the SQL oracle side."""

    def _partial(b: pa.Table) -> pa.Table:
        key = b.column(cat_cols[0]).cast(pa.string())
        for c in cat_cols[1:]:
            key = pc.binary_join_element_wise(key, b.column(c).cast(pa.string()), sep)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(b.column(target_col), 100.0), 0.5)),
            pa.int64(),
        )
        t = pa.table({"cat": key.combine_chunks(), "cents": cents})
        t = t.filter(pc.is_valid(t.column("cents")))
        return t.append_column("one", pa.array(np.ones(t.num_rows, np.int64)))

    narrow = ds.map_batches(_partial, batch_format="pyarrow")
    agg = fold_per_key(
        narrow, "cat", {"cents": ("sum", "cents"), "n": ("sum", "one")}
    ).materialize()

    # global mean from the (category-cardinality) aggregate — tiny reduce
    tot = agg.map_batches(
        lambda b: pa.table(
            {
                "k": pa.array(np.zeros(b.num_rows, np.int64)),
                "c": b.column("cents").combine_chunks(),
                "n": b.column("n").combine_chunks(),
            }
        ),
        batch_format="pyarrow",
    )
    tot_t = fold_per_key(tot, "k", {"c": ("sum", "c"), "n": ("sum", "n")}).take_all()
    tot_c = int(tot_t[0]["c"]) if tot_t else 0
    tot_n = int(tot_t[0]["n"]) if tot_t else 0
    g_mean = tot_c / tot_n if tot_n else 0.0

    def _enc(b: pa.Table) -> pa.Table:
        s = b.column("cents").to_numpy(zero_copy_only=False).astype(np.float64)
        n = b.column("n").to_numpy(zero_copy_only=False).astype(np.int64)
        # SAME op order as the SQL oracle: (sum + m*mean) / (n + m)
        enc = (s + m * g_mean) / (n + m)
        return pa.table(
            {
                "cat": b.column("cat").combine_chunks(),
                "n": pa.array(n, pa.int64()),
                "enc": pa.array(enc, pa.float64()),
            }
        )

    return agg.map_batches(_enc, batch_format="pyarrow")


_SIGN_DIV = 1 << 40  # sign nibble independent of bucket = hv % k (k << 2^40)


def _md5_int(token: str) -> int:
    return int(hashlib.md5(token.encode("utf-8")).hexdigest()[:15], 16)


def hashing_features(
    ds: rd.Dataset,
    id_col: str,
    text_col: str,
    *,
    k: int = 128,
) -> rd.Dataset:
    """-> sparse (id, bucket, val) rows: signed token counts under the
    hashing trick. Tokenization = lowercase whitespace split (the engine's
    BPE/token-count convention). ``id * k`` must fit int64 — true for any
    corpus whose ids fit 2^63/k; refuse loudly otherwise."""

    def _hash_batch(b: pa.Table) -> pa.Table:
        ids = b.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        if len(ids) and (np.abs(ids).max() > (1 << 62) // k):
            raise ValueError(
                f"{id_col} too large to pack with k={k} buckets in int64"
            )
        txt = pc.fill_null(b.column(text_col).combine_chunks(), "")
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(txt)), r"\s+"
        )
        counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = toks.flatten().to_numpy(zero_copy_only=False)
        doc = np.repeat(ids, counts)
        keep = flat != ""
        doc, flat = doc[keep], flat[keep]
        # hash each UNIQUE token once (web text repeats tokens heavily)
        codes, uniq = pd.factorize(flat)
        hv_u = np.array([_md5_int(t) for t in uniq], np.int64)
        hv = hv_u[codes] if len(codes) else np.empty(0, np.int64)
        bucket = hv % k
        sign = np.where((hv // _SIGN_DIV) % 2 == 0, 1, -1).astype(np.int64)
        t = (
            pa.table(
                {
                    "key": pa.array(doc * k + bucket, pa.int64()),
                    "val": pa.array(sign, pa.int64()),
                }
            )
            .group_by(["key"])
            .aggregate([("val", "sum")])
        )
        return t.rename_columns(["key", "val"])

    from ..extras.graph import sum_per_key

    packed = sum_per_key(
        ds.map_batches(_hash_batch, batch_format="pyarrow"), "key", "val"
    )

    def _unpack(b: pa.Table) -> pa.Table:
        key = b.column("key").to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(key // k, pa.int64()),
                "bucket": pa.array(key % k, pa.int64()),
                "val": pc.cast(b.column("val"), pa.int64()).combine_chunks(),
            }
        )

    return packed.map_batches(_unpack, batch_format="pyarrow")
