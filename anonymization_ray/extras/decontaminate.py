"""Benchmark decontamination: flag training documents that overlap a
held-out evaluation set by shared word n-grams.

The standard training-data hygiene step (GPT-3 appendix C / Gopher §A.5.2
style): any document sharing an n-gram with a benchmark document is
contaminated and must be dropped or cleaned before training. The reference
engine has no unstructured-text surface; this is the corpus-side sibling of
its delete-originals pass (reference ``Anonymization.java`` removes matched
structured values; here the match set is a broadcast n-gram dictionary).

Shape, Ray-Data-first and 100-TB-safe:

- the benchmark set is SMALL by construction (eval suites are thousands of
  documents, not billions), so its distinct n-gram set is built once and
  broadcast via ``ray.put`` — one object-store copy per node, never
  re-shipped per batch and never a shuffle join against the corpus;
- the corpus-side scan is a stateful ``map_batches`` actor pool: each actor
  fetches the broadcast set once in ``__init__`` and every batch is pure
  Arrow kernels — regex split -> flatten with parent indices -> shifted-slice
  n-gram join (``binary_join_element_wise``) masked to same-document runs ->
  ``pc.is_in`` against the broadcast set -> ``np.bincount`` per-doc hit
  counts. No Python row loop, no shuffle, streams at input-byte rate;
- counts are exact integers (matched n-gram OCCURRENCES per document), so
  the DuckDB oracle (window-function n-grams + semi-join) is value-hash
  exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..util import actor_pool_size


# the ONE n-gram kernel (tokenizer + shifted-slice same-doc join) is shared
# with the duplicate-span operator so the SQL-oracle tokenization contract
# can never drift between the two
from .dedup import _ngram_occurrences as _ngram_flat  # noqa: E402


def ngram_set(ds: rd.Dataset, text_col: str = "text", n: int = 3) -> pa.Array:
    """Distinct word n-grams of a SMALL dataset (the benchmark suite),
    gathered to the driver. Per-batch n-grams are deduped remotely first so
    only distinct grams travel; the final cross-batch dedup is one
    ``pc.unique`` over benchmark-sized data."""

    def _grams(batch: pa.Table) -> pa.Table:
        g, _ = _ngram_flat(batch, text_col, n)
        return pa.table({"ngram": pc.unique(g)})

    # stay in Arrow end-to-end: gather block refs, concat, one final unique
    # (row-dict take_all would build a Python dict per distinct n-gram)
    tables = [
        t
        for t in ray.get(
            ds.map_batches(_grams, batch_format="pyarrow")
            .materialize()
            .to_arrow_refs()
        )
        if t.num_rows
    ]
    if not tables:
        return pa.array([], pa.string())
    return pc.unique(pa.concat_tables(tables).column("ngram").combine_chunks())


class _Decontaminator:
    """Actor: broadcast n-gram set fetched once, per-batch Arrow scan."""

    def __init__(self, bench_ref, text_col: str, id_col: str, n: int):
        bench = ray.get(bench_ref) if not isinstance(bench_ref, pa.Array) else bench_ref
        self.bench = bench
        self.text_col = text_col
        self.id_col = id_col
        self.n = n

    def __call__(self, batch: pa.Table) -> pa.Table:
        grams, doc = _ngram_flat(batch, self.text_col, self.n)
        ids = batch.column(self.id_col).combine_chunks()
        if len(grams) == 0 or len(self.bench) == 0:
            return pa.table(
                {
                    self.id_col: pa.array([], ids.type),
                    "n_hits": pa.array([], pa.int64()),
                }
            )
        hit = pc.is_in(grams, value_set=self.bench).to_numpy(
            zero_copy_only=False
        )
        counts = np.bincount(doc[hit], minlength=len(batch))
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                self.id_col: ids.take(pa.array(nz, pa.int64())),
                "n_hits": pa.array(counts[nz], pa.int64()),
            }
        )


def decontaminate(
    ds: rd.Dataset,
    bench_ngrams: pa.Array,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> rd.Dataset:
    """Dataset[(id_col, n_hits)] — one row per CONTAMINATED document (shares
    at least one word n-gram with the benchmark set), with the exact count
    of matched n-gram occurrences. Clean documents emit no row; the caller
    anti-filters the corpus on the returned ids (see ``corpus_clean`` for
    the anti-join shape)."""
    ref = ray.put(bench_ngrams)
    lo, hi = actor_pool_size()
    return ds.map_batches(
        _Decontaminator,
        fn_constructor_args=(ref, text_col, id_col, n),
        batch_format="pyarrow",
        concurrency=(lo, hi),
    )
