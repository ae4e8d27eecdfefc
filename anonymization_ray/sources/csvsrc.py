"""CSV/TSV documents source: delimited crawl/metadata dumps -> documents
schema (doc_id, text, lang, source).

``ray.data.read_csv`` parallelizes per file with Arrow's CSV reader doing
the parsing (vectorized C, not Python rows); this wrapper supplies the
parse options (delimiter, header handling) and the SAME field-alias
normalization + deterministic id-fallback contract as the JSONL source
(``sources/jsonl.py``): missing doc ids derive from SplitMix64 over a
pandas hash of the text — stable across runs and block layouts, never a
row counter. Reference parity: the reference ingests flat tabular exports
of the same record shape (SURVEY.md §2 S-family); this is the delimited
twin of S9.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from .jsonl import _ALIASES


def read_csv_documents(
    paths: str | list[str],
    *,
    delimiter: str = ",",
) -> rd.Dataset:
    """CSV/TSV file(s)/dir -> Dataset[(doc_id, text, lang, source)]."""
    from pyarrow import csv as pacsv

    from ..extras.shuffle import sm64_key

    ds = rd.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(delimiter=delimiter),
    )

    def _norm(batch: pa.Table) -> pa.Table:
        cols = {c.lower(): c for c in batch.column_names}

        def pick(key: str):
            for a in _ALIASES[key]:
                if a in cols:
                    return batch.column(cols[a])
            return None

        text = pick("text")
        if text is None:
            raise ValueError(
                f"no text-like column in CSV batch (have {batch.column_names})"
            )
        text = pc.cast(text.combine_chunks(), pa.string())
        txt_np = text.to_numpy(zero_copy_only=False)

        def _hash_ids(strings: np.ndarray) -> np.ndarray:
            h = sm64_key(pd.util.hash_array(strings).astype(np.int64))
            return (h >> np.uint64(1)).astype(np.int64)

        ids = pick("doc_id")
        # id strategy decided by schema type (as in jsonl.py): integer id
        # column -> cast + text-hash fill for nulls; otherwise text hash
        if ids is not None and pa.types.is_integer(ids.type):
            iv = pc.cast(ids.combine_chunks(), pa.int64())
            null_mask = pc.is_null(iv).to_numpy(zero_copy_only=False)
            out_ids = iv.to_numpy(zero_copy_only=False).copy()
            if null_mask.any():
                out_ids[null_mask] = _hash_ids(
                    txt_np[null_mask].astype(str)
                )
            id_arr = pa.array(out_ids.astype(np.int64), pa.int64())
        else:
            id_arr = pa.array(_hash_ids(txt_np.astype(str)), pa.int64())

        lang = pick("lang")
        lang = (
            pc.cast(lang.combine_chunks(), pa.string())
            if lang is not None
            else pa.array(["und"] * batch.num_rows, pa.string())
        )
        source = pick("source")
        source = (
            pc.cast(source.combine_chunks(), pa.string())
            if source is not None
            else pa.array(["csv"] * batch.num_rows, pa.string())
        )
        return pa.table(
            {"doc_id": id_arr, "text": text, "lang": lang, "source": source}
        )

    return ds.map_batches(_norm, batch_format="pyarrow")
