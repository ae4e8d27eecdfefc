"""JSONL documents source: newline-delimited JSON crawl dumps -> documents
schema (doc_id, text, lang, source).

``ray.data.read_json`` handles .jsonl natively (one task per file, Arrow
conversion inside the read); this wrapper only normalizes heterogeneous
field names and fills defaults so any downstream operator sees the same
documents schema the parquet tables carry. Missing doc ids are derived
deterministically from a SplitMix64 hash of the text (stable across runs
and partitionings — never a row counter, which would depend on block
layout)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

_ALIASES = {
    "doc_id": ("doc_id", "id", "docid"),
    "text": ("text", "content", "body", "raw_content"),
    "lang": ("lang", "language"),
    "source": ("source", "subset", "pile_set_name", "domain"),
}


def read_jsonl_documents(paths: str | list[str]) -> rd.Dataset:
    """JSONL file(s)/dir -> Dataset[(doc_id, text, lang, source)]."""
    from ..extras.shuffle import sm64_key

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
                f"no text-like column in JSONL batch (have {batch.column_names})"
            )
        text = pa.compute.cast(text.combine_chunks(), pa.string())

        def _hash_ids(strings: np.ndarray) -> np.ndarray:
            h = sm64_key(pd.util.hash_array(strings).astype(np.int64))
            return (h >> np.uint64(1)).astype(np.int64)

        txt_np = text.to_numpy(zero_copy_only=False)
        ids = pick("doc_id")
        # the id STRATEGY is decided by the column's SCHEMA type, never by
        # whether a particular batch happens to parse — per-batch fallback
        # would make doc_ids depend on block layout
        if ids is not None and pa.types.is_integer(ids.type):
            iv = pa.compute.cast(ids.combine_chunks(), pa.int64())
            null_mask = pa.compute.is_null(iv).to_numpy(zero_copy_only=False)
            if null_mask.any():
                # same text-hash fallback as the string path — null ids must
                # never leak as NaN into downstream integer key arithmetic
                filled = pa.compute.fill_null(iv, 0).to_numpy(zero_copy_only=False)
                iv = pa.array(
                    np.where(null_mask, _hash_ids(txt_np), filled), pa.int64()
                )
            ids = iv
        elif ids is not None:
            s = pa.compute.cast(ids.combine_chunks(), pa.string())
            sv = s.to_numpy(zero_copy_only=False)
            # null ids would all hash alike — those rows derive from text
            null_mask = pa.compute.is_null(s).to_numpy(zero_copy_only=False)
            derived = _hash_ids(np.where(null_mask, txt_np, sv))
            ids = pa.array(derived, pa.int64())
        else:
            ids = pa.array(_hash_ids(txt_np), pa.int64())

        def str_or(key: str, default: str):
            c = pick(key)
            if c is None:
                return pa.array([default] * len(batch), pa.string())
            return pa.compute.fill_null(
                pa.compute.cast(c.combine_chunks(), pa.string()), default
            )

        return pa.table(
            {
                "doc_id": ids,
                "text": text,
                "lang": str_or("lang", "und"),
                "source": str_or("source", "jsonl"),
            }
        )

    return rd.read_json(paths).map_batches(_norm, batch_format="pyarrow")


def write_jsonl_gzip(ds: rd.Dataset, out_dir: str) -> int:
    """Distributed gzip-compressed JSONL dump — the wire format web-scale
    text dumps actually ship as (one ``part-<sha>.jsonl.gz`` per block,
    content-hash-named so re-runs are idempotent; the hash is of the
    UNCOMPRESSED bytes, keeping names stable across zlib versions).
    Returns the number of files. Read back with ``ray.data.read_json``,
    which infers gzip from the extension."""
    import gzip
    import hashlib
    import json as _json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _dump(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        body = ("\n".join(_json.dumps(r) for r in rows) + "\n").encode()
        name = f"part-{hashlib.sha256(body).hexdigest()[:16]}.jsonl.gz"
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with gzip.open(tmp, "wb", compresslevel=6) as f:
            f.write(body)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"file": pa.array([name], pa.string())})

    return len(ds.map_batches(_dump, batch_format="pyarrow").take_all())
