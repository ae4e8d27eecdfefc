"""WARC source: Common-Crawl-style archive files -> the engine's page table.

The canonical input is the Parquet page table (``url, warc_ts, html, text,
lang`` — input_hint), but crawls arrive as WARC: concatenated records, each a
``WARC/1.x`` header block, CRLF-separated header lines, a blank line, then
``Content-Length`` payload bytes, then two CRLFs. This module is a minimal
pure-Python WARC 1.0/1.1 parser (no external libs in this environment) wired
into Ray Data the idiomatic way:

- ``ray.data.read_binary_files`` streams whole WARC members (one file = one
  record batch source; parallelism = file count, like any crawl layout);
- ``warc_pages`` is one stateless ``map_batches`` that splits records,
  keeps ``response`` records, strips the HTTP envelope, and emits page rows
  matching the parquet page schema — from there every downstream stage
  (fingerprint dedup, extraction, linking, ...) is identical.

Record parsing is per-record Python by necessity (WARC is a byte-framed
container, not columnar); the cost is bounded per record and the stage
lives in ordinary task parallelism across files. Gzip members (.warc.gz)
are handled via ``gzip.decompress`` when the magic matches.
"""

from __future__ import annotations

import gzip

import numpy as np
import pyarrow as pa
import ray.data as rd


def parse_warc(data: bytes) -> list[dict]:
    """All WARC records of one archive blob as dicts:
    ``{headers: {name_lower: value}, payload: bytes}``. Framing follows the
    spec: header block ends at the first empty line; the payload is exactly
    ``Content-Length`` bytes; records are padded by CRLF CRLF."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 2] in (b"\r\n", b"\n\n"):
            pos += 2
        if pos >= n or not data.startswith(b"WARC/", pos):
            break
        # header block ends at the EARLIEST blank line, whichever framing —
        # searching CRLF-first globally would run past an LF-terminated
        # header into the payload
        i_crlf = data.find(b"\r\n\r\n", pos)
        i_lf = data.find(b"\n\n", pos)
        cands = [(i, s) for i, s in ((i_crlf, 4), (i_lf, 2)) if i != -1]
        if not cands:
            break
        hdr_end, sep = min(cands)
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\n")[1:]:
            line = line.strip()
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        length = int(headers.get("content-length", "0"))
        body_start = hdr_end + sep
        payload = data[body_start : body_start + length]
        records.append({"headers": headers, "payload": payload})
        pos = body_start + length
    return records


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope of a ``response`` record (payload =
    status line + headers + blank line + body)."""
    if payload[:5] in (b"HTTP/",):
        cands = [
            (i, len(sep))
            for sep in (b"\r\n\r\n", b"\n\n")
            if (i := payload.find(sep)) != -1
        ]
        if cands:
            i, w = min(cands)
            return payload[i + w :]
    return payload


def warc_pages(files: rd.Dataset) -> rd.Dataset:
    """``read_binary_files`` output -> page rows (url, warc_ts, html, text,
    lang). ``response`` records only; ``text``/``lang`` start empty/unknown —
    the extraction stage fills text (byte-identically per url), mirroring a
    real crawl where extraction happens inside the engine."""

    def _split(batch: pa.Table) -> pa.Table:
        urls: list[str] = []
        tss: list[str] = []
        htmls: list[bytes] = []
        for blob in batch.column("bytes").to_pylist():
            for rec in parse_warc(blob):
                h = rec["headers"]
                if h.get("warc-type") != "response":
                    continue
                urls.append(h.get("warc-target-uri", ""))
                tss.append(h.get("warc-date", "1970-01-01T00:00:00Z"))
                htmls.append(_http_body(rec["payload"]))
        # WARC 1.1 allows fractional seconds (Arrow strptime has no %f):
        # parse whole seconds with the fraction stripped, re-attach the
        # fraction as microseconds, and map malformed dates to null rather
        # than failing the read
        import pyarrow.compute as pc

        raw_ts = pa.array(tss, pa.string())
        ts_str = pc.replace_substring_regex(raw_ts, r"\.\d+Z$", "Z")
        secs = pc.cast(
            pc.strptime(
                ts_str, format="%Y-%m-%dT%H:%M:%SZ", unit="us", error_is_null=True
            ),
            pa.int64(),
        )
        frac = pc.struct_field(
            pc.extract_regex(raw_ts, r"\.(?P<f>\d{1,6})\d*Z$"), "f"
        )
        width = pc.fill_null(pc.utf8_length(frac), 0)
        digits = pc.cast(pc.fill_null(frac, "0"), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        micros = digits * np.power(
            10, 6 - width.to_numpy(zero_copy_only=False).astype(np.int64)
        ).clip(1, 1_000_000)
        ts = pc.cast(
            pc.add(secs, pa.array(micros, pa.int64())), pa.timestamp("us")
        )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": ts,
                "html": pa.array(htmls, pa.binary()),
                "text": pa.array([""] * len(urls), pa.string()),
                "lang": pa.array(["und"] * len(urls), pa.string()),
            }
        )

    return files.map_batches(_split, batch_format="pyarrow")


def read_warc(paths: str | list[str]) -> rd.Dataset:
    """WARC file(s)/dir -> page-table Dataset (the parquet page schema)."""
    return warc_pages(rd.read_binary_files(paths))
