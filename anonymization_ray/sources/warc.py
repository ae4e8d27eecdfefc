"""WARC source: Common-Crawl-style archive files -> the engine's page table.

The canonical input is the Parquet page table (``url, warc_ts, html, text,
lang`` — input_hint), but crawls arrive as WARC: concatenated records, each a
``WARC/1.x`` header block, CRLF-separated header lines, a blank line, then
``Content-Length`` payload bytes, then two CRLFs. This module is a minimal
pure-Python WARC 1.0/1.1 parser (no external libs in this environment) wired
into Ray Data the idiomatic way, with THREE read paths by archive size:

- ``read_warc`` (default): one streaming task per file. Records are parsed
  incrementally from a bounded buffer (``iter_warc_records``) and emitted as
  page-row batches of ``rows_per_batch`` — peak memory per task is
  O(chunk + largest single record + one output batch), NOT O(archive), so a
  50 GB ``.warc.gz`` streams under a capped RSS. Gzip members decompress
  incrementally (``zlib.decompressobj`` / multi-member loop — never
  ``gzip.decompress`` of the whole file).
- ``read_warc_ranged``: splits LARGE archives into byte-range tasks so
  parallelism exceeds file count. Uncompressed WARCs split at arbitrary
  byte offsets (each task scans forward to the next validated record
  boundary, Hadoop-style). ``.warc.gz`` splits at gzip MEMBER offsets
  discovered by one indexing pass; Common-Crawl convention is one record
  per member, which the index pass VERIFIES (every member must begin with
  ``WARC/``) — a non-record-aligned archive falls back to a single
  whole-file streaming range rather than corrupting records.
- ``warc_pages`` over ``read_binary_files`` blobs: kept for small test
  archives already in memory.

Record parsing is per-record Python by necessity (WARC is a byte-framed
container, not columnar); the cost is bounded per record.
"""

from __future__ import annotations

import gzip
import io
import os
import zlib
from collections.abc import Callable, Iterator

import numpy as np
import pyarrow as pa
import ray.data as rd

_GZ_MAGIC = b"\x1f\x8b"
_CHUNK = 1 << 20  # 1 MiB read granularity for all streaming paths


# --------------------------------------------------------------------------
# incremental record parser (bounded buffer)
# --------------------------------------------------------------------------


def iter_warc_records(read: Callable[[int], bytes], *, chunk_size: int = _CHUNK):
    """Incrementally parse WARC records from a ``read(n) -> bytes`` stream.

    Yields ``(start_offset, record)`` where ``start_offset`` is the byte
    offset (in the logical/decompressed stream) of the record's ``WARC/``
    line and ``record`` is ``{"headers": {...}, "payload": bytes}``.

    Framing follows the spec with the same tolerances as the historical
    whole-blob parser: the header block ends at the EARLIEST blank line
    (CRLF-CRLF or LF-LF — whichever comes first, so an LF-framed header is
    not run past into its payload); the payload is exactly
    ``Content-Length`` bytes (truncated at EOF is emitted as-is); records
    are padded by CRLF CRLF; a malformed/truncated trailing header is
    dropped. The buffer holds at most O(chunk + one record), so memory is
    bounded regardless of archive size.
    """
    buf = bytearray()
    pos = 0  # parse cursor within buf
    base = 0  # logical offset of buf[0]
    eof = False

    def _fill() -> bool:
        nonlocal eof
        if eof:
            return False
        data = read(chunk_size)
        if not data:
            eof = True
            return False
        buf.extend(data)
        return True

    while True:
        # skip inter-record padding
        while True:
            if pos + 2 > len(buf) and not eof:
                _fill()
                continue
            if buf[pos : pos + 2] in (b"\r\n", b"\n\n"):
                pos += 2
                continue
            break
        # compact: everything before pos is consumed
        if pos:
            del buf[:pos]
            base += pos
            pos = 0
        # need a "WARC/" record start
        while len(buf) < 5 and not eof:
            _fill()
        if not buf:
            return
        if not bytes(buf[:5]) == b"WARC/":
            return
        # header block ends at the EARLIEST blank line, whichever framing
        while True:
            i_crlf = buf.find(b"\r\n\r\n")
            i_lf = buf.find(b"\n\n")
            cands = [(i, s) for i, s in ((i_crlf, 4), (i_lf, 2)) if i != -1]
            if cands:
                hdr_end, sep = min(cands)
                break
            if not _fill():
                return  # truncated header: drop
        headers: dict[str, str] = {}
        for line in bytes(buf[:hdr_end]).split(b"\n")[1:]:
            line = line.strip()
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", "0"))
        except ValueError:
            length = 0
        body_start = hdr_end + sep
        while len(buf) < body_start + length and not eof:
            _fill()
        payload = bytes(buf[body_start : body_start + length])
        yield base, {"headers": headers, "payload": payload}
        pos = min(body_start + length, len(buf))


def parse_warc(data: bytes) -> list[dict]:
    """All WARC records of one archive blob as dicts:
    ``{headers: {name_lower: value}, payload: bytes}`` (whole-blob
    convenience wrapper over the incremental parser; gzip blobs decompress
    incrementally, multi-member included)."""
    if data[:2] == _GZ_MAGIC:
        read = gzip.GzipFile(fileobj=io.BytesIO(data)).read
    else:
        read = io.BytesIO(data).read
    return [rec for _, rec in iter_warc_records(read)]


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


# --------------------------------------------------------------------------
# page-table construction (shared by every read path)
# --------------------------------------------------------------------------


def _pages_table(urls: list[str], tss: list[str], htmls: list[bytes]) -> pa.Table:
    """(url, warc-date string, html bytes) rows -> the page-table schema.
    WARC 1.1 allows fractional seconds (Arrow strptime has no %f): parse
    whole seconds with the fraction stripped, re-attach the fraction as
    microseconds, and map malformed dates to null rather than failing."""
    import pyarrow.compute as pc

    raw_ts = pa.array(tss, pa.string())
    ts_str = pc.replace_substring_regex(raw_ts, r"\.\d+Z$", "Z")
    secs = pc.cast(
        pc.strptime(ts_str, format="%Y-%m-%dT%H:%M:%SZ", unit="us", error_is_null=True),
        pa.int64(),
    )
    frac = pc.struct_field(pc.extract_regex(raw_ts, r"\.(?P<f>\d{1,6})\d*Z$"), "f")
    width = pc.fill_null(pc.utf8_length(frac), 0)
    digits = pc.cast(pc.fill_null(frac, "0"), pa.int64()).to_numpy(zero_copy_only=False)
    micros = digits * np.power(
        10, 6 - width.to_numpy(zero_copy_only=False).astype(np.int64)
    ).clip(1, 1_000_000)
    ts = pc.cast(pc.add(secs, pa.array(micros, pa.int64())), pa.timestamp("us"))
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([""] * len(urls), pa.string()),
            "lang": pa.array(["und"] * len(urls), pa.string()),
        }
    )


_EMPTY_PAGES = _pages_table([], [], [])


def _page_batches(
    records: Iterator[tuple[int, dict]], rows_per_batch: int
) -> Iterator[pa.Table]:
    """``response`` records -> page-row tables of at most ``rows_per_batch``
    rows (the streaming paths yield incrementally so a huge archive never
    accumulates rows in the task heap)."""
    urls: list[str] = []
    tss: list[str] = []
    htmls: list[bytes] = []
    for _, rec in records:
        h = rec["headers"]
        if h.get("warc-type") != "response":
            continue
        urls.append(h.get("warc-target-uri", ""))
        tss.append(h.get("warc-date", "1970-01-01T00:00:00Z"))
        htmls.append(_http_body(rec["payload"]))
        if len(urls) >= rows_per_batch:
            yield _pages_table(urls, tss, htmls)
            urls, tss, htmls = [], [], []
    if urls:
        yield _pages_table(urls, tss, htmls)


def warc_pages(files: rd.Dataset) -> rd.Dataset:
    """``read_binary_files`` output -> page rows (url, warc_ts, html, text,
    lang). ``response`` records only; ``text``/``lang`` start empty/unknown —
    the extraction stage fills text (byte-identically per url), mirroring a
    real crawl where extraction happens inside the engine."""

    def _split(batch: pa.Table) -> Iterator[pa.Table]:
        n = 0
        for blob in batch.column("bytes").to_pylist():
            if blob[:2] == _GZ_MAGIC:
                read = gzip.GzipFile(fileobj=io.BytesIO(blob)).read
            else:
                read = io.BytesIO(blob).read
            for t in _page_batches(iter_warc_records(read), 4096):
                n += len(t)
                yield t
        if n == 0:
            yield _EMPTY_PAGES  # schema-stable empty output

    return files.map_batches(_split, batch_format="pyarrow")


# --------------------------------------------------------------------------
# streaming per-file read (bounded memory)
# --------------------------------------------------------------------------


def _expand_paths(paths: str | list[str]) -> list[str]:
    if isinstance(paths, str):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        if os.path.isdir(p):
            for root, _, names in os.walk(p):
                out.extend(os.path.join(root, n) for n in sorted(names))
        else:
            out.append(p)
    return sorted(out)


def _open_logical(path: str):
    """Binary stream of the archive's LOGICAL bytes (gzip members
    decompress incrementally — multi-member handled by GzipFile)."""
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == _GZ_MAGIC:
        return gzip.GzipFile(fileobj=f)
    return f


def read_warc(paths: str | list[str], *, rows_per_batch: int = 1024) -> rd.Dataset:
    """WARC file(s)/dir -> page-table Dataset (the parquet page schema).

    One streaming task per file: records parse incrementally and page rows
    emit every ``rows_per_batch``, so task memory is bounded by
    O(read chunk + largest record + one batch) — a multi-GB ``.warc.gz``
    never materializes in the worker heap. Parallelism = file count (crawls
    ship thousands of files); for few-but-huge archives use
    ``read_warc_ranged``.
    """
    files = _expand_paths(paths)
    items = rd.from_items([{"path": p} for p in files], override_num_blocks=max(1, len(files)))

    def _stream(batch: pa.Table) -> Iterator[pa.Table]:
        n = 0
        for path in batch.column("path").to_pylist():
            with _open_logical(path) as f:
                for t in _page_batches(iter_warc_records(f.read), rows_per_batch):
                    n += len(t)
                    yield t
        if n == 0:
            yield _EMPTY_PAGES

    return items.map_batches(_stream, batch_format="pyarrow")


# --------------------------------------------------------------------------
# range-split read (parallelism beyond file count for huge archives)
# --------------------------------------------------------------------------


def gzip_member_offsets(path: str, *, chunk_size: int = _CHUNK) -> tuple[list[int], bool]:
    """One streaming index pass over a ``.warc.gz``: byte offsets of every
    gzip member start, plus whether every member begins a WARC record
    (``WARC/`` as its first decompressed bytes — the Common-Crawl
    record-per-member convention that makes member offsets safe split
    points). Decompressed bytes are counted and discarded; memory stays
    O(chunk)."""
    offsets: list[int] = []
    aligned = True
    with open(path, "rb") as f:
        abs_pos = 0  # offset of buf[0] in the file
        buf = b""
        d = zlib.decompressobj(31)
        member_start = 0
        first_out = b""
        while True:
            if not buf:
                buf = f.read(chunk_size)
                if not buf:
                    break
            before = len(buf)
            out = d.decompress(buf)
            if len(first_out) < 5:
                first_out += out[: 5 - len(first_out)]
            if d.eof:
                rest = d.unused_data
                consumed = before - len(rest)
                offsets.append(member_start)
                if first_out[:5] != b"WARC/":
                    aligned = False
                abs_pos += consumed
                member_start = abs_pos
                buf = rest
                d = zlib.decompressobj(31)
                first_out = b""
            else:
                abs_pos += before
                buf = b""
    return offsets, aligned


def _gz_members_read(f, start: int, end: int, *, chunk_size: int = _CHUNK):
    """``read(n)``-style callable yielding the decompressed bytes of every
    gzip member whose FIRST byte lies in ``[start, end)`` (members are the
    split unit; record-per-member alignment is verified by the index
    pass)."""
    f.seek(start)
    state = {
        "buf": b"",
        "abs": start,  # offset of buf[0]
        "member_start": start,
        "d": zlib.decompressobj(31),
        "done": False,
        "out": bytearray(),
    }

    def _read(n: int) -> bytes:
        while len(state["out"]) < n and not state["done"]:
            if not state["buf"]:
                state["buf"] = f.read(chunk_size)
                if not state["buf"]:
                    state["done"] = True
                    break
            before = len(state["buf"])
            out = state["d"].decompress(state["buf"])
            state["out"].extend(out)
            if state["d"].eof:
                rest = state["d"].unused_data
                consumed = before - len(rest)
                state["abs"] += consumed
                state["buf"] = rest
                state["member_start"] = state["abs"]
                if state["member_start"] >= end:
                    state["done"] = True
                    break
                state["d"] = zlib.decompressobj(31)
            else:
                state["abs"] += before
                state["buf"] = b""
        res = bytes(state["out"][:n])
        del state["out"][:n]
        return res

    return _read


def _plain_range_read(f, start: int, end: int, *, chunk_size: int = _CHUNK):
    """``(read(n), aligned_start)`` over an UNCOMPRESSED archive byte range:
    seek to ``start`` (with a 4-byte lookback so a record starting EXACTLY
    at the boundary is owned by this range), scan forward to the next
    record boundary (``WARC/`` right after a blank line), then serve bytes
    freely — records may overhang the range end; the caller keeps only
    records whose start offset is inside ``[aligned_start, end)``
    (Hadoop-input-split style) and the last kept record reads past ``end``
    as needed. Returns ``(None, 0)`` when the range contains no record
    start."""
    if start == 0:
        f.seek(0)
        return f.read, 0
    # lookback covers a separator that ENDS exactly at `start`
    scan_base = max(0, start - 4)
    f.seek(scan_base)
    scan = b""
    seam = len(b"\r\n\r\nWARC/")
    while True:
        more = f.read(chunk_size)
        if not more:
            return None, 0  # no boundary in (or after) this range
        scan += more
        best = None
        search_from = 0
        while True:
            cands = []
            for sep in (b"\r\n\r\nWARC/", b"\n\nWARC/"):
                i = scan.find(sep, search_from)
                if i != -1:
                    cands.append(i + len(sep) - 5)
            if not cands:
                break
            pos = min(cands)
            if scan_base + pos >= start:
                best = pos
                break
            search_from = pos + 1  # boundary before `start`: previous range owns it
        if best is not None:
            if scan_base + best >= end:
                return None, 0  # next record belongs to the next range
            aligned = scan_base + best
            f.seek(aligned)
            return f.read, aligned
        if len(scan) > chunk_size:  # keep a seam, bound the scan buffer
            scan_base += len(scan) - seam
            scan = scan[-seam:]
        if scan_base >= end:
            return None, 0


def warc_split_ranges(path: str, *, target_bytes: int = 256 << 20) -> list[dict]:
    """Split one archive into range-task descriptors
    ``{path, start, end, gz}``. Gzip archives split at member offsets
    (verified record-aligned — non-aligned archives fall back to ONE
    whole-file streaming range); uncompressed archives split at raw byte
    offsets (tasks self-align to record boundaries)."""
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        is_gz = f.read(2) == _GZ_MAGIC
    if not is_gz:
        starts = list(range(0, size, target_bytes)) or [0]
        return [
            {"path": path, "start": s, "end": min(s + target_bytes, size), "gz": False}
            for s in starts
        ]
    offsets, aligned = gzip_member_offsets(path)
    if not aligned or not offsets:
        return [{"path": path, "start": 0, "end": size, "gz": True}]
    bounds = [offsets[0]]
    for off in offsets[1:]:
        if off - bounds[-1] >= target_bytes:
            bounds.append(off)
    ranges = []
    for i, s in enumerate(bounds):
        e = bounds[i + 1] if i + 1 < len(bounds) else size
        ranges.append({"path": path, "start": s, "end": e, "gz": True})
    return ranges


def read_warc_ranged(
    paths: str | list[str],
    *,
    target_bytes: int = 256 << 20,
    rows_per_batch: int = 1024,
) -> rd.Dataset:
    """WARC file(s)/dir -> page-table Dataset with RANGE-SPLIT parallelism:
    each archive is divided into ~``target_bytes`` spans so a few huge
    archives still fan out across the cluster (parallelism = total bytes /
    target, not file count). The gzip index pass runs once per file in a
    Ray task; range tasks then stream their span with bounded memory."""
    files = _expand_paths(paths)
    items = rd.from_items([{"path": p} for p in files], override_num_blocks=max(1, len(files)))

    def _index(row: dict) -> list[dict]:
        return warc_split_ranges(row["path"], target_bytes=target_bytes)

    ranges = items.flat_map(_index)
    n_ranges = ranges.count()  # small: one row per ~target_bytes span

    def _read_range(batch: pa.Table) -> Iterator[pa.Table]:
        n = 0
        for row in batch.to_pylist():
            with open(row["path"], "rb") as f:
                if row["gz"]:
                    read = _gz_members_read(f, row["start"], row["end"])
                    stop = None  # member-bounded: the stream IS the range
                else:
                    read, aligned = _plain_range_read(f, row["start"], row["end"])
                    if read is None:
                        continue  # no record starts in this range
                    stop = row["end"] - aligned  # stream-relative record cutoff
                for t in _page_batches(
                    _bounded_records(iter_warc_records(read), stop),
                    rows_per_batch,
                ):
                    n += len(t)
                    yield t
        if n == 0:
            yield _EMPTY_PAGES

    return ranges.repartition(max(1, n_ranges)).map_batches(
        _read_range, batch_format="pyarrow"
    )


def _bounded_records(records, stop: int | None):
    """For uncompressed ranges (``stop`` = stream-relative range end): keep
    records whose START offset is inside the range — the stream itself
    overhangs so the last one completes. Gzip ranges are already
    member-bounded (``stop=None``) — pass through."""
    for off, rec in records:
        if stop is not None and off >= stop:
            return
        yield off, rec
