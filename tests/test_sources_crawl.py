"""WARC and JSONL crawl sources -> the engine's canonical schemas."""

import gzip
import json

import pyarrow as pa
import ray.data as rd


def _warc_record(url: str, date: str, body: bytes, rtype: str = "response") -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + body
    payload = http if rtype == "response" else body
    hdr = (
        f"WARC/1.0\r\n"
        f"WARC-Type: {rtype}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {date}\r\n"
        f"Content-Length: {len(payload)}\r\n"
        f"\r\n"
    ).encode()
    return hdr + payload + b"\r\n\r\n"


def _write_warc(path, gz=False):
    blob = (
        _warc_record("http://a.example/1", "2024-05-01T10:00:00Z", b"<html><p>alpha beta</p></html>")
        + _warc_record("ignored", "2024-05-01T10:00:01Z", b"warcinfo stuff", rtype="warcinfo")
        + _warc_record("http://b.example/2", "2024-05-02T11:30:00Z", b"<html><p>gamma</p></html>")
    )
    data = gzip.compress(blob) if gz else blob
    with open(path, "wb") as fh:
        fh.write(data)
    return path


def test_warc_parse_and_pages(tmp_path):
    from anonymization_ray.sources.warc import parse_warc, read_warc

    p = _write_warc(tmp_path / "a.warc")
    recs = parse_warc(open(p, "rb").read())
    assert [r["headers"]["warc-type"] for r in recs] == ["response", "warcinfo", "response"]

    pages = read_warc(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    assert pages.url.tolist() == ["http://a.example/1", "http://b.example/2"]
    # HTTP envelope stripped, raw body preserved byte-exactly
    assert pages.html[0] == b"<html><p>alpha beta</p></html>"
    assert str(pages.warc_ts[0]) == "2024-05-01 10:00:00"
    assert set(pages.columns) == {"url", "warc_ts", "html", "text", "lang"}

    # gzip member parses identically
    pg = _write_warc(tmp_path / "b.warc.gz", gz=True)
    pages_gz = read_warc(str(pg)).to_pandas().sort_values("url").reset_index(drop=True)
    assert pages_gz.url.tolist() == pages.url.tolist()
    assert (pages_gz.html == pages.html).all()


def test_warc_feeds_text_extraction(tmp_path):
    """WARC pages run through the same extraction stage as parquet pages."""
    from anonymization_ray.kg.extract import extract_text
    from anonymization_ray.sources.warc import read_warc

    p = _write_warc(tmp_path / "c.warc")
    out = extract_text(read_warc(str(p))).to_pandas().sort_values("url")
    assert out.text_extracted.tolist() == ["alpha beta", "gamma"]


def test_jsonl_documents_normalization(tmp_path):
    from anonymization_ray.sources.jsonl import read_jsonl_documents

    p = tmp_path / "docs.jsonl"
    rows = [
        {"id": 7, "content": "hello world", "language": "en", "subset": "web"},
        {"id": 8, "content": "hallo welt", "language": "de", "subset": "web"},
    ]
    p.write_text("\n".join(json.dumps(r) for r in rows))
    got = read_jsonl_documents(str(p)).to_pandas().sort_values("doc_id")
    assert got.doc_id.tolist() == [7, 8]
    assert got.text.tolist() == ["hello world", "hallo welt"]
    assert got.lang.tolist() == ["en", "de"]
    assert got.source.tolist() == ["web", "web"]

    # missing ids: derived deterministically from text (stable across runs)
    p2 = tmp_path / "noid.jsonl"
    p2.write_text("\n".join(json.dumps({"text": t}) for t in ["aa bb", "cc dd"]))
    a = read_jsonl_documents(str(p2)).to_pandas().sort_values("text")
    b = read_jsonl_documents(str(p2)).to_pandas().sort_values("text")
    assert a.doc_id.tolist() == b.doc_id.tolist()
    assert a.doc_id.nunique() == 2
    assert (a.doc_id >= 0).all()
    assert a.lang.tolist() == ["und", "und"]


def test_documents_from_warc_stable_ids(tmp_path):
    from anonymization_ray.pipelines.corpus import documents_from_warc

    p = _write_warc(tmp_path / "d.warc")
    a = documents_from_warc(str(p)).to_pandas().sort_values("text").reset_index(drop=True)
    b = documents_from_warc(str(p)).to_pandas().sort_values("text").reset_index(drop=True)
    assert a.text.tolist() == ["alpha beta", "gamma"]
    assert a.doc_id.tolist() == b.doc_id.tolist()  # url-hash ids, run-stable
    assert (a.doc_id >= 0).all() and a.doc_id.nunique() == 2


def test_warc_lf_only_and_truncated(tmp_path):
    """LF-only header framing parses; a truncated trailing record is
    dropped rather than crashing."""
    from anonymization_ray.sources.warc import parse_warc

    body = b"<html><p>x</p></html>"
    http = b"HTTP/1.1 200 OK\n\n" + body
    rec = (
        f"WARC/1.1\nWARC-Type: response\nWARC-Target-URI: http://lf.example/\n"
        f"WARC-Date: 2024-01-01T00:00:00Z\nContent-Length: {len(http)}\n\n"
    ).encode() + http + b"\r\n\r\n"
    recs = parse_warc(rec)
    assert len(recs) == 1
    assert recs[0]["headers"]["warc-target-uri"] == "http://lf.example/"
    # the LF-framed payload itself must be intact (not run past by a later
    # CRLF-CRLF) and the LF HTTP envelope must strip to the exact body
    from anonymization_ray.sources.warc import _http_body

    assert recs[0]["payload"] == http
    assert _http_body(recs[0]["payload"]) == body
    # truncated: header block never terminates
    assert parse_warc(rec + b"WARC/1.0\nWARC-Type: response\nContent-Le") and True
    got = parse_warc(rec + b"WARC/1.0\nWARC-Type: response\nContent-Le")
    assert len(got) == 1  # the malformed tail is ignored


def test_warc_fractional_seconds_and_binary_payload(tmp_path):
    """WARC 1.1 fractional-second dates parse; non-UTF-8 payloads survive
    the documents bridge via lossy decode."""
    from anonymization_ray.pipelines.corpus import documents_from_warc
    from anonymization_ray.sources.warc import read_warc

    body = b"<html><p>caf\xe9 latin1</p></html>"  # latin-1, invalid UTF-8
    http = b"HTTP/1.1 200 OK\r\n\r\n" + body
    rec = (
        f"WARC/1.1\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: http://frac.example/\r\n"
        f"WARC-Date: 2017-03-06T04:03:53.392Z\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode() + http + b"\r\n\r\n"
    p = tmp_path / "f.warc"
    p.write_bytes(rec)
    pages = read_warc(str(p)).to_pandas()
    assert str(pages.warc_ts[0]) == "2017-03-06 04:03:53.392000"  # frac kept
    docs = documents_from_warc(str(p)).to_pandas()
    assert len(docs) == 1
    assert "latin1" in docs.text[0]  # lossy decode, extraction succeeded


def test_documents_from_warc_dedups_refetches(tmp_path):
    """The same URL captured twice yields ONE document (earliest capture)."""
    from anonymization_ray.pipelines.corpus import documents_from_warc

    def rec(u, date, words):
        body = ("<html><p>" + words + "</p></html>").encode()
        http = b"HTTP/1.1 200 OK\r\n\r\n" + body
        return (
            f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {u}\r\n"
            f"WARC-Date: {date}\r\nContent-Length: {len(http)}\r\n\r\n"
        ).encode() + http + b"\r\n\r\n"

    p = tmp_path / "r.warc"
    p.write_bytes(
        rec("http://a.example/", "2024-01-02T00:00:00Z", "second fetch")
        + rec("http://a.example/", "2024-01-01T00:00:00Z", "first fetch")
        + rec("http://b.example/", "2024-01-01T00:00:00Z", "only fetch")
    )
    docs = documents_from_warc(str(p)).to_pandas().sort_values("text")
    assert sorted(docs.text) == ["first fetch", "only fetch"]
    assert docs.doc_id.nunique() == 2


def test_jsonl_string_ids(tmp_path):
    import json as _json

    from anonymization_ray.sources.jsonl import read_jsonl_documents

    p = tmp_path / "s.jsonl"
    rows = [{"id": "doc-af83b2", "text": "aa"}, {"id": "doc-ffffff", "text": "bb"}]
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    a = read_jsonl_documents(str(p)).to_pandas().sort_values("text")
    b = read_jsonl_documents(str(p)).to_pandas().sort_values("text")
    assert a.doc_id.tolist() == b.doc_id.tolist()  # stable derived ids
    assert a.doc_id.nunique() == 2 and (a.doc_id >= 0).all()


def test_jsonl_id_strategy_is_schema_level(tmp_path):
    """Numeric-looking STRING ids are hashed (type decides, not parse
    success), and null ids fall back to text-derived hashes — both
    partition-independent."""
    import json as _json

    from anonymization_ray.sources.jsonl import read_jsonl_documents

    p = tmp_path / "m.jsonl"
    rows = [
        {"id": "123", "text": "numeric-looking"},
        {"id": None, "text": "first null"},
        {"id": None, "text": "second null"},
        {"id": "doc-x", "text": "opaque"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows))
    got = read_jsonl_documents(str(p)).to_pandas().set_index("text")
    # numeric string is NOT cast to 123 — strategy is by column type
    assert got.loc["numeric-looking", "doc_id"] != 123
    # null ids derive from text, so the two null-id docs stay distinct
    assert got.loc["first null", "doc_id"] != got.loc["second null", "doc_id"]
    assert got.doc_id.nunique() == 4


def test_jsonl_integer_ids_null_fallback(tmp_path):
    """Null entries in an INTEGER id column derive from the text hash (the
    documented fallback), never surface as null/NaN downstream."""
    import json as _json

    from anonymization_ray.sources.jsonl import read_jsonl_documents

    p = tmp_path / "intids.jsonl"
    rows = [
        {"id": 7, "text": "kept integer id"},
        {"id": None, "text": "derived from text one"},
        {"id": None, "text": "derived from text two"},
    ]
    p.write_text("\n".join(_json.dumps(r) for r in rows) + "\n")
    got = read_jsonl_documents(str(p)).to_pandas().sort_values("text").reset_index(drop=True)
    assert got.doc_id.notna().all()
    assert 7 in set(got.doc_id)
    # derived ids are deterministic and distinct per text
    again = read_jsonl_documents(str(p)).to_pandas().sort_values("text").reset_index(drop=True)
    assert got.doc_id.tolist() == again.doc_id.tolist()
    assert got.doc_id.nunique() == 3


# ---------------------------------------------------------------------------
# streaming / range-split reads (round 4)
# ---------------------------------------------------------------------------


def _rss_kb() -> int:
    with open("/proc/self/statm") as fh:
        return int(fh.read().split()[1]) * 4  # resident pages -> KiB (4K pages)


def test_warc_streaming_bounded_memory(tmp_path):
    """A .warc.gz far larger than the parse buffer streams record-by-record
    with bounded RSS: ~192 MB decompressed, peak incremental RSS well under
    a tenth of that (the historical parser gunzipped the whole archive)."""
    from anonymization_ray.sources.warc import iter_warc_records

    p = tmp_path / "big.warc.gz"
    body = b"ab" * 32768  # 64 KiB, compressible
    n_rec = 3000
    with gzip.open(p, "wb", compresslevel=1) as fh:
        for i in range(n_rec):
            fh.write(
                _warc_record(f"http://big.example/{i}", "2024-05-01T10:00:00Z", body)
            )
    decompressed_mb = n_rec * 64 // 1024
    assert decompressed_mb >= 180

    fh = gzip.open(p, "rb")
    base = _rss_kb()
    peak = 0
    count = 0
    total_payload = 0
    for off, rec in iter_warc_records(fh.read):
        count += 1
        total_payload += len(rec["payload"])
        if count % 100 == 0:
            peak = max(peak, _rss_kb() - base)
    fh.close()
    assert count == n_rec
    assert total_payload > 180 * 1024 * 1024
    assert peak < 50 * 1024, f"peak incremental RSS {peak} KiB not bounded"


def test_warc_ranged_plain_matches_streaming(tmp_path):
    """Uncompressed range-split read returns exactly the same pages as the
    per-file streaming read, for every split size (records are never lost
    or duplicated at range boundaries, including a record starting exactly
    on a boundary)."""
    from anonymization_ray.sources.warc import read_warc, read_warc_ranged

    p = tmp_path / "multi.warc"
    recs = b"".join(
        _warc_record(
            f"http://r.example/{i}",
            "2024-05-01T10:00:00Z",
            f"<html><p>doc {i} {'x' * (37 * (i % 11))}</p></html>".encode(),
        )
        for i in range(40)
    )
    p.write_bytes(recs)

    want = read_warc(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(want) == 40
    for target in (257, 1024, 4096, len(recs) + 10):
        got = (
            read_warc_ranged(str(p), target_bytes=target)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert got.url.tolist() == want.url.tolist(), f"target_bytes={target}"
        assert (got.html == want.html).all()


def test_warc_ranged_boundary_exact(tmp_path):
    """A range boundary placed EXACTLY at a record start assigns the record
    to the later range (no loss, no double-read)."""
    from anonymization_ray.sources.warc import read_warc_ranged

    r0 = _warc_record("http://x.example/0", "2024-05-01T10:00:00Z", b"<html><p>a</p></html>")
    r1 = _warc_record("http://x.example/1", "2024-05-01T10:00:00Z", b"<html><p>b</p></html>")
    r2 = _warc_record("http://x.example/2", "2024-05-01T10:00:00Z", b"<html><p>c</p></html>")
    p = tmp_path / "exact.warc"
    p.write_bytes(r0 + r1 + r2)
    # target = len(r0): bounds at 0, len(r0), 2*len(r0)... r1 starts exactly
    # at len(r0)
    got = (
        read_warc_ranged(str(p), target_bytes=len(r0))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.url.tolist() == [f"http://x.example/{i}" for i in range(3)]


def test_warc_ranged_gz_member_aligned(tmp_path):
    """.warc.gz with one record per member (Common-Crawl convention) splits
    at member offsets; every split size returns the same pages."""
    from anonymization_ray.sources.warc import (
        gzip_member_offsets,
        read_warc,
        read_warc_ranged,
    )

    p = tmp_path / "members.warc.gz"
    with open(p, "wb") as fh:
        for i in range(24):
            fh.write(
                gzip.compress(
                    _warc_record(
                        f"http://m.example/{i}",
                        "2024-05-01T10:00:00Z",
                        f"<html><p>member {i}</p></html>".encode(),
                    )
                )
            )
    offs, aligned = gzip_member_offsets(str(p))
    assert aligned and len(offs) == 24 and offs[0] == 0

    want = read_warc(str(p)).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(want) == 24
    for target in (1, 300, 10**9):
        got = (
            read_warc_ranged(str(p), target_bytes=target)
            .to_pandas()
            .sort_values("url")
            .reset_index(drop=True)
        )
        assert got.url.tolist() == want.url.tolist(), f"target_bytes={target}"


def test_warc_ranged_gz_unaligned_falls_back(tmp_path):
    """A .warc.gz whose members do NOT each start a record (multi-record
    member) is detected by the index pass and read as ONE whole-file range —
    correctness over parallelism."""
    from anonymization_ray.sources.warc import (
        gzip_member_offsets,
        read_warc_ranged,
        warc_split_ranges,
    )

    r = b"".join(
        _warc_record(f"http://u.example/{i}", "2024-05-01T10:00:00Z", b"<html><p>z</p></html>")
        for i in range(4)
    )
    p = tmp_path / "unaligned.warc.gz"
    cut = len(r) // 2 + 7  # NOT a record boundary (records are equal-sized)
    with open(p, "wb") as fh:
        fh.write(gzip.compress(r[:cut]))  # member split mid-record
        fh.write(gzip.compress(r[cut:]))
    offs, aligned = gzip_member_offsets(str(p))
    assert len(offs) == 2 and not aligned
    ranges = warc_split_ranges(str(p), target_bytes=1)
    assert len(ranges) == 1  # fallback: single streaming range
    got = read_warc_ranged(str(p), target_bytes=1).to_pandas()
    assert sorted(got.url.tolist()) == [f"http://u.example/{i}" for i in range(4)]


def test_csv_documents_normalization(tmp_path):
    """CSV with aliased headers and no id column -> hashed ids identical to
    the JSONL source's contract for the same texts."""
    from anonymization_ray.sources.csvsrc import read_csv_documents
    from anonymization_ray.sources.jsonl import read_jsonl_documents

    p = tmp_path / "d.csv"
    p.write_text(
        "content,language,subset\n"
        "alpha beta,en,web\n"
        "gamma delta,de,books\n"
    )
    rows = sorted(
        read_csv_documents(str(p)).take_all(), key=lambda r: r["text"]
    )
    assert [r["text"] for r in rows] == ["alpha beta", "gamma delta"]
    assert [r["lang"] for r in rows] == ["en", "de"]
    assert [r["source"] for r in rows] == ["web", "books"]
    # same texts through the JSONL source -> same deterministic doc_ids
    j = tmp_path / "d.jsonl"
    j.write_text(
        json.dumps({"content": "alpha beta", "language": "en", "subset": "web"})
        + "\n"
        + json.dumps({"content": "gamma delta", "language": "de", "subset": "books"})
        + "\n"
    )
    jrows = sorted(read_jsonl_documents(str(j)).take_all(), key=lambda r: r["text"])
    assert [r["doc_id"] for r in rows] == [r["doc_id"] for r in jrows]


def test_csv_tsv_and_integer_id_null_fallback(tmp_path):
    """TSV delimiter; integer id column keeps given ids and fills nulls
    from the text hash (never a row counter)."""
    from anonymization_ray.sources.csvsrc import read_csv_documents

    p = tmp_path / "d.tsv"
    p.write_text("id\ttext\n7\talpha\n\tbeta\n")
    rows = sorted(
        read_csv_documents(str(p), delimiter="\t").take_all(),
        key=lambda r: r["text"],
    )
    assert rows[0]["doc_id"] == 7
    assert rows[1]["doc_id"] not in (None, 7)
    assert rows[1]["doc_id"] >= 0
    assert [r["lang"] for r in rows] == ["und", "und"]
    assert [r["source"] for r in rows] == ["csv", "csv"]
