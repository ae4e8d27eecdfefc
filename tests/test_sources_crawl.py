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
