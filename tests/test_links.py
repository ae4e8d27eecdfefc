"""Web-link-graph family (`kg/links.py`): URL canonicalizer edge cases the
sf oracle corpus can't exercise, plus extraction sanity on hand-built html.
The end-to-end oracle gate lives in test_oracles (kg_link_graph /
kg_link_canonical / kg_host_graph / kg_anchor_stats)."""

import pyarrow as pa
import ray.data as rd

from anonymization_ray.kg.links import canonicalize_urls, extract_links


def _canon_one(href: str, base: str = "https://example.org/doc/1") -> str | None:
    ds = rd.from_arrow(
        pa.table({"href": pa.array([href]), "src_url": pa.array([base])})
    )
    out = canonicalize_urls(ds, "href", "src_url").take_all()
    return out[0]["dst_url"]


def test_canonicalize_messy_absolute():
    assert (
        _canon_one("HTTPS://EXAMPLE.ORG:443/doc/9?utm_source=feed&id=9")
        == "https://example.org/doc/9?id=9"
    )


def test_canonicalize_http_default_port_and_empty_path():
    assert _canon_one("HTTP://A.COM:80") == "http://a.com/"
    # :443 is NOT default for http — kept
    assert _canon_one("http://a.com:443/x") == "http://a.com:443/x"


def test_canonicalize_fragment_dropped():
    assert _canon_one("https://x.org/p#sec") == "https://x.org/p"


def test_canonicalize_query_param_filter():
    assert _canon_one("https://x.org/p?a=1&utm_a=2&b=3") == "https://x.org/p?a=1&b=3"
    # all params tracking -> no '?'
    assert _canon_one("https://x.org/p?utm_a=2") == "https://x.org/p"


def test_canonicalize_root_relative_resolves_against_base():
    assert (
        _canon_one("/doc/7", base="HTTPS://Example.ORG/else")
        == "https://example.org/doc/7"
    )


def test_canonicalize_protocol_relative_inherits_scheme():
    assert (
        _canon_one("//cdn.x.org/a", base="https://example.org/p")
        == "https://cdn.x.org/a"
    )
    assert (
        _canon_one("//cdn.x.org/a", base="http://example.org/p")
        == "http://cdn.x.org/a"
    )


def test_canonicalize_unresolvable_is_null():
    assert _canon_one("mailto:a@b.org") is None
    assert _canon_one("../up/one") is None
    assert _canon_one("ftp://files.org/x") is None  # non-http(s) scheme


def test_extract_links_multiple_and_none():
    html = (
        b'<html><body><p>t</p><nav><a href="/a">one</a>'
        b'<a href="https://x.org/b">two words</a></nav></body></html>'
    )
    pages = rd.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://example.org/doc/0", "https://example.org/doc/1"]),
                "html": pa.array([html, b"<html><body><p>no links</p></body></html>"], pa.binary()),
            }
        )
    )
    rows = sorted(
        (r["src_url"], r["href"], r["anchor"]) for r in extract_links(pages).take_all()
    )
    assert rows == [
        ("https://example.org/doc/0", "/a", "one"),
        ("https://example.org/doc/0", "https://x.org/b", "two words"),
    ]
