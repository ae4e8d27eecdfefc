"""XML sitemap source (sources/sitemap.py) — parse shapes, W3C datetime
handling, sitemapindex flagging, and the write->read shard roundtrip."""

import pyarrow as pa
import ray.data as rd


def _read(tmp_path, xml, name="s.xml"):
    from anonymization_ray.sources.sitemap import read_sitemaps

    p = tmp_path / name
    p.write_text(xml)
    return (
        read_sitemaps(str(tmp_path))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )


def test_urlset_fields_any_order_and_defaults(tmp_path):
    xml = (
        '<?xml version="1.0" encoding="UTF-8"?>'
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        "<url><loc>https://a.example/1</loc>"
        "<lastmod>2024-05-01T10:00:00Z</lastmod>"
        "<priority>0.8</priority></url>"
        # fields in reverse order, no lastmod
        "<url><priority>0.3</priority><loc> https://a.example/2 </loc></url>"
        # bare loc: priority defaults to 0.5, lastmod null
        "<url><loc>https://a.example/3</loc></url>"
        "</urlset>"
    )
    got = _read(tmp_path, xml)
    assert got.url.tolist() == [
        "https://a.example/1",
        "https://a.example/2",
        "https://a.example/3",
    ]
    assert str(got.lastmod[0]) == "2024-05-01 10:00:00"
    assert got.lastmod.isna().tolist() == [False, True, True]
    assert got.priority_micro.tolist() == [800000, 300000, 500000]
    assert got.is_index.tolist() == [False, False, False]


def test_w3c_datetime_variants(tmp_path):
    xml = (
        "<urlset>"
        # date-only form -> midnight
        "<url><loc>https://b.example/d</loc>"
        "<lastmod>2024-03-07</lastmod></url>"
        # fractional seconds truncated, explicit offset form
        "<url><loc>https://b.example/f</loc>"
        "<lastmod>2024-03-07T01:02:03.456+00:00</lastmod></url>"
        # garbage lastmod -> null, row kept
        "<url><loc>https://b.example/g</loc>"
        "<lastmod>not-a-date</lastmod></url>"
        "</urlset>"
    )
    got = _read(tmp_path, xml)
    assert str(got.lastmod[0]) == "2024-03-07 00:00:00"
    assert str(got.lastmod[1]) == "2024-03-07 01:02:03"
    assert got.lastmod.isna().tolist() == [False, False, True]


def test_sitemapindex_rows_flagged(tmp_path):
    xml = (
        "<sitemapindex>"
        "<sitemap><loc>https://c.example/s1.xml</loc></sitemap>"
        "<sitemap><loc>https://c.example/s2.xml</loc>"
        "<lastmod>2024-01-01</lastmod></sitemap>"
        "</sitemapindex>"
    )
    got = _read(tmp_path, xml)
    assert got.url.tolist() == [
        "https://c.example/s1.xml",
        "https://c.example/s2.xml",
    ]
    assert got.is_index.tolist() == [True, True]
    # index rows carry no page metadata
    assert got.lastmod.isna().all() and got.priority_micro.isna().all()


def test_entry_without_loc_dropped(tmp_path):
    xml = (
        "<urlset>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "<url><loc>https://d.example/ok</loc></url>"
        "</urlset>"
    )
    got = _read(tmp_path, xml)
    assert got.url.tolist() == ["https://d.example/ok"]


def test_write_read_roundtrip_and_idempotent_names(tmp_path):
    from anonymization_ray.sources.sitemap import (
        read_sitemaps,
        write_sitemap_shards,
    )

    tbl = pa.table(
        {
            "url": ["https://e.example/a", "https://e.example/b"],
            "lastmod": pa.array(
                [1714557600000000, None], pa.timestamp("us")
            ),
            "priority_micro": pa.array([500000, None], pa.int64()),
        }
    )
    out = tmp_path / "shards"
    man1 = write_sitemap_shards(
        rd.from_arrow(tbl),
        str(out),
        lastmod_col="lastmod",
        priority_micro_col="priority_micro",
    )
    # content-hash filenames: a retry writes the identical file set
    man2 = write_sitemap_shards(
        rd.from_arrow(tbl),
        str(out),
        lastmod_col="lastmod",
        priority_micro_col="priority_micro",
    )
    assert sorted(man1.column("path").to_pylist()) == sorted(
        man2.column("path").to_pylist()
    )

    got = (
        read_sitemaps(str(out))
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert got.url.tolist() == tbl.column("url").to_pylist()
    assert str(got.lastmod[0]) == "2024-05-01 10:00:00"
    assert got.lastmod.isna().tolist() == [False, True]
    # absent priority reads back as the protocol default 0.5
    assert got.priority_micro.tolist() == [500000, 500000]


def test_xml_entity_escaping_roundtrip(tmp_path):
    from anonymization_ray.sources.sitemap import (
        read_sitemaps,
        write_sitemap_shards,
    )

    url = "https://f.example/search?q=a&b=<c>&name=\"x'y\""
    tbl = pa.table({"url": [url]})
    out = tmp_path / "esc"
    man = write_sitemap_shards(rd.from_arrow(tbl), str(out))
    raw = open(man.column("path")[0].as_py()).read()
    assert "&amp;" in raw and "&lt;c&gt;" in raw and "&" not in raw.replace(
        "&amp;", ""
    ).replace("&lt;", "").replace("&gt;", "").replace("&apos;", "").replace(
        "&quot;", ""
    )
    got = read_sitemaps(str(out)).to_pandas()
    assert got.url.tolist() == [url]
