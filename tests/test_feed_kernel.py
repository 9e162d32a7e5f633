"""RSS / Atom / RDF feed kernel tests."""

import random

import pytest

from sparktika.kernels.errors import DepthLimitError
from sparktika.kernels.extract import extract_document
from sparktika.kernels.feed import parse_feed
from sparktika.synth import build_feed


def test_rss_entities_and_cdata():
    rss = b"""<?xml version="1.0" encoding="utf-8"?>
<rss version="2.0"><channel>
<title>Example &amp; News</title><description>A test feed</description>
<item><title>First &amp; foremost</title><link>https://e.com/1</link>
<description>Body one.</description>
<pubDate>Mon, 01 Jan 2026 00:00:00 GMT</pubDate></item>
<item><title>Second</title><link>https://e.com/2</link>
<description><![CDATA[Body <b>two</b>.]]></description></item>
</channel></rss>"""
    r = extract_document("https://x/feed.xml", None, rss)
    assert r.status == "ok"
    assert r.content_type_detected == "application/rss+xml"
    assert r.title == "Example & News"
    assert r.text_extracted == (
        "First & foremost\nBody one.\nSecond\nBody <b>two</b>.\n")
    assert r.metadata["feed-entry-links"] == [
        "https://e.com/1", "https://e.com/2"]
    assert r.metadata["feed-entry-dates"] == [
        "Mon, 01 Jan 2026 00:00:00 GMT"]


def test_atom_link_rel_selection():
    atom = b"""<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"><title>B</title>
<entry><title>P</title>
<link rel="self" href="https://a.com/self"/>
<link rel="alternate" href="https://a.com/page"/>
<summary>S.</summary></entry></feed>"""
    r = extract_document("https://x/a.xml", None, atom)
    assert r.metadata["feed-entry-links"] == ["https://a.com/page"]
    assert r.content_type_detected == "application/atom+xml"


def test_rdf_siblings_layout():
    r = extract_document("https://x/r.rdf", None, build_feed(2))
    assert r.metadata["feed-format"] == ["rdf"]
    assert r.metadata["feed-entries"] == ["1"]
    assert r.title == "Feed 2"


def test_first_title_wins_nested_item_ignored():
    rss = b"""<rss><channel><title>T1</title><title>T2</title>
<item><title>A</title><description>has <item><title>inner</title>
</item> markup</description></item></channel></rss>"""
    fr = parse_feed(rss.decode())
    assert fr.title == "T1"
    assert len(fr.entries) == 1
    assert fr.entries[0].title == "A"


def test_depth_bomb_becomes_status_row():
    bomb = b"<rss><channel>" + b"<a>" * 200
    r = extract_document("https://x/f.xml",
                         "application/xml", b"<?xml version='1.0'?>" + bomb)
    # either the XML route's own depth guard or the feed walker's —
    # must be a status row, never a crash
    assert r.status in ("ok", "failed")
    with pytest.raises(DepthLimitError):
        parse_feed(("<rss><channel>" + "<a>" * 200).replace("", ""))


def test_entry_flood_truncates():
    body = "<rss><channel><title>F</title>" + \
        "".join(f"<item><title>i{i}</title></item>" for i in range(5000)) + \
        "</channel></rss>"
    fr = parse_feed(body)
    assert len(fr.entries) == 4096
    assert fr.truncated_entries


def test_synth_parity_all_variants():
    for i in range(6):
        r = extract_document(f"https://x/{i}.xml", None, build_feed(i))
        assert r.status == "ok"
        assert r.title == f"Feed {i}"
        want = f"Item {i} alpha\nAlpha body {i}.\n"
        if i % 3 < 2:
            want += f"Item {i} beta\nBeta body {i}.\n"
        assert r.text_extracted == want


def test_fuzz_never_raises():
    rnd = random.Random(11)
    for base in range(3):
        data = bytearray(build_feed(base))
        for _ in range(60):
            i = rnd.randrange(len(data))
            orig = data[i]
            data[i] = rnd.randrange(256)
            r = extract_document("https://x/f.xml", None, bytes(data))
            assert r.status in ("ok", "failed", "unsupported")
            data[i] = orig


def test_sitemap_urlset_and_index():
    from sparktika.kernels.feed import parse_sitemap

    sm = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url><loc>https://e.com/a</loc><lastmod>2026-01-01</lastmod></url>
<url><loc> https://e.com/b </loc></url>
<url><lastmod>2026-02-02</lastmod></url>
</urlset>"""
    r = parse_sitemap(sm)
    assert r.kind == "urlset"
    assert r.urls == ["https://e.com/a", "https://e.com/b"]
    assert r.lastmods == ["2026-01-01", ""]
    idx = ("<sitemapindex><sitemap><loc>https://e.com/s1.xml</loc>"
           "</sitemap></sitemapindex>")
    r2 = parse_sitemap(idx)
    assert r2.kind == "sitemapindex"
    assert r2.urls == ["https://e.com/s1.xml"]


def test_sitemap_url_cap():
    from sparktika.kernels.feed import parse_sitemap

    body = "<urlset>" + "".join(
        f"<url><loc>https://e.com/{i}</loc></url>" for i in range(60)
    ) + "</urlset>"
    r = parse_sitemap(body, max_urls=50)
    assert len(r.urls) == 50 and r.truncated


def test_sitemap_gz_wrapped_dispatch():
    import gzip

    from sparktika.synth import build_sitemap

    r = extract_document("https://x/1/sitemap.xml.gz", None,
                         build_sitemap(1))
    assert r.status == "ok"
    assert r.content_type_detected == "application/x-sitemap+xml"
    assert r.metadata["Content-Encoding-Outer"] == ["gzip"]
    assert r.metadata["sitemap-urls"] == ["3"]
    # fuzz: corrupt sitemaps degrade, never crash
    data = bytearray(gzip.decompress(build_sitemap(1)))
    rnd = random.Random(41)
    for _ in range(50):
        i = rnd.randrange(len(data))
        orig = data[i]
        data[i] = rnd.randrange(256)
        rr = extract_document("https://x/s.xml", None, bytes(data))
        assert rr.status in ("ok", "failed", "unsupported", "truncated")
        data[i] = orig
