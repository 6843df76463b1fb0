"""Single-call library facade: reference-shaped options + verbs, byte
parity with both the golden corpus and the distributed path."""

import pathlib

import pytest

from mdscraper_spark.api import MdScraperSpark
from mdscraper_spark.sources.fixtures import FIXTURE_CASES, fixture_url

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def test_fetch_content_matches_goldens():
    s = MdScraperSpark()
    for case_id, html in FIXTURE_CASES.items():
        got = s.fetch_content(fixture_url(case_id), html)
        # newline="" keeps raw \r bytes (fence-interior goldens pin
        # them); read_text()'s universal-newline mode would fold them
        golden = (GOLDEN_DIR / f"{case_id}__default.md") \
            .read_bytes().decode("utf-8")
        if golden.startswith("<<status:"):
            assert got is None
        else:
            assert got == golden, case_id


def test_reference_option_names_accepted():
    # reference DefaultOptions names pass straight through; inert
    # network-era options are tolerated (scraper.py:84-118)
    s = MdScraperSpark(no_images=True, no_links=True,
                       extra_heading_space="2,3",
                       prepend_source_link=True,
                       root_url="https://fixtures.test/docs",
                       exclude_selectors=(".ads", "#nav"),
                       content=("custom-name",),
                       requests_timeout=60, user_agent="x",
                       custom_content_names=("dead",))
    assert s.config.no_images and s.config.content == ("custom-name",)
    with pytest.raises(TypeError):
        MdScraperSpark(not_an_option=1)


def test_debug_promotes_verbose():
    assert MdScraperSpark(debug=True).config.verbose == 9     # G4 quirk
    assert MdScraperSpark(debug=True, verbose=2).config.verbose == 2


def test_fetch_content_from_local_file(tmp_path):
    p = tmp_path / "page.html"
    p.write_text(FIXTURE_CASES["article-basic"])
    s = MdScraperSpark()
    want = s.fetch_content(fixture_url("article-basic"),
                           FIXTURE_CASES["article-basic"])
    assert s.fetch_content(str(p)) == want
    assert s.fetch_content(f"file://{p}") == want


def test_fetch_result_and_md_title():
    s = MdScraperSpark()
    res = s.fetch_result(fixture_url("quirks"), FIXTURE_CASES["quirks"])
    assert res.status == "ok"
    # B3 strip-all quirk travels through the facade
    assert MdScraperSpark.extract_md_title("# Title with # inner # hash") \
        == "Title with inner hash"


def test_facade_matches_distributed_path(spark):
    from mdscraper_spark.sources.pages import fixture_pages_df

    variant = {"no_images": True, "exclude_selectors": (".ads", "#nav")}
    s = MdScraperSpark(**variant)
    dist = {r.url: r.markdown
            for r in s.fetch_content_df(fixture_pages_df(spark)).collect()}
    for case_id, html in FIXTURE_CASES.items():
        url = fixture_url(case_id)
        assert dist[url] == s.fetch_content(url, html), case_id
