"""Byte-decode seam: invalid UTF-8 in the binary html column.

A Common-Crawl-style corpus is full of pages whose bytes are not the
UTF-8 their headers claim — latin-1/cp1252 high bytes, multibyte
sequences truncated at fetch boundaries, stray continuation bytes,
wrong-width (UTF-16) payloads.  The input contract (BASELINE.json
input_hint) makes html BINARY precisely so the engine owns this seam:
every decode site uses errors="replace" (operators/extract_udfs.py:79,
api.py:78, operators/links.py:144), so a bad byte becomes U+FFFD and
the row keeps flowing — per-row isolation, never a task failure
(reference analog: requests/bs4 swallow the same soup,
/root/reference/mdscraper/core/scraper.py:268).

These tests pin the seam at both surfaces — the driver-side facade and
the distributed Arrow path — and assert they produce identical bytes.
"""

import datetime

import pytest

from mdscraper_spark.api import MdScraperSpark
from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.sources.pages import PAGES_SCHEMA

R = "�"

CASES = {
    # latin-1 high bytes where UTF-8 continuation bytes should be
    "latin1": (
        "<html><body><div class='content'><h1>Caf\xe9</h1>"
        "<p>r\xe9sum\xe9 notes</p></div></body></html>".encode("latin-1"),
        "ok", f"# Caf{R}\n\nr{R}sum{R} notes"),
    # multibyte sequence cut at a fetch boundary
    "truncated": (
        b"<html><body><div class='content'><h1>Truncated</h1>"
        b"<p>caf\xc3</p></div></body></html>",
        "ok", f"# Truncated\n\ncaf{R}"),
    # stray continuation bytes with no lead byte
    "continuation": (
        b"<html><body><div class='content'><h1>Stray</h1>"
        b"<p>a\x80\xbfb</p></div></body></html>",
        "ok", f"# Stray\n\na{R}{R}b"),
    # cp1252 smart quotes / em-dash sent as raw high bytes
    "cp1252": (
        "<html><body><div class='content'><h1>Smart \x93quotes\x94</h1>"
        "<p>dash \x97 here</p></div></body></html>".encode("latin-1"),
        "ok", f"# Smart {R}quotes{R}\n\ndash {R} here"),
    # wrong width entirely: UTF-16LE bytes decode to NUL-riddled text
    # in which no tag ever forms -> the pinned per-row no_content
    # status, not an exception
    "utf16le": (
        "<html><body><div class='content'><h1>Wide</h1><p>body</p>"
        "</div></body></html>".encode("utf-16-le"),
        "no_content", None),
    # NULL html column -> empty document, same status path
    "null-html": (None, "no_content", None),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_facade_decodes_with_replacement(name):
    html, want_status, want_md = CASES[name]
    res = MdScraperSpark().fetch_result(f"https://bytes.test/{name}", html or b"")
    assert res.status == want_status
    assert res.markdown == want_md


def test_spark_path_matches_facade_bytes(spark):
    ts = datetime.datetime(2025, 6, 14)
    rows = [(f"https://bytes.test/{name}", ts, html, None, "en")
            for name, (html, _, _) in sorted(CASES.items())]
    docs = extract_markdown(
        spark.createDataFrame(rows, PAGES_SCHEMA).repartition(3),
        ExtractConfig())
    got = {r.url: (r.markdown, r.status)
           for r in docs.select("url", "markdown", "status").collect()}
    assert len(got) == len(CASES)
    for name, (html, want_status, want_md) in CASES.items():
        md, status = got[f"https://bytes.test/{name}"]
        assert status == want_status, name
        assert md == want_md, name
