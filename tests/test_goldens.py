"""Byte-identity against the frozen golden corpus (SURVEY.md §5.3-1).

The pure single-threaded pipeline must reproduce every golden file
byte-for-byte.  The Spark e2e test (test_spark_extract.py) asserts the
distributed path produces these same bytes under partitioning.
"""

import pathlib

import pytest

from mdscraper_spark.extract.pipeline import extract_page
from mdscraper_spark.sources.fixtures import (
    FIXTURE_CASES,
    VARIANTS,
    fixture_url,
    variant_config,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"

ALL_KEYS = [(c, v) for c in sorted(FIXTURE_CASES) for v in sorted(VARIANTS)]


@pytest.mark.parametrize("case_id,variant", ALL_KEYS)
def test_golden_byte_identity(case_id, variant):
    golden = (GOLDEN_DIR / f"{case_id}__{variant}.md").read_bytes()
    res = extract_page(fixture_url(case_id), FIXTURE_CASES[case_id],
                       variant_config(variant))
    actual = res.markdown if res.markdown is not None else f"<<status:{res.status}>>"
    assert actual.encode("utf-8") == golden


def test_goldens_cover_full_matrix():
    files = {p.name for p in GOLDEN_DIR.glob("*.md")}
    expected = {f"{c}__{v}.md" for c, v in ALL_KEYS}
    assert files == expected


# targeted semantic checks on specific goldens

def read(case, variant):
    return (GOLDEN_DIR / f"{case}__{variant}.md").read_text()


def test_golden_root_url_rewrites_repeated_root():
    md = read("quirks", "root_url")
    assert "[repeat root](/a/b.html)" in md  # D5 replace-all quirk


def test_golden_exclude_strips_ads_and_nav():
    md = read("article-basic", "exclude")
    assert "SPONSORED" not in md and "Home" not in md


def test_golden_custom_container():
    md = read("custom-container", "custom")
    assert "Custom Zone" in md and "decoy" not in md
    md_default = read("custom-container", "default")
    assert "decoy" in md_default


def test_golden_hs_invalid_equals_hs_all():
    assert read("article-basic", "hs_invalid") == read("article-basic", "hs_all")


def test_golden_source_prepend():
    md = read("links-basic", "source")
    assert md.startswith("Source: <https://fixtures.test/links-basic>\n\n")
