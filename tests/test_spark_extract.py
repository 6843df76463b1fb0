"""Spark e2e extraction tests (SURVEY.md §5.3-3).

Byte identity of the distributed path vs the frozen goldens, invariance
under partitioning, and the bulk corpus smoke.
"""

import pathlib

import pytest

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators.extract_udfs import extract_markdown, status_counts
from mdscraper_spark.sources.fixtures import FIXTURE_CASES, VARIANTS, variant_config
from mdscraper_spark.sources.pages import (
    bulk_pages_df,
    fixture_pages_df,
    with_part_id,
    with_url_host,
)

GOLDEN_DIR = pathlib.Path(__file__).parent / "goldens"


def golden_bytes(case_id, variant):
    return (GOLDEN_DIR / f"{case_id}__{variant}.md").read_bytes()


def collect_markdown(spark, variant, num_partitions):
    pages = fixture_pages_df(spark).repartition(num_partitions)
    docs = extract_markdown(pages, variant_config(variant))
    rows = docs.select("url", "markdown", "status").collect()
    return {r.url: (r.markdown, r.status) for r in rows}


@pytest.mark.parametrize("variant", ["default", "no_images", "hs_23", "source"])
def test_spark_matches_goldens(spark, variant):
    got = collect_markdown(spark, variant, num_partitions=3)
    assert len(got) == len(FIXTURE_CASES)
    for case_id in FIXTURE_CASES:
        url = f"https://fixtures.test/{case_id}"
        markdown, status = got[url]
        actual = markdown if markdown is not None else f"<<status:{status}>>"
        assert actual.encode("utf-8") == golden_bytes(case_id, variant), case_id


def test_partitioning_does_not_change_bytes(spark):
    one = collect_markdown(spark, "default", num_partitions=1)
    many = collect_markdown(spark, "default", num_partitions=7)
    assert one == many


def test_bulk_corpus_extraction(spark):
    pages = bulk_pages_df(spark, 60, seed=42)
    docs = extract_markdown(pages, ExtractConfig(
        no_images=True, exclude_selectors=(".ads", "#nav")))
    rows = docs.collect()
    assert len(rows) == 60
    assert all(r.status == "ok" for r in rows)
    sample = next(r for r in rows if r.url.endswith("page00000"))
    assert sample.markdown.startswith("# Report 0")
    assert "advertisement" not in sample.markdown
    assert "Home" not in sample.markdown
    counts = {r.status: r.n for r in status_counts(docs).collect()}
    assert counts == {"ok": 60}


def test_bulk_generation_deterministic_across_partitionings(spark):
    a = {r.url: bytes(r.html) for r in bulk_pages_df(spark, 30, num_partitions=2).collect()}
    b = {r.url: bytes(r.html) for r in bulk_pages_df(spark, 30, num_partitions=5).collect()}
    assert a == b


def test_url_host_and_part_id(spark):
    pages = with_part_id(with_url_host(bulk_pages_df(spark, 40)), 16)
    rows = pages.select("url", "url_host", "part_id").collect()
    assert all(r.url_host.startswith("host") for r in rows)
    assert all(0 <= r.part_id < 16 for r in rows)
    # hub-domain skew present: top host has a disproportionate share
    from collections import Counter
    hosts = Counter(r.url_host for r in rows)
    assert hosts.most_common(1)[0][1] >= 5
