"""Link-harvest operators: the reference's URL-file and site modes as
relational plans (SURVEY.md §2.A2-A4).

The extraction UDF already emits each page's in-content hrefs as the
``links`` array column; everything downstream is Spark built-ins:
posexplode preserves document order, the glob filter is one compiled
rlike alternation, and the work-list semi-joins back into ``pages``.
"""

from __future__ import annotations

import re
from typing import Iterator, Sequence, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)


def url_file_source(spark, path: str) -> DataFrame:
    """A2: text file of URLs -> ordered DataFrame[pos, url]; blank lines
    dropped, duplicates and order preserved (scraper.py:753-767)."""
    from mdscraper_spark.operators.dedup import ws_strip

    # ws_strip, NOT F.trim: the reference's line.strip() removes ALL
    # whitespace while trim is space-only — a tab-padded url would
    # silently miss the pages semi-join (same pitfall documented at
    # dedup.ws_strip)
    lines = spark.read.text(path).select(
        F.monotonically_increasing_id().alias("pos"),
        ws_strip(F.col("value")).alias("url"))
    return lines.filter(F.length("url") > 0)


def with_contiguous_pos(src: DataFrame) -> DataFrame:
    """Re-rank url_file_source's sparse monotonic ids into contiguous
    0-based file order WITHOUT a global single-partition sort: rank
    within each scan split in parallel, then add the split's offset
    (prefix sum over the tiny per-split count table, broadcast back).
    The only global window runs over #splits rows, not #urls.
    """
    from pyspark.sql import Window

    ranked = (src.withColumn("split", F.spark_partition_id())
              .withColumn("r", F.row_number().over(
                  Window.partitionBy("split").orderBy("pos")) - 1))
    offsets = (ranked.groupBy("split")
               .agg(F.count(F.lit(1)).alias("n"))
               .withColumn("off", F.coalesce(F.sum("n").over(
                   Window.orderBy("split")
                   .rowsBetween(Window.unboundedPreceding, -1)),
                   F.lit(0)))
               .select("split", "off"))
    return (ranked.join(F.broadcast(offsets), "split")
            .select((F.col("r") + F.col("off")).alias("pos"), "url"))


def glob_to_regex(globs: Sequence[str]) -> str:
    """fnmatch globs -> one anchored, engine-portable alternation.
    Supports * and ? (the subset the reference's fixtures exercise)."""
    parts = []
    for g in globs:
        out = []
        for ch in g:
            if ch == "*":
                out.append(".*")
            elif ch == "?":
                out.append(".")
            else:
                out.append(re.escape(ch))
        parts.append("".join(out))
    return "^(" + "|".join(parts) + ")$" if parts else "^$"


def site_seed_urls(markdown_docs: DataFrame, site_root: str,
                   exclude_pages: Sequence[str] = ()) -> DataFrame:
    """A3/A4: seed pages' harvested links -> URL work-list.

    Reproduces content_to_url_list semantics (scraper.py:666-709):
    query/fragment dropped, foreign-host absolutes rewritten onto
    site_root (path only), page-name glob exclusion, duplicates and
    document order retained (``pos``).
    """
    exploded = markdown_docs.select(
        "url", F.posexplode("links").alias("pos", "href"))
    # urlparse(href).path emulation (the reference uses it verbatim,
    # scraper.py:687-688 — including its quirks: a slash-less relative
    # href concatenates onto site_root with no separator, and a
    # mailto:/tel: href contributes its scheme-less remainder):
    #  * absolute/scheme-relative urls -> parse_url PATH (query and
    #    fragment dropped by the parser);
    #  * anything else (no netloc) -> href minus any scheme prefix,
    #    minus ?query/#fragment.
    # The old placeholder-host concat absorbed slash-less paths into
    # the fake host (PATH='') and NULLed on non-http schemes, crashing
    # the site work-list.
    href = F.col("href")
    netloc_full = href.rlike(r"^[a-zA-Z][a-zA-Z0-9+.-]*://")
    path = (F.when(netloc_full | href.startswith("//"),
                   F.coalesce(F.parse_url(
                       F.when(href.startswith("//"),
                              F.concat(F.lit("http:"), href))
                       .otherwise(href), F.lit("PATH")), F.lit("")))
            .otherwise(F.regexp_replace(
                F.regexp_replace(href, r"^[a-zA-Z][a-zA-Z0-9+.-]*:", ""),
                r"[?#].*", "")))
    page_name = F.element_at(F.split(path, "/"), -1)
    out = exploded.withColumn("url_path", path) \
                  .withColumn("page_name", page_name)
    if exclude_pages:
        out = out.filter(~F.col("page_name")
                         .rlike(glob_to_regex(exclude_pages)))
    return out.select(
        "url", "pos",
        F.concat(F.lit(site_root), F.col("url_path")).alias("harvested_url"))


DIV_ATTR_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("kind", StringType(), False),   # 'class' | 'id'
    StructField("value", StringType(), False),
])


def div_attr_census(pages: DataFrame) -> DataFrame:
    """C4 promoted from debug aid to corpus statistic: frequency of div
    class tokens / ids across the crawl — the data that tunes the
    content-name heuristic list (scraper.py:107-118)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mdscraper_spark.htmlcore.dom import parse_html

        for pdf in batches:
            rows = {"url": [], "kind": [], "value": []}
            for url, html in zip(pdf["url"], pdf["html"]):
                text = (bytes(html).decode("utf-8", errors="replace")
                        if html is not None else "")
                try:
                    root = parse_html(text)
                except Exception:
                    continue
                for div in root.find_all("div"):
                    for token in div.attrs.get("class", "").split():
                        rows["url"].append(url)
                        rows["kind"].append("class")
                        rows["value"].append(token)
                    if div.attrs.get("id"):
                        rows["url"].append(url)
                        rows["kind"].append("id")
                        rows["value"].append(div.attrs["id"])
            yield pd.DataFrame(rows)

    per_page = pages.select("url", "html").mapInPandas(run, DIV_ATTR_SCHEMA)
    # countDistinct, matching the column's name: a page repeating a
    # class token (or holding two matching divs) is still ONE page —
    # occurrence counting would overweight repeated-container pages in
    # the heuristic-tuning statistic
    return (per_page.groupBy("kind", "value")
            .agg(F.countDistinct("url").alias("n_pages"))
            .orderBy(F.desc("n_pages"), "kind", "value"))
