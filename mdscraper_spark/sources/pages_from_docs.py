"""Derive a Common-Crawl-shaped pages table from the driver's
``documents`` parquet — deterministic column expressions only (JVM-side
concat; no Python), so the same rows appear at any parallelism.

Two templates:
* ``docs_to_pages``   — plain article: h1 + one paragraph of the doc
  text.  Its extracted Markdown is reconstructable in pure SQL, which
  gives the extraction UDF a DuckDB-checkable oracle.
* ``docs_to_kg_pages`` — adds a relation sentence derived from doc_id
  (names from the synthetic entity inventory), so the KG flagship has
  mentions/triples to find.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mdscraper_spark.sources.fixtures import _FIRST, _LAST, _ORG_A, _ORG_B

_PREFIX = ('<html><head><title>Doc</title></head><body>'
           '<div class="content"><h1>Report ')
_MID = "</h1><p>"
_SUFFIX = "</p></div></body></html>"


def _pick(values, idx_col):
    return F.element_at(F.array(*[F.lit(v) for v in values]),
                        (idx_col + 1).cast("int"))


def person_col(doc_id):
    return F.concat_ws(" ", _pick(_FIRST, doc_id % 10),
                       _pick(_LAST, (doc_id / 10).cast("int") % 10))


def org_col(doc_id):
    k = doc_id % 100
    return F.concat(_pick(_ORG_A, k % 10), F.lit(" "),
                    _pick(_ORG_B, (k / 10).cast("int") % 10), F.lit(" "),
                    k.cast("string"))


def docs_to_pages(docs: DataFrame) -> DataFrame:
    html = F.concat(F.lit(_PREFIX), F.col("doc_id").cast("string"),
                    F.lit(_MID), F.col("text"), F.lit(_SUFFIX))
    return docs.select(
        F.concat(F.lit("https://docs.test/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2025-06-14 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"))


def docs_to_census_pages(docs: DataFrame) -> DataFrame:
    """Pages with a richer, fully deterministic div-attribute surface
    (multi-token class lists, conditional ids) so the HTML-parsing
    div census has a generator-vs-parser differential oracle: DuckDB
    recomputes the expected (kind, value) counts straight from the
    generating expressions over documents columns."""
    doc_id = F.col("doc_id")
    maybe_id = F.when(doc_id % 3 == 0,
                      F.concat(F.lit(' id="main-'),
                               (doc_id % 5).cast("string"), F.lit('"'))
                      ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><title>Doc</title></head><body>'
              '<div class="page wrap-'), F.col("lang"), F.lit('">'),
        F.lit('<div class="content post-'), (doc_id % 7).cast("string"),
        F.lit('"'), maybe_id, F.lit("><h1>Report "), doc_id.cast("string"),
        F.lit("</h1><p>"), F.col("text"), F.lit("</p></div>"),
        F.lit('<div class="footer"></div></div></body></html>'))
    return docs.select(
        F.concat(F.lit("https://docs.test/"), doc_id).alias("url"),
        F.to_timestamp(F.lit("2025-06-14 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"))


def docs_to_anchor_pages(docs: DataFrame) -> DataFrame:
    """Pages carrying a deterministic LINK surface so the anchor-text
    harvest has a generator-vs-parser differential oracle: four ``<a>``
    tags per doc whose hrefs/anchors derive from doc_id — one plain,
    one with nested markup + newline inside the anchor (the parser
    must flatten and collapse it), one with an entity (``&amp;``) the
    parser must decode, one mailto (harvested, then dropped by URL
    normalization) — plus a whitespace-only anchor and an href-less
    ``<a>`` that the harvest itself must skip.  DuckDB recomputes the
    expected (href, anchor) rows straight from the same expressions."""
    doc_id = F.col("doc_id")

    def s(col):
        return col.cast("string")

    t1 = F.concat(F.lit("https://site"), s(doc_id % 5),
                  F.lit(".example.com/t/"), s(doc_id % 40))
    t2 = F.concat(F.lit("HTTPS://Site"), s(doc_id % 5),
                  F.lit(".Example.com:443/t/"), s((doc_id * 3) % 40),
                  F.lit("?utm_x=1"))
    t3 = F.concat(F.lit("http://site"), s(doc_id % 5),
                  F.lit(".example.com:80/t/"), s((doc_id + 7) % 40),
                  F.lit("#frag"))
    html = F.concat(
        F.lit('<html><head><title>Doc</title></head><body>'
              '<div class="content"><h1>Links '), s(doc_id),
        F.lit('</h1><p><a href="'), t1, F.lit('">Topic '),
        s(doc_id % 80), F.lit('</a></p><p><a href="'), t2,
        F.lit('"><b>Hot</b>\n   topic '), s((doc_id * 3) % 40),
        F.lit('</a></p><p><a href="'), t3, F.lit('">R &amp; D '),
        s(doc_id % 10),
        F.lit('</a></p><p><a href="'), t1, F.lit('">   </a>'
              '<a name="x">no href here</a>'
              '<a href="mailto:u'), s(doc_id),
        F.lit('@e.com">mail text</a></p></div></body></html>'))
    return docs.select(
        F.concat(F.lit("https://docs.test/"), doc_id).alias("url"),
        F.to_timestamp(F.lit("2025-06-14 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"))


def docs_to_kg_pages(docs: DataFrame) -> DataFrame:
    doc_id = F.col("doc_id")
    relation = F.concat(person_col(doc_id), F.lit(" works for "),
                        org_col(doc_id), F.lit("."))
    html = F.concat(F.lit(_PREFIX), doc_id.cast("string"), F.lit(_MID),
                    relation, F.lit("</p><p>"), F.col("text"),
                    F.lit(_SUFFIX))
    return docs.select(
        F.concat(F.lit("https://docs.test/"), doc_id).alias("url"),
        F.to_timestamp(F.lit("2025-06-14 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.col("lang"))
