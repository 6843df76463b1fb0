"""Arrow-vectorized extraction operator (SURVEY.md §3.2 Stage 1).

Spark mapping of the reference's per-URL pipeline
(/root/reference/mdscraper/core/scraper.py:787-858): the whole
fetch->detect->strip->render chain becomes ONE narrow ``mapInPandas``
stage — no shuffle, no per-row Python (BASELINE.json:15), per-row
error isolation via status/error columns (scraper.py:743-746 keeps
going on failures; so do we).

Scale notes:
* input is pruned to (url, warc_ts, html, lang) before the UDF so the
  parquet scan reads only those columns;
* Arrow batches are bounded by ``arrow.maxRecordsPerBatch`` (session.py)
  because html rows are large;
* the stage is embarrassingly parallel — throughput scales with cores
  until the scan is I/O-bound, which is the property the N-vs-4N bench
  evidences.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.extract.pipeline import extract_page

MARKDOWN_DOCS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("lang", StringType(), True),
    StructField("markdown", StringType(), True),
    StructField("title", StringType(), True),
    StructField("doc_slug", StringType(), True),
    StructField("detect_stage", IntegerType(), True),
    StructField("detect_name", StringType(), True),
    StructField("status", StringType(), False),
    StructField("error", StringType(), True),
    StructField("links", ArrayType(StringType()), True),
    StructField("n_bytes", LongType(), True),
])


def extract_markdown(pages: DataFrame, config: ExtractConfig) -> DataFrame:
    """pages(url, warc_ts, html, ...) -> markdown_docs rows.

    The frozen config is captured in the task closure (it is a few
    hundred bytes — cheaper than a broadcast round-trip).
    """
    config_json = config.to_json()
    cols = [c for c in ("url", "warc_ts", "html", "lang") if c in pages.columns]
    pruned = pages.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cfg = ExtractConfig.from_json(config_json)
        for pdf in batches:
            out = {k: [] for k in (
                "url", "warc_ts", "lang", "markdown", "title", "doc_slug",
                "detect_stage", "detect_name", "status", "error", "links",
                "n_bytes")}
            has_ts = "warc_ts" in pdf.columns
            has_lang = "lang" in pdf.columns
            for row in pdf.itertuples(index=False):
                html = row.html
                html_text = (
                    bytes(html).decode("utf-8", errors="replace")
                    if html is not None else ""
                )
                res = extract_page(row.url, html_text, cfg)
                out["url"].append(row.url)
                out["warc_ts"].append(row.warc_ts if has_ts else None)
                out["lang"].append(row.lang if has_lang else None)
                out["markdown"].append(res.markdown)
                out["title"].append(res.title)
                out["doc_slug"].append(res.doc_slug)
                out["detect_stage"].append(res.detect_stage)
                out["detect_name"].append(res.detect_name)
                out["status"].append(res.status)
                out["error"].append(res.error)
                out["links"].append(res.links)
                out["n_bytes"].append(
                    len(res.markdown.encode("utf-8")) if res.markdown else 0)
            yield pd.DataFrame(out)

    return pruned.mapInPandas(run, MARKDOWN_DOCS_SCHEMA)


def status_counts(markdown_docs: DataFrame) -> DataFrame:
    """G2's success/failure counters as a distributed aggregate
    (scraper.py:731-750)."""
    return (markdown_docs.groupBy("status")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("status"))


def with_doc_path(docs: DataFrame, config: ExtractConfig) -> DataFrame:
    """B2 full output path as a derived column (scraper.py:826-831):
    %-modes get ``os.path.join(outdir, slug + '.md')``; a fixed
    --output name is joined verbatim (no '.md' suffix).  os.path.join
    semantics replicated: no doubled slash after a trailing-slash
    outdir, and an ABSOLUTE fixed name discards outdir.  Null for
    non-ok rows — the reference never names a file for a failed page."""
    fixed = config.output not in ("%TITLE", "%URL")
    name = (F.lit(config.output) if fixed
            else F.concat(F.col("doc_slug"), F.lit(".md")))
    outdir = config.outdir
    if outdir:
        prefix = outdir if outdir.endswith("/") else outdir + "/"
        path = F.when(name.startswith("/"), name) \
                .otherwise(F.concat(F.lit(prefix), name))
    else:
        path = name
    return docs.withColumn(
        "doc_path", F.when(F.col("status") == "ok", path))
