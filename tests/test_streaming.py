"""Structured-Streaming incremental extraction tests."""

import pathlib

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.sources.pages import PAGES_SCHEMA, bulk_pages_df
from mdscraper_spark.streaming.incremental import stream_extract

CFG = ExtractConfig(exclude_selectors=(".ads", "#nav"))


def test_incremental_stream_extract(spark, tmp_path):
    inp = str(tmp_path / "pages_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "ckpt")

    all_pages = bulk_pages_df(spark, 20).collect()

    # batch 1: first 12 pages
    spark.createDataFrame(all_pages[:12], PAGES_SCHEMA) \
         .write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt, CFG)
    got1 = {r.url for r in spark.read.parquet(out).select("url").collect()}
    assert len(got1) == 12

    # batch 2: 8 new pages + 4 re-crawled duplicates of batch-1 urls
    spark.createDataFrame(all_pages[12:] + all_pages[:4], PAGES_SCHEMA) \
         .write.mode("append").parquet(inp)
    stream_extract(spark, inp, out, ckpt, CFG)
    docs = spark.read.parquet(out).collect()
    urls = [r.url for r in docs]
    # batch-1 files are not reprocessed (checkpoint) and the re-crawled
    # urls are dropped by the state restored from the checkpoint: every
    # url extracted exactly once across both increments
    assert sorted(urls) == sorted({r[0] for r in all_pages})
    ok = [r for r in docs if r.status == "ok"]
    assert len(ok) == len(docs)
    sample = next(r for r in docs if r.url.endswith("page00000"))
    assert sample.markdown.startswith("# Report 0")
