"""Incremental-crawl extraction via Structured Streaming (SURVEY.md §2.H
streaming row).

The batch north rule covers a crawl snapshot; this module is the
incremental analog: new page files land in a directory (standing in for
Iceberg incremental reads), the SAME Arrow extraction operator runs on
the stream, late re-crawls of a url within the watermark are dropped,
and exactly-once progress is carried by the checkpoint — the streaming
twin of the lineage/resume ledger.

The extraction operator composes unchanged: mapInPandas is available on
streaming DataFrames, so batch and streaming share one code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.sources.pages import PAGES_SCHEMA


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str, config: ExtractConfig,
                   watermark: str = "1 hour",
                   canonical_urls: bool = False) -> None:
    """Drain all currently-available page files into markdown_docs
    parquet, deduplicating re-crawled urls within the watermark.

    ``availableNow`` processes the backlog and stops — each invocation
    is one incremental ingest; the checkpoint makes repeats exactly-once.

    ``canonical_urls=True`` dedups on ``normalize_url(url)`` instead of
    the raw url (J30 composed into the frontier): two fetches of one
    page under different tracking-param/case/port spellings extract
    once.  Unparseable urls fall back to their raw string — identity
    unknown must never collapse every malformed url into one NULL key.
    The flag is part of the checkpoint's state identity: flipping it on
    an existing checkpoint changes the dedup key column, so use a fresh
    checkpoint per setting (documented, not detected — the state store
    schema is the same either way).
    """
    pages = (spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir))
    if canonical_urls:
        from pyspark.sql import functions as F

        from mdscraper_spark.operators.links import normalize_url

        pages = pages.withColumn(
            "url_key", F.coalesce(normalize_url(F.col("url")),
                                  F.col("url")))
    # dropDuplicatesWithinWatermark, NOT dropDuplicates: with a plain
    # dropDuplicates(["url"]) the watermark never evicts state (the
    # event-time column isn't in the dedup subset), so state grows one
    # entry per distinct url forever — O(corpus) at crawl scale — and a
    # legitimate re-crawl AFTER the watermark would still be dropped.
    # The WithinWatermark variant gives exactly the documented
    # semantics: re-crawls within the watermark are dropped, state is
    # evicted as the watermark advances, and a later re-crawl refreshes
    # the document.
    deduped = (pages.withWatermark("warc_ts", watermark)
               .dropDuplicatesWithinWatermark(
                   ["url_key" if canonical_urls else "url"]))
    if canonical_urls:
        deduped = deduped.drop("url_key")
    docs = extract_markdown(deduped, config)
    query = (docs.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()


def stream_pages_from_warc(spark: SparkSession, shard_dir: str) -> DataFrame:
    """Streaming pages source over ARRIVING WARC shards (round 4).

    ``binaryFile`` is a FileFormat, so it composes with the file-stream
    source: each newly-landed shard becomes one task's input, exactly
    once per checkpoint — the standing-ingest twin of the batch
    ``sources.warc.read_warc``.  The record walk is the identical
    parser, so batch and streaming WARC ingest cannot drift.  Memory
    bound per task = shard size, chosen by the crawler that writes the
    shards (the Common-Crawl contract).
    """
    from mdscraper_spark.sources.warc import files_to_pages

    # the file-stream source requires an explicit schema; binaryFile's
    # is fixed by the format
    binary_file_schema = ("path string, modificationTime timestamp, "
                          "length long, content binary")
    files = (spark.readStream.format("binaryFile")
             .schema(binary_file_schema)
             .option("pathGlobFilter", "*.{warc,warc.gz}")
             .load(shard_dir))
    return files_to_pages(files)


def stream_extract_warc(spark: SparkSession, shard_dir: str,
                        output_dir: str, checkpoint_dir: str,
                        config: ExtractConfig) -> None:
    """Incremental extraction straight off arriving WARC shards:
    drain the current backlog (availableNow) through the SAME Arrow
    extraction operator and append markdown_docs parquet; the
    checkpoint makes re-runs exactly-once per shard."""
    docs = extract_markdown(stream_pages_from_warc(spark, shard_dir),
                            config)
    query = (docs.writeStream
             .format("parquet")
             .option("path", output_dir)
             .option("checkpointLocation", checkpoint_dir)
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
