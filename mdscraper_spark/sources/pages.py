"""pages-table source: schema, synthesis, and host partitioning.

The canonical input shape is pinned by BASELINE.json:15:
``pages(url string, warc_ts timestamp, html binary, text string,
lang string)``.  In production this is an Iceberg table partitioned by
``bucket(N, url_host)``; in this sandbox (no Iceberg runtime jar,
SURVEY.md §4.4) we mimic the layout with parquet partitioned by a
``part_id = pmod(xxhash64(url_host), N)`` column — the same co-location
property the KG stages rely on, via a thin adapter
(mdscraper_spark.sources.tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mdscraper_spark.sources import fixtures

PAGES_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), True),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])


def fixture_pages_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(fixtures.fixture_pages(), PAGES_SCHEMA)


def bulk_pages_df(spark: SparkSession, n: int, seed: int = 42,
                  num_partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic crawl slice, Zipf-skewed hosts.

    Generation is distributed: the driver ships only (start, count)
    ranges; each task materializes its rows locally so a 10^7-row bench
    corpus never sits in driver memory.  Determinism: one RNG stream
    per page id, independent of partitioning.
    """
    num_partitions = num_partitions or spark.sparkContext.defaultParallelism

    def gen(start: int, count: int):
        from mdscraper_spark.sources.fixtures import bulk_page_row

        for i in range(start, start + count):
            yield bulk_page_row(i, seed)

    step = (n + num_partitions - 1) // num_partitions
    ranges = [(s, min(step, n - s)) for s in range(0, n, step)]
    rdd = spark.sparkContext.parallelize(ranges, len(ranges)).flatMap(
        lambda r: gen(*r)
    )
    return spark.createDataFrame(rdd, PAGES_SCHEMA)


def with_url_host(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Derive the host for bucket-partitioning (Iceberg: bucket(N, url_host))."""
    return df.withColumn("url_host", F.parse_url(F.col(url_col), F.lit("HOST")))


def with_part_id(df: DataFrame, n_buckets: int, url_col: str = "url") -> DataFrame:
    """Deterministic bucket id on url-host hash — the resume/lineage work
    unit (SURVEY.md §2.I7/I8).  Values, not placement: salting for skew
    happens at shuffle time and never changes part_id."""
    host = F.parse_url(F.col(url_col), F.lit("HOST"))
    return df.withColumn("part_id",
                         F.pmod(F.xxhash64(host), F.lit(n_buckets)).cast("int"))
