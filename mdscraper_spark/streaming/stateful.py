"""Custom stateful streaming operator: per-host crawl state.

The incremental-crawl path (streaming/incremental.py) is stateless
per-row extraction; this adds the stateful piece a live crawl needs —
per-host running counts/recency maintained across micro-batches with
``applyInPandasWithState`` (Arrow-batched, state checkpointed by the
engine, resumable like every other stage).

Scale shape: state is partitioned by url_host — the same key the
pages table is bucketed by — so a 10^12-page crawl shards its state
across executors with no skew beyond the host distribution itself
(hub hosts hold one state row each; state size is O(#hosts), not
O(#pages)).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

HOST_STATE_SCHEMA = StructType([
    StructField("n_pages_total", LongType()),
    StructField("last_warc_ts", TimestampType()),
])

HOST_STATS_SCHEMA = StructType([
    StructField("url_host", StringType()),
    StructField("n_pages_total", LongType()),
    StructField("batch_pages", LongType()),
    StructField("last_warc_ts", TimestampType()),
])


def _update_host_state(key: Tuple[Any, ...],
                       pdfs: Iterator[pd.DataFrame],
                       state: GroupState) -> Iterator[pd.DataFrame]:
    n_total, last_ts = state.get if state.exists else (0, None)
    batch_pages = 0
    for pdf in pdfs:
        batch_pages += len(pdf)
        ts_max = pdf["warc_ts"].max()
        # never let NaT into state: an all-null first batch would
        # otherwise pin last_ts at NaT forever (NaT > x is always False)
        if not pd.isna(ts_max) and (
                last_ts is None or pd.isna(last_ts) or ts_max > last_ts):
            last_ts = ts_max
    n_total += batch_pages
    state.update((n_total, last_ts))
    yield pd.DataFrame({
        "url_host": [key[0]],
        "n_pages_total": [n_total],
        "batch_pages": [batch_pages],
        "last_warc_ts": [last_ts],
    })


def host_crawl_stats(pages_stream: DataFrame) -> DataFrame:
    """Streaming (url_host, n_pages_total, batch_pages, last_warc_ts):
    one updated row per host per micro-batch, state carried across
    batches and restored from checkpoint on restart."""
    with_host = pages_stream.withColumn(
        "url_host", F.parse_url(F.col("url"), F.lit("HOST")))
    return (with_host
            .select("url_host", "warc_ts")
            .groupBy("url_host")
            .applyInPandasWithState(
                _update_host_state,
                outputStructType=HOST_STATS_SCHEMA,
                stateStructType=HOST_STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout))
