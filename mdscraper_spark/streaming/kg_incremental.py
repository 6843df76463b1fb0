"""Incremental KG maintenance: new crawl files -> extraction + triple
mining -> MERGE-accumulated edge-support table, exactly-once.

The batch flagship rebuilds the graph from a snapshot; this is the
standing-ingest analog: each micro-batch of new pages is extracted and
mined with the SAME operators, its (subj, pred, obj) support counts are
summed into the warehouse's ``raw_edges`` table through
``Warehouse.merge_table`` (upsert keyed on the triple, PARTITIONED by
pred so a batch rewrites only the predicates it touches, not the
whole accumulated table).

Exactly-once is a two-layer contract: the streaming checkpoint skips
fully committed batches, and — because foreachBatch output is only
at-least-once (a crash between the table commit and the epoch log
replays the batch) — the last applied ``batch_id`` is committed INSIDE
the snapshot manifest (Iceberg snapshot-properties analog) atomically
with the data, so a replayed batch is detected and skipped instead of
double-counted.

Canonicalization stays a periodic batch job over the accumulated table
(connected components is global by nature; running it per micro-batch
would recompute the world every few seconds — the standard
lambda-architecture split for KG builds).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators import kg as kg_ops
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.sources.pages import PAGES_SCHEMA
from mdscraper_spark.sources.tables import Warehouse

RAW_EDGES = "raw_edges"
EDGE_KEYS = ("subj", "pred", "obj")


def merge_edge_support(wh: Warehouse, batch_edges,
                       batch_id: int) -> None:
    """Sum a batch's per-triple support into the accumulated table:
    touched keys are read back, summed with the batch, and upserted —
    the pred-partitioned merge rewrites only the touched predicates'
    partitions while the snapshot chain keeps every prior accumulation
    time-travelable.

    Idempotence (foreachBatch is at-least-once): ``batch_id`` is
    committed in the snapshot's properties atomically with the data;
    a replayed batch whose id was already applied is skipped, so a
    crash between the table commit and the streaming epoch log cannot
    double-count support."""
    props = {"last_batch_id": int(batch_id)}
    if not wh.exists(RAW_EDGES):
        wh.write_table(batch_edges, RAW_EDGES,
                       partition_by=("pred",), properties=props)
        return
    applied = (wh.manifest(RAW_EDGES).get("properties", {})
               .get("last_batch_id", -1))
    if batch_id <= applied:
        return                      # replayed micro-batch: already in
    existing = (wh.read_table(RAW_EDGES)
                .join(batch_edges.select(*EDGE_KEYS).distinct(),
                      list(EDGE_KEYS), "left_semi"))
    combined = (existing.unionByName(batch_edges)
                .groupBy(*EDGE_KEYS)
                .agg(F.sum("n_support").alias("n_support")))
    wh.merge_table(combined, RAW_EDGES, key_cols=EDGE_KEYS,
                   partition_by=("pred",), properties=props)


def stream_kg_update(spark: SparkSession, input_dir: str,
                     warehouse_path: str, checkpoint_dir: str,
                     config: ExtractConfig | None = None) -> None:
    """Drain currently-available page files into the accumulated
    raw_edges table (availableNow + checkpoint = one exactly-once
    incremental ingest per invocation)."""
    config = config or ExtractConfig()
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def update(batch_df, batch_id) -> None:
        docs = extract_markdown(batch_df, config)
        triples = kg_ops.mine_triples(docs)
        # materialize once: the merge references this plan several
        # times (semi-join, union) and Spark does not dedupe common
        # subtrees — without the checkpoint the Arrow extraction +
        # mining would re-run ~4x per batch
        batch_edges = (triples.groupBy(*EDGE_KEYS)
                       .agg(F.count(F.lit(1)).alias("n_support"))
                       .localCheckpoint())
        merge_edge_support(Warehouse(spark, warehouse_path), batch_edges,
                           int(batch_id))

    query = (pages.writeStream
             .foreachBatch(update)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
