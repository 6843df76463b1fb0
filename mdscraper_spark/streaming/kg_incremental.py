"""Incremental KG maintenance: new crawl files -> extraction + triple
mining -> MERGE-accumulated edge-support table, exactly-once.

The batch flagship rebuilds the graph from a snapshot; this is the
standing-ingest analog: each micro-batch of new pages is extracted and
mined with the SAME operators, its (subj, pred, obj) support counts are
summed into the warehouse's ``raw_edges`` table through
``Warehouse.merge_table`` (upsert keyed on the triple), and the
streaming checkpoint makes re-runs exactly-once — a crashed ingest
resumes without double-counting support.

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


def merge_edge_support(wh: Warehouse, batch_edges) -> None:
    """Sum a batch's per-triple support into the accumulated table:
    touched keys are read back, summed with the batch, and upserted —
    the merge rewrites only the touched rows' table state while the
    snapshot chain keeps every prior accumulation time-travelable."""
    if not wh.exists(RAW_EDGES):
        wh.write_table(batch_edges, RAW_EDGES)
        return
    existing = (wh.read_table(RAW_EDGES)
                .join(batch_edges.select(*EDGE_KEYS).distinct(),
                      list(EDGE_KEYS), "left_semi"))
    combined = (existing.unionByName(batch_edges)
                .groupBy(*EDGE_KEYS)
                .agg(F.sum("n_support").alias("n_support")))
    wh.merge_table(combined, RAW_EDGES, key_cols=EDGE_KEYS)


def stream_kg_update(spark: SparkSession, input_dir: str,
                     warehouse_path: str, checkpoint_dir: str,
                     config: ExtractConfig | None = None) -> None:
    """Drain currently-available page files into the accumulated
    raw_edges table (availableNow + checkpoint = one exactly-once
    incremental ingest per invocation)."""
    config = config or ExtractConfig()
    pages = spark.readStream.schema(PAGES_SCHEMA).parquet(input_dir)

    def update(batch_df, _batch_id) -> None:
        docs = extract_markdown(batch_df, config)
        triples = kg_ops.mine_triples(docs)
        batch_edges = (triples.groupBy(*EDGE_KEYS)
                       .agg(F.count(F.lit(1)).alias("n_support")))
        merge_edge_support(Warehouse(spark, warehouse_path), batch_edges)

    query = (pages.writeStream
             .foreachBatch(update)
             .option("checkpointLocation", checkpoint_dir)
             .trigger(availableNow=True)
             .start())
    query.awaitTermination()
