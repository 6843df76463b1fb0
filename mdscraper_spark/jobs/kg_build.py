"""End-to-end KG build job with per-partition lineage and resume.

Stage pipeline (SURVEY.md §3.2), driven as one batch job:

  pages -> [extract] markdown_docs          resumable per url-host bucket
        -> [mine]    mentions, triples      narrow Arrow stages
        -> [link]    entity_links           broadcast (or salted) join
        -> [canon]   canonical_map          iterative CC
        -> [graph]   kg_nodes, kg_edges     shuffle agg + write

Resume contract (north rule: "resumable from checkpoint with
per-partition lineage + metrics"): the expensive extraction stage is
checkpointed at url-host-bucket granularity.  A restart anti-joins the
bucket universe against lineage rows with status='ok' and re-extracts
only missing buckets; writes are dynamic-partition overwrites, so
re-running a bucket is idempotent.  Downstream stages are recomputed
from the (then complete) markdown_docs table — they are global
(connected components cross every partition boundary) and cheap
relative to extraction.
"""

from __future__ import annotations

import datetime
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators import kg as kg_ops
from mdscraper_spark.operators.extract_udfs import (extract_markdown,
                                                    with_doc_path)
from mdscraper_spark.sources import fixtures
from mdscraper_spark.sources.pages import with_part_id
from mdscraper_spark.sources.tables import Warehouse

LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("part_id", IntegerType(), False),
    StructField("stage", StringType(), False),
    StructField("status", StringType(), False),
    StructField("n_rows", LongType(), False),
    StructField("wall_ms", LongType(), False),
    StructField("ts", TimestampType(), False),
])

GLOBAL_PART = -1  # lineage part_id for non-bucketed (global) stages


class KgBuildJob:
    def __init__(self, spark: SparkSession, warehouse_path: str,
                 config: Optional[ExtractConfig] = None,
                 n_buckets: int = 16, salt="auto",
                 aliases: Optional[DataFrame] = None,
                 cc_local_solve_threshold: int = 2_000_000) -> None:
        self.spark = spark
        self.wh = Warehouse(spark, warehouse_path)
        self.config = config or ExtractConfig()
        self.n_buckets = n_buckets
        self.salt = salt
        # size gate for canonicalization (passed straight to
        # connected_components); 0 forces the distributed
        # label-propagation path — production web-scale behavior, and
        # the path whose cc_round telemetry the lineage table records
        self.cc_local_solve_threshold = cc_local_solve_threshold
        self._custom_aliases = aliases is not None
        self.aliases = aliases if aliases is not None else kg_ops.alias_df(spark)

    def _gazetteer_entries(self) -> tuple:
        """(alias, etype) tuples for mention mining, from the job's own
        alias dictionary."""
        if not self._custom_aliases:
            return tuple((a, t) for a, _e, _c, t, _p in
                         fixtures.alias_rows())
        rows = (self.aliases.select("alias", "etype")
                .orderBy("alias", "etype").collect())
        return tuple((r.alias, r.etype) for r in rows)

    # -- lineage -----------------------------------------------------------
    def _append_lineage(self, rows: list) -> None:
        df = self.spark.createDataFrame(rows, LINEAGE_SCHEMA)
        df.write.mode("append").parquet(str(self.wh.table_path("lineage")))

    def _lineage(self) -> Optional[DataFrame]:
        path = self.wh.table_path("lineage")
        if not path.exists():
            return None
        return self.spark.read.parquet(str(path))

    def _record_stage(self, run_id: str, stage: str, per_part_counts: list,
                      wall_ms: int) -> None:
        now = datetime.datetime.now()
        self._append_lineage([
            (run_id, int(pid), stage, "ok", int(n), wall_ms, now)
            for pid, n in per_part_counts
        ])

    # -- stages -------------------------------------------------------------
    def run(self, pages: DataFrame, run_id: str = "run-1",
            resume: bool = False) -> dict:
        pages = with_part_id(pages, self.n_buckets)

        todo = pages
        if resume:
            lineage = self._lineage()
            if lineage is not None:
                done = (lineage
                        .filter((F.col("stage") == "extract")
                                & (F.col("status") == "ok"))
                        .select("part_id").distinct())
                todo = pages.join(done, "part_id", "left_anti")

        t0 = time.monotonic()
        n_todo = todo.limit(1).count()
        if n_todo > 0:
            docs = with_doc_path(extract_markdown(todo, self.config),
                                 self.config)
            docs = with_part_id(docs, self.n_buckets)
            # co-locate each bucket into one task before the partitioned
            # write: one output file per (bucket, write) instead of
            # n_tasks x n_buckets small files
            docs = docs.repartition(self.n_buckets, "part_id")
            self.wh.write_table(docs, "markdown_docs",
                                partition_by=("part_id",))
            wall_ms = int((time.monotonic() - t0) * 1000)
            counts = [(r.part_id, r.n) for r in
                      self.wh.read_table("markdown_docs")
                      .join(todo.select("part_id").distinct(), "part_id",
                            "left_semi")
                      .groupBy("part_id").agg(F.count("*").alias("n"))
                      .collect()]
            self._record_stage(run_id, "extract", counts, wall_ms)

        docs = self.wh.read_table("markdown_docs")

        # downstream stages, each lineage-recorded with per-bucket counts.
        # The mining gazetteer comes from the SAME aliases the linking
        # stage uses — a caller-injected dictionary must drive mention
        # detection too, or custom aliases silently produce an empty KG.
        # (alias_rows() order is preserved for the default fixture dict,
        # keeping the byte-pinned fixture behavior; injected dicts are
        # collected in a deterministic order — the dictionary is the
        # bounded broadcast side, so the collect is small by contract.)
        gaz_entries = self._gazetteer_entries()

        def per_part(df: DataFrame) -> list:
            keyed = with_part_id(df, self.n_buckets)
            return [(r.part_id, r.n) for r in
                    keyed.groupBy("part_id").agg(F.count("*").alias("n"))
                    .collect()]

        t0 = time.monotonic()
        mined = kg_ops.mine_kg_combined(docs, gaz_entries).persist()
        mentions, triples = kg_ops.split_mined(mined)
        self.wh.write_table(with_part_id(mentions, self.n_buckets),
                            "mentions", partition_by=("part_id",))
        self.wh.write_table(with_part_id(triples, self.n_buckets),
                            "triples", partition_by=("part_id",))
        mined.unpersist()
        mentions = self.wh.read_table("mentions")
        triples = self.wh.read_table("triples")
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._record_stage(run_id, "mine", per_part(mentions.select("url")),
                           wall_ms)

        t0 = time.monotonic()
        links = kg_ops.link_entities(mentions, self.aliases, salt=self.salt)
        self.wh.write_table(with_part_id(links, self.n_buckets),
                            "entity_links", partition_by=("part_id",))
        links = self.wh.read_table("entity_links")
        wall_ms = int((time.monotonic() - t0) * 1000)
        self._record_stage(run_id, "link", per_part(links.select("url")),
                           wall_ms)

        t0 = time.monotonic()
        # CC convergence telemetry (round-4 verdict item 8): every
        # distributed label-propagation round lands in lineage as
        # stage='cc_round' with part_id = round index and
        # n_rows = changed-label count, so a production
        # non-convergence is diagnosable from the trajectory (flat
        # n_rows => a deep component, shrinking => raise max_iter).
        # The driver-sized local union-find path has no rounds and
        # records nothing.
        cc_rounds: list = []
        t_round = [time.monotonic()]

        def record_cc_round(round_idx: int, n_changed: int,
                            n_nodes: int) -> None:
            # per-ROUND wall, not the cumulative stage wall: the whole
            # point of the trajectory is seeing WHICH rounds were slow
            now_s = time.monotonic()
            cc_rounds.append(
                (round_idx, n_changed, int((now_s - t_round[0]) * 1000)))
            t_round[0] = now_s

        cmap = kg_ops.connected_components(
            kg_ops.coreference_edges(links),
            local_solve_threshold=self.cc_local_solve_threshold,
            on_round=record_cc_round)
        if cc_rounds:
            now = datetime.datetime.now()
            self._append_lineage([
                (run_id, int(rnd), "cc_round", "ok", int(n_changed),
                 wall_round, now)
                for rnd, n_changed, wall_round in cc_rounds])
        self.wh.write_table(cmap, "canonical_map")
        cmap = self.wh.read_table("canonical_map")
        nodes = kg_ops.build_kg_nodes(cmap, mentions, self.aliases)
        edges = kg_ops.build_kg_edges(triples, cmap)
        self.wh.write_table(nodes, "kg_nodes")
        self.wh.write_table(edges, "kg_edges")
        wall_ms = int((time.monotonic() - t0) * 1000)
        n_nodes = self.wh.read_table("kg_nodes").count()
        self._record_stage(run_id, "graph", [(GLOBAL_PART, n_nodes)], wall_ms)

        return {name: self.wh.read_table(name) for name in (
            "markdown_docs", "mentions", "triples", "entity_links",
            "canonical_map", "kg_nodes", "kg_edges", "lineage")}
