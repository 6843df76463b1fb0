"""Lineage + resumable-restart tests (SURVEY.md §2.I8, north rule).

A full run and a damaged-then-resumed run must produce identical
tables: we delete the extracted output and lineage for half the
url-host buckets (simulating a mid-job crash) and restart with
resume=True.
"""

import shutil

import pytest

from pyspark.sql import functions as F

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.jobs.kg_build import KgBuildJob
from mdscraper_spark.sources.pages import bulk_pages_df

N_PAGES = 30
N_BUCKETS = 8
CFG = ExtractConfig(exclude_selectors=(".ads", "#nav"))


def snapshot(tables):
    return {
        "markdown_docs": {tuple(r) for r in tables["markdown_docs"]
                          .select("url", "markdown", "status").collect()},
        "kg_edges": {tuple(r) for r in tables["kg_edges"].collect()},
        "kg_nodes": {tuple(r) for r in tables["kg_nodes"].collect()},
    }


def test_resume_after_partial_loss(spark, tmp_path):
    pages = bulk_pages_df(spark, N_PAGES)

    # reference: clean full run
    job_a = KgBuildJob(spark, str(tmp_path / "wh_a"), CFG, n_buckets=N_BUCKETS)
    want = snapshot(job_a.run(pages, run_id="full"))

    # damaged run: full run, then destroy half the extraction buckets
    job_b = KgBuildJob(spark, str(tmp_path / "wh_b"), CFG, n_buckets=N_BUCKETS)
    job_b.run(pages, run_id="first")

    lineage = spark.read.parquet(str(job_b.wh.table_path("lineage")))
    extracted_parts = sorted(
        r.part_id for r in lineage.filter(F.col("stage") == "extract")
        .select("part_id").distinct().collect())
    lost = extracted_parts[: len(extracted_parts) // 2]
    assert lost, "need at least one bucket to damage"

    for pid in lost:
        bucket_dirs = list(job_b.wh.table_path("markdown_docs")
                           .glob(f"data/snap-*/part_id={pid}"))
        assert bucket_dirs, f"no data dirs for bucket {pid}"
        for bucket_dir in bucket_dirs:
            shutil.rmtree(bucket_dir)
    kept = lineage.filter(~((F.col("stage") == "extract")
                            & F.col("part_id").isin([int(p) for p in lost])))
    kept_rows = kept.collect()
    shutil.rmtree(job_b.wh.table_path("lineage"))
    spark.createDataFrame(kept_rows, lineage.schema).write.parquet(
        str(job_b.wh.table_path("lineage")))

    # damaged buckets are really gone
    n_after_damage = job_b.wh.read_table("markdown_docs").count()
    assert n_after_damage < N_PAGES

    got = snapshot(job_b.run(pages, run_id="resume", resume=True))
    assert got == want


def test_resume_skips_completed_buckets(spark, tmp_path):
    pages = bulk_pages_df(spark, N_PAGES)
    job = KgBuildJob(spark, str(tmp_path / "wh"), CFG, n_buckets=N_BUCKETS)
    job.run(pages, run_id="r1")

    manifest_before = job.wh.manifest("markdown_docs")
    job.run(pages, run_id="r2", resume=True)
    manifest_after = job.wh.manifest("markdown_docs")
    # nothing left to extract -> no new markdown_docs snapshot committed
    assert manifest_before["snapshot_id"] == manifest_after["snapshot_id"]

    lineage = job.wh.read_table("lineage")
    extract_runs = {r.run_id for r in lineage
                    .filter(F.col("stage") == "extract").collect()}
    assert extract_runs == {"r1"}


def test_lineage_metrics_recorded(spark, tmp_path):
    pages = bulk_pages_df(spark, N_PAGES)
    job = KgBuildJob(spark, str(tmp_path / "wh"), CFG, n_buckets=N_BUCKETS)
    tables = job.run(pages, run_id="r1")
    lineage = tables["lineage"]
    stages = {r.stage for r in lineage.select("stage").distinct().collect()}
    assert stages == {"extract", "mine", "link", "graph"}
    extract_total = (lineage.filter(F.col("stage") == "extract")
                     .agg(F.sum("n_rows")).collect()[0][0])
    assert extract_total == N_PAGES
    assert all(r.wall_ms >= 0 for r in lineage.collect())


def test_empty_corpus_flows_through_all_stages(spark, tmp_path):
    """A corpus with zero gazetteer hits/triples must still complete:
    empty partitioned writes leave no parquet files, so read_table must
    recover the schema from the manifest (Iceberg metadata semantics),
    and the size-gated CC must handle an empty co-reference graph."""
    pages = (bulk_pages_df(spark, 5)
             .withColumn("html", F.encode(F.lit(
                 "<html><body><div class='content'><h1>T</h1>"
                 "<p>nothing relevant here</p></div></body></html>"),
                 "utf-8")))
    tables = KgBuildJob(spark, str(tmp_path / "wh"), config=CFG,
                        n_buckets=N_BUCKETS).run(pages, run_id="r-empty")
    assert tables["markdown_docs"].filter("status='ok'").count() == 5
    assert tables["mentions"].count() == 0
    assert tables["canonical_map"].count() == 0
    assert tables["kg_edges"].count() == 0
    # schema preserved for the empty tables
    assert set(tables["mentions"].columns) >= {"url", "sent_id", "surface"}


def test_custom_alias_dictionary_drives_mining_too(spark, tmp_path):
    """An injected alias dictionary must reach BOTH linking and mention
    mining — hard-coding the fixture gazetteer made custom dictionaries
    silently produce an empty KG."""
    custom = spark.createDataFrame(
        [("Zorblax Corp", 900, "Zorblax Corporation", "ORG", 1.0),
         ("Quuxana Vel", 901, "Quuxana Vel", "PERSON", 1.0)],
        "alias string, entity_id long, canonical string, "
        "etype string, prior double")
    html = ("<div class='content'><p>Quuxana Vel works for Zorblax Corp."
            "</p></div>")
    import datetime
    pages = spark.createDataFrame(
        [(f"https://z.test/p{i}", datetime.datetime(2025, 6, 14),
          html.encode(), None, "en") for i in range(4)],
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    job = KgBuildJob(spark, str(tmp_path / "wh_custom"), CFG,
                     n_buckets=4, aliases=custom)
    tables = job.run(pages)
    edges = tables["kg_edges"].collect()
    assert len(edges) > 0                      # custom surfaces mined
    nodes = {r.label for r in tables["kg_nodes"].collect()}
    assert "Zorblax Corporation" in nodes      # linked + canonicalized
