"""Scan-shape evidence: column pruning and predicate pushdown must
reach the parquet scan — a scan reading all columns for a 2-column
projection is wrong at 100 TB regardless of local timings."""

import re

from pyspark.sql import functions as F

from mdscraper_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name):
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def codegen_explain(spark, name):
    """explain('codegen') text — the only surface that reports
    WholeStageCodegen subtrees under AQE's plan stringification."""
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    df.collect()    # AQE compiles codegen stages only on execution
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("codegen")
    return df._jdf.queryExecution().explainString(mode)


def read_schemas(plan):
    return re.findall(r"ReadSchema: struct<([^>]*)>", plan)


def test_doc_size_kb_prunes_to_two_columns(spark):
    schemas = read_schemas(plan_of(spark, "doc_size_kb"))
    assert schemas, "no parquet scan found"
    cols = {c.split(":")[0] for c in schemas[0].split(",")}
    assert cols == {"doc_id", "text"}


def test_split_assignment_prunes_to_id_only(spark):
    schemas = read_schemas(plan_of(spark, "doc_split_assignment"))
    assert {c.split(":")[0] for c in schemas[0].split(",")} == {"doc_id"}


def test_q3_pushes_filters_into_scans(spark):
    plan = plan_of(spark, "q3_top_orders")
    assert "PushedFilters: [" in plan
    # at least one scan carries a non-empty pushed filter set
    assert re.search(r"PushedFilters: \[[^\]]+\]", plan), plan


def test_headline_queries_use_wholestage_codegen(spark):
    for name in ("q1_pricing_summary", "doc_token_stats",
                 "doc_repetition_stats", "dedup_exact"):
        text = codegen_explain(spark, name)
        assert re.search(r"Found \d+ WholeStageCodegen subtrees", text), name
        assert "Found 0 WholeStageCodegen" not in text, name


def test_cosine_topk_scan_prunes_label_column(spark):
    schemas = read_schemas(plan_of(spark, "cosine_topk"))
    for s in schemas:
        assert "label" not in s     # the unused embeddings column
