"""Physical-plan regression tests (SURVEY.md §4: the plan is part of
the contract — pushdown, pruning, and join strategy must not silently
regress)."""

import contextlib
import io

import pytest

from mdscraper_spark.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    fn, _ = REGISTRY[name]
    df = fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q3_broadcasts_and_pushes_segment_filter(spark):
    plan = plan_of(spark, "q3_top_orders")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan        # all sides fit broadcast here
    assert "EqualTo(c_mktsegment,BUILDING)" in plan  # predicate pushdown


def test_q3_prunes_lineitem_columns(spark):
    plan = plan_of(spark, "q3_top_orders")
    # only the 3 needed lineitem columns reach the scan
    assert "struct<l_orderkey:bigint,l_extendedprice:double,l_discount:double>" in plan


def test_q1_pushes_shipdate_filter(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "LessThanOrEqual(l_shipdate," in plan


def test_extraction_stage_is_narrow(spark):
    """The extraction operator must not shuffle: scan -> project ->
    ArrowEvalPython/MapInPandas with no Exchange."""
    from mdscraper_spark.config import ExtractConfig
    from mdscraper_spark.operators.extract_udfs import extract_markdown
    from mdscraper_spark.sources.pages import fixture_pages_df

    docs = extract_markdown(fixture_pages_df(spark), ExtractConfig())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        docs.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan


def test_link_join_is_broadcast(spark):
    from mdscraper_spark.operators import kg as kg_ops
    from mdscraper_spark.sources.fixtures import alias_rows
    from mdscraper_spark.operators.extract_udfs import extract_markdown
    from mdscraper_spark.config import ExtractConfig
    from mdscraper_spark.sources.pages import fixture_pages_df

    docs = extract_markdown(fixture_pages_df(spark), ExtractConfig())
    gaz = tuple((a, t) for a, _e, _c, t, _p in alias_rows())
    mentions = kg_ops.mine_mentions(docs, gaz)
    links = kg_ops.link_entities(mentions, kg_ops.alias_df(spark))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        links.explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
