"""Combined single-pass miner must equal the two separate miners."""

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.operators import kg as kg_ops
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.sources import fixtures
from mdscraper_spark.sources.pages import bulk_pages_df

CFG = ExtractConfig(exclude_selectors=(".ads", "#nav"))


def test_combined_miner_equals_separate(spark):
    docs = extract_markdown(bulk_pages_df(spark, 25), CFG)
    gaz = tuple((a, t) for a, _e, _c, t, _p in fixtures.alias_rows())
    mentions_sep = {tuple(r) for r in kg_ops.mine_mentions(docs, gaz).collect()}
    triples_sep = {tuple(r) for r in kg_ops.mine_triples(docs).collect()}
    mined = kg_ops.mine_kg_combined(docs, gaz)
    mentions_c, triples_c = kg_ops.split_mined(mined)
    assert {tuple(r) for r in mentions_c.collect()} == mentions_sep
    assert {tuple(r) for r in triples_c.collect()} == triples_sep
    assert mentions_sep and triples_sep
