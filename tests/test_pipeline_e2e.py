"""Cross-module web-pipeline composition, end to end in one test:

    crawl frontier (noisy URL spellings)
      -> URL canonicalization + dedup          (J30)
      -> crawl-policy filtering                (J40)
      -> Arrow markdown extraction             (north-rule front end)
      -> dedup job over the extracted text     (J38)

Every stage is verified elsewhere in isolation; this pins that their
CONTRACTS compose — column names, null conventions, and keep/allow
semantics hand off without glue code.
"""

from pyspark.sql import functions as F

from mdscraper_spark.config import ExtractConfig
from mdscraper_spark.jobs.dedup import dedup_corpus
from mdscraper_spark.operators import links
from mdscraper_spark.operators.extract_udfs import extract_markdown
from mdscraper_spark.sources.pages import bulk_pages_df
from mdscraper_spark.sources.tables import Warehouse


def test_frontier_to_dedup_composition(spark, tmp_path):
    pages = bulk_pages_df(spark, 40).localCheckpoint()

    # frontier: every page url plus noisy re-spellings of the first ten
    noisy = (pages.limit(10)
             .select(F.concat(F.col("url"), F.lit("?utm_source=feed"))
                     .alias("url")))
    frontier = (pages.select("url").unionByName(noisy)
                .select(F.monotonically_increasing_id().alias("doc_id"),
                        "url"))
    assert frontier.count() == 50

    # J30: the 10 re-spellings collapse onto their canonical pages
    decided = links.url_dedup(frontier)
    survivors = decided.filter("keep")
    assert survivors.count() == 40

    # J40: disallow two hosts entirely
    rules = spark.createDataFrame(
        [("host000.test", "/"), ("host001.test", "/")],
        "host string, path_prefix string")
    policy = links.crawl_policy_filter(
        survivors.select(F.coalesce("url_norm", F.lit("")).alias("url")),
        rules)
    allowed = policy.filter("allowed").select("url")
    n_denied = policy.count() - allowed.count()
    assert n_denied == pages.filter(
        F.col("url").rlike("^https://host00[01]\\.test/")).count() > 0

    # extraction: fetchable worklist -> markdown docs (canonical urls
    # equal the raw urls here — bulk pages are already canonical)
    work = pages.join(allowed, "url", "left_semi")
    docs = extract_markdown(work, ExtractConfig())
    assert docs.count() == 40 - n_denied
    assert docs.filter("status = 'ok'").count() == docs.count()

    # J38: dedup job over the extracted markdown as the document corpus
    corpus = docs.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("markdown").alias("text")).localCheckpoint()
    audit = dedup_corpus(spark, corpus, str(tmp_path / "wh_e2e"),
                         mode="normalized")
    assert audit["total"] == 40 - n_denied
    # synthetic bulk pages have distinct bodies: nothing to remove,
    # which is itself the contract worth pinning (no false dedup)
    assert audit["removed"] == 0
    wh = Warehouse(spark, str(tmp_path / "wh_e2e"))
    assert wh.read_table("dedup_docs").filter("keep").count() \
        == audit["total"]
