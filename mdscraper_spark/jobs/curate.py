"""Training-set curation job: documents -> filter funnel -> packed
curated table, with the funnel recorded as run metrics.

The query-registry rows (`curation_funnel`, `greedy_token_packing`)
verify the semantics against DuckDB; this job is the production
surface that MATERIALIZES the result: survivors of
lang -> quality -> repetition -> exact-dedup -> decontamination get
pack assignments and land in the warehouse's ``curated_docs`` table,
with per-stage survivor counts committed as snapshot properties so
every curated snapshot carries its own recipe audit.

    spark-submit --py-files dist/mdscraper_spark.zip \\
        mdscraper_spark/jobs/curate.py \\
        --input /path/documents_parquet --warehouse /path/wh \\
        --budget 2048
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from mdscraper_spark.operators import textstats
from mdscraper_spark.sources.tables import Warehouse

STAGES = ("total", "lang", "quality", "repetition", "dedup",
          "decontaminated")


FLAG_COLUMNS = ("doc_id", "lang_ok", "quality_ok", "rep_ok",
                "canonical", "clean")


def stage_conditions():
    """Ordered cumulative funnel conditions over the doc_flags columns
    — the ONE definition shared by this job and the oracled
    `curation_funnel` registry row (a threshold change desyncing the
    two silently would invalidate the recipe audit).  A function, not
    a constant: Column expressions need an active JVM gateway."""
    return [
        ("total", F.lit(True)),
        ("lang", F.col("lang_ok")),
        ("quality", F.col("lang_ok") & F.col("quality_ok")),
        ("repetition", F.col("lang_ok") & F.col("quality_ok")
         & F.col("rep_ok")),
        ("dedup", F.col("lang_ok") & F.col("quality_ok")
         & F.col("rep_ok") & F.col("canonical")),
        ("decontaminated", F.col("lang_ok") & F.col("quality_ok")
         & F.col("rep_ok") & F.col("canonical") & F.col("clean")),
    ]


def doc_flags(docs, lang: str = "en", min_quality: float = 0.5,
              benchmark=None):
    """Per-doc funnel flags, PROJECTED DOWN TO (doc_id, 5 booleans).

    ``text`` is read during flag computation but never carried past
    this projection — the curate job localCheckpoints this frame, and
    at crawl scale checkpointing the text column would rewrite ~the
    whole corpus to executor disk.  Survivor text is re-joined from
    the source scan instead (one doc_id semi-join vs a corpus-sized
    materialization).

    ``benchmark``: the held-out eval-suite DataFrame (needs a ``text``
    column) the decontamination stage screens against.  Default (None)
    is the deterministic 1-in-97 self-sample — the fixture contract the
    oracled `curation_funnel` registry row replays; a REAL run passes
    the actual benchmark suite (CLI: --benchmark)."""
    if benchmark is None:
        benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    w_dup = Window.partitionBy(F.md5("text"))
    contam = (textstats.contamination(docs, benchmark, k=5)
              .select("doc_id", (~F.col("contaminated")).alias("clean")))
    return (docs.select(
        "doc_id",
        (textstats.lang_guess(F.col("text")) == lang).alias("lang_ok"),
        (textstats.quality_score(F.col("text")) >= min_quality)
        .alias("quality_ok"),
        ((textstats.dup_line_frac(F.col("text")) <= 0.3)
         & (textstats.top_bigram_frac(F.col("text")) <= 0.2))
        .alias("rep_ok"),
        (F.col("doc_id") == F.min("doc_id").over(w_dup))
        .alias("canonical"))
        .join(contam, "doc_id", "left")
        .withColumn("clean", F.coalesce("clean", F.lit(True))))


def curate(spark: SparkSession, docs, warehouse_path: str,
           budget: int = 2048, lang: str = "en",
           min_quality: float = 0.5, benchmark=None) -> dict:
    """Filter + pack + write; returns the funnel counts dict."""
    flags = doc_flags(docs, lang=lang, min_quality=min_quality,
                      benchmark=benchmark)
    assert set(flags.columns) == set(FLAG_COLUMNS), flags.columns

    conds = dict(stage_conditions())
    # checkpoint ONLY (doc_id, flags) — a few bytes/doc — so one corpus
    # pass feeds both the funnel agg and the survivor filter; survivor
    # text comes back from the source scan via a doc_id semi-join
    flags = flags.localCheckpoint()
    # coalesce: F.sum over ZERO rows is null — an empty (or fully
    # pre-filtered) corpus must report a zero funnel, not crash
    funnel = flags.agg(
        *[F.coalesce(F.sum(c.cast("long")), F.lit(0)).alias(s)
          for s, c in conds.items()]
    ).first().asDict()

    surviving_ids = flags.filter(conds["decontaminated"]).select("doc_id")
    survivors = (docs.select("doc_id", "text", "lang")
                 .join(surviving_ids, "doc_id", "left_semi"))
    packed = textstats.greedy_pack(survivors, budget=budget)
    curated = survivors.join(packed.select("doc_id", "n_tokens",
                                           "pack_id"), "doc_id")
    wh = Warehouse(spark, warehouse_path)
    wh.write_table(curated, "curated_docs",
                   properties={"funnel": {s: int(funnel[s])
                                          for s in STAGES},
                               "budget": budget})
    return {s: int(funnel[s]) for s in STAGES}


def main(argv=None) -> None:
    p = argparse.ArgumentParser(description="curate a training set")
    p.add_argument("--input", required=True, help="documents parquet")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--budget", type=int, default=2048)
    p.add_argument("--lang", default="en")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--benchmark", default=None, metavar="PARQUET",
                   help="held-out benchmark suite parquet (text column) "
                        "for the decontamination stage; default is the "
                        "deterministic 1-in-97 self-sample fixture "
                        "contract")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from mdscraper_spark.session import get_spark

    spark = get_spark("mdscraper-spark-curate", master=args.master)
    docs = spark.read.parquet(args.input)
    bench = (spark.read.parquet(args.benchmark)
             if args.benchmark else None)
    funnel = curate(spark, docs, args.warehouse, budget=args.budget,
                    lang=args.lang, min_quality=args.min_quality,
                    benchmark=bench)
    print(json.dumps({"funnel": funnel}))


if __name__ == "__main__":
    main()
