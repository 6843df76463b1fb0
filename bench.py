"""Per-round benchmark harness (driver contract).

Runs the headline suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value" (total sec), "unit": "sec",
"queries": {name: sec}, "sf", plus kg-throughput extras}.

The KG end-to-end bench is the north-star metric: pages/sec over a
pre-materialized synthetic crawl (generation is NOT timed; the
pipeline reads parquet like production reads Iceberg).  Query timings
force full computation through the noop sink so Catalyst cannot prune
the work away.

Two-parallelism scaling evidence lives in tools/scaling_bench.py ->
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))

HEADLINE = (
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_region_revenue",
    "latest_order_per_customer",
    "rollup_lang_source",
    "hourly_event_stats",
    "dedup_exact",
    "minhash_signatures",
    "simhash16",
    "ngram_jaccard_pairs",
    "near_dedup_groups",
    "paragraph_dedup",
    "dup_span_stats",
    "url_normalize_dedup",
    "doc_chunks",
    "cosine_topk",
    "lsh_topk",
    "ivf_topk",
    "dedup_embedding_pairs",
    "event_sessions",
    "asof_prior_click",
    "doc_token_stats",
    "doc_quality_score",
    "doc_repetition_stats",
    "benchmark_contamination",
    "extract_markdown_docs",
)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def materialize_pages(spark, n_pages: int, path: str,
                      num_partitions: int | None = None) -> None:
    """Write the synthetic crawl.  num_partitions controls the FILE
    count, which caps scan parallelism downstream (one row group per
    file -> splits cannot subdivide a file): too few files quantizes a
    timed stage into idle-core waves.  Production Iceberg tables have
    abundant files/row-groups, so this is bench-corpus plumbing only."""
    from mdscraper_spark.sources.pages import bulk_pages_df

    df = bulk_pages_df(spark, n_pages, num_partitions=num_partitions)
    df.write.mode("overwrite").parquet(path)


def run_kg_pipeline(spark, pages_path: str, salt=None) -> dict:
    from pyspark import StorageLevel

    from mdscraper_spark.config import ExtractConfig
    from mdscraper_spark.operators import kg as kg_ops
    from mdscraper_spark.operators.extract_udfs import extract_markdown
    from mdscraper_spark.sources.fixtures import alias_rows

    pages = spark.read.parquet(pages_path)
    cfg = ExtractConfig(exclude_selectors=(".ads", "#nav"))
    # markdown_docs feeds two mining branches; persist so extraction
    # runs once (production writes it to the warehouse instead)
    docs = extract_markdown(pages, cfg)
    aliases = kg_ops.alias_df(spark)
    gaz = tuple((a, t) for a, _e, _c, t, _p in alias_rows())
    # one Arrow pass mines mentions + triples; persist the (small) mined
    # rows so the two consumers don't re-run extraction
    mined = kg_ops.mine_kg_combined(docs, gaz) \
                  .persist(StorageLevel.MEMORY_AND_DISK)
    mentions, triples = kg_ops.split_mined(mined)
    links = kg_ops.link_entities(mentions, aliases, salt=salt)
    cmap = kg_ops.connected_components(kg_ops.coreference_edges(links))
    edges = kg_ops.build_kg_edges(triples, cmap)
    try:
        return {"n_edges": edges.count()}
    finally:
        mined.unpersist()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # local mode: driver heap IS the executor heap; 8g with 32 task
    # threads chewing HTML strings is GC-bound (box has 128 GiB)
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "32g")
    sf = float(pathlib.Path(sf_dir).name.replace("sf", "") or 0.1)

    from mdscraper_spark.queries import REGISTRY
    from mdscraper_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=2 * cpus,
                      extra_conf={
                          # bench-scale split sizing (see tools/scaling_bench)
                          "spark.sql.files.maxPartitionBytes":
                              str(2 * 1024 * 1024),
                          "spark.sql.files.openCostInBytes":
                              str(512 * 1024),
                      })
    spark.sparkContext.setLogLevel("ERROR")

    timings: dict = {}
    rep_times: dict = {}     # name -> every rep's wall sec (not just min)
    rep_busy: dict = {}      # name -> host-busy fraction around each rep

    def _proc_stat():
        f = pathlib.Path("/proc/stat").read_text().splitlines()[0].split()
        vals = [int(x) for x in f[1:]]
        return vals[3], sum(vals)          # (idle, total) jiffies

    # -- KG end-to-end (north-star): pages/sec -------------------------
    n_pages = max(2000, int(100_000 * sf))
    workdir = tempfile.mkdtemp(prefix="bench_pages_")

    def timed_min(name, fn, reps: int = 2) -> float:
        """Min of `reps` timed passes: this sandbox VM's throughput
        swings several-x between identical runs (host contention), and
        min is the estimator of true capacity under additive noise.
        Every rep's wall time AND the whole-host busy fraction around
        it are recorded in the JSON (round-3 verdict item 4: three
        rounds of driver bench files were dominated by unrecorded host
        noise — the numbers must carry their own weather report)."""
        best = float("inf")
        rep_times[name], rep_busy[name] = [], []
        for _ in range(reps):
            idle0, tot0 = _proc_stat()
            t0 = time.monotonic()
            fn()
            wall = time.monotonic() - t0
            idle1, tot1 = _proc_stat()
            busy = 1.0 - (idle1 - idle0) / max(1, tot1 - tot0)
            rep_times[name].append(round(wall, 3))
            rep_busy[name].append(round(busy, 2))
            best = min(best, wall)
        return best

    try:
        pages_path = str(pathlib.Path(workdir) / "pages")
        materialize_pages(spark, n_pages, pages_path,
                          num_partitions=4 * cpus)
        run_kg_pipeline(spark, pages_path)  # warm-up (JVM + Python workers)
        kg_sec = timed_min("kg_pipeline",
                           lambda: run_kg_pipeline(spark, pages_path))
        timings["kg_pipeline"] = round(kg_sec, 3)
        pages_per_sec = round(n_pages / kg_sec, 1)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)

    # -- headline registry queries --------------------------------------
    for name in HEADLINE:
        fn, _sql = REGISTRY[name]
        force(fn(spark, sf_dir))  # warm-up
        # cheap queries get a third rep: on this several-x-noisy host
        # the min estimator tightens a lot for sub-second timings
        timings[name] = round(
            timed_min(name, lambda: force(fn(spark, sf_dir)), reps=3), 3)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "kg_pages": n_pages,
        "kg_pages_per_sec": pages_per_sec,
        "cpus": cpus,
        # self-interpretation: per-rep walls + host-busy fraction around
        # each rep, and the 1/5/15-min loadavg at exit.  busy >> what
        # this process can use alone means the minima above are still
        # UPPER bounds on true cost (shared-VM contention).
        "rep_times": rep_times,
        "rep_host_busy": rep_busy,
        "loadavg": [round(x, 1) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
