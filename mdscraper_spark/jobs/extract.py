"""spark-submit entry point (reference CLI parity, G3/G5).

Every reference flag (/root/reference/mdscraper/cli.py:12-52) maps to
an ExtractConfig field; the per-file/per-URL modes become table-scale
modes.  Launch:

    spark-submit --py-files dist/mdscraper_spark.zip \\
        mdscraper_spark/jobs/extract.py \\
        --input /path/to/pages_parquet --warehouse /path/to/warehouse \\
        --no-images --exclude-selectors .ads #nav \\
        --run-id run-42 --resume

Config precedence matches the reference (defaults < --settings file <
CLI flags; scraper.py:184-191).  --save-settings dumps the resolved
config and exits, like the reference's settings sink (B5).
"""

from __future__ import annotations

import argparse
import datetime
import json
import sys


def create_cli_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="mdscraper-spark: extract Markdown + build the KG "
                    "from a pages table")
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input", help="pages parquet/Iceberg path")
    src.add_argument("--synthesize", type=int, metavar="N",
                     help="generate N deterministic synthetic pages")
    p.add_argument("--warehouse", required=True, help="output warehouse dir")
    p.add_argument("--content", "-c", nargs="*", default=None,
                   help="additional div id/class names for the main content")
    p.add_argument("--no-images", "-i", action="store_true")
    p.add_argument("--no-links", action="store_true")
    p.add_argument("--prepend-source-link", action="store_true")
    p.add_argument("--root-url", "-r", default=None)
    p.add_argument("--exclude-pages", "-p", nargs="*", default=None,
                   help="page-name globs to drop from link harvests")
    p.add_argument("--exclude-selectors", "-s", nargs="*", default=None,
                   help="CSS selectors to strip before rendering")
    p.add_argument("--extra-heading-space", metavar="LEVELS", default=None)
    p.add_argument("--settings", help="YAML/JSON config file")
    p.add_argument("--save-settings", action="store_true",
                   help="dump resolved config and exit")
    p.add_argument("--run-id", default=None)
    p.add_argument("--resume", action="store_true",
                   help="skip url-host buckets already ok in lineage")
    p.add_argument("--n-buckets", type=int, default=256)
    p.add_argument("--salt", type=int, default=None,
                   help="salt factor for the entity-link join (skewed dicts)")
    p.add_argument("--extract-only", action="store_true",
                   help="stop after markdown_docs (no KG back end)")
    p.add_argument("--master", default=None)
    return p


def load_settings_file(path: str) -> dict:
    """YAML-first, JSON-fallback (reference utils.py:124-152)."""
    import yaml

    with open(path, "r", encoding="utf-8") as fh:
        try:
            data = yaml.safe_load(fh)
        except yaml.YAMLError:
            fh.seek(0)
            data = json.load(fh)
    if not isinstance(data, dict):
        raise ValueError("Config file content must be a dictionary")
    return data


def main(argv=None) -> None:
    args = create_cli_parser().parse_args(argv)

    from mdscraper_spark.config import resolve_config

    cli_opts = {}
    for key, flag in (("content", "content"), ("no_images", "no_images"),
                      ("no_links", "no_links"),
                      ("prepend_source_link", "prepend_source_link"),
                      ("root_url", "root_url"),
                      ("exclude_pages", "exclude_pages"),
                      ("exclude_selectors", "exclude_selectors"),
                      ("extra_heading_space", "extra_heading_space")):
        val = getattr(args, flag)
        if val not in (None, False):
            cli_opts[key] = tuple(val) if isinstance(val, list) else val
    file_opts = load_settings_file(args.settings) if args.settings else None
    config = resolve_config(cli_opts, file_opts)

    if args.save_settings:
        stamp = datetime.datetime.now().strftime("%Y%m%d_%H%M")
        out = f"mdscraper_spark_{stamp}.json"
        with open(out, "w", encoding="utf-8") as fh:
            fh.write(config.to_json())
        print(f"Config file created successfully: {out}")
        return

    from mdscraper_spark.jobs.kg_build import KgBuildJob
    from mdscraper_spark.session import get_spark
    from mdscraper_spark.sources.pages import bulk_pages_df

    spark = get_spark("mdscraper-spark-extract", master=args.master)
    pages = (spark.read.parquet(args.input) if args.input
             else bulk_pages_df(spark, args.synthesize))

    run_id = args.run_id or datetime.datetime.now().strftime("run-%Y%m%d%H%M%S")
    job = KgBuildJob(spark, args.warehouse, config,
                     n_buckets=args.n_buckets, salt=args.salt)
    if args.extract_only:
        from mdscraper_spark.operators.extract_udfs import extract_markdown
        from mdscraper_spark.sources.pages import with_part_id

        docs = with_part_id(extract_markdown(pages, config), args.n_buckets)
        job.wh.write_table(docs.repartition(args.n_buckets, "part_id"),
                           "markdown_docs", partition_by=("part_id",))
    else:
        job.run(pages, run_id=run_id, resume=args.resume)

    counts = {name: job.wh.read_table(name).count()
              for name in ("markdown_docs",) + (
                  () if args.extract_only else
                  ("mentions", "triples", "entity_links", "kg_nodes",
                   "kg_edges"))}
    print(json.dumps({"run_id": run_id, "tables": counts}))


if __name__ == "__main__":
    main()
