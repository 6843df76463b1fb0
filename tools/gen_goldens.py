"""Freeze the golden Markdown files (byte contract, SURVEY.md §5.3-1).

Runs the single-threaded pure-Python pipeline over every
(fixture case x option variant) and writes tests/goldens/.  Goldens are
generated once, reviewed, and committed; the test suite and the Spark
e2e test then assert byte equality against them — any change to the
renderer that alters bytes is caught.

Usage: python tools/gen_goldens.py
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

from mdscraper_spark.extract.pipeline import extract_page
from mdscraper_spark.sources.fixtures import (
    FIXTURE_CASES,
    VARIANTS,
    fixture_url,
    variant_config,
)

GOLDEN_DIR = pathlib.Path(__file__).resolve().parents[1] / "tests" / "goldens"

FAILED_SENTINEL = "<<status:{status}>>"


def golden_name(case_id: str, variant: str) -> str:
    return f"{case_id}__{variant}.md"


def main() -> None:
    GOLDEN_DIR.mkdir(parents=True, exist_ok=True)
    n = 0
    for case_id, html in sorted(FIXTURE_CASES.items()):
        for variant in sorted(VARIANTS):
            res = extract_page(fixture_url(case_id), html, variant_config(variant))
            body = res.markdown if res.markdown is not None else FAILED_SENTINEL.format(status=res.status)
            (GOLDEN_DIR / golden_name(case_id, variant)).write_bytes(body.encode("utf-8"))
            n += 1
    print(f"wrote {n} goldens to {GOLDEN_DIR}")


if __name__ == "__main__":
    main()
