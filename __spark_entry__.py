"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-
insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``mdscraper_spark.queries`` (registry of
SURVEY.md §2 operators + training-data ops).  Local pre-flight twin of
the driver harness: ``python tools/check_oracle.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG pipeline (extract -> mentions -> triples ->
    entity linking -> connected components -> kg_edges) over pages
    synthesized from the sf0.001 documents parquet."""
    from mdscraper_spark.queries import kg_flagship

    return kg_flagship(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from mdscraper_spark import queries as q

    return q.queries()


def oracle_sql() -> dict[str, str]:
    from mdscraper_spark import queries as q

    return q.oracle_sql()
