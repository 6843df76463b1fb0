"""mdscraper_spark: PySpark-native KG-construction engine.

A brand-new engine with the query/data-processing capabilities of the
reference (warmwind/mdscraper) re-expressed Spark-first: Arrow-batch
extraction front end, DataFrame KG back end, lineage/resume, and
scale-oriented partitioning (SURVEY.md is the blueprint).
"""

__version__ = "0.1.0"
