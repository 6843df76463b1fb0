import os

import pytest

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "4g")


@pytest.fixture(scope="session")
def spark():
    from mdscraper_spark.session import get_spark

    session = get_spark(
        app_name="mdscraper-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.coalescePartitions.minPartitionSize": "1KB"},
    )
    yield session
    session.stop()
