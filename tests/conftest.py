import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # fast test startup


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import get_spark

    s = get_spark("crawler-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def miniweb():
    from crawler_spark.fixtures.webgen import generate

    return generate(seed=42, n_pages=300)
