import pytest

from openoa_spark.session import get_session


@pytest.fixture(scope="session")
def spark():
    s = get_session("openoa-spark-tests", master="local[4]", shuffle_partitions=4)
    yield s
