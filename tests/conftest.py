import pytest

from oasysdb_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="oasysdb-tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
