import pytest

from gpi_etl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("gpi_tests", master="local[4]", shuffle_partitions=4)
    yield s
