import pytest

from bliss_rs_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("bliss_rs_spark_tests", cpus=4, shuffle_partitions=4)
    yield s
    s.stop()
