import pytest

from obiemachinelearningframework_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("obie_tests", master="local[8]", shuffle_partitions=8)
    yield s
