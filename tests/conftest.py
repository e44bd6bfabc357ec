import pytest

from obiemachinelearningframework_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("obie_tests", master="local[4]", shuffle_partitions=4)
    yield s
