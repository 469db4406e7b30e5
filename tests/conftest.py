import pytest


@pytest.fixture(scope="session")
def spark():
    from tsfeatures_spark.session import get_spark

    s = get_spark("tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()
