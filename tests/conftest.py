import pytest


@pytest.fixture(scope="session")
def spark():
    from spatialpandas_spark.session import get_spark

    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
