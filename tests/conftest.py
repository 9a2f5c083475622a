import pytest


@pytest.fixture(scope="session")
def spark():
    from parquet4seastar_spark.engine.session import get_spark

    spark = get_spark(app_name="p4s-tests", master="local[4]", shuffle_partitions=4)
    yield spark
    spark.stop()
