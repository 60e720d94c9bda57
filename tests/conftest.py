import pytest


@pytest.fixture(scope="session")
def spark():
    from ocr_spark.session import get_spark

    s = get_spark(app_name="ocr_spark_tests", cpus=4, shuffle_partitions=8)
    yield s
