import pytest

from lakehouse_ingestion_spark.session import SparkConfig, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(SparkConfig(app_name="tests", shuffle_partitions=8))
    yield s
    s.stop()


SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
