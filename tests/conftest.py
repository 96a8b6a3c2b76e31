import pytest

from aws_glue_data_lake_spark.session import get_spark

SMOKE_SF = "/root/testdata/sf0.001"
CORRECTNESS_SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    # Small local session for tests: 4 threads, 8 shuffle partitions —
    # enough parallelism to catch partitioning bugs, fast enough for CI.
    s = get_spark(app_name="tests", cpus=4, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SMOKE_SF
