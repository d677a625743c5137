import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from orc_spark.session import get_spark

    s = get_spark(cpus=4, shuffle_partitions=8, app_name="orc_spark_tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()
