import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from maskmypy_spark.session import get_spark

    s = get_spark(app="maskmypy-spark-tests", cores=os.environ.get("SPARK_TEST_CPUS", 8))
    yield s
