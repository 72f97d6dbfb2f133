import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kamu_engine_flink_spark.session import engine_session  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = engine_session(
        app_name="kamu-engine-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
