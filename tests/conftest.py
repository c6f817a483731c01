import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trainable_entity_extractor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="tee-spark-tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield session
