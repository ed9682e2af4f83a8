from __future__ import annotations

import pytest

from nlp_lib_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="nlp_lib_spark-tests", cpus=4, shuffle_partitions=8,
                  driver_memory="8g")
    yield s
    s.stop()
