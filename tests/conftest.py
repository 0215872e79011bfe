from __future__ import annotations

import pytest

from docrawl_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="docrawl_spark_tests", cpus=4, shuffle_partitions=4)
    yield s
