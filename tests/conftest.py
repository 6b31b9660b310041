from __future__ import annotations

import pytest

from bigdata_scala_offline_data_clean_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
    )
    yield s
    s.stop()
