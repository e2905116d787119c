from __future__ import annotations

import pytest

from navgraph_osm_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("navgraph-tests", parallelism=4)
    yield s
    s.stop()
