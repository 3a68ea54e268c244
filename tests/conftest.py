import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN = "/root/reference/tests/golden"


def golden(name: str) -> str:
    path = os.path.join(GOLDEN, name)
    if not os.path.isdir(path):
        pytest.skip(f"golden table {name} not available")
    return path


@pytest.fixture(scope="session")
def spark():
    from delta_go_spark.session import get_spark

    s = get_spark("tests", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
