from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from convei_abstract_relational_knowledge_explorer_spark.session import get_spark

    session = get_spark(
        app_name="convei-kg-tests", master="local[4]", shuffle_partitions=8
    )
    yield session
    session.stop()
