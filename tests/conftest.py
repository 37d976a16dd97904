from __future__ import annotations

import os
import sys
from pathlib import Path

# Bare `pytest tests/` (no -m) doesn't put the repo root on sys.path the way
# `python -m pytest` does; insert it so `custom_vector_database_spark` imports
# under either invocation.
_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "4")


@pytest.fixture(scope="session")
def spark():
    from custom_vector_database_spark.session import get_spark

    s = get_spark("cvdb-tests", cpus=4, shuffle_partitions=8)
    yield s
    s.stop()


SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_oracle() -> str:
    return SF_ORACLE
