from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from distributed_database_for_sql_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"  # tiny: unit tests must stay fast


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("tests")
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
