"""Shared fixtures: one SparkSession per test session, one DuckDB oracle
connection per scale-factor dir (SURVEY.md §5.2)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hdc_dataengineering_sqlsync_spark.session import get_session
from hdc_dataengineering_sqlsync_spark.testing import duckdb_connect

# sf0.001 keeps the full-catalog comparison suite fast; set
# SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the pre-commit deep check.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    session = get_session(app_name="hdc_sqlsync_tests", shuffle_partitions=8)
    yield session


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def oracle(sf_dir):
    con = duckdb_connect(sf_dir)
    yield con
    con.close()
