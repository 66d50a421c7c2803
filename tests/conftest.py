"""Shared Spark fixture — one session for the whole test run (JVM startup ~30s)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
REFERENCE = "/root/reference/legal_ner"


@pytest.fixture(scope="session")
def spark():
    from spanluke_spark.session import get_spark

    s = get_spark(app_name="spanluke_tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
