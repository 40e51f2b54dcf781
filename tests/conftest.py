"""Shared Spark fixtures. One session per test run (startup ~30 s);
suites must not assume catalog isolation — use unique view names."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[8]")
        .appName("arc-jupyter-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # the sf1 plan-gate sweep (tests/test_plans_scale.py) plans
        # every headline query against the generated 10x point; the
        # queries whose CONSTRUCTION runs jobs (bloom builds, k-row
        # centroid collects) OOM the 1g default heap at that scale
        .config("spark.driver.memory", "12g")
        .getOrCreate()
    )
    yield s
    s.stop()


@pytest.fixture()
def ctx(spark):
    from arc_jupyter_spark.context import ArcContext

    return ArcContext(spark)
