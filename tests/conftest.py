import os
import pathlib

import pytest
from pyspark.sql import SparkSession

# Spawned Python workers (pyspark.daemon forks, and the separate
# transformWithState driver worker) resolve this package by import, not from
# the driver's pickled closures — put the repo root on their path before the
# JVM launches, the test-env stand-in for shipping the package via
# --py-files / a wheel on a real cluster.
_REPO_ROOT = str(pathlib.Path(__file__).resolve().parent.parent)
os.environ["PYTHONPATH"] = (
    _REPO_ROOT + os.pathsep + os.environ["PYTHONPATH"]
    if os.environ.get("PYTHONPATH")
    else _REPO_ROOT
)


@pytest.fixture(scope="session")
def spark():
    s = (
        SparkSession.builder.master("local[4]")
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.session.timeZone", "UTC")
        # mirror build_session: Python-source filter pushdown on
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    yield s
