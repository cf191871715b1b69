from __future__ import annotations

import os
import sys
from contextlib import contextmanager

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_project_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
SF_DIR_ORACLE = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="bdp-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@contextmanager
def checkpoint_rdd_guard(spark):
    """Delta-based localCheckpoint cleanup for tests that build
    checkpointed round frames (x88 NN-descent and its consumers):
    ``spark.catalog.clearCache()`` does NOT release localCheckpoint RDD
    blocks (similarity.py's own cache-contract note), so on a shared
    session fixture each chain run would leak its per-round blocks for
    the rest of the suite.  Snapshot the persisted-RDD ids on entry,
    clearCache plus unpersist every NEW id on exit — the same
    delta-based recipe as ``bench.free_new_rdds``."""
    jsc = spark.sparkContext._jsc
    before = set(jsc.getPersistentRDDs().keySet())
    try:
        yield
    finally:
        spark.catalog.clearCache()
        leaked = jsc.getPersistentRDDs()
        for rid in [r for r in leaked.keySet() if r not in before]:
            leaked.get(rid).unpersist()
