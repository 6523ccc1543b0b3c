from __future__ import annotations

import json
import os

import pytest

from feray_spark.session import get_spark

#: correctness tier defaults to the t1 smoke SF for fast local loops;
#: CI / pre-commit can export SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
#: to run at the driver's t2 scale.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    # FERAY_SPARK_EXTRA_CONF: JSON dict of extra session confs. The
    # delta-twin leg (scripts/run_delta_twin.sh) uses it to inject
    # the Delta SQL extension — a STATIC conf that must reach the
    # builder before the first session exists.
    extra = json.loads(os.environ.get("FERAY_SPARK_EXTRA_CONF", "{}"))
    s = get_spark(
        app_name="feray-spark-tests",
        cores=8,
        shuffle_partitions=8,
        driver_mem=os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        extra_conf=extra,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
