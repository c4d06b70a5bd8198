from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from experimentsplan_datapipeline_spark.session import get_session

    s = get_session(app_name="tests", shuffle_partitions=8)
    # codegen lint (VERDICT r10 item 2): a whole-stage-codegen compile
    # failure (e.g. a generated method past the JVM's 64 KB limit) must
    # FAIL the test instead of silently running interpreted — the
    # constant-factor fallback is exactly the plan-quality regression
    # the round-10 media_phash finding slipped through
    s.conf.set("spark.sql.codegen.fallback", "false")
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
