from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ecmwf_models_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("pytest", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def bronze(spark):
    from ecmwf_models_spark.synth import gen_transcripts

    df = gen_transcripts(spark, n_conv=50, days=4, turns_per_conv=12)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
