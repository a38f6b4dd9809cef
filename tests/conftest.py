from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from bloomfilter_multithread_spark.sources.io import get_spark

    s = get_spark(app="pytest", master=os.environ.get("SPARK_TEST_MASTER", "local[8]"),
                  shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def corpus(spark):
    """Small deterministic transcript corpus, cached for the session."""
    from bloomfilter_multithread_spark.sources.transcripts import synth_transcripts

    df = synth_transcripts(spark, n_convs=1500, seed=42).cache()
    df.count()
    return df
