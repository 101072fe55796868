from __future__ import annotations

import shutil
import tempfile

import pytest

from europa_spark.fixtures import generate, write_corpus
from europa_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session(
        app_name="europa-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    return generate(2000, seed=42, truth=True)


@pytest.fixture(scope="session")
def corpus_dir(corpus):
    d = tempfile.mkdtemp(prefix="europa_fixture_")
    write_corpus(corpus, d)
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def docs_df(spark, corpus_dir):
    return spark.read.parquet(f"{corpus_dir}/documents.parquet")
