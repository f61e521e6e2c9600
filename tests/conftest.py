from __future__ import annotations

import os
import shutil

import pytest

from miru_spark.session import get_spark

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")


@pytest.fixture(scope="session")
def spark():
    s = get_spark("miru_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_corpus(spark):
    from miru_spark.corpus import generate_corpus

    df = generate_corpus(spark, n_rows=200, seed=42, partitions=2)
    df = df.persist()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_index(spark, tiny_corpus, tmp_path_factory):
    from miru_spark.index.build import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "tiny")
    build_index(spark, tiny_corpus, index_dir, num_partitions=4)
    yield index_dir
    shutil.rmtree(index_dir, ignore_errors=True)


@pytest.fixture(scope="session")
def sf_dir():
    return os.path.join(TESTDATA, "sf0.001")
