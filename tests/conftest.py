from __future__ import annotations

import shutil
import tempfile

import pytest

from uncp_spark.config import SimilarityConfig
from uncp_spark.fixtures import FixtureSpec, make_repos
from uncp_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(8, app_name="uncp_spark_tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg() -> SimilarityConfig:
    return SimilarityConfig()


@pytest.fixture(scope="session")
def repos_df(spark):
    df = make_repos(spark, FixtureSpec(n_repos=12, files_per_repo=8, seed=42))
    df.cache()
    df.count()
    return df


@pytest.fixture()
def tmpdir_path():
    d = tempfile.mkdtemp(prefix="uncp_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)
