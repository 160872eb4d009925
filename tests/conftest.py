from __future__ import annotations

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from fa_spark.pipeline import default_session

    s = default_session(app="fa-spark-tests", cores=8, shuffle_partitions=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory):
    from fa_spark.gen_fixtures import write_pages

    p = tmp_path_factory.mktemp("fixtures") / "pages.parquet"
    write_pages(str(p), 800)
    return str(p)


@pytest.fixture(scope="session")
def pages_df(spark, pages_path):
    return spark.read.parquet(pages_path)
