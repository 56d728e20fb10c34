import shutil
import tempfile

import pytest

from etl_cms_spark.session import build_session


@pytest.fixture(scope="session")
def spark():
    s = build_session("local[4]", app_name="etl-cms-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture()
def tmp_root():
    d = tempfile.mkdtemp(prefix="etl_cms_spark_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet")


@pytest.fixture(scope="session")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="session")
def documents(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="session")
def embeddings(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="session")
def changes(spark):
    from etl_cms_spark.fixtures.generator import gen_source_changes

    return gen_source_changes(spark, n_events=3000, n_keys=500, n_repos=20).cache()


def assert_df_equal(a, b, msg=""):
    """Order-insensitive multiset equality."""
    extra = a.exceptAll(b).count()
    missing = b.exceptAll(a).count()
    assert extra == 0 and missing == 0, f"{msg}: extra={extra} missing={missing}"
