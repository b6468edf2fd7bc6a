import os

import pytest

os.environ.setdefault("SPARK_GRAFT_SHUFFLE_PARTITIONS", "4")

from jaccard_join_duckdb_spark import get_spark  # noqa: E402

TESTS_DIR = os.path.dirname(os.path.abspath(__file__))
SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="jjds-tests",
        master="local[4]",
        extra_conf={"spark.ui.enabled": "false", "spark.sql.session.timeZone": "UTC"},
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def purchases(spark):
    from jaccard_join_duckdb_spark.sources import read_csv

    return read_csv(spark, os.path.join(TESTS_DIR, "data", "purchases.csv")).cache()


@pytest.fixture(scope="session")
def interests(spark):
    from jaccard_join_duckdb_spark.sources import read_csv

    return read_csv(spark, os.path.join(TESTS_DIR, "data", "interests.csv")).cache()


@pytest.fixture(scope="session")
def documents(spark):
    from jaccard_join_duckdb_spark.sources import load_table

    return load_table(spark, SF_SMALL, "documents").cache()


def pairs(df):
    """Order-insensitive set of unordered pairs (the reference's own
    comparison discipline — notebook.ipynb cell 5)."""
    return {tuple(sorted((r[0], r[1]), key=str)) for r in df.collect()}
