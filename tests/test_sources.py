"""Sources & input-shaping helpers (SURVEY.md §2.1 / §2.7)."""

import os

from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.sources import (
    concat_val,
    read_csv,
    register_view,
    sample_fixed,
    to_join_input,
    union_distinct,
)
from tests.conftest import TESTS_DIR


def test_csv_scan_infers_schema(purchases):
    assert purchases.count() == 6
    assert dict(purchases.dtypes)["id"] in ("int", "bigint")


def test_concat_val_null_parity(spark):
    """DuckDB concat skips NULLs (doubled separators remain) — Spark
    F.concat would null the row; our helper reproduces DuckDB."""
    df = spark.createDataFrame(
        [("a", None, "c")], "c1 string, c2 string, c3 string"
    )
    out = df.select(concat_val("c1", "c2", "c3").alias("v")).collect()[0][0]
    assert out == "a  c"


def test_to_join_input_shape(purchases):
    out = to_join_input(purchases, "id", "purchases")
    assert out.columns == ["id", "val"]


def test_union_distinct_is_sql_union(spark):
    a = spark.createDataFrame([(1,), (2,)], "x int")
    b = spark.createDataFrame([(2,), (3,)], "x int")
    c = spark.createDataFrame([(3,), (1,)], "x int")
    out = union_distinct(a, b, c)
    assert sorted(r.x for r in out.collect()) == [1, 2, 3]


def test_sample_fixed_deterministic(documents):
    s1 = sample_fixed(documents, 50, seed=7).select("doc_id").collect()
    s2 = sample_fixed(documents, 50, seed=7).select("doc_id").collect()
    assert len(s1) == 50
    assert {r.doc_id for r in s1} == {r.doc_id for r in s2}


def test_register_view_and_sql_surface(spark, purchases):
    register_view(purchases, "purchases_v")
    n = spark.sql("select count(*) as n from purchases_v").collect()[0].n
    assert n == 6
    # S7 catalog metadata
    assert any(t.name == "purchases_v" for t in spark.catalog.listTables())


def test_any_value_per_group(spark, purchases):
    """A5: any_value picks an arbitrary-but-present value per group
    (test.ipynb cell 29 uses it in the manual similarity calc)."""
    out = (
        purchases.groupBy(F.lit(1).alias("g"))
        .agg(F.any_value(F.col("id")).alias("some_id"))
        .collect()
    )
    assert out[0].some_id in {r.id for r in purchases.collect()}
