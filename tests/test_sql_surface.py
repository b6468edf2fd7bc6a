"""SQL surface ≡ DataFrame surface: the generated Spark-SQL pipeline
must return exactly the pairs the DataFrame operators return."""

import pytest
from pyspark.sql import functions as F

from jaccard_join_duckdb_spark import (
    QGramsTokzr,
    WhitespaceTokzr,
    jaccard_inner_join,
    jaccard_self_join,
    jaccard_self_join_brute_force,
)
from jaccard_join_duckdb_spark.plans.spark_sql import inner_join_sql, self_join_sql
from tests.conftest import pairs


@pytest.mark.parametrize("tok", [WhitespaceTokzr(), QGramsTokzr(3)])
@pytest.mark.parametrize("t", [0.5, 0.8])
def test_sql_self_join_equals_dataframe(documents, tok, t):
    df_out = jaccard_self_join(documents, "doc_id", "text", tok, t)
    sql_out = self_join_sql(documents, "doc_id", "text", tok, t)
    assert pairs(df_out) == pairs(sql_out)


def test_sql_self_brute_equals_dataframe(documents):
    df_out = jaccard_self_join_brute_force(
        documents, "doc_id", "text", WhitespaceTokzr(), 0.8
    )
    sql_out = self_join_sql(
        documents, "doc_id", "text", WhitespaceTokzr(), 0.8, brute_force=True
    )
    assert pairs(df_out) == pairs(sql_out)


def test_sql_inner_join_equals_dataframe(documents):
    l = documents.filter(F.col("doc_id") % 2 == 0)
    r = documents.filter(F.col("doc_id") % 2 == 1)
    ws = WhitespaceTokzr()
    df_out = jaccard_inner_join(
        l, r, "doc_id", "doc_id", "text", "text", ws, 0.8
    )
    sql_out = inner_join_sql(
        l, r, "doc_id", "doc_id", "text", "text", ws, 0.8
    )
    assert pairs(df_out) == pairs(sql_out)
    assert {tuple(sorted(map(str, row))) for row in df_out.collect()} == {
        tuple(sorted(map(str, row))) for row in sql_out.collect()
    }
