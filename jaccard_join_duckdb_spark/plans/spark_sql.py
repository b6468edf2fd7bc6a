"""Spark-SQL surface: run the reference join pipelines as pure SQL
text via ``spark.sql`` over temp views.

The DataFrame operators in :mod:`..operators.jaccard` are the primary
surface; these runners prove the engine's second surface (SURVEY.md
§1 "both the DataFrame and SQL surfaces work") by executing the SAME
generated pipeline SQL (:mod:`.ref_sql` with ``dialect='spark'``)
inside Spark's own SQL engine. Tests assert the two surfaces agree
pair-for-pair, and the DuckDB dialect of the identical generator is
the driver's oracle — a three-way agreement.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame

from ..tokenizers import Tokenizer
from . import ref_sql

__all__ = ["self_join_sql", "inner_join_sql"]


def _temp_view(df: DataFrame, stem: str) -> str:
    name = f"{stem}_{uuid.uuid4().hex[:8]}"
    df.createOrReplaceTempView(name)
    return name


def self_join_sql(
    df: DataFrame,
    key_attr: str,
    join_attr: str,
    tokenizer: Tokenizer,
    threshold: float,
    l_out: str = "l_id",
    r_out: str = "r_id",
    brute_force: bool = False,
) -> DataFrame:
    """Filtered (or brute-force) self-join executed as one Spark SQL
    statement."""
    view = _temp_view(df, "sj_in")
    gen = ref_sql.self_brute_sql if brute_force else ref_sql.self_filtered_sql
    sql = gen(
        view, key_attr, join_attr, tokenizer, threshold,
        l_out, r_out, dialect="spark",
    )
    return df.sparkSession.sql(sql)


def inner_join_sql(
    l_df: DataFrame,
    r_df: DataFrame,
    l_key: str,
    r_key: str,
    l_val: str,
    r_val: str,
    tokenizer: Tokenizer,
    threshold: float,
    l_out: str = "l_id",
    r_out: str = "r_id",
    brute_force: bool = False,
) -> DataFrame:
    """Two-table filtered (or brute-force) join as one Spark SQL
    statement, including the widow placeholder and swap-aware output
    naming encoded in SQL."""
    lv = _temp_view(l_df, "ij_l")
    rv = _temp_view(r_df, "ij_r")
    gen = ref_sql.inner_brute_sql if brute_force else ref_sql.inner_filtered_sql
    sql = gen(
        lv, rv, l_key, r_key, l_val, r_val, tokenizer, threshold,
        l_out, r_out, dialect="spark",
    )
    return l_df.sparkSession.sql(sql)
