"""End-to-end corpus curation: Spark pipeline ≡ composed DuckDB SQL
on a corpus with junk docs, exact dups, and near-dup families."""

import duckdb
import pytest

from jaccard_join_duckdb_spark.operators.curate import curate_corpus
from jaccard_join_duckdb_spark.plans.oracle_ext import curate_corpus_sql

ROWS = [
    (1, "the quick brown fox jumps over the lazy dog and then naps"),
    (2, "the quick brown fox jumps over the lazy dog and then naps"),
    (3, "the quick brown fox jumps over the lazy dog and then sleeps"),
    (4, "12345 67890 12345 67890 12345 67890 12345"),
    (5, "short"),
    (6, "a completely different document about the weather in the mountains today"),
    (7, "a completely different document about the weather in the mountains today"),
    (8, "the sun was shining and the birds were singing in the quiet green park"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id long, text string")


def test_curate_matches_duckdb(docs):
    got = {
        (r.doc_id, r.n_tokens, r.quality)
        for r in curate_corpus(
            docs, "doc_id", "text",
            min_quality=0.3, min_tokens=5, neardup_threshold=0.8,
        ).collect()
    }
    con = duckdb.connect()
    vals = ", ".join(f"({i}, '{t}')" for i, t in ROWS)
    con.execute(
        f"create view documents as select * from (values {vals}) v(doc_id, text)"
    )
    want = {
        tuple(r)
        for r in con.execute(
            curate_corpus_sql(
                "documents", "doc_id", "text",
                min_quality=0.3, min_tokens=5, neardup_threshold=0.8,
            )
        ).fetchall()
    }
    assert got == want
    kept_ids = {r[0] for r in got}
    # junk/digit doc and too-short doc are gone; each dup family keeps
    # its min id
    assert 4 not in kept_ids and 5 not in kept_ids
    assert 1 in kept_ids and 2 not in kept_ids
    assert 6 in kept_ids and 7 not in kept_ids
    assert 8 in kept_ids
