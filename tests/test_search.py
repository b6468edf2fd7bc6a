"""Phrase search: crafted positional semantics + scan-vs-bucketed-
index equality + anchor behavior on absent/duplicate terms."""

import pytest
from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.operators.search import (
    phrase_search,
    phrase_search_scan,
    token_postings,
    write_postings_index,
)


def _hits(df):
    return sorted((r.id, r.start_pos) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog"),
            (1, "quick brown quick brown fox"),
            (2, "THE QUICK BROWN"),          # case-folded match
            (3, "brown quick"),              # reversed — no match
            (4, ""),
        ],
        ["doc_id", "text"],
    )


def test_postings_positions_are_one_based(spark, corpus):
    p = token_postings(corpus, "doc_id", "text")
    first = {(r.id, r.pos) for r in p.filter(F.col("token") == "the").collect()}
    assert (0, 1) in first and (0, 7) in first and (2, 1) in first


def test_phrase_basic_and_overlapping(spark, corpus):
    got = _hits(phrase_search_scan(corpus, "doc_id", "text", "quick brown"))
    assert got == [(0, 2), (1, 1), (1, 3), (2, 2)]


def test_phrase_three_terms_and_order_sensitivity(spark, corpus):
    assert _hits(
        phrase_search_scan(corpus, "doc_id", "text", "quick brown fox")
    ) == [(0, 2), (1, 3)]
    assert _hits(phrase_search_scan(corpus, "doc_id", "text", "fox brown")) == []


def test_single_term_and_absent_term(spark, corpus):
    assert _hits(phrase_search_scan(corpus, "doc_id", "text", "dog")) == [(0, 9)]
    assert _hits(phrase_search_scan(corpus, "doc_id", "text", "zebra fox")) == []


def test_duplicate_phrase_terms(spark, corpus):
    assert _hits(
        phrase_search_scan(corpus, "doc_id", "text", "quick brown quick brown")
    ) == [(1, 1)]


def test_empty_phrase_rejected(spark, corpus):
    with pytest.raises(ValueError):
        phrase_search_scan(corpus, "doc_id", "text", "   ")


def test_bucketed_index_equals_scan(spark, corpus, tmp_path):
    name = "t_postings_idx"
    write_postings_index(corpus, "doc_id", "text", name, num_buckets=4)
    try:
        idx = spark.table(name)
        for phrase in ("quick brown", "quick brown fox", "dog"):
            assert _hits(phrase_search(idx, phrase)) == _hits(
                phrase_search_scan(corpus, "doc_id", "text", phrase)
            ), phrase
    finally:
        spark.sql(f"drop table if exists {name}")


def test_phrase_search_many_equals_singles(spark, corpus):
    from jaccard_join_duckdb_spark.operators.search import phrase_search_many

    probes = [
        ("a", "quick brown"),
        ("b", "quick brown fox"),
        ("c", "dog"),
        ("d", "quick brown quick brown"),  # duplicate terms
        ("e", "zebra fox"),                # absent term
    ]
    phrases = spark.createDataFrame(probes, ["phrase_id", "phrase"])
    p = token_postings(corpus, "doc_id", "text")
    got = {}
    for r in phrase_search_many(p, phrases).collect():
        got.setdefault(r.phrase_id, []).append((r.id, r.start_pos))
    for pid, phrase in probes:
        assert sorted(got.get(pid, [])) == _hits(phrase_search(p, phrase)), pid


def test_phrase_search_many_rejects_empty_phrase(spark, corpus):
    from jaccard_join_duckdb_spark.operators.search import phrase_search_many

    p = token_postings(corpus, "doc_id", "text")
    for bad in ("   ", None):
        phrases = spark.createDataFrame(
            [("ok", "quick brown"), ("bad", bad)],
            "phrase_id string, phrase string",
        )
        with pytest.raises(ValueError, match="'bad'"):
            phrase_search_many(p, phrases)
