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
        spark.sql(f"drop table if exists {name}_counts")


def test_term_counts_skip_aggregation_job(spark, corpus):
    """With precomputed term_counts the probe schedules no
    postings-aggregation job: a dict adds ZERO jobs beyond the
    action; the <name>_counts side table adds one pushed-filter read
    (no groupBy over postings). Results identical on all paths, even
    with deliberately wrong counts (anchor choice is a performance
    heuristic, not a correctness input)."""
    import warnings as _w

    from jaccard_join_duckdb_spark.operators.search import load_term_counts

    name = "t_postings_counts_idx"
    write_postings_index(corpus, "doc_id", "text", name, num_buckets=4)
    try:
        idx = spark.table(name)
        counts_tbl = load_term_counts(spark, name)
        counts = {r["token"]: r["cnt"] for r in counts_tbl.collect()}
        expect = _hits(phrase_search(idx, "quick brown fox"))

        sc = spark.sparkContext
        with _w.catch_warnings():
            _w.simplefilter("ignore")

            def jobs_for(fn, group):
                sc.setJobGroup(group, group)
                try:
                    fn()
                finally:
                    sc.setJobGroup(None, None)
                return len(sc.statusTracker().getJobIdsForGroup(group))

            base = jobs_for(
                lambda: phrase_search(
                    idx, "quick brown fox", term_counts=counts
                ).collect(),
                "probe-dict",
            )
            agg = jobs_for(
                lambda: phrase_search(idx, "quick brown fox").collect(),
                "probe-agg",
            )
        assert base < agg  # the per-probe aggregation job is gone
        # all anchor sources agree, including adversarial counts
        assert _hits(phrase_search(idx, "quick brown fox",
                                   term_counts=counts)) == expect
        assert _hits(phrase_search(idx, "quick brown fox",
                                   term_counts=counts_tbl)) == expect
        assert _hits(phrase_search(idx, "quick brown fox",
                                   term_counts={"quick": 9, "brown": 1,
                                                "fox": 5})) == expect
    finally:
        spark.sql(f"drop table if exists {name}")
        spark.sql(f"drop table if exists {name}_counts")


def test_bucket_demotion_warning(spark, corpus):
    """Probing a bucketed postings table with autoBucketedScan ON
    warns (RuntimeWarning naming the conf); with the conf OFF (the
    session default for probes) it stays silent; strict_buckets
    raises. Scan-path probes (non-bucketed input) never warn."""
    import warnings as _w

    name = "t_postings_warn_idx"
    write_postings_index(corpus, "doc_id", "text", name, num_buckets=4)
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    try:
        idx = spark.table(name)
        spark.conf.set(conf, "true")
        with pytest.warns(RuntimeWarning, match="autoBucketedScan"):
            phrase_search(idx, "quick brown")
        with pytest.raises(RuntimeError, match="autoBucketedScan"):
            phrase_search(idx, "quick brown", strict_buckets=True)
        spark.conf.set(conf, "false")
        with _w.catch_warnings():
            _w.simplefilter("error")
            phrase_search(idx, "quick brown")          # no warning
            p = token_postings(corpus, "doc_id", "text")
            phrase_search(p, "quick brown")            # non-bucketed: silent
    finally:
        spark.conf.set(conf, old)
        spark.sql(f"drop table if exists {name}")
        spark.sql(f"drop table if exists {name}_counts")


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
