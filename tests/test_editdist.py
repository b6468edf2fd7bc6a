"""Edit-distance self-join: crafted cases + differential fuzz of
both candidate filters (positional q-gram prefix, FastSS deletion
neighborhood) against a brute-force Levenshtein oracle — the
lossless-superset claim is the whole correctness story, so the fuzz
alphabet maximizes shared grams, ties, short strings, and
common-prefix identifier shapes (the q-gram filter's worst case)."""

import os

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from jaccard_join_duckdb_spark.operators.editdist import (
    edit_distance_join,
    edit_distance_self_join,
)

_N_EXAMPLES = int(os.environ.get("SPARK_GRAFT_FUZZ_EXAMPLES", "10"))


def _brute(strings, d):
    """Driver-side Levenshtein (classic DP) — the oracle."""

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    out = set()
    for i in range(len(strings)):
        for j in range(i + 1, len(strings)):
            if abs(len(strings[i]) - len(strings[j])) <= d:
                dist = lev(strings[i], strings[j])
                if dist <= d:
                    out.add((i, j, dist))
    return out


def _run(spark, strings, d, **kw):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(strings)], ["id", "s"]
    )
    got = edit_distance_self_join(df, "id", "s", d, **kw)
    return {(r.l_id, r.r_id, r.dist) for r in got.collect()}


def test_crafted_substitution_insert_delete(spark):
    strings = ["kitten", "mitten", "kitte", "kittens", "sitting", "xyz"]
    for kw in ({"method": "qgram"}, {"method": "deletes"}):
        got = _run(spark, strings, 1, **kw)
        assert got == _brute(strings, 1), kw


def test_crafted_common_prefix_identifiers(spark):
    # the q-gram filter's worst case: long shared prefix, short
    # discriminative tail (the customer-name shape)
    strings = [f"Customer#{n:09d}" for n in (0, 1, 2, 10, 11, 100, 99999999)]
    for kw in (
        {"method": "qgram", "q": 2},
        {"method": "qgram", "q": 5},
        {"method": "deletes"},
    ):
        got = _run(spark, strings, 1, **kw)
        assert got == _brute(strings, 1), kw


def test_crafted_short_strings_share_no_gram(spark):
    # "a" vs "b": zero shared grams at any q, distance 1 — only the
    # short-row fallback (or deletes) can find it
    strings = ["a", "b", "", "ab", "ba", "ccc"]
    for kw in ({"method": "qgram", "q": 2}, {"method": "deletes"}):
        got = _run(spark, strings, 1, **kw)
        assert got == _brute(strings, 1), kw


def test_d2_qgram_only(spark):
    strings = ["abcdef", "abcxef", "abxxef", "abcdefgh", "zzzzzz", "abcd"]
    got = _run(spark, strings, 2, q=2)
    assert got == _brute(strings, 2)


def test_d0_exact_duplicates(spark):
    strings = ["dup", "dup", "dup2", "x"]
    got = _run(spark, strings, 0, q=2)
    assert got == _brute(strings, 0)


def test_deletes_rejects_d2(spark):
    df = None
    with pytest.raises(ValueError, match="max_dist=1"):
        edit_distance_self_join(df, "id", "s", 2, method="deletes")


def test_null_text_dropped(spark):
    df = spark.createDataFrame(
        [(0, "ab"), (1, None), (2, "ab")], ["id", "s"]
    )
    got = edit_distance_self_join(df, "id", "s", 1)
    assert {(r.l_id, r.r_id) for r in got.collect()} == {(0, 2)}


# Small alphabet => heavy gram collisions and ties; includes the
# empty string, 1-char strings (below q), and repeated chars
# (duplicate variants in the deletion neighborhood).
_strings = st.lists(
    st.text(alphabet="abA#0", min_size=0, max_size=8),
    min_size=2,
    max_size=10,
)


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings=_strings, d=st.integers(min_value=0, max_value=2))
def test_fuzz_qgram_vs_brute(spark, strings, d):
    for q in (1, 2, 3):
        assert _run(spark, strings, d, q=q) == _brute(strings, d), q


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(strings=_strings)
def test_fuzz_deletes_vs_brute(spark, strings):
    assert _run(spark, strings, 1, method="deletes") == _brute(strings, 1)


# ---- two-table (R-S) form ----


def _brute_rs(lstrings, rstrings, d):
    got = _brute(list(lstrings) + list(rstrings), d)
    n = len(lstrings)
    # spanning pairs of the concatenated corpus, re-indexed per side
    return {(i, j - n, dist) for i, j, dist in got if i < n <= j}


def _run_rs(spark, lstrings, rstrings, d, **kw):
    ldf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(lstrings)], ["lid", "ls"]
    )
    rdf = spark.createDataFrame(
        [(i, s) for i, s in enumerate(rstrings)], ["rid", "rs"]
    )
    got = edit_distance_join(ldf, rdf, "lid", "rid", "ls", "rs", d, **kw)
    return {(r.l_id, r.r_id, r.dist) for r in got.collect()}


def test_rs_crafted(spark):
    L = ["kitten", "abc", "zzz", "a"]
    R = ["mitten", "kitten", "abcd", "b", "qqq"]
    for kw in ({"method": "qgram"}, {"method": "deletes"}):
        assert _run_rs(spark, L, R, 1, **kw) == _brute_rs(L, R, 1), kw


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lstrings=_strings, rstrings=_strings, d=st.integers(min_value=0, max_value=2))
def test_fuzz_rs_qgram_vs_brute(spark, lstrings, rstrings, d):
    assert _run_rs(spark, lstrings, rstrings, d, q=2) == _brute_rs(
        lstrings, rstrings, d
    )


@settings(
    max_examples=_N_EXAMPLES,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lstrings=_strings, rstrings=_strings)
def test_fuzz_rs_deletes_vs_brute(spark, lstrings, rstrings):
    assert _run_rs(spark, lstrings, rstrings, 1, method="deletes") == _brute_rs(
        lstrings, rstrings, 1
    )
