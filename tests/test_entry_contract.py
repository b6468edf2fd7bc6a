"""Driver-contract invariants for __spark_entry__: every query has an
oracle, names are stable, and callables have the right signature —
prevents contract drift as operators are added."""

import inspect


# Gated queries deliberately WITHOUT a DuckDB oracle (the driver
# records its weaker rows-only check): each must be non-SQL-
# expressible and carry its own pinning tests. Empty since round 9 —
# pack_stats_bpe (the last member) gained a hash-strong oracle via a
# pre-encoded md5(text)→count fixture (tools/gen_bpe_fixture.py).
ROWS_ONLY: set[str] = set()


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    missing = sorted(set(qs) - set(oracles) - ROWS_ONLY)
    extra = sorted(set(oracles) - set(qs))
    assert not missing, f"queries without oracle_sql: {missing}"
    assert not extra, f"oracle_sql without queries: {extra}"
    stale = sorted(ROWS_ONLY & set(oracles))
    assert not stale, f"ROWS_ONLY entries that now HAVE an oracle: {stale}"


def test_every_extra_query_has_an_oracle():
    import __spark_entry__ as e

    qs, oracles = e.extra_queries(), e.extra_oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    extra = sorted(set(oracles) - set(qs))
    assert not missing, f"extra_queries without extra_oracle_sql: {missing}"
    assert not extra, f"extra_oracle_sql without extra_queries: {extra}"
    overlap = sorted(set(qs) & set(e.queries()))
    assert not overlap, f"queries present in both dicts: {overlap}"


def test_graded_inventory_fits_driver_window():
    """The driver grades only the FIRST 50 queries() entries; at 53
    (round 4) three declared queries silently fell off the gate. Pin
    the graded dict inside the window so every declared query gets a
    CORRECTNESS row."""
    import __spark_entry__ as e

    assert len(e.queries()) <= 50, (
        "queries() exceeds the driver's 50-row grading window — demote "
        "redundant variants to extra_queries()"
    )


# Queries declared AFTER the round-5 snapshot, awaiting their first
# rotation into the driver window (each is already hash-verified every
# round by tools/check_entry.py). Promote on the next window rotation
# and remove from this list.
# Round 8: empty — jaccard_knn and events_resample_7h were rotated
# into _GATED (round-7 verdict #1), and the new domain_pagerank_zipf
# entered _GATED directly on declaration.
PENDING_FIRST_DRIVER_ROW: set[str] = set()


def test_rotation_union_covers_inventory():
    """Round-5 verdict #2: the gate window rotates so the union of the
    round-5 driver rows and the current window covers EVERY declared
    query — no name goes two rounds without a driver-signed row.
    Brand-new queries may await their first rotation, but only if
    explicitly listed in PENDING_FIRST_DRIVER_ROW."""
    import json
    import pathlib

    import __spark_entry__ as e

    repo = pathlib.Path(__file__).resolve().parents[1]
    graded: set[str] = set()
    # union EVERY past round's driver rows (r5 onward — the rotation
    # era), so the invariant stays correct as new rounds accumulate
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        if f.name >= "CORRECTNESS_r05.json":
            graded |= set(json.loads(f.read_text()))
    declared = set(e.queries()) | set(e.extra_queries())
    uncovered = set(declared - graded - set(e.queries()))
    unexplained = sorted(uncovered - PENDING_FIRST_DRIVER_ROW)
    assert not unexplained, (
        f"declared queries with no driver row in r5, not in the current "
        f"window, and not declared pending: {unexplained}"
    )
    stale = sorted(PENDING_FIRST_DRIVER_ROW - uncovered)
    assert not stale, f"PENDING entries that now have coverage: {stale}"


def test_query_callables_signature():
    import __spark_entry__ as e

    for name, fn in {**e.queries(), **e.extra_queries()}.items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_is_nonempty_text():
    import __spark_entry__ as e

    for name, sql in {**e.oracle_sql(), **e.extra_oracle_sql()}.items():
        assert isinstance(sql, str) and sql.strip(), name
