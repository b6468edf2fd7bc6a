"""Driver-contract invariants for __spark_entry__: every query has an
oracle, names are stable, and callables have the right signature —
prevents contract drift as operators are added."""

import inspect


def test_every_query_has_an_oracle():
    import __spark_entry__ as e

    qs, oracles = e.queries(), e.oracle_sql()
    missing = sorted(set(qs) - set(oracles))
    extra = sorted(set(oracles) - set(qs))
    assert not missing, f"queries without oracle_sql: {missing}"
    assert not extra, f"oracle_sql without queries: {extra}"


def test_query_callables_signature():
    import __spark_entry__ as e

    for name, fn in e.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_oracle_sql_is_nonempty_text():
    import __spark_entry__ as e

    for name, sql in e.oracle_sql().items():
        assert isinstance(sql, str) and sql.strip(), name
