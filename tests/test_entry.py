"""Driver-contract integrity: queries()/oracle_sql() shape, explicit
ordering lists stay in sync with the registry (a typo in _FIRST/_LAST
would silently demote a query out of the driver's verified window)."""

from __future__ import annotations

import __spark_entry__ as entry


def test_ordering_lists_reference_real_queries():
    names = set(entry.QUERIES)
    assert set(entry._FIRST) <= names, set(entry._FIRST) - names
    assert set(entry._LAST) <= names, set(entry._LAST) - names
    assert not set(entry._FIRST) & set(entry._LAST)


def test_queries_and_oracles_consistent():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert list(qs) == entry._ordered(list(entry.QUERIES))
    assert set(oracles) <= set(qs)
    # every oracle is non-empty SQL; every query is callable
    assert all(isinstance(sql, str) and sql.strip() for sql in oracles.values())
    assert all(callable(fn) for fn in qs.values())
    # the unverified-first window actually leads the dict
    assert list(qs)[: len(entry._FIRST)] == [n for n in entry._FIRST if n in qs]


def test_entry_returns_dataframe(spark):
    df = entry.entry(spark)
    assert df.columns[0] == "l_returnflag"
    assert df.count() > 0
