"""Driver-contract consistency: queries/oracles well-formed, entry runs."""

from __future__ import annotations

import inspect

import __spark_entry__ as E


def test_oracle_keys_subset_of_queries():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert set(oracles) <= set(qs), set(oracles) - set(qs)
    # every query is a 2-arg callable
    for name, fn in qs.items():
        assert callable(fn), name
        assert len(inspect.signature(fn).parameters) == 2, name


def test_oracle_coverage_ratio():
    """Most operators must be value-checked, not just rows-only."""
    qs, oracles = E.queries(), E.oracle_sql()
    assert len(oracles) / len(qs) >= 0.7, (len(oracles), len(qs))


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert {"rid", "cluster_id", "cluster_size"} <= set(df.columns)
    assert df.count() > 0
