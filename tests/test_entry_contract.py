"""Mirror the driver's verify: every queries() entry vs its oracle_sql()."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import assert_matches_oracle

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["event_type", "ds", "y"]


def test_every_query_has_callable():
    assert QUERIES, "queries() must not be empty"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_keys_subset_of_queries():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracle_sql keys without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, sf_dir, name):
    got = QUERIES[name](spark, sf_dir)
    assert_matches_oracle(got, duck, ORACLES[name])
