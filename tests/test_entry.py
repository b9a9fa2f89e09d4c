"""Driver-contract smoke: entry() produces rows; every queries() entry runs
at sf0.001 with a stable schema; oracle_sql coverage is declared."""

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert len(df.collect()) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    assert df.schema.fieldNames()
    assert df.count() >= 0


def test_oracle_coverage():
    qs = set(entrymod.queries())
    oracles = set(entrymod.oracle_sql())
    assert oracles <= qs
    # every declared query has an exact SQL oracle (round-1 verdict item 1b)
    assert qs - oracles == set()
