"""The local mirror of the driver's correctness gate: every queries()
entry with an oracle_sql() entry must match DuckDB exactly at sf0.001."""

import pytest

import __ray_entry__ as entry_mod

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()
SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, duck):
    from conftest import assert_matches_oracle
    result = QUERIES[name](SF_DIR)
    assert_matches_oracle(result, duck, ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(name, duck):
    from conftest import to_pandas
    df = to_pandas(QUERIES[name](SF_DIR))
    assert df is not None
    assert len(df.columns) > 0
