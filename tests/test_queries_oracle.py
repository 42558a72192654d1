"""Local mirror of the driver's correctness gate: every query with an
oracle is executed at sf0.001 and compared value-for-value with DuckDB."""

import pytest

import __ray_entry__ as entrymod
from tests.util import assert_matches_oracle, to_pandas

SF = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()

WITH_ORACLE = sorted(set(QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(name):
    result = QUERIES[name](SF)
    assert_matches_oracle(result, ORACLES[name], SF)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_runs(name):
    df = to_pandas(QUERIES[name](SF))
    assert df is not None
    assert len(df.columns) > 0


def test_entry_smoke():
    result = entrymod.entry()
    df = to_pandas(result)
    assert len(df) > 0
    assert set(df.columns) == {"subj", "pred", "obj"}


def test_every_oracle_key_has_query():
    assert set(ORACLES) <= set(QUERIES)
