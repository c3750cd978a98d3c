"""Local replica of the driver's verify: entry() smoke + every oracle-
checked query vs DuckDB at sf0.001 (fast; sf0.01 is the driver's own gate
and is exercised via tests/oracle_harness.py manually)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrypoint
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"


def test_entry_smoke(spark):
    df = entrypoint.entry(spark)
    assert df.count() > 0
    assert df.columns[0] == "bucket_ms"


def test_queries_oracle_keys_align():
    q = entrypoint.queries()
    o = entrypoint.oracle_sql()
    assert set(o) <= set(q)
    # every query is either oracle-checked or explicitly rows-only
    rows_only = set(q) - set(o)
    assert rows_only == {"approx_distinct"}


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(entrypoint.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = entrypoint.queries()[name]
    sql = entrypoint.oracle_sql()[name]
    rep = compare(name, q(spark, SF), duck, sql)
    assert rep["status"] == "OK", rep
