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
    # r6: every driver entry is oracle-checked — the one rows-only entry
    # (approx_distinct, HLL) moved to EXTRA_QUERIES; its accuracy gate is
    # tests/test_sketches.py
    assert set(q) == set(o)


def test_registry_stays_at_driver_cap():
    """The driver verifies exactly the first 50 registry entries (measured
    round 1 — 6 entries silently fell outside the window then).  Pin the
    cap so adding entry #51 fails HERE, pointing at EXTRA_QUERIES (the
    pytest-gated overflow registry in queries.py) instead of silently
    losing driver coverage.  Demoted to EXTRA in r4 to make room:
    order_limit, minhash_signatures, multimodal_metadata — all still
    oracle-compared by tests/test_extra_registry.py."""
    from dbc_informed_socketcan_to_parquet_spark.queries import EXTRA_QUERIES

    assert len(entrypoint.queries()) == 50, (
        "driver checks exactly 50 entries; register overflow queries in "
        "EXTRA_QUERIES instead"
    )
    assert len(EXTRA_QUERIES) >= 6


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(entrypoint.oracle_sql()))
def test_query_matches_oracle(spark, duck, name):
    q = entrypoint.queries()[name]
    sql = entrypoint.oracle_sql()[name]
    rep = compare(name, q(spark, SF), duck, sql)
    assert rep["status"] == "OK", rep
