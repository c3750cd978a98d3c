"""Oracle-parity gate for queries BEYOND the capped driver registry.

The driver checks at most 50 ``queries()`` entries, so the registry is
held at exactly 50; every additional oracle-paired query registers in
``EXTRA_QUERIES``/``EXTRA_ORACLES`` and runs through the SAME DuckDB
compare() here — identical rigor, pytest-gated instead of driver-gated.
"""

from __future__ import annotations

import pytest

from dbc_informed_socketcan_to_parquet_spark.queries import EXTRA_ORACLES, EXTRA_QUERIES

from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.01"


def test_extra_registry_shape():
    from dbc_informed_socketcan_to_parquet_spark.queries import ORACLES, QUERIES

    assert len(QUERIES) == 50            # the driver cap — do not exceed
    assert set(ORACLES) <= set(QUERIES)
    assert set(EXTRA_ORACLES) == set(EXTRA_QUERIES)
    assert not set(EXTRA_QUERIES) & set(QUERIES)
    # the parametrized oracle test below shrinks silently if entries are
    # dropped — pin the floor so a lost registration fails loudly
    assert len(EXTRA_QUERIES) >= 36, sorted(EXTRA_QUERIES)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(EXTRA_QUERIES))
def test_extra_query_matches_oracle(spark, duck, name):
    rep = compare(name, EXTRA_QUERIES[name](spark, SF), duck, EXTRA_ORACLES[name])
    assert rep["status"] == "OK", rep
