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
    assert set(ORACLES) == set(QUERIES)  # r6: all 50 driver rows hash-checked
    assert set(EXTRA_ORACLES) <= set(EXTRA_QUERIES)
    # rows-only extras (no DuckDB-replayable values) are a closed list —
    # each must name its dedicated pytest gate in a comment at its @extra_query
    assert set(EXTRA_QUERIES) - set(EXTRA_ORACLES) == {
        "approx_distinct", "bpe_token_count", "compression_ratio",
        "semantic_dedup_against_pq",
    }
    assert not set(EXTRA_QUERIES) & set(QUERIES)
    # the parametrized oracle test below shrinks silently if entries are
    # dropped — pin the floor so a lost registration fails loudly
    assert len(EXTRA_QUERIES) >= 41, sorted(EXTRA_QUERIES)


@pytest.fixture(scope="module")
def duck():
    return duck_connection(SF)


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLES))
def test_extra_query_matches_oracle(spark, duck, name):
    rep = compare(name, EXTRA_QUERIES[name](spark, SF), duck, EXTRA_ORACLES[name])
    assert rep["status"] == "OK", rep


@pytest.mark.parametrize("name", sorted(set(EXTRA_QUERIES) - set(EXTRA_ORACLES)))
def test_extra_rows_only_query_executes(spark, name):
    """Rows-only extras still execute end-to-end with a stable schema;
    their value semantics live in dedicated pytests (approx_distinct →
    tests/test_sketches.py; bpe_token_count → tests/test_bpe.py)."""
    df = EXTRA_QUERIES[name](spark, SF)
    assert df.columns, name
    assert df.count() > 0, name
