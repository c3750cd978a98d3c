"""Local replica of the driver's t2 correctness gate.

Runs each ``queries()[name]`` on Spark and the paired ``oracle_sql()[name]``
in DuckDB over the same parquet fixtures, then compares row count, sorted
column-name set, and an order-insensitive multiset of normalized rows.
Stricter than the driver (exact values, tiny float tolerance via rounding
to 9 significant-ish decimals) — if this passes, the driver's hash should.
"""

from __future__ import annotations

import math
from collections import Counter
from decimal import Decimal

import duckdb

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return int(v)
        return round(v, 9)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    return v


# Canonical type signatures: the driver's value-hash goes through pandas on
# both engines, so a numerically-equal result still hash-mismatches when the
# declared result types differ (DuckDB DECIMAL/HUGEINT leakage, float32 vs
# float64, int32 vs int64 — the r1 failure class).  Map each engine's
# declared column type to a signature and require equality; DECIMAL and
# HUGEINT are flagged outright (pandas-converts differently per engine).
_SPARK_SIG = {
    "float": "f4", "double": "f8", "tinyint": "i1", "smallint": "i2",
    "int": "i4", "bigint": "i8", "boolean": "b", "string": "s",
    "binary": "bin", "date": "date",
}
_DUCK_SIG = {
    "FLOAT": "f4", "REAL": "f4", "DOUBLE": "f8", "TINYINT": "i1",
    "SMALLINT": "i2", "INTEGER": "i4", "BIGINT": "i8", "BOOLEAN": "b",
    "VARCHAR": "s", "BLOB": "bin", "DATE": "date",
    "HUGEINT": "!hugeint", "UBIGINT": "!ubigint",
}


def _spark_sig(dt: str) -> str:
    if dt.startswith("decimal"):
        return "!decimal"
    if dt.startswith("timestamp"):
        return "ts"
    return _SPARK_SIG.get(dt, dt)


def _duck_sig(dt: str) -> str:
    if dt.startswith("DECIMAL"):
        return "!decimal"
    if dt.startswith("TIMESTAMP"):
        return "ts"
    return _DUCK_SIG.get(dt, dt.lower())


def type_signatures(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """{col: (spark_sig, duck_sig)} for every mismatched or flagged column."""
    s_types = {f.name.lower(): _spark_sig(f.dataType.simpleString()) for f in spark_df.schema.fields}
    d_types = {
        r[0].lower(): _duck_sig(r[1])
        for r in con.execute(f"DESCRIBE {sql}").fetchall()
    }
    bad = {}
    for c in s_types:
        ss, ds = s_types[c], d_types.get(c)
        if ds is None:
            continue  # schema mismatch reported separately
        if ss != ds or ss.startswith("!") or ds.startswith("!"):
            bad[c] = (ss, ds)
    return bad


def compare(name: str, spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    s_cols = sorted(spark_df.columns, key=str.lower)
    s_rows = [tuple(_norm(r[c]) for c in s_cols) for r in spark_df.collect()]

    rel = con.execute(sql)
    d_cols_raw = [d[0] for d in rel.description]
    d_order = sorted(range(len(d_cols_raw)), key=lambda i: d_cols_raw[i].lower())
    d_cols = [d_cols_raw[i] for i in d_order]
    d_rows = [tuple(_norm(row[i]) for i in d_order) for row in rel.fetchall()]

    report = {"name": name, "rows_spark": len(s_rows), "rows_duck": len(d_rows)}
    if [c.lower() for c in s_cols] != [c.lower() for c in d_cols]:
        report["status"] = "SCHEMA_MISMATCH"
        report["spark_cols"], report["duck_cols"] = s_cols, d_cols
        return report
    bad_types = type_signatures(spark_df, con, sql)
    if bad_types:
        report["status"] = "TYPE_MISMATCH"
        report["cols"] = {c: list(t) for c, t in bad_types.items()}
        return report
    if len(s_rows) != len(d_rows):
        report["status"] = "ROWCOUNT_MISMATCH"
        return report
    cs, cd = Counter(s_rows), Counter(d_rows)
    if cs == cd:
        report["status"] = "OK"
        return report
    only_s = list((cs - cd).items())[:3]
    only_d = list((cd - cs).items())[:3]
    report["status"] = "VALUE_MISMATCH"
    report["n_diff"] = sum((cs - cd).values())
    report["sample_spark_only"] = [str(x) for x in only_s]
    report["sample_duck_only"] = [str(x) for x in only_d]
    report["cols"] = s_cols
    return report


def run_all(spark, sf_dir: str, names: list[str] | None = None) -> list[dict]:
    from dbc_informed_socketcan_to_parquet_spark.queries import ORACLES, QUERIES

    con = duck_connection(sf_dir)
    out = []
    for name, fn in QUERIES.items():
        if names and name not in names:
            continue
        if name not in ORACLES:
            df = fn(spark, sf_dir)
            out.append({"name": name, "status": "ROWS_ONLY", "rows_spark": df.count()})
            continue
        try:
            out.append(compare(name, fn(spark, sf_dir), con, ORACLES[name]))
        except Exception as e:  # surface, keep going
            out.append({"name": name, "status": "ERROR", "error": str(e)[:400]})
    return out


if __name__ == "__main__":
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from dbc_informed_socketcan_to_parquet_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2].split(",") if len(sys.argv) > 2 else None
    spark = get_spark("oracle-harness")
    for rep in run_all(spark, sf_dir, names):
        print(json.dumps(rep))
