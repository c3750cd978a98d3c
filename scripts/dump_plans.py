"""Dump ``explain("formatted")`` for bench entries into plans/$PLANS_ROUND
(default r16).

Usage: [PLANS_ROUND=rNN] python scripts/dump_plans.py <suffix> [name,name,...]

Writes plans/<round>/<query>_<suffix>.txt for every headline + fast-path +
corpus bench entry (or the named subset).  Pure plan capture — nothing is
executed except whatever driver-side model fitting a query's *construction*
already does (classifier_train's gradient loop etc.), identical to what the
bench pays before its timed action.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dbc_informed_socketcan_to_parquet_spark.queries import (  # noqa: E402
    EXTRA_QUERIES,
    QUERIES,
)
from dbc_informed_socketcan_to_parquet_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def bench_entry_names() -> list[str]:
    import inspect
    import re

    corpus = re.findall(r'"([a-z0-9_]+)"', inspect.getsource(bench._corpus_addition_timings))
    corpus = [c for c in corpus if c in QUERIES or c in EXTRA_QUERIES]
    return list(dict.fromkeys(bench.HEADLINE + corpus))


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "plans", os.environ.get("PLANS_ROUND", "r16"))
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-plans")
    for name in bench_entry_names():
        if only and name not in only:
            continue
        fn = QUERIES.get(name) or EXTRA_QUERIES[name]
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
                df._jdf.queryExecution(), "formatted")
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR building {name}: {e}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")


if __name__ == "__main__":
    main()
