"""Local oracle-parity checker — mirrors the driver's t2 gate.

Runs every registered query on Spark and its DuckDB oracle twin on
the same parquet tables, then compares row count, column names/types,
and an order-insensitive value representation (see
``kafkatoclickhouse_spark.oracle``).

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from kafkatoclickhouse_spark import oracle, registry  # noqa: E402
from kafkatoclickhouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    registry.load_all()
    spark = get_spark("parity")
    con = oracle.duckdb_connect(sf_dir)

    failures = []
    ran = 0
    for name in sorted(registry.QUERIES):
        if only and name not in only:
            continue
        ran += 1
        t0 = time.time()
        try:
            problems = oracle.compare_query(spark, con, name, sf_dir)
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: error: {e}")
            continue
        if problems:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(problems)}")
        elif name not in registry.ORACLES:
            n = registry.QUERIES[name](spark, sf_dir).count()
            print(f"ok   {name}: rows-only ({n} rows, {time.time()-t0:.1f}s)")
        else:
            print(f"ok   {name}: match ({time.time()-t0:.1f}s)")

    print(f"\n{ran - len(failures)}/{ran} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
