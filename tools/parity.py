"""Local oracle-parity checker — mirrors the driver's t2 gate.

Runs every registered query on Spark and its DuckDB oracle twin on
the same parquet tables, then compares row count, column names/types,
and an order-insensitive value representation. Strict: values are
compared exactly after canonical string formatting (floats via
repr of float64). If this passes, any reasonable driver-side hash
comparison passes too.

Usage: python tools/parity.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb

sys.path.insert(0, ".")

from kafkatoclickhouse_spark import registry  # noqa: E402
from kafkatoclickhouse_spark.session import get_spark  # noqa: E402
from kafkatoclickhouse_spark.tables import TABLES  # noqa: E402


def canon_cell(v) -> str:
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)


def canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        "|".join(canon_cell(r[i]) for i in order) for r in rows
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    registry.load_all()
    spark = get_spark("parity")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in sorted(registry.QUERIES.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [tuple(r) for r in sdf.collect()]
            scols = sdf.columns
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error: {e}")
            continue
        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracle)
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error: {e}")
            continue
        status = []
        if sorted(scols) != sorted(ocols):
            status.append(f"cols spark={sorted(scols)} duck={sorted(ocols)}")
        if len(srows) != len(orows):
            status.append(f"rowcount spark={len(srows)} duck={len(orows)}")
        if not status:
            sc = canon_rows(scols, srows)
            oc = canon_rows(ocols, orows)
            if sc != oc:
                diffs = [
                    (a, b) for a, b in zip(sc, oc) if a != b
                ][:3]
                status.append(f"values ({sum(a != b for a, b in zip(sc, oc))}"
                              f" diffs) e.g. {diffs}")
        if status:
            failures.append(name)
            print(f"FAIL {name}: {'; '.join(status)}")
        else:
            print(f"ok   {name}: {len(srows)} rows match "
                  f"({time.time()-t0:.1f}s)")

    print(f"\n{len(registry.QUERIES) - len(failures)}/"
          f"{len(registry.QUERIES)} pass")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
