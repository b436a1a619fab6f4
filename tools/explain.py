"""Plan inspector for registered queries — the `.explain` feedback
loop as a CLI. Prints the formatted physical plan plus the scan-level
properties the 100 TB contract cares about (PushedFilters, ReadSchema,
PartitionFilters) so a plan regression is visible without reading the
whole tree.

Usage: python tools/explain.py <query> [query ...] [--sf SF_DIR]
       python tools/explain.py --list
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from kafkatoclickhouse_spark import plans, registry  # noqa: E402
from kafkatoclickhouse_spark.session import get_spark  # noqa: E402

INTERESTING = ("PushedFilters", "ReadSchema", "PartitionFilters")


def main() -> int:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]

    registry.load_all()
    if "--list" in args or not args:
        for name in sorted(registry.QUERIES):
            mark = "" if name in registry.ORACLES else "  (rows-only)"
            print(f"{name}{mark}")
        return 0

    spark = get_spark("explain")
    for name in args:
        df = registry.QUERIES[name](spark, sf_dir)
        plan = plans.plan_string(df)
        print(f"==== {name} " + "=" * max(0, 60 - len(name)))
        print(plan)
        hits = [
            line.strip()
            for line in plan.splitlines()
            if any(k in line for k in INTERESTING)
        ]
        if hits:
            print("---- scan properties " + "-" * 40)
            for h in hits:
                print(h)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
