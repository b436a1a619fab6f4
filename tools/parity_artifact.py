"""Committed full-registry parity artifact (VERDICT r7 #3).

The driver's per-round correctness sample rotates 50 of the
registered queries; queries outside the sample would otherwise have
only session-local evidence. This tool runs EVERY registered query
against its DuckDB oracle at one or more scale factors and writes
``PARITY_r{N}.json`` in-repo — per-query pass/fail plus the oracle
mode (hash-matched vs rows-only) — so each round's full-coverage
evidence is a durable, judged artifact like ``BENCH_LAST.json``.

Usage: python tools/parity_artifact.py ROUND [sf_dir ...]
(default sf_dirs: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafkatoclickhouse_spark import oracle, registry  # noqa: E402
from kafkatoclickhouse_spark.session import get_spark  # noqa: E402


def run_sf(spark, sf_dir: str) -> dict:
    con = oracle.duckdb_connect(sf_dir)
    out: dict[str, dict] = {}
    for name in sorted(registry.QUERIES):
        t0 = time.time()
        entry: dict = {
            "mode": "oracle" if name in registry.ORACLES else "rows_only"
        }
        try:
            problems = oracle.compare_query(spark, con, name, sf_dir)
            if name not in registry.ORACLES:
                entry["rows"] = registry.QUERIES[name](spark, sf_dir).count()
            entry["pass"] = not problems
            if problems:
                entry["problems"] = problems
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            entry["pass"] = False
            entry["problems"] = [f"{type(e).__name__}: {e}"[:300]]
        entry["sec"] = round(time.time() - t0, 2)
        out[name] = entry
        status = "ok  " if entry["pass"] else "FAIL"
        print(f"{status} {name} ({sf_dir}): {entry['sec']}s", flush=True)
    return out


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])
    sf_dirs = sys.argv[2:] or [
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    ]
    registry.load_all()
    spark = get_spark("parity_artifact")
    git_head = subprocess.run(
        ["git", "rev-parse", "HEAD"],
        capture_output=True,
        text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ).stdout.strip()
    results = {sf: run_sf(spark, sf) for sf in sf_dirs}
    n_queries = len(registry.QUERIES)
    summary = {
        sf: {
            "pass": sum(1 for e in r.values() if e["pass"]),
            "total": len(r),
            "fails": sorted(k for k, e in r.items() if not e["pass"]),
        }
        for sf, r in results.items()
    }
    payload = {
        "round": rnd,
        "git_head": git_head,
        "n_registered": n_queries,
        "n_oracled": len(registry.ORACLES),
        "summary": summary,
        "results": results,
    }
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"PARITY_r{rnd:02d}.json",
    )
    with open(out_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(json.dumps({"summary": summary, "artifact": out_path}))
    return 0 if all(
        s["pass"] == s["total"] for s in summary.values()
    ) else 1


if __name__ == "__main__":
    raise SystemExit(main())
