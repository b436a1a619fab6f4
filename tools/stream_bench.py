"""Streaming-topology throughput bench: the reference-parity R1→R7
pipeline (source → parse → validate → per-key count window → retry
sink) drained end-to-end with an availableNow trigger.

The reference publishes no throughput numbers (BASELINE.md), so this
records OUR side of the comparison: sustained rows/sec through the
full streaming topology — source decode, JSON parse, dirty-split,
stateful count window (applyInPandasWithState), sink projection and
the foreachBatch retry wrapper — not a bare source-to-noop pass.

Usage: python tools/stream_bench.py [sf_dir] [window_size]
Prints ONE JSON line:
  {"metric": "stream_ingest_rows_per_sec", "value": N,
   "rows": R, "wall_sec": W, "window_size": K, "sf": ...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from kafkatoclickhouse_spark import config as cfgmod  # noqa: E402
from kafkatoclickhouse_spark.operators import ingest  # noqa: E402
from kafkatoclickhouse_spark.session import get_spark  # noqa: E402
from kafkatoclickhouse_spark.streaming import job, sink, source  # noqa: E402
from kafkatoclickhouse_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    )
    window_size = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    sf = float(
        os.path.basename(sf_dir.rstrip("/")).removeprefix("sf") or 0.1
    )
    spark = get_spark("stream_bench")
    work = tempfile.mkdtemp(prefix="stream_bench_")
    try:
        feed = os.path.join(work, "feed")
        events = load_table(spark, sf_dir, "events")
        ingest.events_as_raw_json(events).write.parquet(feed)
        n_rows = spark.read.parquet(feed).count()

        props = cfgmod.load_properties("configs/example.properties")
        cfg = cfgmod.PipelineConfig.from_properties(props)
        cfg.window_size = window_size
        cfg.checkpoint_dir = os.path.join(work, "ckpt")
        out_dir = os.path.join(work, "landed")

        # warm the JVM/codegen on a tiny prefix drain, then time a
        # fresh full drain from a clean checkpoint.
        for rnd in ("warm", "timed"):
            shutil.rmtree(cfg.checkpoint_dir, ignore_errors=True)
            shutil.rmtree(out_dir, ignore_errors=True)
            raw = source.file_raw_stream(spark, feed)
            t0 = time.perf_counter()
            q = job.start(
                spark,
                cfg,
                write_fn=sink.parquet_writer(out_dir),
                raw=raw,
                available_now=True,
            )
            q.awaitTermination(600)
            wall = time.perf_counter() - t0
        landed = spark.read.parquet(out_dir).count()
        print(
            json.dumps(
                {
                    "metric": "stream_ingest_rows_per_sec",
                    "value": round(n_rows / wall, 1),
                    "unit": "rows/sec",
                    "rows": n_rows,
                    "landed_rows": landed,
                    "wall_sec": round(wall, 3),
                    "window_size": window_size,
                    "sf": sf,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
