"""Runnable job entry — the reference's submission surface.

The reference launches as ``flink run -c KafakToClickhouse <jar>
--config_path test.properties`` (`KafakToClickhouse.scala:16-22`);
the Spark twin is::

    python -m kafkatoclickhouse_spark --config_path test.properties
    python -m kafkatoclickhouse_spark test.properties      # positional too

Config → session → topology → sink, all driven by the same
.properties surface (reference key spellings accepted — see
``config.PipelineConfig.from_properties``). ``--available-now``
drains the backlog and exits (the batch-backfill mode); the default
runs until terminated, checkpointed per R9. With a sink catalog
reachable over JDBC, the R6 schema bootstrap shapes the output
(``--no-catalog`` or an unreachable catalog falls back to the raw
windowed columns).
"""

from __future__ import annotations

import argparse
import sys

from kafkatoclickhouse_spark import config as cfgmod
from kafkatoclickhouse_spark.session import get_spark
from kafkatoclickhouse_spark.streaming import job, sink_catalog


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="kafkatoclickhouse_spark")
    ap.add_argument("config", nargs="?", help=".properties path")
    ap.add_argument("--config_path", dest="config_path", default=None)
    ap.add_argument(
        "--available-now",
        action="store_true",
        help="drain available input then stop (backfill mode)",
    )
    ap.add_argument(
        "--no-catalog",
        action="store_true",
        help="skip the R6 sink-catalog schema bootstrap",
    )
    ap.add_argument(
        "--file-source",
        default=None,
        metavar="DIR",
        help="read the raw feed from parquet files instead of Kafka "
        "(the broker-less test double; same columns as the Kafka "
        "source)",
    )
    ap.add_argument(
        "--parquet-sink",
        default=None,
        metavar="DIR",
        help="land output as parquet instead of JDBC (smoke/backfill)",
    )
    ap.add_argument(
        "--curate",
        default=None,
        metavar="DIR",
        help="run the CURATION topology instead of the R1-R7 event "
        "chain: stream documents-shaped parquet from DIR through "
        "score -> decontam -> dedup -> per-source count window -> "
        "sink (VERDICT r11 #4)",
    )
    ap.add_argument(
        "--curate-fixture",
        default=None,
        metavar="DIR",
        help="fixture directory providing the trained classifier "
        "model and the eval set for decontamination (defaults to "
        "the --curate DIR)",
    )
    ap.add_argument(
        "--curate-stages",
        default=",".join(
            ("score", "decontam", "dedup")
        ),
        metavar="CSV",
        help="comma-separated subset of score,decontam,dedup",
    )
    ap.add_argument(
        "--curate-ts-col",
        default=None,
        metavar="COL",
        help="event-time column bounding the dedup state (required "
        "when the dedup stage is on)",
    )
    args = ap.parse_args(argv)
    path = args.config_path or args.config
    if not path:
        ap.error("a .properties path is required (positional or --config_path)")
    if args.curate:
        stages = {
            s.strip() for s in args.curate_stages.split(",") if s.strip()
        }
        if "dedup" in stages and not args.curate_ts_col:
            # fail at the CLI surface, not deep inside topology
            # construction (ADVICE r12)
            ap.error(
                "--curate-ts-col is required when the dedup stage is "
                "enabled (it bounds the dedup state's event-time "
                "horizon); pass --curate-ts-col COL or drop dedup "
                "from --curate-stages"
            )

    cfg = cfgmod.PipelineConfig.from_properties(
        cfgmod.load_properties(path)
    )
    spark = get_spark("kafkatoclickhouse")

    catalog = None
    if not args.no_catalog and cfg.jdbc_url and not cfg.jdbc_database:
        # mirror the other two fallback paths: the user pointed at a
        # sink but we can't tell which database to bootstrap from, so
        # say so instead of silently skipping projection/typing.
        print(
            "no clickhouse.database configured (and none in the JDBC "
            "URL path); skipping sink-catalog bootstrap",
            file=sys.stderr,
        )
    if not args.no_catalog and cfg.jdbc_url and cfg.jdbc_database:
        try:
            catalog = sink_catalog.fetch_sink_catalog(
                spark,
                cfg.jdbc_url,
                cfg.jdbc_database,
                cfg.jdbc_table,
                user=cfg.jdbc_user or None,
                password=cfg.jdbc_password or None,
            )
        except Exception as e:  # noqa: BLE001 — catalog is best-effort
            print(
                f"sink-catalog bootstrap unavailable ({e}); "
                "writing unprojected columns",
                file=sys.stderr,
            )
        else:
            if not catalog:
                # zero rows = table/database missing from
                # system.columns; an empty projection would drop EVERY
                # column, so treat it like an unreachable catalog.
                catalog = None
                print(
                    "sink-catalog bootstrap returned no columns for "
                    f"{cfg.jdbc_database}.{cfg.jdbc_table}; "
                    "writing unprojected columns",
                    file=sys.stderr,
                )

    from kafkatoclickhouse_spark.streaming import sink, source

    write_fn = None
    if args.parquet_sink:
        write_fn = sink.parquet_writer(args.parquet_sink)

    if args.curate:
        from kafkatoclickhouse_spark.functions import hashing
        from kafkatoclickhouse_spark.operators import decontam as bd
        from kafkatoclickhouse_spark.streaming import curation
        from kafkatoclickhouse_spark.tables import load_table

        stages = tuple(
            s.strip() for s in args.curate_stages.split(",") if s.strip()
        )
        fixture = args.curate_fixture or args.curate
        if write_fn is None:
            write_fn = sink.jdbc_writer(
                cfg.jdbc_url,
                cfg.jdbc_table,
                user=cfg.jdbc_user or None,
                password=cfg.jdbc_password or None,
            )
        from pyspark.sql import functions as F

        docs = load_table(spark, fixture, "documents")
        stream = (
            spark.readStream.schema(
                spark.read.parquet(
                    args.curate + "/documents.parquet"
                ).schema
            ).parquet(args.curate + "/documents.parquet")
        )
        eval_shingles = None
        if "decontam" in stages:
            eval_shingles = (
                docs.where(F.col("doc_id") % bd.EVAL_MOD == 0)
                .select(
                    F.explode(
                        hashing.word_shingles(
                            F.col("text"), bd.DECONTAM_N
                        )
                    ).alias("shingle")
                )
                .distinct()
            )
        q = curation.start_curation(
            spark,
            fixture,
            stream,
            write_fn=write_fn,
            checkpoint_dir=cfg.checkpoint_dir,
            stages=stages,
            eval_shingles=eval_shingles,
            ts_col=args.curate_ts_col,
            window_size=cfg.window_size,
            max_retries=cfg.max_retries,
            available_now=args.available_now,
        )
        q.awaitTermination()
        return 0

    raw = None
    if args.file_source:
        raw = source.file_raw_stream(spark, args.file_source)
    q = job.start(
        spark,
        cfg,
        write_fn=write_fn,
        raw=raw,
        available_now=args.available_now,
        catalog=catalog,
    )
    q.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
