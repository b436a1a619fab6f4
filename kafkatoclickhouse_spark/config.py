"""Flat .properties config loader.

Parity with the reference's ``utils/GetConfig.getProperties``
(``/root/reference/src/main/scala/utils/GetConfig.scala:12-15``) and
its consumption in ``KafakToClickhouse.scala:19-40``: a properties
file becomes a flat str→str mapping that parameterizes sources,
validation, windowing and the sink. We keep the same key names the
reference uses (``/root/reference/test.properties``) so a reference
user's config ports over unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path


def load_properties(path: str | Path) -> dict[str, str]:
    """Parse a Java-style .properties file into a dict.

    Supports ``key=value`` lines, ``#``/``!`` comments, and blank
    lines. Values keep internal ``=``; whitespace around key/value is
    stripped (matches java.util.Properties for the subset the
    reference uses).
    """
    props: dict[str, str] = {}
    for raw in Path(path).read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith(("#", "!")):
            continue
        if "=" not in line:
            continue
        key, _, value = line.partition("=")
        props[key.strip()] = value.strip()
    return props


@dataclass
class PipelineConfig:
    """Typed view of the reference's config surface.

    Key names follow ``/root/reference/test.properties`` 1:1:
    kafka.* (lines 1-7), clickhouse.* (17-24), window.size (25),
    string.type (26), check.field (27), env switch (8-16).
    """

    kafka_bootstrap_servers: str = "localhost:9092"
    kafka_topics: list[str] = field(default_factory=list)
    kafka_group_id: str = "kafkatoclickhouse_spark"
    kafka_starting_offsets: str = "earliest"
    jdbc_url: str = ""
    jdbc_database: str = ""
    jdbc_table: str = ""
    jdbc_user: str = ""
    jdbc_password: str = ""
    max_retries: int = 3
    window_size: int = 20
    check_fields: list[str] = field(default_factory=lambda: ["cTime", "essCode"])
    string_types: list[str] = field(
        default_factory=lambda: ["String", "Date", "DateTime"]
    )
    checkpoint_dir: str = "/tmp/kafkatoclickhouse_spark/checkpoints"
    env: str = "test"

    @classmethod
    def from_properties(cls, props: dict[str, str]) -> "PipelineConfig":
        """Build the typed config, accepting BOTH this repo's key
        spellings and the reference's verbatim ones
        (``/root/reference/test.properties``): ``kafka.topic`` (:3),
        ``kafka.consumer.groupid`` (:5), ``clickhouse.conn`` +
        ``clickhouse.database`` (:21,19) composing the JDBC URL,
        ``clickhouse.stringTypes`` (:26) and ``checkpoint.path``
        (:10). Repo spellings win when both are present; a verbatim
        reference file populates every field (pinned in
        tests/test_config.py)."""

        def split_csv(s: str) -> list[str]:
            return [x.strip() for x in s.split(",") if x.strip()]

        def first(*keys: str, default: str = "") -> str:
            for k in keys:
                if k in props:
                    return props[k]
            return default

        jdbc_url = props.get("clickhouse.url", "")
        database = props.get("clickhouse.database", "")
        if not jdbc_url and "clickhouse.conn" in props:
            jdbc_url = props["clickhouse.conn"].rstrip("/")
            if database:
                jdbc_url = f"{jdbc_url}/{database}"
        if not database and jdbc_url:
            # clickhouse.url with a database path (…host:8123/db) — the
            # tail after the authority. A URL with no path (…host:8123)
            # yields no database; catalog bootstrap then requires the
            # explicit clickhouse.database key rather than guessing
            # 'host:8123' as a database name.
            tail = jdbc_url.split("//", 1)[-1]
            if "/" in tail:
                database = tail.rsplit("/", 1)[-1].split("?", 1)[0]

        return cls(
            kafka_bootstrap_servers=props.get(
                "kafka.bootstrap.servers", "localhost:9092"
            ),
            kafka_topics=split_csv(first("kafka.topics", "kafka.topic")),
            kafka_group_id=first(
                "kafka.group.id",
                "kafka.consumer.groupid",
                default="kafkatoclickhouse_spark",
            ),
            kafka_starting_offsets=props.get(
                "kafka.auto.offset.reset", "earliest"
            ),
            jdbc_url=jdbc_url,
            jdbc_database=database,
            jdbc_table=props.get("clickhouse.table", ""),
            jdbc_user=props.get("clickhouse.user", ""),
            jdbc_password=props.get("clickhouse.passwd", ""),
            max_retries=int(props.get("clickhouse.maxRetries", "3")),
            window_size=int(props.get("window.size", "20")),
            check_fields=split_csv(props.get("check.field", "cTime,essCode")),
            string_types=split_csv(
                first(
                    "string.type",
                    "clickhouse.stringTypes",
                    default="String,Date,DateTime",
                )
            ),
            checkpoint_dir=first(
                "checkpoint.dir",
                "checkpoint.path",
                default="/tmp/kafkatoclickhouse_spark/checkpoints",
            ),
            env=props.get("flink.env", props.get("env", "test")),
        )
