"""ClickHouse SQL dialect shim — the reference's INSERT contract.

The reference sink writes raw batch-INSERT strings built per window
(`MyWindowFunction.scala:33-56`): values whose catalog type is in the
configured ``clickhouse.stringTypes`` set (``test.properties:26``:
``String,Date,DateTime``) are single-quoted after
``ClickHouseUtil.escape``, everything else is spliced raw, and
null/empty fields render as unquoted ``null``
(`MyWindowFunction.scala:85-95`).

Our Spark sink path doesn't normally need any of this — it writes
typed parameterized JDBC batches (``streaming/sink.py``), where
quoting is the driver's problem. This module pins the DIALECT
CONTRACT anyway: when the target really is ClickHouse and the
deployment wants the reference's statement-per-batch shape (e.g. to
reuse existing on-cluster quotas/auditing keyed on INSERT text), the
renderer here emits byte-equivalent SQL, and the pytest contract
test asserts it against the reference's own ``test.properties``
values — closing the "ClickHouse dialect untestable in-env" residual
without a live server.

Reference-exact sharp edge, reproduced deliberately: the reference
matches ``stringTypes`` against the *lowercased raw* catalog type
(`MyWindowFunction.scala:25,91`) — so ``Nullable(String)`` or
``DateTime64(3)`` columns are NOT quoted (their lowercase forms are
not in the set). That is arguably a bug upstream, but it is the
wire contract; ``sink_catalog._base_type`` exists for the
normalized behavior when building typed frames.

Multi-host failover (`ClickHouseSink.scala:42`): the reference hands
``jdbc:clickhouse://host1:8123,host2:8123`` to
``BalancedClickhouseDataSource``, which splits the host list, pings
each (``actualize()``) and round-robins connections over the live
subset. In a Spark deployment that concern moves to cluster config —
either the ClickHouse JDBC driver's own balanced datasource on the
executor classpath, or a TCP/HTTP load balancer in front of the
cluster; :func:`split_balanced_url` implements the same URL-splitting
contract so a foreachBatch writer can do client-side failover over
the candidate URLs (try in order, like the reference's retry loop).
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

# ClickHouseUtil.escape's escape table (clickhouse-jdbc, public
# source: ru.yandex.clickhouse.ClickHouseUtil — guava Escaper with
# exactly these single-char escapes).
_ESCAPES = {
    "\\": "\\\\",
    "\n": "\\n",
    "\t": "\\t",
    "\b": "\\b",
    "\f": "\\f",
    "\r": "\\r",
    "\0": "\\0",
    "'": "\\'",
    "`": "\\`",
}


def escape(value: str | None) -> str:
    """``ClickHouseUtil.escape`` twin: backslash-escape the control/
    quote characters; a null renders as ``\\N`` (the driver's
    convention)."""
    if value is None:
        return "\\N"
    return "".join(_ESCAPES.get(ch, ch) for ch in value)


def format_value(
    value: str | None,
    clickhouse_type: str,
    string_types: Sequence[str] | frozenset[str],
) -> str | None:
    """`MyWindowFunction.formatValue` (`MyWindowFunction.scala:85-95`)
    twin: null/empty → None (rendered as unquoted ``null``),
    stringTypes member (matched on the LOWERCASED RAW type — see
    module docstring) → quoted+escaped, else the raw value spliced
    as-is. ``string_types`` may be pre-lowered via
    :func:`_lowered_types` to avoid per-value set rebuilds."""
    if value is None or value == "":
        return None
    lowered = _lowered_types(string_types)
    if clickhouse_type.lower() in lowered:
        return f"'{escape(value)}'"
    return value


def _lowered_types(
    string_types: Sequence[str] | frozenset[str],
) -> frozenset[str]:
    """Normalize the stringTypes set once (idempotent: an already-
    prepared frozenset passes through by identity)."""
    if isinstance(string_types, frozenset):
        return string_types
    return frozenset(s.strip().lower() for s in string_types)


def render_batch_insert(
    database: str,
    table: str,
    columns: Sequence[tuple[str, str]],
    rows: Sequence[Mapping[str, str | None]],
    string_types: Sequence[str],
) -> str:
    """The reference's per-window batch statement
    (`MyWindowFunction.scala:33-56`):
    ``insert into db.table (c1,c2,...) values (v1,...),(v2,...)`` —
    columns in catalog order, one tuple per record, each value
    through :func:`format_value`. The reference iterates an
    unordered Scala Map for both the column list and the values, so
    its order is arbitrary-but-consistent; here ``columns`` is an
    explicit ordered sequence (catalog order), which satisfies the
    same consistency requirement deterministically."""
    if not rows:
        raise ValueError("render_batch_insert requires at least one row")
    names = [name for name, _ in columns]
    lowered = _lowered_types(string_types)
    tuples = []
    for row in rows:
        vals = []
        for name, ch_type in columns:
            v = format_value(row.get(name), ch_type, lowered)
            vals.append("null" if v is None else v)
        tuples.append("(" + ",".join(vals) + ")")
    return (
        f"insert into {database}.{table} ("
        + ",".join(names)
        + ") values "
        + ",".join(tuples)
    )


def split_balanced_url(jdbc_url: str) -> list[str]:
    """``BalancedClickhouseDataSource``'s URL contract
    (`ClickHouseSink.scala:42`): a ``jdbc:clickhouse://`` URL whose
    authority is a comma-separated host:port list splits into one
    single-host JDBC URL per endpoint (path/query preserved). The
    caller tries them in order / round-robin — client-side failover;
    at cluster scale prefer a load balancer in front of ClickHouse
    (see module docstring)."""
    prefix = "jdbc:clickhouse://"
    if not jdbc_url.startswith(prefix):
        raise ValueError(f"not a clickhouse JDBC url: {jdbc_url}")
    rest = jdbc_url[len(prefix) :]
    for cut, ch in enumerate(rest):
        if ch in "/?":
            authority, tail = rest[:cut], rest[cut:]
            break
    else:
        authority, tail = rest, ""
    hosts = [h.strip() for h in authority.split(",") if h.strip()]
    if not hosts:
        raise ValueError(f"no hosts in clickhouse JDBC url: {jdbc_url}")
    return [f"{prefix}{h}{tail}" for h in hosts]
