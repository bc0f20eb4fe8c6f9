"""Live-database round trip for the W3 serving sink — capability-gated.

The sandbox ships neither a JDBC jar nor a running database, so the
protocol is normally proven against a DB-API fake + sqlite
(tests/test_jdbc.py). When a real PostgreSQL is reachable — DSN in
``$SPARK_GRAFT_PG_DSN`` plus an importable pure-Python driver — this
module exercises the actual wire path: delete-then-append in two
transactions (reference utils/postgres_utils.py:26-41), sibling
partitions intact. Skips cleanly otherwise, same stance as the
Avro/Pillow optional-dependency gates.
"""

from __future__ import annotations

import uuid

import pytest

from etl_poor_main_pipeline_spark.sinks.jdbc import (
    JdbcTarget,
    connect_from_env,
    load_serving_table,
)

_CONNECT = connect_from_env()

pytestmark = pytest.mark.skipif(
    _CONNECT is None,
    reason="no live database: set SPARK_GRAFT_PG_DSN and install pg8000/psycopg2",
)


@pytest.fixture()
def live_table():
    table = f"serving_smoke_{uuid.uuid4().hex[:12]}"
    conn = _CONNECT()
    try:
        cur = conn.cursor()
        cur.execute(
            f"CREATE TABLE {table} (date_id VARCHAR(10), station VARCHAR(32), temp_f DOUBLE PRECISION)"
        )
        conn.commit()
    finally:
        conn.close()
    yield table
    conn = _CONNECT()
    try:
        cur = conn.cursor()
        cur.execute(f"DROP TABLE IF EXISTS {table}")
        conn.commit()
    finally:
        conn.close()


def _rows(table):
    conn = _CONNECT()
    try:
        cur = conn.cursor()
        cur.execute(f"SELECT date_id, station, temp_f FROM {table} ORDER BY 1, 2")
        return [tuple(r) for r in cur.fetchall()]
    finally:
        conn.close()


def test_live_delete_append_round_trip(spark, live_table):
    target = JdbcTarget(url="unused-for-dbapi-path", table=live_table)
    day1 = spark.createDataFrame(
        [("2024-01-01", "KSEA", 51.0), ("2024-01-01", "KPDX", 49.5)],
        ["date_id", "station", "temp_f"],
    )
    day2 = spark.createDataFrame(
        [("2024-01-02", "KSEA", 47.0)], ["date_id", "station", "temp_f"]
    )
    assert (
        load_serving_table(day1, target, "2024-01-01", connect=_CONNECT, placeholder="%s")
        == 2
    )
    assert (
        load_serving_table(day2, target, "2024-01-02", connect=_CONNECT, placeholder="%s")
        == 1
    )
    # re-load day1 with revised values: its rows are REPLACED, day2 intact
    day1_fix = spark.createDataFrame(
        [("2024-01-01", "KSEA", 52.5)], ["date_id", "station", "temp_f"]
    )
    assert (
        load_serving_table(
            day1_fix, target, "2024-01-01", connect=_CONNECT, placeholder="%s"
        )
        == 1
    )
    assert _rows(live_table) == [
        ("2024-01-01", "KSEA", 52.5),
        ("2024-01-02", "KSEA", 47.0),
    ]


def test_live_empty_input_guard(spark, live_table):
    target = JdbcTarget(url="unused", table=live_table)
    empty = spark.createDataFrame([], "date_id string, station string, temp_f double")
    assert (
        load_serving_table(empty, target, "2024-01-03", connect=_CONNECT, placeholder="%s")
        == 0
    )
    assert _rows(live_table) == []
