"""ClickHouse-shaped sink tests — INSERT parity + transactional behavior,
run against a fake DBAPI connection (no server required)."""

from __future__ import annotations

import os
import pickle
import tempfile
from datetime import datetime

import pytest

from klogs_spark.config import EngineConfig
from klogs_spark.sink_clickhouse import ClickHouseSink, build_insert_sql

_SPOOL = tempfile.mkdtemp(prefix="fake-ch-")


def make_factory(spool_dir, fail_commit=False):
    """Factory returning a fake DBAPI connection that spools committed rows
    to disk. Classes are defined inside the closure so cloudpickle ships
    them by value to executor workers (the test module itself is not
    importable there)."""

    def factory():
        class FakeCursor:
            def __init__(self, store):
                self.store = store

            def executemany(self, sql, rows):
                self.store.append((sql, list(rows)))

        class FakeConnection:
            def __init__(self):
                self.pending = []

            def cursor(self):
                return FakeCursor(self.pending)

            def commit(self):
                if fail_commit:
                    raise RuntimeError("server gone")
                path = os.path.join(
                    spool_dir, f"commit-{os.getpid()}-{id(self)}.pkl"
                )
                with open(path, "wb") as f:
                    pickle.dump(self.pending, f)

            def rollback(self):
                self.pending = []

            def close(self):
                pass

        return FakeConnection()

    return factory


def read_spool(spool_dir):
    rows = []
    sqls = set()
    for name in os.listdir(spool_dir):
        with open(os.path.join(spool_dir, name), "rb") as f:
            for sql, batch in pickle.load(f):
                sqls.add(sql)
                rows.extend(batch)
    return sqls, rows


def test_insert_sql_matches_reference_shape():
    # clickhouse.go:76 — 10 columns, logs table, db-qualified
    sql = build_insert_sql(EngineConfig(database="logs"))
    assert sql.startswith(
        "INSERT INTO logs.logs (timestamp, cluster, namespace, app, "
        "pod_name, container_name, host, fields_string, fields_number, log) "
        "VALUES ("
    )
    assert sql.count("?") == 10
    assert "SETTINGS" not in sql


def test_async_insert_settings_suffix():
    # clickhouse.go:65-73
    cfg = EngineConfig(async_insert=True, wait_for_async_insert=True)
    assert build_insert_sql(cfg).endswith(
        "SETTINGS async_insert = 1, wait_for_async_insert = 1"
    )
    cfg2 = EngineConfig(async_insert=True, wait_for_async_insert=False)
    assert build_insert_sql(cfg2).endswith("wait_for_async_insert = 0")


def test_write_batch_commits_all_rows(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    sink = ClickHouseSink(EngineConfig(), make_factory(spool))
    df = spark.createDataFrame(
        [
            (datetime(2026, 1, 1), "c", "ns", "a", "p", "ct", "h",
             {"k": "v"}, {"n": 1.0}, "line-1"),
            (datetime(2026, 1, 2), "c", "ns", "a", "p", "ct", "h",
             {}, {}, "line-2"),
        ],
        "timestamp timestamp, cluster string, namespace string, app string, "
        "pod_name string, container_name string, host string, "
        "fields_string map<string,string>, fields_number map<string,double>, "
        "log string",
    )
    sink.write_batch(df, batch_id=0)
    sqls, rows = read_spool(spool)
    assert len(rows) == 2
    assert all(len(r) == 10 for r in rows)
    assert {r[9] for r in rows} == {"line-1", "line-2"}
    assert sqls == {sink.insert_sql}


def test_write_batch_failure_propagates(spark, tmp_path):
    spool = str(tmp_path / "spool")
    os.makedirs(spool)
    sink = ClickHouseSink(EngineConfig(), make_factory(spool, fail_commit=True))
    df = spark.createDataFrame(
        [(datetime(2026, 1, 1), "c", "ns", "a", "p", "ct", "h", {}, {}, "l")],
        "timestamp timestamp, cluster string, namespace string, app string, "
        "pod_name string, container_name string, host string, "
        "fields_string map<string,string>, fields_number map<string,double>, "
        "log string",
    )
    with pytest.raises(Exception):
        sink.write_batch(df, batch_id=0)
    # nothing committed -> at-least-once replay will redeliver
    assert read_spool(spool) == (set(), [])
