"""Logs table layout tests — partitioning, in-file sort, TTL retention."""

from __future__ import annotations

from datetime import date, datetime
from pathlib import Path

import pytest

from klogs_spark.schema import CLUSTER_KEY
from klogs_spark.table import apply_retention, read_logs, register_view, write_logs


@pytest.fixture()
def logs_df(spark):
    rows = [
        (datetime(2026, 1, d, h, 0, 0), "prod", f"ns-{d % 2}", "app",
         f"pod-{h}", "c", "host", {"level": "info"}, {"v": float(h)}, "line")
        for d in (1, 2, 3)
        for h in (0, 6, 12)
    ]
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, cluster string, namespace string, app string, "
        "pod_name string, container_name string, host string, "
        "fields_string map<string,string>, fields_number map<string,double>, "
        "log string",
    )


def test_write_creates_daily_partitions(spark, logs_df, tmp_path):
    path = str(tmp_path / "logs")
    write_logs(logs_df, path)
    parts = sorted(p.name for p in Path(path).glob("date=*"))
    assert parts == ["date=2026-01-01", "date=2026-01-02", "date=2026-01-03"]
    back = read_logs(spark, path)
    assert back.count() == 9
    assert back.select("date").distinct().count() == 3


def test_rows_sorted_by_cluster_key_within_files(spark, logs_df, tmp_path):
    path = str(tmp_path / "logs")
    write_logs(logs_df, path)
    # every parquet file must be sorted by the cluster key (schema.sql:18)
    for f in Path(path).glob("date=*/*.parquet"):
        pdf = spark.read.parquet(str(f)).select(*CLUSTER_KEY).toPandas()
        key = list(map(tuple, pdf.itertuples(index=False)))
        assert key == sorted(key)


def test_partition_pruning_in_plan(spark, logs_df, tmp_path):
    from pyspark.sql import functions as F

    path = str(tmp_path / "logs")
    write_logs(logs_df, path)
    df = read_logs(spark, path).filter("date = DATE'2026-01-02'")
    assert df.count() == 3
    # runtime truth: only files under the matching partition dir were read
    touched = [
        r[0] for r in df.select(F.input_file_name()).distinct().collect()
    ]
    assert touched and all("date=2026-01-02" in f for f in touched)


def test_register_view_sql_roundtrip(spark, logs_df, tmp_path):
    path = str(tmp_path / "logs")
    write_logs(logs_df, path)
    register_view(spark, path, "logs_t")
    got = spark.sql(
        "SELECT count(*) AS c FROM logs_t WHERE namespace = 'ns-1'"
    ).collect()[0].c
    assert got == 6  # days 1 and 3 route to ns-1, 3 rows each


def test_retention_drops_old_partitions(spark, logs_df, tmp_path):
    path = str(tmp_path / "logs")
    write_logs(logs_df, path)
    dropped = apply_retention(path, retention_days=30, today=date(2026, 2, 2))
    assert dropped == ["date=2026-01-01", "date=2026-01-02"]
    assert read_logs(spark, path).count() == 3
    # idempotent
    assert apply_retention(path, 30, date(2026, 2, 2)) == []
