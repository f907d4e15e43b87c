"""EXT streaming operator tests — windows, sessions, stateful tracker.

Streaming variants run over a file stream of log parquet with availableNow;
watermark/late-data behavior asserted on post-checkpoint results.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from klogs_spark.streaming_ext import (
    error_run_tracker,
    session_counts,
    windowed_counts,
)

T0 = datetime(2026, 1, 1, 0, 0, 0)


@pytest.fixture()
def logs_df(spark):
    def row(minute, ns, level):
        return (
            T0 + timedelta(minutes=minute), "prod", ns, "app", f"pod-{ns}",
            "c", "h", {"level": level}, {}, f"{level} at {minute}",
        )

    rows = (
        [row(m, "ns-a", "info") for m in (0, 10, 20, 70, 80)]
        + [row(m, "ns-b", "error") for m in (5, 6, 7, 8, 65)]
        + [row(61, "ns-b", "info")]
    )
    return spark.createDataFrame(
        rows,
        "timestamp timestamp, cluster string, namespace string, app string, "
        "pod_name string, container_name string, host string, "
        "fields_string map<string,string>, fields_number map<string,double>, "
        "log string",
    )


def test_windowed_counts_batch(logs_df):
    out = {
        (r.window_start, r.namespace): r.cnt
        for r in windowed_counts(logs_df, "1 hour").collect()
    }
    assert out[(T0, "ns-a")] == 3
    assert out[(T0 + timedelta(hours=1), "ns-a")] == 2
    assert out[(T0, "ns-b")] == 4
    assert out[(T0 + timedelta(hours=1), "ns-b")] == 2


def test_session_counts_batch(logs_df):
    out = {
        (r.pod_name, r.session_start): r.n_events
        for r in session_counts(logs_df, gap="30 minutes").collect()
    }
    # ns-a: 0,10,20 in one session; 70,80 in another
    assert out[("pod-ns-a", T0)] == 3
    assert out[("pod-ns-a", T0 + timedelta(minutes=70))] == 2
    # ns-b: 5-8 one session; 61,65 another
    assert out[("pod-ns-b", T0 + timedelta(minutes=5))] == 4
    assert out[("pod-ns-b", T0 + timedelta(minutes=61))] == 2


def test_error_run_tracker_batch(logs_df):
    rows = sorted(
        error_run_tracker(logs_df, threshold=3).collect(),
        key=lambda r: r.timestamp,
    )
    assert [(r.namespace, r.error_run) for r in rows] == [
        ("ns-b", 3), ("ns-b", 4),
    ]


def test_windowed_counts_streaming_with_watermark(spark, logs_df, tmp_path):
    src = str(tmp_path / "src")
    logs_df.write.parquet(src)
    stream = spark.readStream.schema(logs_df.schema).parquet(src)
    q = (
        windowed_counts(stream, "1 hour", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-finalized windows: max event time is
    # 01:20, watermark 01:10 -> the 00:00-01:00 windows are final
    got = {
        (r.window_start, r.namespace): r.cnt
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    assert got == {(T0, "ns-a"): 3, (T0, "ns-b"): 4}


def test_error_run_tracker_streaming(spark, logs_df, tmp_path):
    src = str(tmp_path / "src")
    logs_df.write.parquet(src)
    stream = spark.readStream.schema(logs_df.schema).parquet(src)
    q = (
        error_run_tracker(stream, threshold=3)
        .writeStream.format("memory")
        .queryName("err_runs")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        spark.sql("SELECT * FROM err_runs").collect(), key=lambda r: r.timestamp
    )
    assert [(r.namespace, r.error_run) for r in rows] == [
        ("ns-b", 3), ("ns-b", 4),
    ]
