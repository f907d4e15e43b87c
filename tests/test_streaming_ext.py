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


def test_stream_left_outer_interval_join_emits_unmatched(spark, tmp_path):
    """A left row with no interval match must emit with NULL right columns
    once the watermark passes its match window — and matched rows must
    never also emit a null twin."""
    from pyspark.sql import functions as F

    base = str(tmp_path)
    err_src, clk_src = f"{base}/errors", f"{base}/clicks"
    ckpt, outp = f"{base}/ckpt", f"{base}/out"

    def write(src, schema_cols, rows):
        spark.createDataFrame(rows, schema_cols).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def drain():
        errors = (
            spark.readStream.schema("err_ts timestamp, user_id long")
            .parquet(err_src)
            .withWatermark("err_ts", "10 minutes")
        )
        clicks = (
            spark.readStream.schema("click_ts timestamp, click_user long")
            .parquet(clk_src)
            .withWatermark("click_ts", "10 minutes")
        )
        joined = errors.join(
            clicks,
            (F.col("user_id") == F.col("click_user"))
            & (F.col("click_ts")
               >= F.col("err_ts") - F.expr("INTERVAL 30 MINUTES"))
            & (F.col("click_ts") <= F.col("err_ts")),
            "leftOuter",
        ).select("user_id", "err_ts", "click_ts")
        q = (
            joined.writeStream.outputMode("append")
            .format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # user 1: error at 10:00 with a click at 09:50 (match);
    # user 2: error at 10:00, nearest click 2h earlier (no match)
    write(err_src, "err_ts timestamp, user_id long",
          [(T0.replace(hour=10), 1), (T0.replace(hour=10), 2)])
    write(clk_src, "click_ts timestamp, click_user long",
          [(T0.replace(hour=9, minute=50), 1), (T0.replace(hour=8), 2)])
    drain()
    for days in (1, 2):  # sentinel batches advance + apply the watermark
        ts = T0 + timedelta(days=days)
        write(err_src, "err_ts timestamp, user_id long", [(ts, -1)])
        write(clk_src, "click_ts timestamp, click_user long", [(ts, -1)])
        drain()

    rows = sorted(
        (r.user_id, r.click_ts)
        for r in spark.read.parquet(outp).filter("user_id >= 0").collect()
    )
    assert rows == [
        (1, T0.replace(hour=9, minute=50)),  # matched, exactly once
        (2, None),                           # unmatched -> null emission
    ]


def test_upsert_sink_batch_replay_is_idempotent(spark, tmp_path):
    """At-least-once contract of the streaming upsert sink: re-delivering
    the SAME micro-batch must leave the table state unchanged (the merge
    re-replaces identical keys with identical rows)."""
    from pyspark.sql import functions as F

    from klogs_spark.manifest import publish_snapshot, read_logs_at
    from klogs_spark.streaming_ext import upsert_logs_sink
    from klogs_spark.table import write_logs
    from klogs_spark.views import derive_logs_from_events

    logs = derive_logs_from_events(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "t")
    write_logs(logs.filter(F.col("timestamp") < "2024-01-03"), path)
    publish_snapshot(spark, path)

    batch = (
        logs.filter(
            (F.col("timestamp") >= "2024-01-02")
            & (F.col("timestamp") < "2024-01-04")
        )
        .withColumn("log", F.concat(F.col("log"), F.lit(" [v2]")))
    )
    sink = upsert_logs_sink(path, key_cols=["timestamp"])
    sink(batch, 0)
    state1 = sorted(
        (str(r.timestamp), r.log)
        for r in read_logs_at(spark, path).select("timestamp", "log").collect()
    )
    sink(batch, 1)  # replay
    state2 = sorted(
        (str(r.timestamp), r.log)
        for r in read_logs_at(spark, path).select("timestamp", "log").collect()
    )
    assert state1 == state2
    n_v2 = batch.count()
    assert sum(1 for _, log in state2 if log.endswith(" [v2]")) == n_v2


def test_gdpr_delete_sink_applies_and_replays_idempotently(spark, tmp_path):
    """The streaming right-to-be-forgotten sink: a batch of requests
    applies as ONE merge-on-read delete (zero data files touched), and a
    REPLAYED batch (at-least-once) finds its rows already
    vector-deleted, so it no-ops without even publishing a version."""
    import glob
    import os

    from pyspark.sql import functions as F

    from klogs_spark.manifest import (
        publish_snapshot,
        read_logs_at,
        snapshot_versions,
    )
    from klogs_spark.streaming_ext import gdpr_delete_sink
    from klogs_spark.table import write_logs
    from klogs_spark.views import derive_logs_from_events

    logs = derive_logs_from_events(spark, "/root/testdata/sf0.001").filter(
        F.col("timestamp") < "2024-01-03"
    )
    path = str(tmp_path / "t")
    write_logs(logs, path)
    publish_snapshot(spark, path)
    total = read_logs_at(spark, path).count()
    n7 = logs.filter("pod_name = 'pod-7'").count()
    files = {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/date=*/*.parquet")
    }

    sink = gdpr_delete_sink(path, key_col="pod_name")
    batch = spark.createDataFrame([("pod-7",)], "pod_name string")
    sink(batch, 0)
    assert read_logs_at(spark, path).count() == total - n7
    v_after = snapshot_versions(spark, path)[-1]
    # replay: same requests again — no rows left to delete, no version
    sink(batch, 0)
    assert snapshot_versions(spark, path)[-1] == v_after
    assert read_logs_at(spark, path).count() == total - n7
    # zero data files touched by any of it
    assert {
        f: os.path.getmtime(f)
        for f in glob.glob(f"{path}/date=*/*.parquet")
    } == files
    # empty batch short-circuits
    sink(spark.createDataFrame([], "pod_name string"), 1)
    assert snapshot_versions(spark, path)[-1] == v_after


def test_cdc_rollup_sink_recovers_from_crashed_predecessor_lock(
    spark, tmp_path
):
    """Crash-restart contract of the streaming CDF consumer (review
    r19): a driver killed mid-advance leaves the rollup lock behind;
    the restarted stream's replayed batch must reclaim its OWN dead
    predecessor's lock and converge — a FOREIGN maintainer's live lock
    still refuses loudly."""
    import json

    import pytest
    from pyspark.sql import functions as F

    from klogs_spark.streaming_ext import cdc_rollup_sink
    from klogs_spark.table import (
        ROLLUP_LOCK,
        ConcurrentRollupError,
        read_rollup,
    )
    from klogs_spark.views import derive_logs_from_events

    logs = derive_logs_from_events(spark, "/root/testdata/sf0.001").filter(
        F.col("timestamp") < "2024-01-03"
    )
    path, rdir = str(tmp_path / "t"), str(tmp_path / "r")
    sink = cdc_rollup_sink(path, rdir)
    sink(logs.filter(F.col("timestamp") < "2024-01-02"), 0)
    n1 = read_rollup(spark, rdir).agg(F.sum("n_rows")).first()[0]
    assert n1 == logs.filter(F.col("timestamp") < "2024-01-02").count()

    # the previous driver died holding the lock: same owner identity
    (tmp_path / "r" / ROLLUP_LOCK).write_text(
        json.dumps({"op": "incremental_rollup",
                    "owner": f"cdc_rollup_sink:{path}"})
    )
    day2 = logs.filter(F.col("timestamp") >= "2024-01-02")
    sink(day2, 1)  # the replayed batch reclaims and advances
    assert not (tmp_path / "r" / ROLLUP_LOCK).exists()
    assert read_rollup(spark, rdir).agg(
        F.sum("n_rows")
    ).first()[0] == logs.count()

    # a DIFFERENT maintainer's live lock is NOT stolen
    (tmp_path / "r" / ROLLUP_LOCK).write_text(
        json.dumps({"op": "incremental_rollup", "owner": "nightly-job"})
    )
    with pytest.raises(ConcurrentRollupError):
        sink(logs.limit(5), 2)
