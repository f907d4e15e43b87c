"""Source-stage tests — CRI/docker parsing, multiline reassembly, enrichment."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from klogs_spark.sources import (
    enrich_with_pod_metadata,
    inject_static_fields,
    parse_cri_lines,
    parse_docker_json_lines,
    reassemble_multiline,
)


def test_parse_cri_and_reassemble(spark, tmp_path):
    lines = [
        "2024-01-01T00:00:00.1Z stdout P part-one ",
        "2024-01-01T00:00:00.2Z stdout P part-two ",
        "2024-01-01T00:00:00.3Z stdout F final",
        "2024-01-01T00:00:01.0Z stdout F single line",
        "2024-01-01T00:00:02.0Z stderr F err line",
        "not a cri line at all",
    ]
    p = tmp_path / "c.log"
    p.write_text("\n".join(lines) + "\n")
    raw = spark.read.text(str(p))
    parsed = parse_cri_lines(raw)
    assert parsed.count() == 5  # junk line dropped
    out = {(r.stream, r.log) for r in reassemble_multiline(parsed).collect()}
    assert ("stdout", "part-one part-two final") in out
    assert ("stdout", "single line") in out
    assert ("stderr", "err line") in out


def test_parse_docker_json(spark, tmp_path):
    lines = [
        json.dumps({"log": "hello\n", "stream": "stdout",
                    "time": "2024-01-01T00:00:00.1Z"}),
        json.dumps({"log": "partial...", "stream": "stdout",
                    "time": "2024-01-01T00:00:00.2Z"}),
        json.dumps({"log": "done\n", "stream": "stdout",
                    "time": "2024-01-01T00:00:00.3Z"}),
        "garbage",
    ]
    p = tmp_path / "d.log"
    p.write_text("\n".join(lines) + "\n")
    parsed = parse_docker_json_lines(spark.read.text(str(p)))
    rows = sorted(parsed.collect(), key=lambda r: r.log_time)
    assert [r.flag for r in rows] == ["F", "P", "F"]
    merged = {r.log for r in reassemble_multiline(parsed).collect()}
    assert merged == {"hello", "partial...done"}


def test_enrich_with_pod_metadata_broadcasts(spark):
    logs = spark.createDataFrame(
        [("p1", "line a"), ("p2", "line b"), ("p3", "orphan")],
        "pod_name string, log string",
    )
    meta = spark.createDataFrame(
        [("p1", "ns-a", "web"), ("p2", "ns-b", "api")],
        "pod_name string, namespace string, app string",
    )
    out = enrich_with_pod_metadata(logs, meta)
    got = {r.pod_name: (r.namespace, r.app) for r in out.collect()}
    assert got["p1"] == ("ns-a", "web")
    assert got["p3"] == (None, None)  # left join keeps orphans
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_inject_static_fields(spark):
    df = spark.createDataFrame([("x",)], "log string")
    out = inject_static_fields(df, cluster="kind", zone="z1")
    row = out.collect()[0]
    assert row.cluster == "kind" and row.zone == "z1"


def test_parse_syslog_rfc5424(spark):
    lines = [
        "<134>1 2024-01-07T06:00:00.000001Z node-1 web 42 - - hello world",
        "<131>1 2024-01-07T06:00:01.000001Z node-2 api - MSG7 "
        "[sd@1 k=\"v\"] boom",
        "not syslog at all",
    ]
    from klogs_spark.sources import parse_syslog_lines

    raw = spark.createDataFrame([(l,) for l in lines], "value string")
    rows = {r.host: r for r in parse_syslog_lines(raw).collect()}
    assert set(rows) == {"node-1", "node-2"}  # junk dropped
    a = rows["node-1"]
    assert (a.format, a.pri, a.facility, a.severity) == ("rfc5424", 134, 16, 6)
    assert (a.app, a.procid, a.content) == ("web", "42", "hello world")
    b = rows["node-2"]
    assert b.severity == 3 and b.procid is None  # '-' nil-mapped
    assert b.content == "boom"  # structured-data block stripped


def test_parse_syslog_rfc3164_fallback(spark):
    from klogs_spark.sources import parse_syslog_lines

    raw = spark.createDataFrame(
        [
            ("<13>Feb 05 17:32:18 host1 su[1234]: auth ok",),
            ("<13>Feb  5 17:32:18 host2 cron: tick",),  # space-padded day, no pid
        ],
        "value string",
    )
    rows = {r.host: r for r in parse_syslog_lines(raw).collect()}
    a = rows["host1"]
    assert (a.format, a.facility, a.severity) == ("rfc3164", 1, 5)
    assert (a.app, a.procid, a.content) == ("su", "1234", "auth ok")
    assert a.log_time == "Feb 05 17:32:18"
    b = rows["host2"]
    assert (b.app, b.procid, b.content) == ("cron", None, "tick")


def test_throttle_per_key(spark):
    from klogs_spark.sources import throttle_per_key

    rows = [
        # 4 records in one (ns-a, hour) bucket, 1 in the next hour
        ("ns-a", "2024-01-01 00:00:01", 1),
        ("ns-a", "2024-01-01 00:10:00", 2),
        ("ns-a", "2024-01-01 00:20:00", 3),
        ("ns-a", "2024-01-01 00:30:00", 4),
        ("ns-a", "2024-01-01 01:05:00", 5),
        ("ns-b", "2024-01-01 00:00:02", 6),
    ]
    df = spark.createDataFrame(rows, "namespace string, t string, id long")
    df = df.select("namespace", F.col("t").cast("timestamp").alias("ts"), "id")
    out = throttle_per_key(
        df, keys=("namespace",), time_col="ts", bucket="1 hour",
        limit=2, tiebreak=("id",),
    )
    kept = sorted(r.id for r in out.filter("kept").collect())
    dropped = sorted(r.id for r in out.filter("NOT kept").collect())
    assert kept == [1, 2, 5, 6]  # first 2 per bucket; new hour resets
    assert dropped == [3, 4]
    assert out.count() == len(rows)  # audit form keeps every row


def test_parse_syslog_property_roundtrip(spark):
    """Property: synthesized RFC 5424 lines parse back to their parts —
    catches regex edge cases (empty msg, spaces/brackets in msg, pri
    boundaries) that fixed fixtures miss."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from klogs_spark.sources import parse_syslog_lines

    word = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz0123456789.-", min_size=1,
        max_size=12,
    ).filter(lambda s: s != "-")
    msg = st.text(
        alphabet="abcdefghijklmnopqrstuvwxyz []{}=:,", max_size=40
    )

    @given(
        st.integers(min_value=0, max_value=191), word, word,
        st.integers(min_value=1, max_value=99999), msg,
    )
    @settings(max_examples=30, deadline=None, derandomize=True,
              suppress_health_check=list(HealthCheck))
    def check(pri, host, app, pid, message):
        line = (f"<{pri}>1 2024-01-07T06:00:00.000001Z {host} {app} {pid} "
                f"- - {message}")
        raw = spark.createDataFrame([(line,)], "value string")
        rows = parse_syslog_lines(raw).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.pri, r.facility, r.severity) == (pri, pri // 8, pri % 8)
        assert (r.host, r.app, r.procid) == (host, app, str(pid))
        assert r.content == message

    check()
