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
