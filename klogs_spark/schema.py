"""Schemas — the logs table row type and raw-event shapes.

Reference: /root/reference/schema.sql:3-15 (ClickHouse DDL) and the Go row
struct pkg/clickhouse/clickhouse.go:16-27. SURVEY.md §1.1 maps every column.
"""

from __future__ import annotations

from pyspark.sql.types import (
    DoubleType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The one logical table of the reference (schema.sql:3-15).
# timestamp is DateTime64(3) in ClickHouse; Spark TimestampType is µs — lossless.
LOG_SCHEMA = StructType(
    [
        StructField("timestamp", TimestampType(), False),
        StructField("cluster", StringType(), True),
        StructField("namespace", StringType(), True),
        StructField("app", StringType(), True),
        StructField("pod_name", StringType(), True),
        StructField("container_name", StringType(), True),
        StructField("host", StringType(), True),
        StructField("fields_string", MapType(StringType(), StringType()), True),
        StructField("fields_number", MapType(StringType(), DoubleType()), True),
        StructField("log", StringType(), True),
    ]
)

# Column order of the reference INSERT statement (clickhouse.go:76).
LOG_COLUMNS = [f.name for f in LOG_SCHEMA.fields]

# Sort/cluster key of the reference table (schema.sql:18) — used by
# table.write_logs via sortWithinPartitions for row-group data skipping.
CLUSTER_KEY = [
    "cluster",
    "namespace",
    "app",
    "pod_name",
    "container_name",
    "host",
    "timestamp",
]

# Partition column derived at write time: toDate(timestamp), schema.sql:17.
PARTITION_COLUMN = "date"

# Envelope routing table: flattened-key -> logs column.
# Reference main.go:313-328 (exact key matches on the flattened record).
ENVELOPE_KEYS = {
    "cluster": "cluster",
    "kubernetes_namespace_name": "namespace",
    "kubernetes_pod_name": "pod_name",
    "kubernetes_container_name": "container_name",
    "kubernetes_host": "host",
    "log": "log",
}
# `app` has 2-way aliasing (main.go:318-321): kubernetes_labels_k8s-app and
# kubernetes_labels_app both route to `app`. Go map iteration makes the winner
# nondeterministic when both are present; we deterministically prefer k8s-app
# (documented deviation, SURVEY §7 step 1).
APP_KEY_PRIMARY = "kubernetes_labels_k8s-app"
APP_KEY_FALLBACK = "kubernetes_labels_app"
