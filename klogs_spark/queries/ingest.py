"""Ingest-pipeline parity check — the decode hot path against the oracle.

Builds raw Fluent-Bit-shaped JSON events from the ``events`` table (nested
kubernetes metadata, typed content fields, arrays, bools, dotted keys, nulls),
pushes them through the REAL decode stage (mapInPandas flatten + type dispatch
+ timestamp extraction + envelope routing, klogs_spark.decode), and aggregates
the decoded logs. The DuckDB oracle computes the expected aggregate directly
from ``events`` — equality proves the whole P1-P8 pipeline (SURVEY §2.2)
produces exactly the rows the reference's Go hot path (main.go:240-355) would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import EngineConfig
from ..decode import decode_dataframe
from ..transform import field_number, field_string, has_field
from ..views import load_table
from . import QuerySpec


def _raw_json_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events -> one JSON line per record, F-RAW shape (FIXTURES.md)."""
    ev = load_table(spark, sf_dir, "events")
    level = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "signup", "warn")
        .otherwise("info")
    )
    record = F.struct(
        F.lit("prod").alias("cluster"),
        F.struct(
            F.concat(F.lit("ns-"), (F.col("user_id") % 5).cast("string")).alias(
                "namespace_name"
            ),
            F.concat(F.lit("pod-"), (F.col("user_id") % 50).cast("string")).alias(
                "pod_name"
            ),
            F.lit("c").alias("container_name"),
            F.concat(F.lit("node-"), (F.col("user_id") % 8).cast("string")).alias(
                "host"
            ),
            F.struct(F.col("event_type").alias("k8s-app")).alias("labels"),
        ).alias("kubernetes"),
        F.concat(F.lit("type="), F.col("event_type")).alias("log"),
        F.struct(
            level.alias("level"),
            F.col("value").alias("value"),
            F.get_json_object(F.col("props"), "$.k").alias("k"),
            F.array(F.lit("x"), F.lit("y")).alias("tags"),
            (F.col("user_id") % 4 == 0).alias("flag"),
        ).alias("content"),
        F.lit("v").alias("dotted.key"),
    )
    return ev.select(
        F.to_json(
            F.struct(
                F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS").alias("ts"),
                record.alias("record"),
            )
        ).alias("value")
    )


def q_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw JSON -> decode_dataframe -> per-app aggregate over decoded rows.

    Exercises: ISO event-time extraction (S2), recursive flatten with nested
    maps + arrays (P1), bool/number/string dispatch (P2), envelope routing
    with k8s-app aliasing (P3), Force_Underscores on a dotted key (P4),
    Force_Number_Fields coercion of the stringly 'k' (P5), null-drop via
    to_json's null omission (P6), map-key projections on the result (P9).
    """
    raw = _raw_json_events(spark, sf_dir)
    cfg = EngineConfig(force_number_fields=["content_k"], force_underscores=True)
    decoded = decode_dataframe(raw, cfg)
    return (
        decoded.groupBy("app")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.min("timestamp").alias("min_ts"),
            F.max("timestamp").alias("max_ts"),
            F.round(F.sum(field_number("content_value")), 2).alias("sum_value"),
            F.round(F.sum(field_number("content_k")), 2).alias("sum_k"),
            F.sum(
                F.when(field_string("content_level") == "error", 1).otherwise(0)
            ).alias("n_error"),
            F.sum(
                F.when(field_string("content_flag") == "true", 1).otherwise(0)
            ).alias("n_flag"),
            F.sum(
                F.when(field_string("content_tags_1") == "y", 1).otherwise(0)
            ).alias("n_tag1"),
            F.sum(F.when(has_field("fields_string", "dotted_key"), 1).otherwise(0))
            .alias("n_dotted"),
            F.count_distinct(F.col("namespace")).alias("n_namespaces"),
        )
    )


SQL_INGEST_PIPELINE = """
SELECT event_type AS app,
       count(*) AS cnt,
       min(ts) AS min_ts,
       max(ts) AS max_ts,
       round(sum(value), 2) AS sum_value,
       round(sum(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2)
         AS sum_k,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_error,
       CAST(sum(CASE WHEN user_id % 4 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_flag,
       count(*) AS n_tag1,
       count(*) AS n_dotted,
       count(DISTINCT 'ns-' || CAST(user_id % 5 AS VARCHAR)) AS n_namespaces
FROM events
GROUP BY event_type
"""


SPECS = {
    "ingest_decode_pipeline": QuerySpec(
        q_ingest_pipeline,
        SQL_INGEST_PIPELINE,
        "full decode hot path (flatten/dispatch/routing) vs direct oracle",
    ),
}
