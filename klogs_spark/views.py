"""Deterministic logs-shaped view derived from the driver's ``events`` table.

The driver testdata (TESTDATA.md) has no logs fixture, so the correctness gate
for the klogs query surface runs over a logs view derived 1:1 from
``events.parquet``. The SAME derivation is inlined (as scalar columns) in the
DuckDB oracle CTE (queries/logs.py:LOGS_CTE) — Spark answers map-typed queries
over this view, DuckDB answers the equivalent scalar queries, values must
hash-match.

The derivation deliberately exercises the reference data model (SURVEY §1):
dynamic string/number maps with conditionally-present keys (F5), a numeric
field parsed from JSON (P5-style coercion), and a raw ``log`` line carrying a
substring marker for full-text filters (F6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import LOG_COLUMNS


# Driver parquet has shipped two timestamp encodings across rounds:
#   * INT64 TIMESTAMP(NANOS), which Spark refuses by default — read as longs
#     (legacy conf) and restore TimestampType via integer division (ns epoch
#     > 2^53; double division would lose precision, `div` truncates exactly
#     like DuckDB's ns->µs cast);
#   * plain timestamp[us] with no UTC flag, which Spark 4 infers as
#     TIMESTAMP_NTZ — cast to TIMESTAMP_LTZ so every downstream expression
#     (`.cast("long")`, unix_timestamp, window()) sees the same LTZ type the
#     query surface was verified against. Sessions here run with
#     spark.sql.session.timeZone=UTC, so the NTZ->LTZ cast is wall-clock
#     identity and hashes match the DuckDB oracle, which treats naive
#     timestamps as UTC.
_TIMESTAMP_COLS = {
    "events": ["ts"],
    "orders": ["o_orderdate"],
    "lineitem": ["l_shipdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for c in _TIMESTAMP_COLS.get(name, []):
        if dtypes.get(c) == "bigint":
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp_ltz"))
    return df


def derive_logs_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) -> LOG_SCHEMA.

    Mirrors queries/logs.py:LOGS_CTE exactly — keep the two in sync.
    Conditionally-present map keys are built with map_filter over null values
    (null elimination P6, reference main.go:312).
    """
    ev = load_table(spark, sf_dir, "events")
    level = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "signup", "warn")
        .otherwise("info")
    )
    k_str = F.get_json_object(F.col("props"), "$.k")
    latency = F.when(
        F.col("event_type").isin("click", "view"), F.col("value") * 10
    )
    flag = F.when(F.col("user_id") % 3 == 0, F.lit("on"))
    return ev.select(
        F.col("ts").alias("timestamp"),
        F.lit("prod").alias("cluster"),
        F.concat(F.lit("ns-"), (F.col("user_id") % 5).cast("string")).alias(
            "namespace"
        ),
        F.col("event_type").alias("app"),
        F.concat(F.lit("pod-"), (F.col("user_id") % 50).cast("string")).alias(
            "pod_name"
        ),
        F.concat(F.lit("c-"), F.col("event_type")).alias("container_name"),
        F.concat(F.lit("node-"), (F.col("user_id") % 8).cast("string")).alias("host"),
        F.map_filter(
            F.create_map(
                F.lit("level"), level,
                F.lit("source"),
                F.concat(F.lit("src-"), (F.col("user_id") % 10).cast("string")),
                F.lit("flag"), flag,
            ),
            lambda _, v: v.isNotNull(),
        ).alias("fields_string"),
        F.map_filter(
            F.create_map(
                F.lit("value"), F.col("value"),
                F.lit("k"), k_str.try_cast("double"),
                F.lit("latency_ms"), latency,
            ),
            lambda _, v: v.isNotNull(),
        ).alias("fields_number"),
        F.concat(
            F.lit("type="), F.col("event_type"),
            F.lit(" user="), F.col("user_id").cast("string"),
            F.lit(" k="), k_str,
            F.when(F.col("event_type") == "error", " error occurred").otherwise(
                " ok"
            ),
        ).alias("log"),
    ).select(*LOG_COLUMNS)
