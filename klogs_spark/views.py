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
    Conditionally-present map keys (null elimination P6, reference
    main.go:312) are built as a presence CASE over create_map branches —
    one codegen'd map allocation per row in original key order — instead
    of map_filter over a 3-entry map, whose higher-order lambda does not
    participate in whole-stage codegen (interleaved in-session A/B at
    sf0.1: derive+noop median 1.016s -> 0.633s, row-identical incl. NULL
    value/k/latency elimination; r22)."""
    ev = load_table(spark, sf_dir, "events")
    level = (
        F.when(F.col("event_type") == "error", "error")
        .when(F.col("event_type") == "signup", "warn")
        .otherwise("info")
    )
    k_str = F.get_json_object(F.col("props"), "$.k")
    k_num = k_str.try_cast("double")
    latency = F.when(
        F.col("event_type").isin("click", "view"), F.col("value") * 10
    )
    flag = F.when(F.col("user_id") % 3 == 0, F.lit("on"))
    source = F.concat(F.lit("src-"), (F.col("user_id") % 10).cast("string"))
    # level/source are never null; flag is the only conditional string key
    fields_string = F.when(
        flag.isNotNull(),
        F.create_map(
            F.lit("level"), level, F.lit("source"), source, F.lit("flag"), flag
        ),
    ).otherwise(F.create_map(F.lit("level"), level, F.lit("source"), source))
    # all three number keys are conditional: enumerate the presence mask so
    # each branch allocates exactly the entries map_filter would have kept
    a, b, c = F.col("value").isNotNull(), k_num.isNotNull(), latency.isNotNull()
    m = F.create_map
    val = F.col("value")
    fields_number = (
        F.when(a & b & c, m(F.lit("value"), val, F.lit("k"), k_num,
                            F.lit("latency_ms"), latency))
        .when(a & b, m(F.lit("value"), val, F.lit("k"), k_num))
        .when(a & c, m(F.lit("value"), val, F.lit("latency_ms"), latency))
        .when(b & c, m(F.lit("k"), k_num, F.lit("latency_ms"), latency))
        .when(a, m(F.lit("value"), val))
        .when(b, m(F.lit("k"), k_num))
        .when(c, m(F.lit("latency_ms"), latency))
        .otherwise(F.create_map().cast("map<string,double>"))
    )
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
        fields_string.alias("fields_string"),
        fields_number.alias("fields_number"),
        F.concat(
            F.lit("type="), F.col("event_type"),
            F.lit(" user="), F.col("user_id").cast("string"),
            F.lit(" k="), k_str,
            F.when(F.col("event_type") == "error", " error occurred").otherwise(
                " ok"
            ),
        ).alias("log"),
    ).select(*LOG_COLUMNS)
