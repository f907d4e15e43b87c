"""klogs query-surface parity checks (SURVEY §2.3/2.5/2.7/2.9).

Spark runs each query through the real engine API (views.derive_logs_from_events
-> LogsQuery / transform helpers, i.e. map-typed columns); the DuckDB oracle
inlines the identical derivation as flat scalar columns (LOGS_CTE) and answers
with plain SQL. Equal results prove the map-based data model computes the same
answers as the reference's ClickHouse surface would.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..query import LogsQuery
from ..transform import field_number, field_string, has_field, promote_string_field
from ..views import derive_logs_from_events
from . import QuerySpec

# Keep in sync with views.derive_logs_from_events.
LOGS_CTE = """
WITH logs AS (
  SELECT
    ts AS "timestamp",
    'prod' AS cluster,
    'ns-' || CAST(user_id % 5 AS VARCHAR) AS namespace,
    event_type AS app,
    'pod-' || CAST(user_id % 50 AS VARCHAR) AS pod_name,
    'c-' || event_type AS container_name,
    'node-' || CAST(user_id % 8 AS VARCHAR) AS host,
    CASE WHEN event_type = 'error' THEN 'error'
         WHEN event_type = 'signup' THEN 'warn'
         ELSE 'info' END AS f_level,
    'src-' || CAST(user_id % 10 AS VARCHAR) AS f_source,
    CASE WHEN user_id % 3 = 0 THEN 'on' END AS f_flag,
    value AS f_value,
    TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS f_k,
    CASE WHEN event_type IN ('click','view') THEN value * 10 END AS f_latency_ms,
    'type=' || event_type || ' user=' || CAST(user_id AS VARCHAR)
      || ' k=' || json_extract_string(props, '$.k')
      || CASE WHEN event_type = 'error' THEN ' error occurred' ELSE ' ok' END AS log
  FROM events
)
"""

_T0, _T1 = "2024-01-05 00:00:00", "2024-01-15 00:00:00"


def _logs(spark: SparkSession, sf_dir: str) -> LogsQuery:
    return LogsQuery(derive_logs_from_events(spark, sf_dir))


# --- F1+F2+F3+A1: the canonical klogs question (SURVEY §7 step 2) -----------
def q_env_map_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _logs(spark, sf_dir)
        .time_range(_T0, _T1)
        .where_env(namespace="ns-1")
        .where_field_eq("level", "error")
        .count_all()
    )


SQL_ENV_MAP_COUNT = LOGS_CTE + f"""
SELECT count(*) AS cnt FROM logs
WHERE "timestamp" BETWEEN '{_T0}' AND '{_T1}'
  AND namespace = 'ns-1' AND f_level = 'error'
"""


# --- F4+A4: numeric aggregates over a dynamic field -------------------------
def q_number_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = (
        _logs(spark, sf_dir)
        .where_number("value", ">", 100.0)
        .number_stats("value", "namespace")
    )
    return df.select(
        "namespace",
        "cnt",
        F.round("avg_v", 4).alias("avg_v"),
        F.round("min_v", 2).alias("min_v"),
        F.round("max_v", 2).alias("max_v"),
        F.round("sum_v", 2).alias("sum_v"),
    )


SQL_NUMBER_STATS = LOGS_CTE + """
SELECT namespace,
       count(f_value) AS cnt,
       round(avg(f_value), 4) AS avg_v,
       round(min(f_value), 2) AS min_v,
       round(max(f_value), 2) AS max_v,
       round(sum(f_value), 2) AS sum_v
FROM logs WHERE f_value > 100.0
GROUP BY namespace
"""


# --- F5: map-key existence --------------------------------------------------
def q_field_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _logs(spark, sf_dir).where_exists("flag").count_by("app")


SQL_FIELD_EXISTS = LOGS_CTE + """
SELECT app, count(*) AS cnt FROM logs WHERE f_flag IS NOT NULL GROUP BY app
"""


# --- F6: full-text substring on the raw line --------------------------------
def q_fulltext(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _logs(spark, sf_dir).where_log_contains("error occurred").count_by(
        "namespace"
    )


SQL_FULLTEXT = LOGS_CTE + """
SELECT namespace, count(*) AS cnt FROM logs
WHERE log LIKE '%error occurred%' GROUP BY namespace
"""


# --- F6 regex variant -------------------------------------------------------
def q_log_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _logs(spark, sf_dir).where_log_rlike("user=1[0-9] ").count_by("app")


SQL_LOG_REGEX = LOGS_CTE + """
SELECT app, count(*) AS cnt FROM logs
WHERE regexp_matches(log, 'user=1[0-9] ') GROUP BY app
"""


# --- A2: hourly log-volume histogram ----------------------------------------
def q_hourly_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _logs(spark, sf_dir).time_range(_T0, "2024-01-08 00:00:00").df
    return (
        df.groupBy(F.date_trunc("hour", F.col("timestamp")).alias("bucket_start"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_HOURLY_HISTOGRAM = LOGS_CTE + f"""
SELECT date_trunc('hour', "timestamp") AS bucket_start, count(*) AS cnt
FROM logs
WHERE "timestamp" BETWEEN '{_T0}' AND '2024-01-08 00:00:00'
GROUP BY 1
"""


# --- A2 via native window(): 5-minute tumbling buckets ----------------------
def q_window_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Spark-native window() bucketing (epoch-aligned tumbling windows);
    oracle reproduces the alignment with pure epoch arithmetic."""
    df = _logs(spark, sf_dir).time_range(_T0, "2024-01-06 00:00:00").df
    w = F.window(F.col("timestamp"), "5 minutes")
    return (
        df.groupBy(w.alias("w"), "namespace")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col("w.end").alias("bucket_end"),
            "namespace",
            "cnt",
        )
    )


SQL_WINDOW_5M = LOGS_CTE + f"""
SELECT TIMESTAMP '1970-01-01'
         + to_seconds(CAST(floor(epoch("timestamp") / 300) * 300 AS BIGINT))
         AS bucket_start,
       TIMESTAMP '1970-01-01'
         + to_seconds(CAST(floor(epoch("timestamp") / 300) * 300 + 300 AS BIGINT))
         AS bucket_end,
       namespace, count(*) AS cnt
FROM logs
WHERE "timestamp" BETWEEN '{_T0}' AND '2024-01-06 00:00:00'
GROUP BY 1, 2, namespace
"""


# --- A3: per-namespace/app counts -------------------------------------------
def q_env_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _logs(spark, sf_dir).count_by("namespace", "app")


SQL_ENV_COUNTS = LOGS_CTE + """
SELECT namespace, app, count(*) AS cnt FROM logs GROUP BY namespace, app
"""


# --- A4 on the JSON-parsed field (P5 coercion path) -------------------------
def q_parsed_field_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _logs(spark, sf_dir).df
    v = field_number("k")
    return (
        df.filter(v.isNotNull())
        .groupBy("app")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg(v), 4).alias("avg_k"),
            F.round(F.sum(v), 2).alias("sum_k"),
        )
    )


SQL_PARSED_FIELD_STATS = LOGS_CTE + """
SELECT app, count(*) AS cnt,
       round(avg(f_k), 4) AS avg_k, round(sum(f_k), 2) AS sum_k
FROM logs WHERE f_k IS NOT NULL GROUP BY app
"""


# --- logfmt parsing of the raw line (read-path structured extraction) -------
def q_parse_logfmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse the derived ``type=... user=... k=...`` line with str_to_map and
    prove the extracted fields agree with the envelope/maps they came from."""
    from ..transform import parse_logfmt

    df = _logs(spark, sf_dir).df
    parsed = parse_logfmt(F.col("log"))
    return (
        df.withColumn("p", parsed)
        .groupBy("app")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                F.when(F.element_at("p", "type") == F.col("app"), 1).otherwise(0)
            ).alias("n_type_matches"),
            F.round(
                F.sum(F.element_at("p", "user").try_cast("double")), 2
            ).alias("sum_user"),
            F.sum(
                F.when(
                    F.element_at("p", "k").try_cast("double")
                    == F.element_at("fields_number", "k"),
                    1,
                ).otherwise(0)
            ).alias("n_k_matches"),
        )
    )


SQL_PARSE_LOGFMT = LOGS_CTE + """
SELECT app, count(*) AS cnt,
       count(*) AS n_type_matches,
       round(sum(CAST(regexp_extract(log, 'user=([0-9]+)', 1) AS DOUBLE)), 2)
         AS sum_user,
       count(f_k) AS n_k_matches
FROM logs GROUP BY app
"""


# --- Merge_Log: JSON raw lines parsed into the string map -------------------
def q_merge_json_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props (a JSON object string) as the raw log line, merged into
    fields_string by merge_log_json (reference Merge_Log,
    cluster/fluent-bit.yaml:83-84), then queried through the map."""
    from ..transform import merge_log_json
    from ..views import load_table

    ev = load_table(spark, sf_dir, "events")
    logs = ev.select(
        F.col("ts").alias("timestamp"),
        F.col("event_type").alias("app"),
        F.create_map(F.lit("orig"), F.lit("x")).alias("fields_string"),
        F.create_map().cast("map<string,double>").alias("fields_number"),
        F.col("props").alias("log"),
    )
    merged = merge_log_json(logs)
    return merged.groupBy("app").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(
            F.sum(F.element_at("fields_string", "k").try_cast("double")), 2
        ).alias("sum_k"),
        F.sum(
            F.when(F.element_at("fields_string", "orig") == "x", 1).otherwise(0)
        ).alias("n_orig_kept"),
    )


SQL_MERGE_JSON_LOG = """
SELECT event_type AS app, count(*) AS cnt,
       round(sum(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2)
         AS sum_k,
       count(*) AS n_orig_kept
FROM events GROUP BY event_type
"""


# --- schema discovery: which dynamic field keys exist, with what frequency --
def q_field_key_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The "what fields exist?" question a klogs UI asks before offering
    filter autocomplete: every dynamic key with its row count and value type,
    from map_keys explosion over both maps."""
    df = _logs(spark, sf_dir).df
    s = df.select(
        F.explode(F.map_keys(F.col("fields_string"))).alias("key")
    ).withColumn("value_type", F.lit("string"))
    n = df.select(
        F.explode(F.map_keys(F.col("fields_number"))).alias("key")
    ).withColumn("value_type", F.lit("number"))
    return (
        s.unionByName(n)
        .groupBy("key", "value_type")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


SQL_FIELD_KEY_STATS = LOGS_CTE + """
SELECT key, value_type, count(*) AS n_rows FROM (
  SELECT 'level' AS key, 'string' AS value_type FROM logs
  UNION ALL SELECT 'source', 'string' FROM logs
  UNION ALL SELECT 'flag', 'string' FROM logs WHERE f_flag IS NOT NULL
  UNION ALL SELECT 'value', 'number' FROM logs
  UNION ALL SELECT 'k', 'number' FROM logs WHERE f_k IS NOT NULL
  UNION ALL SELECT 'latency_ms', 'number' FROM logs WHERE f_latency_ms IS NOT NULL
) GROUP BY key, value_type
"""


# --- A5: distinct field values ----------------------------------------------
def q_distinct_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _logs(spark, sf_dir).distinct_field_values("source")


SQL_DISTINCT_SOURCES = LOGS_CTE + """
SELECT count(DISTINCT f_source) AS distinct_cnt FROM logs
"""


# --- A7: exact percentiles over a numeric field -----------------------------
def q_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _logs(spark, sf_dir).df
    v = field_number("value")
    return df.filter(v.isNotNull()).agg(
        *[
            F.round(F.expr(f"percentile(element_at(fields_number, 'value'), {q})"), 4).alias(
                f"p{int(q * 100)}"
            )
            for q in (0.5, 0.9, 0.95, 0.99)
        ]
    )


SQL_VALUE_PERCENTILES = LOGS_CTE + """
SELECT round(percentile_cont(0.50) WITHIN GROUP (ORDER BY f_value), 4) AS p50,
       round(percentile_cont(0.90) WITHIN GROUP (ORDER BY f_value), 4) AS p90,
       round(percentile_cont(0.95) WITHIN GROUP (ORDER BY f_value), 4) AS p95,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY f_value), 4) AS p99
FROM logs WHERE f_value IS NOT NULL
"""


# --- A7 grouped: latency percentiles per namespace --------------------------
def q_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = _logs(spark, sf_dir).df
    v = field_number("latency_ms")
    return (
        df.filter(v.isNotNull())
        .groupBy("namespace")
        .agg(
            F.round(
                F.expr("percentile(element_at(fields_number, 'latency_ms'), 0.5)"), 4
            ).alias("p50"),
            F.round(
                F.expr("percentile(element_at(fields_number, 'latency_ms'), 0.99)"), 4
            ).alias("p99"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


SQL_GROUPED_PERCENTILES = LOGS_CTE + """
SELECT namespace,
       round(percentile_cont(0.50) WITHIN GROUP (ORDER BY f_latency_ms), 4) AS p50,
       round(percentile_cont(0.99) WITHIN GROUP (ORDER BY f_latency_ms), 4) AS p99,
       count(*) AS cnt
FROM logs WHERE f_latency_ms IS NOT NULL
GROUP BY namespace
"""


# --- error-rate timeseries (conditional aggregation per bucket) -------------
def q_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily error-rate per namespace — the alerting timeseries every log
    platform derives.  The rate is emitted as integer parts-per-million via
    integer division (Spark ``div`` == DuckDB ``//`` for non-negative longs),
    which is tie-proof: no float rounding is involved, so the cross-engine
    hash can never disagree on a half-boundary (the round-1 red row)."""
    df = _logs(spark, sf_dir).df
    is_err = F.when(field_string("level") == "error", 1).otherwise(0)
    return (
        df.groupBy(
            F.to_date("timestamp").alias("day"),
            "namespace",
        )
        .agg(
            F.count(F.lit(1)).alias("total"),
            F.sum(is_err).alias("n_errors"),
        )
        .withColumn(
            "error_rate_ppm",
            F.expr("CAST((n_errors * CAST(1000000 AS BIGINT)) div total AS BIGINT)"),
        )
    )


SQL_ERROR_RATE = LOGS_CTE + """
SELECT CAST("timestamp" AS DATE) AS day, namespace,
       count(*) AS total,
       CAST(sum(CASE WHEN f_level = 'error' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_errors,
       CAST(sum(CASE WHEN f_level = 'error' THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS error_rate_ppm
FROM logs GROUP BY 1, 2
"""


# --- burn-rate alert (multi-window error-rate comparison) -------------------
def q_burn_rate_alert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRE-style multi-window burn-rate alert: flag every (namespace, hour)
    whose error rate runs at >= 2x the namespace's SAME-DAY baseline rate
    with at least 2 errors in the hour — the standard short-window/
    long-window alerting rule, all in integer ppm (tie-proof cross-engine).

    Scale shape: two aggregations over the stream (hourly and daily); the
    daily baseline is |namespaces x days|-sized, so it broadcasts back onto
    the hourly side — no second event-level shuffle."""
    df = _logs(spark, sf_dir).df
    is_err = F.when(field_string("level") == "error", 1).otherwise(0)
    base = df.select(
        "namespace",
        F.date_trunc("hour", F.col("timestamp")).alias("hour"),
        F.to_date("timestamp").alias("day"),
        is_err.alias("is_err"),
    )
    hourly = base.groupBy("namespace", "hour").agg(
        F.count(F.lit(1)).alias("n_1h"),
        F.sum("is_err").alias("err_1h"),
    )
    daily = base.groupBy("namespace", "day").agg(
        F.count(F.lit(1)).alias("n_1d"),
        F.sum("is_err").alias("err_1d"),
    )
    ppm = "CAST(({n} * CAST(1000000 AS BIGINT)) div greatest({d}, 1) AS BIGINT)"
    daily = daily.select(
        F.col("namespace").alias("d_namespace"), "day", "n_1d", "err_1d"
    )
    joined = hourly.join(
        F.broadcast(daily),
        (F.col("namespace") == F.col("d_namespace"))
        & (F.to_date(F.col("hour")) == F.col("day")),
    ).select(
        "namespace",
        "hour",
        "err_1h",
        "n_1h",
        F.expr(ppm.format(n="err_1h", d="n_1h")).alias("ppm_1h"),
        F.expr(ppm.format(n="err_1d", d="n_1d")).alias("ppm_1d"),
    )
    return joined.filter(
        (F.col("ppm_1h") >= 2 * F.col("ppm_1d")) & (F.col("err_1h") >= 2)
    )


SQL_BURN_RATE_ALERT = LOGS_CTE + """,
base AS (
  SELECT namespace, date_trunc('hour', "timestamp") AS hour,
         CAST("timestamp" AS DATE) AS day,
         CASE WHEN f_level = 'error' THEN 1 ELSE 0 END AS is_err
  FROM logs
),
hourly AS (
  SELECT namespace, hour, count(*) AS n_1h,
         CAST(sum(is_err) AS BIGINT) AS err_1h
  FROM base GROUP BY 1, 2
),
daily AS (
  SELECT namespace, day, count(*) AS n_1d,
         CAST(sum(is_err) AS BIGINT) AS err_1d
  FROM base GROUP BY 1, 2
)
SELECT h.namespace, h.hour, h.err_1h, CAST(h.n_1h AS BIGINT) AS n_1h,
       CAST(h.err_1h * 1000000 // greatest(h.n_1h, 1) AS BIGINT) AS ppm_1h,
       CAST(d.err_1d * 1000000 // greatest(d.n_1d, 1) AS BIGINT) AS ppm_1d
FROM hourly h JOIN daily d
  ON h.namespace = d.namespace AND CAST(h.hour AS DATE) = d.day
WHERE h.err_1h * 1000000 // greatest(h.n_1h, 1)
        >= 2 * (d.err_1d * 1000000 // greatest(d.n_1d, 1))
  AND h.err_1h >= 2
"""


# --- O1/O3: newest-first log view (top-k, no full sort) ---------------------
def q_newest_logs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # events timestamps are unique (TESTDATA seed) -> deterministic top-100.
    return (
        _logs(spark, sf_dir)
        .where_env(namespace="ns-2")
        .newest(100)
        .select("timestamp", "namespace", "app", "pod_name", "log")
    )


SQL_NEWEST_LOGS = LOGS_CTE + """
SELECT "timestamp", namespace, app, pod_name, log FROM logs
WHERE namespace = 'ns-2'
ORDER BY "timestamp" DESC LIMIT 100
"""


# --- promoted materialized column parity (README.md:69-91) ------------------
def q_promoted_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = promote_string_field(
        derive_logs_from_events(spark, sf_dir), "level", "content_level"
    )
    # Filter on the promoted column; also prove equivalence with the map path.
    return (
        df.filter(F.col("content_level") == field_string("level"))
        .groupBy(F.col("content_level").alias("level"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_PROMOTED_LEVEL = LOGS_CTE + """
SELECT f_level AS level, count(*) AS cnt FROM logs GROUP BY f_level
"""


# --- P5 at rest: force_numbers read-path coercion ---------------------------
def q_force_numbers_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A string-typed numeric field stored in fields_string is coerced into
    fields_number by transform.force_numbers (the at-rest twin of the ingest
    Force_Number_Fields path, main.go:339-345), then aggregated from the
    number map — proving the value really moved."""
    from ..transform import force_numbers

    df = derive_logs_from_events(spark, sf_dir)
    ev_logs = df.withColumn(
        "fields_string",
        F.map_concat(
            F.col("fields_string"),
            F.create_map(
                F.lit("k_str"),
                F.element_at(F.col("fields_number"), "k").cast("long").cast(
                    "string"
                ),
            ),
        ),
    )
    coerced = force_numbers(ev_logs, ["k_str"])
    return coerced.groupBy("app").agg(
        F.count(F.when(has_field("fields_number", "k_str"), 1)).alias("n_moved"),
        F.count(F.when(has_field("fields_string", "k_str"), 1)).alias(
            "n_left_string"
        ),
        F.round(F.sum(field_number("k_str")), 2).alias("sum_k"),
    )


SQL_FORCE_NUMBERS_READ = LOGS_CTE + """
SELECT app, count(f_k) AS n_moved, 0 AS n_left_string,
       round(sum(f_k), 2) AS sum_k
FROM logs GROUP BY app
"""


# --- P4 at rest: key normalization ------------------------------------------
def q_normalize_keys_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dotted map keys rewritten '.'->'_' by transform.normalize_keys
    (Force_Underscores at rest, main.go:331-334)."""
    from ..transform import normalize_keys

    df = derive_logs_from_events(spark, sf_dir)
    dotted = df.withColumn(
        "fields_string",
        F.map_concat(
            F.col("fields_string"),
            F.create_map(F.lit("content.level"), field_string("level")),
        ),
    )
    normalized = dotted.withColumn(
        "fields_string", normalize_keys(F.col("fields_string"))
    )
    return normalized.groupBy(
        F.element_at("fields_string", "content_level").alias("level")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(
            F.when(has_field("fields_string", "content.level"), 1).otherwise(0)
        ).alias("n_dotted_left"),
    )


SQL_NORMALIZE_KEYS_READ = LOGS_CTE + """
SELECT f_level AS level, count(*) AS cnt, 0 AS n_dotted_left
FROM logs GROUP BY f_level
"""


# --- type-flap: same key string in some rows, number in others --------------
def q_type_flap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7 hard part: a field whose runtime type flaps across rows
    lands in fields_number on numeric rows and fields_string on string rows
    (per-row winner, main.go:336-349). Queries consult the map they name;
    coalesce(number, try_cast(string)) is the cross-type read. Both
    populations and the merged aggregate are checked."""
    df = derive_logs_from_events(spark, sf_dir)
    # user_id parity decides the runtime type of 'flappy'
    uid = F.element_at(F.col("fields_number"), "k")  # stand-in deterministic src
    flap_num = F.when(uid % 2 == 0, uid * 2)
    flap_str = F.when(uid % 2 == 1, F.concat(F.lit("s"), uid.cast("long").cast("string")))
    flapped = df.withColumn(
        "fields_number",
        F.map_concat(
            F.col("fields_number"),
            F.map_filter(F.create_map(F.lit("flappy"), flap_num),
                         lambda _, v: v.isNotNull()),
        ),
    ).withColumn(
        "fields_string",
        F.map_concat(
            F.col("fields_string"),
            F.map_filter(F.create_map(F.lit("flappy"), flap_str),
                         lambda _, v: v.isNotNull()),
        ),
    )
    num_side = F.element_at(F.col("fields_number"), "flappy")
    str_side = F.element_at(F.col("fields_string"), "flappy")
    merged = F.coalesce(
        num_side, F.regexp_extract(str_side, "^s([0-9]+)$", 1).try_cast("double")
    )
    return flapped.groupBy("app").agg(
        F.count(num_side).alias("n_number_rows"),
        F.count(str_side).alias("n_string_rows"),
        F.round(F.sum(num_side), 2).alias("sum_number_side"),
        F.round(F.sum(merged), 2).alias("sum_merged"),
    )


SQL_TYPE_FLAP = LOGS_CTE + """
SELECT app,
       count(CASE WHEN CAST(f_k AS BIGINT) % 2 = 0 THEN 1 END) AS n_number_rows,
       count(CASE WHEN CAST(f_k AS BIGINT) % 2 = 1 THEN 1 END) AS n_string_rows,
       round(sum(CASE WHEN CAST(f_k AS BIGINT) % 2 = 0 THEN f_k * 2 END), 2)
         AS sum_number_side,
       round(sum(CASE WHEN CAST(f_k AS BIGINT) % 2 = 0 THEN f_k * 2
                      ELSE f_k END), 2) AS sum_merged
FROM logs WHERE f_k IS NOT NULL
GROUP BY app
"""


# --- T5 EXT: session windows over the logs stream (batch-mode check) --------
def q_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window sessionization of the logs view (streaming twin
    in streaming_ext.session_counts — session end = last event + gap)."""
    from ..streaming_ext import session_counts

    logs = derive_logs_from_events(spark, sf_dir)
    return session_counts(logs, gap="30 minutes", key="pod_name")


SQL_SESSION_WINDOWS = LOGS_CTE + """,
flagged AS (
  SELECT pod_name, "timestamp" AS ts,
         CASE WHEN epoch("timestamp") - epoch(LAG("timestamp") OVER w) IS NULL
                OR epoch("timestamp") - epoch(LAG("timestamp") OVER w) > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM logs WINDOW w AS (PARTITION BY pod_name ORDER BY "timestamp")
), islands AS (
  SELECT pod_name, ts,
         SUM(new_s) OVER (PARTITION BY pod_name ORDER BY ts
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sid
  FROM flagged
)
SELECT min(ts) AS session_start,
       max(ts) + INTERVAL 30 MINUTE AS session_end,
       pod_name, count(*) AS n_events
FROM islands GROUP BY pod_name, sid
"""


# --- A5: approx_count_distinct. HLL estimates are engine-specific, so the
# estimate itself cannot be hash-compared against DuckDB; instead the query
# emits the EXACT distinct counts (oracle-hashable) plus booleans asserting
# the HLL estimate landed within 2x the requested rsd — the oracle declares
# the booleans true, so a drifting estimator fails the external hash check
# instead of being permanently unverifiable. -------------------------------
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    logs = derive_logs_from_events(spark, sf_dir)
    rsd = 0.05  # approx_count_distinct default
    return logs.agg(
        F.countDistinct("pod_name").alias("exact_pods"),
        F.countDistinct("log").alias("exact_lines"),
        F.approx_count_distinct("pod_name", rsd).alias("_a_pods"),
        F.approx_count_distinct("log", rsd).alias("_a_lines"),
    ).select(
        "exact_pods",
        "exact_lines",
        (F.abs(F.col("_a_pods") - F.col("exact_pods"))
         <= 2 * rsd * F.col("exact_pods")).alias("pods_within_rsd"),
        (F.abs(F.col("_a_lines") - F.col("exact_lines"))
         <= 2 * rsd * F.col("exact_lines")).alias("lines_within_rsd"),
    )


SQL_APPROX_DISTINCT = LOGS_CTE + """
SELECT CAST(count(DISTINCT pod_name) AS BIGINT) AS exact_pods,
       CAST(count(DISTINCT log) AS BIGINT) AS exact_lines,
       true AS pods_within_rsd,
       true AS lines_within_rsd
FROM logs
"""


# --- A7 approx variant: percentile_approx with error-bound booleans ---------
def q_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-sketch twin of logs_approx_distinct: per-namespace
    approx p50/p95 over the value field, hash-checked the same way — exact
    percentiles (oracle-replicable, discrete so no interpolation ambiguity)
    plus booleans asserting the sketch lands within a 5%+1 band of exact.
    percentile_approx's GK sketch is merge-order dependent, so its raw
    output can differ run-to-run — the booleans are what's stable, exactly
    the HLL treatment."""
    logs = derive_logs_from_events(spark, sf_dir)
    v = field_number("value")
    base = logs.select("namespace", v.alias("v")).filter(F.col("v").isNotNull())
    agg = base.groupBy("namespace").agg(
        F.expr("percentile(v, 0.5)").alias("_e50"),
        F.expr("percentile(v, array(0.95))[0]").alias("_e95"),
        F.expr("percentile_approx(v, 0.5, 1000)").alias("_a50"),
        F.expr("percentile_approx(v, 0.95, 1000)").alias("_a95"),
    )
    band = lambda e, a: (F.abs(F.col(a) - F.col(e))  # noqa: E731
                         <= 0.05 * F.abs(F.col(e)) + 1)
    return agg.select(
        "namespace",
        F.round("_e50", 6).alias("exact_p50"),
        F.round("_e95", 6).alias("exact_p95"),
        band("_e50", "_a50").alias("p50_within_band"),
        band("_e95", "_a95").alias("p95_within_band"),
    )


SQL_APPROX_PERCENTILES = LOGS_CTE + """
SELECT namespace,
       round(quantile_cont(f_value, 0.5), 6) AS exact_p50,
       round(quantile_cont(f_value, 0.95), 6) AS exact_p95,
       true AS p50_within_band,
       true AS p95_within_band
FROM logs WHERE f_value IS NOT NULL
GROUP BY namespace
"""


# --- EXT window: top-3 pods by volume per namespace -------------------------
def q_top_pods(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    counts = _logs(spark, sf_dir).count_by("namespace", "pod_name")
    w = Window.partitionBy("namespace").orderBy(
        F.col("cnt").desc(), F.col("pod_name")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("namespace", "pod_name", "cnt", "rnk")
    )


SQL_TOP_PODS = LOGS_CTE + """
SELECT namespace, pod_name, cnt, rnk FROM (
  SELECT namespace, pod_name, count(*) AS cnt,
         ROW_NUMBER() OVER (PARTITION BY namespace
                            ORDER BY count(*) DESC, pod_name) AS rnk
  FROM logs GROUP BY namespace, pod_name
) WHERE rnk <= 3
"""


def q_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log template mining (Drain-lite): mask numeric literals in the raw
    line and group by the resulting template — the standard first pass of
    log-pattern clustering (templates per app, volume, blast radius in
    pods). One regexp_replace + one aggregation; no Python, no pairwise
    comparison.

    Scale shape: the mask is a JVM-side regex in whole-stage codegen; the
    group-by shuffles |templates| keys after map-side combine — template
    cardinality is tiny next to line count, so this is a near-free rollup
    even at 100 TB."""
    df = _logs(spark, sf_dir).df
    template = F.regexp_replace(
        F.col("log"), r"[0-9]+(\.[0-9]+)?", "<N>"
    )
    return (
        df.select(
            template.alias("template"), "app", "pod_name"
        )
        .groupBy("template")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("app").alias("n_apps"),
            F.count_distinct("pod_name").alias("n_pods"),
        )
    )


SQL_TEMPLATE_CLUSTERS = LOGS_CTE + r"""
SELECT regexp_replace(log, '[0-9]+(\.[0-9]+)?', '<N>', 'g') AS template,
       count(*) AS n,
       CAST(count(DISTINCT app) AS BIGINT) AS n_apps,
       CAST(count(DISTINCT pod_name) AS BIGINT) AS n_pods
FROM logs
GROUP BY 1
"""


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: hourly line counts per app, z-scored
    against that app's own month of hourly counts; emit hours with
    |z| >= 2. Mean/variance come from exact integer sums (n, sum, sum of
    squares) rather than engine stddev — both engines then evaluate the
    identical IEEE expression, so the 2-sigma cut cannot flip cross-engine.
    The zero-variance guard is the exact integer comparison n*s2 > s1^2.

    Scale shape: one event-level aggregation to hourly counts (map-side
    combined), a |apps|-sized stats rollup broadcast back onto the hourly
    grid, then a filter — no event-level join, no window sort."""
    df = _logs(spark, sf_dir).df
    hourly = df.groupBy(
        "app", F.date_trunc("hour", F.col("timestamp")).alias("bucket")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = hourly.groupBy("app").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    z = (F.col("cnt") - F.col("s1") / F.col("n")) / F.sqrt(
        (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
        / (F.col("n") - 1)
    )
    return (
        hourly.join(F.broadcast(stats), "app")
        .filter(F.col("n") * F.col("s2") > F.col("s1") * F.col("s1"))
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) >= 2.0)
        .select("app", "bucket", "cnt", F.round("z", 4).alias("z"))
    )


SQL_ANOMALY_ZSCORE = LOGS_CTE + """,
hourly AS (
  SELECT app, date_trunc('hour', "timestamp") AS bucket, count(*) AS cnt
  FROM logs GROUP BY 1, 2
),
stats AS (
  SELECT app,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(cnt) AS BIGINT) AS s1,
         CAST(sum(cnt * cnt) AS BIGINT) AS s2
  FROM hourly GROUP BY 1
)
SELECT app, bucket, cnt,
       round((cnt - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1)), 4) AS z
FROM hourly JOIN stats USING (app)
WHERE n * s2 > s1 * s1
  AND abs((cnt - s1 / n) / sqrt((s2 - s1 * s1 / n) / (n - 1))) >= 2.0
"""


HEATMAP_BUCKET_MS = 500  # latency bucket width


def q_latency_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The latency heatmap feed (hour x latency-bucket counts over the
    dynamic latency_ms field) — the 2-D histogram every latency dashboard
    renders. One keyed aggregate; bucket = integer DIV of the latency so
    both engines cut identically; rows missing the field are excluded the
    same way a dashboard excludes non-request lines."""
    logs = derive_logs_from_events(spark, sf_dir)
    lat = F.element_at(F.col("fields_number"), F.lit("latency_ms"))
    return (
        logs.filter(lat.isNotNull())
        .filter(F.col("timestamp") < "2024-01-08 00:00:00")
        .select(
            F.date_trunc("hour", F.col("timestamp")).alias("hour"),
            F.expr(
                f"CAST(CAST(element_at(fields_number, 'latency_ms') AS BIGINT)"
                f" DIV {HEATMAP_BUCKET_MS} AS INT)"
            ).alias("lat_bucket"),
        )
        .groupBy("hour", "lat_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


SQL_LATENCY_HEATMAP = LOGS_CTE + f"""
SELECT date_trunc('hour', "timestamp") AS hour,
       CAST(CAST(f_latency_ms AS BIGINT) // {HEATMAP_BUCKET_MS} AS INT)
         AS lat_bucket,
       count(*) AS cnt
FROM logs
WHERE f_latency_ms IS NOT NULL
  AND "timestamp" < TIMESTAMP '2024-01-08 00:00:00'
GROUP BY 1, 2
"""


def q_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANALYZE job externally checked: one-pass per-column statistics
    (rows, nulls, exact NDV, min/max) over the envelope dimensions plus a
    conditionally-present map key — the null count on ``flag`` proves the
    derived-expression path. Production runs the same job with approx=True
    (HLL++ NDV) on the 100 TB table; exact mode is the oracle-comparable
    twin (table.collect_column_stats)."""
    from ..table import collect_column_stats

    logs = derive_logs_from_events(spark, sf_dir)
    return collect_column_stats(
        logs,
        [
            "namespace",
            "app",
            "pod_name",
            "host",
            ("flag", F.element_at(F.col("fields_string"), F.lit("flag"))),
        ],
    )


def _stats_block(name: str, expr: str) -> str:
    return f"""
SELECT '{name}' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({expr}) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv,
       CAST(min({expr}) AS VARCHAR) AS min_value,
       CAST(max({expr}) AS VARCHAR) AS max_value
FROM logs"""


SQL_COLUMN_STATS = LOGS_CTE + " UNION ALL ".join(
    _stats_block(n, e)
    for n, e in [
        ("namespace", "namespace"),
        ("app", "app"),
        ("pod_name", "pod_name"),
        ("host", "host"),
        ("flag", "f_flag"),
    ]
)


def q_new_fields_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift monitor — the operational question a klogs operator
    asks when a deploy starts emitting new labels: for every dynamic
    field key (both maps), the day it FIRST appeared, how many days it
    has been seen, and total carrying rows. One explode of map_keys into
    a key-keyed aggregate (the token-first-day trick) — no per-key scans,
    no running state; at 100 TB this is one pass with a vocabulary-sized
    shuffle."""
    df = derive_logs_from_events(spark, sf_dir)
    keys = df.select(
        F.to_date("timestamp").alias("d"),
        F.explode(
            F.concat(
                F.map_keys("fields_string"), F.map_keys("fields_number")
            )
        ).alias("key"),
    )
    return keys.groupBy("key").agg(
        F.min("d").alias("first_day"),
        F.count_distinct("d").alias("n_days_seen"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_NEW_FIELDS_REPORT = LOGS_CTE + """
, keys AS (
  SELECT CAST("timestamp" AS DATE) AS d, 'level' AS key FROM logs
  UNION ALL SELECT CAST("timestamp" AS DATE), 'source' FROM logs
  UNION ALL SELECT CAST("timestamp" AS DATE), 'flag' FROM logs
    WHERE f_flag IS NOT NULL
  UNION ALL SELECT CAST("timestamp" AS DATE), 'value' FROM logs
  UNION ALL SELECT CAST("timestamp" AS DATE), 'k' FROM logs
    WHERE f_k IS NOT NULL
  UNION ALL SELECT CAST("timestamp" AS DATE), 'latency_ms' FROM logs
    WHERE f_latency_ms IS NOT NULL
)
SELECT key, min(d) AS first_day,
       CAST(count(DISTINCT d) AS BIGINT) AS n_days_seen,
       count(*) AS n_rows
FROM keys GROUP BY 1
"""


def q_field_cardinality_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cardinality-explosion guard: per (day, string key) distinct value
    counts — the observability failure mode where a label starts carrying
    user IDs or UUIDs and the dynamic map's dictionary encoding (and
    every downstream group-by) degrades. One explode of the string map
    into a (day, key)-keyed distinct aggregate."""
    df = derive_logs_from_events(spark, sf_dir)
    kv = df.select(
        F.to_date("timestamp").alias("day"),
        F.explode("fields_string").alias("key", "val"),
    )
    return kv.groupBy("day", "key").agg(
        F.count_distinct("val").alias("n_values"),
        F.count(F.lit(1)).alias("n_rows"),
    )


SQL_FIELD_CARDINALITY_GUARD = LOGS_CTE + """
, kv AS (
  SELECT CAST("timestamp" AS DATE) AS day, 'level' AS key, f_level AS val
  FROM logs
  UNION ALL SELECT CAST("timestamp" AS DATE), 'source', f_source FROM logs
  UNION ALL SELECT CAST("timestamp" AS DATE), 'flag', f_flag FROM logs
    WHERE f_flag IS NOT NULL
)
SELECT day, key, CAST(count(DISTINCT val) AS BIGINT) AS n_values,
       count(*) AS n_rows
FROM kv GROUP BY 1, 2
"""


def q_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Season-aware volume anomalies: each (app, hour-of-day) gets its OWN
    baseline — the median of that hour's counts across the window's days —
    so the nightly lull and the 9am ramp stop reading as anomalies (the
    flaw of flat baselines like burn-rate's same-day mean or the global
    MAD). Deviation is measured in integer ppm against the seasonal
    median; everything runs over the bounded (app x 24 x days) hourly
    aggregate."""
    logs = derive_logs_from_events(spark, sf_dir)
    hourly = (
        logs.filter(F.col("timestamp").between(_T0, _T1))
        .groupBy(
            "app",
            F.date_trunc("hour", F.col("timestamp")).alias("hour"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("hod", F.hour("hour"))
    )
    season = hourly.groupBy("app", "hod").agg(
        F.expr("percentile(cnt, 0.5)").alias("season_med")
    )
    return (
        hourly.join(F.broadcast(season), ["app", "hod"])
        .select(
            "app",
            "hour",
            "cnt",
            F.round("season_med", 4).alias("season_med"),
            F.expr(
                "CAST((cnt - season_med) * 1000000 AS BIGINT) DIV "
                "greatest(CAST(floor(season_med) AS BIGINT), 1)"
            ).alias("dev_ppm"),
        )
    )


SQL_SEASONAL_ANOMALY = LOGS_CTE + f"""
, hourly AS (
  SELECT app, date_trunc('hour', "timestamp") AS hour, count(*) AS cnt
  FROM logs
  WHERE "timestamp" BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'
  GROUP BY 1, 2
),
season AS (
  SELECT app, extract(hour FROM hour) AS hod,
         quantile_cont(cnt, 0.5) AS season_med
  FROM hourly GROUP BY 1, 2
)
SELECT hourly.app, hour, cnt,
       round(season_med, 4) AS season_med,
       CAST(CAST((cnt - season_med) * 1000000 AS BIGINT)
            // greatest(CAST(floor(season_med) AS BIGINT), 1) AS BIGINT)
         AS dev_ppm
FROM hourly JOIN season
  ON hourly.app = season.app AND extract(hour FROM hour) = season.hod
"""


PAGE_SIZE = 100


def q_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The log-viewer "show surrounding logs" drill-down (the klogs UI's
    context fetch, batch form): for EVERY error line, the ±2 neighboring
    lines of the same pod's stream — one lag/lead window PARTITIONED BY
    pod (never global; at 100 TB each pod's stream sorts independently),
    anchors filtered after the window so neighbors are real stream
    neighbors, not match neighbors. Deterministic order: (timestamp, log)
    tiebreak in both engines. Namespace pre-filter prunes the scan and
    cannot split a pod's stream (pods are namespace-constant by the
    events mapping)."""
    from pyspark.sql.window import Window

    logs = derive_logs_from_events(spark, sf_dir).filter(
        F.col("namespace") == "ns-1"
    )
    w = Window.partitionBy("pod_name").orderBy("timestamp", "log")
    ctx = logs.select(
        "pod_name",
        "timestamp",
        F.lag("log", 2).over(w).alias("prev2"),
        F.lag("log", 1).over(w).alias("prev1"),
        "log",
        F.lead("log", 1).over(w).alias("next1"),
        F.lead("log", 2).over(w).alias("next2"),
    )
    return ctx.filter(F.col("log").endswith(" error occurred"))


SQL_CONTEXT_WINDOW = LOGS_CTE + """
SELECT * FROM (
  SELECT pod_name, "timestamp",
         lag(log, 2) OVER w AS prev2,
         lag(log, 1) OVER w AS prev1,
         log,
         lead(log, 1) OVER w AS next1,
         lead(log, 2) OVER w AS next2
  FROM logs
  WHERE namespace = 'ns-1'
  WINDOW w AS (PARTITION BY pod_name ORDER BY "timestamp", log)
) t
WHERE log LIKE '% error occurred'
"""


def q_keyset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-correct log paging: page 2 of the newest-first view fetched by
    KEYSET (``timestamp < last_seen_of_page_1 ORDER BY ts DESC LIMIT k``)
    — the pagination every log UI should use instead of OFFSET, which
    scans-and-discards every earlier page (OFFSET 1e6 reads a million
    rows; a keyset page is the same TakeOrderedAndProject as page 1, and
    the predicate prunes partitions). The oracle fetches rows k+1..2k of
    the global order directly — equality proves keyset paging walks the
    exact same total order with no skipped or repeated rows (timestamps
    are unique in the fixture, the precondition keyset paging needs)."""
    df = _logs(spark, sf_dir).df.filter(F.col("namespace") == "ns-1")
    page1 = df.orderBy(F.col("timestamp").desc()).limit(PAGE_SIZE)
    last_seen = page1.agg(F.min("timestamp")).first()[0]
    return (
        df.filter(F.col("timestamp") < last_seen)
        .orderBy(F.col("timestamp").desc())
        .limit(PAGE_SIZE)
        .select("timestamp", "namespace", "app", "pod_name", "log")
    )


SQL_KEYSET_PAGINATION = LOGS_CTE + f"""
SELECT "timestamp", namespace, app, pod_name, log FROM logs
WHERE namespace = 'ns-1'
ORDER BY "timestamp" DESC
LIMIT {PAGE_SIZE} OFFSET {PAGE_SIZE}
"""


def q_table_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (klogs_spark.expectations — the
    Deequ / Great Expectations pattern): five expectations over the logs
    view — envelope not-null, domain membership on a dynamic field, a
    numeric range, a conditional-presence rule, and key uniqueness — all
    verified in ONE table pass (each check is two partial-aggregatable
    terms; uniqueness rides the same aggregate). The oracle recomputes
    every violation count independently, so the report's pass/fail
    verdicts are externally proven, not self-attested."""
    from ..expectations import check_report
    from ..transform import field_number, field_string

    logs = derive_logs_from_events(spark, sf_dir)
    lat = field_number("latency_ms")
    return check_report(
        logs,
        checks=[
            ("timestamp_not_null", F.col("timestamp").isNotNull()),
            (
                "level_in_domain",
                field_string("level").isin("info", "warn", "error"),
            ),
            ("value_nonnegative", field_number("value") >= 0),
            (
                "latency_present_for_clicks",
                F.when(
                    F.col("app").isin("click", "view"), lat.isNotNull()
                ).otherwise(F.lit(True)),
            ),
        ],
        unique_keys=[("timestamp_unique", F.col("timestamp"))],
    )


SQL_TABLE_EXPECTATIONS = LOGS_CTE + """
SELECT check_name, n_rows, n_violations, (n_violations = 0) AS passed
FROM (
  SELECT 'timestamp_not_null' AS check_name, count(*) AS n_rows,
         CAST(sum(CASE WHEN "timestamp" IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violations
  FROM logs
  UNION ALL
  SELECT 'level_in_domain', count(*),
         CAST(sum(CASE WHEN NOT coalesce(
               f_level IN ('info', 'warn', 'error'), false)
              THEN 1 ELSE 0 END) AS BIGINT)
  FROM logs
  UNION ALL
  SELECT 'value_nonnegative', count(*),
         CAST(sum(CASE WHEN NOT coalesce(f_value >= 0, false)
              THEN 1 ELSE 0 END) AS BIGINT)
  FROM logs
  UNION ALL
  SELECT 'latency_present_for_clicks', count(*),
         CAST(sum(CASE WHEN app IN ('click', 'view')
                        AND f_latency_ms IS NULL
              THEN 1 ELSE 0 END) AS BIGINT)
  FROM logs
  UNION ALL
  SELECT 'timestamp_unique', count(*),
         -- duplicates beyond first occurrence PLUS NULL-keyed rows (a
         -- missing key violates uniqueness; count()/count(DISTINCT)
         -- both skip NULLs so the NULL term is explicit)
         CAST(count("timestamp") - count(DISTINCT "timestamp")
              + count(*) - count("timestamp") AS BIGINT)
  FROM logs
) t
"""


def q_volume_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust volume anomalies: per-app hourly counts flagged by MEDIAN
    ABSOLUTE DEVIATION — the robust twin of logs_anomaly_zscore (a single
    genuine traffic spike inflates a stddev and masks itself; it cannot
    move a median). Both medians run over the per-app HOURLY aggregate —
    bounded by apps x hours-in-window, never the log volume — and exact
    interpolated percentiles keep both engines identical."""
    logs = derive_logs_from_events(spark, sf_dir)
    hourly = (
        logs.filter(F.col("timestamp").between(_T0, _T1))
        .groupBy("app", F.date_trunc("hour", F.col("timestamp")).alias("hour"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    med = hourly.groupBy("app").agg(
        F.expr("percentile(cnt, 0.5)").alias("med")
    )
    dev = hourly.join(F.broadcast(med), "app").withColumn(
        "adev", F.abs(F.col("cnt") - F.col("med"))
    )
    mad = dev.groupBy("app").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "app")
        .select(
            "app",
            "hour",
            "cnt",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col("cnt") - F.col("med")) > 3 * F.col("mad"))
            ).alias("is_anomaly"),
        )
    )


SQL_VOLUME_ANOMALY_MAD = LOGS_CTE + f"""
, hourly AS (
  SELECT app, date_trunc('hour', "timestamp") AS hour, count(*) AS cnt
  FROM logs
  WHERE "timestamp" BETWEEN TIMESTAMP '{_T0}' AND TIMESTAMP '{_T1}'
  GROUP BY 1, 2
),
med AS (SELECT app, quantile_cont(cnt, 0.5) AS med FROM hourly GROUP BY 1),
dev AS (
  SELECT hourly.app, hour, cnt, med, abs(cnt - med) AS adev
  FROM hourly JOIN med ON hourly.app = med.app
),
mad AS (SELECT app, quantile_cont(adev, 0.5) AS mad FROM dev GROUP BY 1)
SELECT dev.app, hour, cnt, round(dev.med, 4) AS med, round(mad.mad, 4) AS mad,
       (mad.mad > 0 AND abs(cnt - dev.med) > 3 * mad.mad) AS is_anomaly
FROM dev JOIN mad ON dev.app = mad.app
"""


_FORECAST_EPOCH = "2024-01-01"  # testdata day-index origin (literal)


def q_volume_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pod log-volume trend + next-day forecast — the capacity-
    planning regression an SRE runs over daily ingest counts (the one
    analytics family the logs surface lacked: forecasting). Ordinary
    least squares over (day-index, daily count) per pod, computed from
    EXACT integer sums (n, Σx, Σy, Σxy, Σx²): the slope is one double
    division of integer terms, and intercept/forecast chain a few more
    fp ops whose EXPRESSION SHAPE (operand order + parenthesization) is
    shared verbatim with the oracle — the bit-identical guarantee rests
    on that shared shape, so never reassociate one side alone (review
    r20). Pods with fewer than two observed days carry no trend and are
    excluded (their denominator is zero). Missing days simply
    contribute no point (OLS over observed days); NULL timestamps are
    excluded on both sides (a NULL day group would inflate n_days but
    none of the sums — a fabricated trend, review r20). Scale shape:
    one corpus pass to daily counts (pods x days rows), then a
    pods-sized aggregate — nothing data-volume-sized leaves the first
    groupBy."""
    logs = derive_logs_from_events(spark, sf_dir)
    daily = logs.filter(F.col("timestamp").isNotNull()).groupBy(
        "pod_name",
        # bigint BEFORE the products: datediff is int32, and d*d would
        # wrap at |d| >= 46341 while the oracle computes BIGINT exactly
        F.datediff(
            F.to_date("timestamp"), F.lit(_FORECAST_EPOCH).cast("date")
        ).cast("bigint").alias("d"),
    ).agg(F.count(F.lit(1)).alias("y"))
    agg = (
        daily.groupBy("pod_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.sum("d").cast("bigint").alias("sx"),
            F.sum("y").cast("bigint").alias("sy"),
            F.sum(F.col("d") * F.col("y")).cast("bigint").alias("sxy"),
            F.sum(F.col("d") * F.col("d")).cast("bigint").alias("sxx"),
            F.max("d").cast("bigint").alias("last_d"),
        )
        .filter(F.col("n_days") >= 2)
    )
    slope = (
        F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx"))
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n_days")
    forecast = intercept + slope * (F.col("last_d") + 1)
    return agg.select(
        "pod_name",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
        F.round(forecast, 6).alias("next_day_forecast"),
    )


_SLOPE_SQL = ("(n_days*sxy - sx*sy) / "
              "(n_days*sxx - sx*sx)")
_INTERCEPT_SQL = f"(sy - ({_SLOPE_SQL}) * sx) / n_days"

SQL_VOLUME_FORECAST = LOGS_CTE + f"""
, daily AS (
  SELECT pod_name,
         datediff('day', DATE '{_FORECAST_EPOCH}',
                  CAST("timestamp" AS DATE)) AS d,
         count(*) AS y
  FROM logs WHERE "timestamp" IS NOT NULL GROUP BY 1, 2
),
agg AS (
  SELECT pod_name,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(d) AS BIGINT) AS sx,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(d * y) AS BIGINT) AS sxy,
         CAST(sum(d * d) AS BIGINT) AS sxx,
         CAST(max(d) AS BIGINT) AS last_d
  FROM daily GROUP BY 1 HAVING count(*) >= 2
)
SELECT pod_name, n_days,
       round({_SLOPE_SQL}, 6) AS slope,
       round({_INTERCEPT_SQL}, 6) AS intercept,
       round(({_INTERCEPT_SQL}) + ({_SLOPE_SQL}) * (last_d + 1), 6)
         AS next_day_forecast
FROM agg
"""


def q_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log template mining (the Drain/LogMine clustering idea, the
    deterministic 80% version): mask every digit run to <N>, then group —
    lines that differ only in identifiers collapse to one template. Emits
    per (app, template): volume, spread (distinct pods — a template seen
    on one pod is a local fault, on all pods a rollout), and first/last
    day. One groupBy over a narrow projection — the map-side-combinable
    shape; template cardinality is format-bounded, not row-bounded, so
    the aggregate output stays tiny at 100 TB."""
    df = _logs(spark, sf_dir).df
    tpl = F.regexp_replace(F.col("log"), "[0-9]+", "<N>")
    return df.groupBy(F.col("app"), tpl.alias("template")).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("pod_name").alias("n_pods"),
        F.min(F.to_date("timestamp")).alias("first_day"),
        F.max(F.to_date("timestamp")).alias("last_day"),
    )


# DuckDB regexp_replace replaces the FIRST match unless 'g' (known trap)
SQL_TEMPLATE_MINING = LOGS_CTE + """
SELECT app, regexp_replace(log, '[0-9]+', '<N>', 'g') AS template,
       count(*) AS n,
       CAST(count(DISTINCT pod_name) AS BIGINT) AS n_pods,
       min(CAST("timestamp" AS DATE)) AS first_day,
       max(CAST("timestamp" AS DATE)) AS last_day
FROM logs GROUP BY 1, 2
"""


SPECS = {
    "logs_env_map_count": QuerySpec(q_env_map_count, SQL_ENV_MAP_COUNT,
                                    "F1+F2+F3+A1 canonical klogs count",
                                    hash_also=(derive_logs_from_events,)),
    "logs_template_mining": QuerySpec(
        q_template_mining, SQL_TEMPLATE_MINING,
        "Drain-style log template mining: digit-masked clustering with "
        "volume/pod-spread/first-last-seen per template"),
    "logs_number_stats": QuerySpec(q_number_stats, SQL_NUMBER_STATS,
                                   "F4+A4 dynamic-number aggregates"),
    "logs_field_exists": QuerySpec(q_field_exists, SQL_FIELD_EXISTS,
                                   "F5 map-key existence"),
    "logs_fulltext": QuerySpec(q_fulltext, SQL_FULLTEXT, "F6 substring"),
    "logs_log_regex": QuerySpec(q_log_regex, SQL_LOG_REGEX, "F6 regex"),
    "logs_hourly_histogram": QuerySpec(q_hourly_histogram, SQL_HOURLY_HISTOGRAM,
                                       "A2 time-bucketed counts"),
    "logs_window_5m": QuerySpec(q_window_5m, SQL_WINDOW_5M,
                                "A2 native window() tumbling buckets"),
    "logs_env_counts": QuerySpec(q_env_counts, SQL_ENV_COUNTS,
                                 "A3 envelope-dim counts"),
    "logs_parsed_field_stats": QuerySpec(q_parsed_field_stats,
                                         SQL_PARSED_FIELD_STATS,
                                         "A4 over JSON-coerced field"),
    "logs_distinct_sources": QuerySpec(q_distinct_sources, SQL_DISTINCT_SOURCES,
                                       "A5 count distinct"),
    "logs_field_key_stats": QuerySpec(q_field_key_stats, SQL_FIELD_KEY_STATS,
                                      "dynamic-schema key discovery",
                                      hash_also=(derive_logs_from_events,)),
    "logs_parse_logfmt": QuerySpec(q_parse_logfmt, SQL_PARSE_LOGFMT,
                                   "str_to_map logfmt extraction"),
    "logs_merge_json_log": QuerySpec(q_merge_json_log, SQL_MERGE_JSON_LOG,
                                     "Merge_Log JSON line merge"),
    "logs_value_percentiles": QuerySpec(q_value_percentiles,
                                        SQL_VALUE_PERCENTILES,
                                        "A7 exact percentiles"),
    "logs_grouped_percentiles": QuerySpec(q_grouped_percentiles,
                                          SQL_GROUPED_PERCENTILES,
                                          "A7 per-group latency quantiles"),
    "logs_error_rate": QuerySpec(q_error_rate, SQL_ERROR_RATE,
                                 "daily error-rate timeseries"),
    "logs_newest": QuerySpec(q_newest_logs, SQL_NEWEST_LOGS,
                             "O3 newest-first top-k"),
    "logs_promoted_level": QuerySpec(q_promoted_level, SQL_PROMOTED_LEVEL,
                                     "promoted-column parity README.md:69-91"),
    "logs_top_pods": QuerySpec(q_top_pods, SQL_TOP_PODS,
                               "EXT window top-k per group"),
    "logs_force_numbers_read": QuerySpec(q_force_numbers_read,
                                         SQL_FORCE_NUMBERS_READ,
                                         "P5 at-rest forced-number coercion"),
    "logs_normalize_keys_read": QuerySpec(q_normalize_keys_read,
                                          SQL_NORMALIZE_KEYS_READ,
                                          "P4 at-rest key normalization"),
    "logs_session_windows": QuerySpec(q_session_windows, SQL_SESSION_WINDOWS,
                                      "T5 session_window sessionization"),
    "logs_type_flap": QuerySpec(q_type_flap, SQL_TYPE_FLAP,
                                "string/number type-flap semantics (SURVEY §7)"),
    "logs_approx_distinct": QuerySpec(
        q_approx_distinct, SQL_APPROX_DISTINCT,
        "A5 approx_count_distinct, exact counts + rsd-bound booleans"),
    "logs_approx_percentiles": QuerySpec(
        q_approx_percentiles, SQL_APPROX_PERCENTILES,
        "A7 percentile_approx sketch, exact quantiles + error-band booleans"),
    "logs_burn_rate_alert": QuerySpec(
        q_burn_rate_alert, SQL_BURN_RATE_ALERT,
        "multi-window burn-rate alert (hourly vs same-day baseline, "
        "integer ppm, broadcast baseline)"),
    "logs_template_clusters": QuerySpec(
        q_template_clusters, SQL_TEMPLATE_CLUSTERS,
        "Drain-lite log template mining (numeric-mask + rollup)"),
    "logs_anomaly_zscore": QuerySpec(
        q_anomaly_zscore, SQL_ANOMALY_ZSCORE,
        "per-app hourly volume anomalies via exact-integer-sum z-scores"),
    "table_column_stats": QuerySpec(
        q_column_stats, SQL_COLUMN_STATS,
        "ANALYZE-style one-pass column statistics (rows/nulls/ndv/min/max) "
        "over envelope dims and a map key"),
    "logs_latency_heatmap": QuerySpec(
        q_latency_heatmap, SQL_LATENCY_HEATMAP,
        "hour x latency-bucket 2-D histogram over the dynamic number "
        "field (integer-DIV buckets, engine-exact)"),
    "logs_new_fields_report": QuerySpec(
        q_new_fields_report, SQL_NEW_FIELDS_REPORT,
        "schema-drift monitor: first-seen day / days-seen / rows per "
        "dynamic field key (one map_keys explode)"),
    "logs_field_cardinality_guard": QuerySpec(
        q_field_cardinality_guard, SQL_FIELD_CARDINALITY_GUARD,
        "per-(day, key) distinct-value counts — the label-cardinality "
        "explosion watch"),
    "logs_volume_anomaly_mad": QuerySpec(
        q_volume_anomaly_mad, SQL_VOLUME_ANOMALY_MAD,
        "robust MAD hourly volume anomalies (medians over the bounded "
        "hourly aggregate; spikes cannot mask themselves)"),
    "logs_volume_forecast": QuerySpec(
        q_volume_forecast, SQL_VOLUME_FORECAST,
        "per-pod OLS volume trend + next-day forecast from exact "
        "integer sums (capacity planning)"),
    "table_expectations": QuerySpec(
        q_table_expectations, SQL_TABLE_EXPECTATIONS,
        "Deequ-style declarative data-quality gate: five expectations "
        "(not-null/domain/range/conditional/uniqueness) in ONE pass"),
    "logs_context_window": QuerySpec(
        q_context_window, SQL_CONTEXT_WINDOW,
        "log-viewer surrounding-context fetch: ±2 stream neighbors per "
        "error line, one pod-partitioned lag/lead window"),
    "logs_keyset_pagination": QuerySpec(
        q_keyset_pagination, SQL_KEYSET_PAGINATION,
        "keyset (seek) pagination: page 2 via ts < last_seen — same "
        "TakeOrdered cost as page 1, vs the oracle's OFFSET fetch"),
    "logs_seasonal_anomaly": QuerySpec(
        q_seasonal_anomaly, SQL_SEASONAL_ANOMALY,
        "hour-of-day seasonal baselines (per-(app, hod) medians over the "
        "bounded hourly aggregate); deviation in integer ppm"),
}
