"""Upstream source transforms — the Fluent Bit pipeline stages before the
plugin (S7/S8/S9 in SURVEY §2.1).

The reference consumes records already shaped by Fluent Bit's tail input with
docker/CRI parsers and multiline reassembly (cluster/fluent-bit.yaml:62-73),
the kubernetes metadata filter (:75-86), and a static-field modify filter
(:88-91). A self-contained engine needs those stages too; they are implemented
here as Column expressions (parsers) plus one aggregation (multiline
reassembly — a genuine stateful grouping, expressed as groupBy over
line-provenance keys, no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# CRI log line: "2024-01-01T00:00:00.123456789Z stdout P partial-content"
# (flag F = full line, P = partial awaiting continuation)
CRI_REGEX = r"^(\S+) (stdout|stderr) ([FP]) (.*)$"


def parse_cri_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse CRI container-runtime log lines (the tail input's `cri` parser).

    Returns (log_time, stream, flag, content, file) — content still partial;
    feed through :func:`reassemble_multiline`.
    """
    v = F.col(value_col)
    return raw.select(
        F.regexp_extract(v, CRI_REGEX, 1).alias("log_time"),
        F.regexp_extract(v, CRI_REGEX, 2).alias("stream"),
        F.regexp_extract(v, CRI_REGEX, 3).alias("flag"),
        F.regexp_extract(v, CRI_REGEX, 4).alias("content"),
        F.input_file_name().alias("file"),
    ).filter(F.col("log_time") != "")


def parse_docker_json_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse docker json-file log lines: {"log": "...", "stream": "stdout",
    "time": "..."} (the tail input's `docker` parser)."""
    parsed = F.from_json(
        F.col(value_col), "log string, stream string, time string"
    )
    return raw.select(
        parsed["time"].alias("log_time"),
        parsed["stream"].alias("stream"),
        # docker keeps the trailing newline; a full line ends with \n
        F.when(parsed["log"].endswith("\n"), "F").otherwise("P").alias("flag"),
        F.regexp_replace(parsed["log"], r"\n$", "").alias("content"),
        F.input_file_name().alias("file"),
    ).filter(parsed["time"].isNotNull())


# RFC 5424: <PRI>VERSION TIMESTAMP HOSTNAME APP-NAME PROCID MSGID SD MSG
# (structured data synthesized/accepted as "-" or a single [..] block)
SYSLOG_5424_REGEX = (
    r"^<(\d{1,3})>(\d) (\S+) (\S+) (\S+) (\S+) (\S+) (?:-|\[.*\]) ?(.*)$"
)
# RFC 3164 (BSD): <PRI>MMM dd HH:mm:ss HOSTNAME TAG[PID]: MSG
SYSLOG_3164_REGEX = (
    r"^<(\d{1,3})>([A-Z][a-z]{2} [ 0-9]\d \d{2}:\d{2}:\d{2}) "
    r"(\S+) ([^:\[\s]+)(?:\[(\d+)\])?: ?(.*)$"
)


def parse_syslog_lines(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse syslog lines — RFC 5424 first, RFC 3164 (BSD) fallback — the
    remaining tail-input parser family member next to `cri` and `docker`
    (Fluent Bit ships the same pair as its stock `syslog-rfc5424` /
    `syslog-rfc3164` parsers).

    Pure Column expressions (two regexes + conditional projection, no
    Python): returns one row per parseable line with
    (format, pri, facility, severity, log_time, host, app, procid, content).
    PRI decomposes as facility = pri / 8, severity = pri % 8 per RFC 5424
    §6.2.1. Unparseable lines are dropped (the reference drops undecodable
    records the same way, main.go:246-249).
    """
    v = F.col(value_col)
    is5424 = v.rlike(SYSLOG_5424_REGEX)
    is3164 = v.rlike(SYSLOG_3164_REGEX)

    def g5(i: int) -> Column:
        return F.regexp_extract(v, SYSLOG_5424_REGEX, i)

    def g3(i: int) -> Column:
        return F.regexp_extract(v, SYSLOG_3164_REGEX, i)

    pri = F.when(is5424, g5(1)).otherwise(g3(1)).cast("int")
    # "-" is RFC 5424 nil; "" is an unmatched optional group (no [pid])
    nil = lambda c: F.when(c.isin("-", ""), None).otherwise(c)  # noqa: E731
    return raw.select(
        F.when(is5424, "rfc5424").otherwise("rfc3164").alias("format"),
        pri.alias("pri"),
        (pri / 8).cast("int").alias("facility"),
        (pri % 8).alias("severity"),
        F.when(is5424, g5(3)).otherwise(g3(2)).alias("log_time"),
        F.when(is5424, g5(4)).otherwise(g3(3)).alias("host"),
        F.when(is5424, g5(5)).otherwise(g3(4)).alias("app"),
        nil(F.when(is5424, g5(6)).otherwise(g3(5))).alias("procid"),
        F.when(is5424, g5(8)).otherwise(g3(6)).alias("content"),
    ).filter(is5424 | is3164)


def throttle_per_key(
    df: DataFrame,
    keys: tuple[str, ...],
    time_col: str = "timestamp",
    bucket: str = "1 hour",
    limit: int = 100,
    tiebreak: tuple[str, ...] = (),
) -> DataFrame:
    """Rate-limit records per key per time bucket — Fluent Bit's `throttle`
    filter, made deterministic: keep the FIRST ``limit`` records of each
    (keys, bucket) group ordered by (time_col, *tiebreak), mark the rest.

    One window shuffle on (keys, bucket); (time_col, *tiebreak) must be a
    total order within a group or the kept set is nondeterministic. Adds a
    boolean ``kept`` instead of filtering so callers can audit drops; filter
    on it to enforce.
    """
    from pyspark.sql.window import Window

    bucket_col = F.window(F.col(time_col), bucket)["start"]
    w = Window.partitionBy(*keys, "_bucket").orderBy(time_col, *tiebreak)
    return (
        df.withColumn("_bucket", bucket_col)
        .withColumn("kept", F.row_number().over(w) <= limit)
        .drop("_bucket")
    )


def reassemble_multiline(
    parsed: DataFrame, order_col: str = "log_time"
) -> DataFrame:
    """Merge partial lines (flag=P) into their terminating full line.

    Docker/CRI split long application lines at 16 KB; the tail input's
    multiline parser reassembles them (cluster/fluent-bit.yaml:66-67). Spark
    expression: within each (file, stream), a full line F terminates the run
    of preceding P lines — assign every line the id of the NEXT F line
    (min over the following frame), then concat per group. Pure window + agg,
    no Python; shuffles once on (file, stream).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("file", "stream").orderBy(order_col)
    rn = F.row_number().over(w)
    with_rn = parsed.withColumn("rn", rn)
    # id of the terminating F-line for each row: min rn of F-lines at/after it
    frame = (
        Window.partitionBy("file", "stream")
        .orderBy("rn")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    group_id = F.min(F.when(F.col("flag") == "F", F.col("rn"))).over(frame)
    return (
        with_rn.withColumn("gid", group_id)
        .filter(F.col("gid").isNotNull())  # trailing P-run with no F: dropped
        .groupBy("file", "stream", "gid")
        .agg(
            F.min(order_col).alias("log_time"),
            # collect_list has no intra-group order guarantee: sort the
            # (rn, content) structs, then strip to content before concat
            F.concat_ws(
                "",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "content"))),
                    lambda s: s["content"],
                ),
            ).alias("log"),
        )
        .drop("gid")
    )


def enrich_with_pod_metadata(
    logs: DataFrame,
    pod_metadata: DataFrame,
    on: tuple[str, str] = ("pod_name", "pod_name"),
) -> DataFrame:
    """S8: kubernetes metadata enrichment as a broadcast join.

    Fluent Bit's kubernetes filter joins pod metadata (labels, namespace,
    host) onto each record (cluster/fluent-bit.yaml:75-86). The dimension is
    tiny (one row per live pod) next to the log stream — broadcast it so the
    fact side never shuffles.
    """
    left_key, right_key = on
    dim = F.broadcast(pod_metadata)
    return logs.join(dim, logs[left_key] == dim[right_key], "left").drop(
        dim[right_key]
    )


def inject_static_fields(df: DataFrame, **fields: str) -> DataFrame:
    """S9: the `modify` filter — add constant columns to every record
    (cluster/fluent-bit.yaml:88-91, e.g. `Add cluster kind`)."""
    for name, value in fields.items():
        df = df.withColumn(name, F.lit(value))
    return df
