"""The logs table — physical layout parity with the reference DDL.

Reference schema.sql:16-21 defines the entire performance contract (SURVEY
§1.3). Spark mapping:

- ``PARTITION BY toDate(timestamp)``  -> ``partitionBy("date")`` parquet; Catalyst
  prunes day directories for time-range predicates (F1) automatically.
- ``ORDER BY (cluster, ..., timestamp)`` -> ``sortWithinPartitions`` on the same
  key before write, so parquet row-group min/max stats skip granules for
  selective envelope predicates (F2) — the sparse-primary-index equivalent.
- ``TTL 30 DAY``                       -> :func:`apply_retention` partition-drop job.
- ``LowCardinality`` / codecs          -> parquet dictionary encoding + zstd
  (set session-wide in session.py).
- ``Distributed(..., rand())``         -> Spark's native partitioned write; no code.

At 100 TB: daily partitions bound each query's scan set; within a day the
cluster-key sort gives row-group skipping without any index structure to
maintain; writes scale horizontally because partitions are independent.
"""

from __future__ import annotations

import shutil
from datetime import date, timedelta
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import CLUSTER_KEY, LOG_COLUMNS, PARTITION_COLUMN


def write_logs(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = 4_000_000,
) -> None:
    """Write logs rows as date-partitioned, cluster-sorted parquet.

    Equivalent of one MergeTree part flush: daily partition dirs
    (schema.sql:17), rows sorted by the cluster key within each file
    (schema.sql:18).  The shuffle is an AQE REBALANCE on the date: small days
    coalesce to one writer (small-file hygiene), while a hot day is SPLIT
    across many writer tasks by advisory partition size
    (``spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled``, on by
    default) — so at 100 TB/day the day's data fans out over parallel writers
    instead of funnelling through one task, the exact MergeTree
    parallel-part-write contract (schema.sql:16-18; each resulting file is an
    internally cluster-sorted "part"; parts may overlap in key space, and
    row-group min/max stats still skip granules).  A plain
    ``repartitionByRange`` was rejected because its boundary sampling
    recomputes the full upstream lineage (a second decode pass on the ingest
    path); REBALANCE sizes partitions from shuffle statistics instead.
    ``maxRecordsPerFile`` caps any single file; :func:`compact_partition`
    handles file-count hygiene per day.
    """
    (
        df.withColumn(PARTITION_COLUMN, F.to_date(F.col("timestamp")))
        .hint("rebalance", PARTITION_COLUMN)
        # date leads the sort: FileFormatWriter requires ordering by the
        # partition column and would otherwise inject its own sort on date
        # alone, destroying the cluster-key order inside each file.
        .sortWithinPartitions(PARTITION_COLUMN, *CLUSTER_KEY)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(PARTITION_COLUMN)
        .parquet(path)
    )


def read_logs(spark: SparkSession, path: str) -> DataFrame:
    """Read the logs table; select() restores the canonical column order."""
    return spark.read.parquet(path).select(PARTITION_COLUMN, *LOG_COLUMNS)


def register_view(spark: SparkSession, path: str, name: str = "logs") -> None:
    """Expose the table to spark.sql() — the read-path entry point (SURVEY §3.4)."""
    read_logs(spark, path).createOrReplaceTempView(name)


def write_logs_promoted(
    df: DataFrame,
    path: str,
    promotions: dict[str, str],
    mode: str = "append",
) -> None:
    """Write logs with materialized fast-path columns for hot map keys.

    Parity with the reference's promoted-column recipe (README.md:69-91:
    ``ADD COLUMN content_level String DEFAULT fields_string['content.level']``
    + MATERIALIZE) — SURVEY §4 option (b): promote at write, no Catalyst rule.
    ``promotions`` maps map-key -> column name. Filters on the promoted
    column scan a dictionary-encoded parquet column and benefit from
    row-group stats; the map column is never touched (Catalyst prunes it).
    """
    from .transform import promote_string_field

    out = df
    for key, column in promotions.items():
        out = promote_string_field(out, key, column)
    write_logs(out, path, mode)


def compact_partition(
    spark: SparkSession,
    path: str,
    partition: str,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> int:
    """Compact one day-partition's small files into ~target-sized files.

    The MergeTree background-merge equivalent: streaming ingest appends one
    file set per micro-batch, so a day accumulates many small files; query
    cost grows with file count (task scheduling + footer reads). Rewrites a
    SINGLE partition directory (never the table) preserving the cluster-key
    sort; safe to run per-day behind the watermark of active ingest.
    Returns the resulting file count.
    """
    part_dir = Path(path) / partition
    if not part_dir.exists():
        return 0
    total_bytes = sum(f.stat().st_size for f in part_dir.glob("*.parquet"))
    n_files = max(1, round(total_bytes / target_file_bytes))
    df = spark.read.parquet(str(part_dir))
    tmp_dir = part_dir.with_name(part_dir.name + "._compacting")
    (
        df.repartition(n_files)
        .sortWithinPartitions(*CLUSTER_KEY)
        .write.mode("overwrite")
        .parquet(str(tmp_dir))
    )
    # atomic-ish swap: parquet writes land under _temporary until committed,
    # so tmp_dir is complete here; replace the old dir
    shutil.rmtree(part_dir)
    tmp_dir.rename(part_dir)
    return len(list(part_dir.glob("*.parquet")))


def apply_retention(
    path: str, retention_days: int = 30, today: date | None = None
) -> list[str]:
    """TTL job: drop day-partitions older than the retention window.

    Parity with ``TTL toDateTime(timestamp) + INTERVAL 30 DAY`` (schema.sql:19)
    — ClickHouse enforces it in storage; Spark needs an explicit partition-drop
    job (SURVEY §1.3). Deleting whole partition directories is O(#days), never
    a data rewrite, so it holds at any scale. Returns dropped partition names.
    """
    today = today or date.today()
    cutoff = today - timedelta(days=retention_days)
    dropped: list[str] = []
    root = Path(path)
    if not root.exists():
        return dropped
    for part in sorted(root.glob(f"{PARTITION_COLUMN}=*")):
        try:
            part_date = date.fromisoformat(part.name.split("=", 1)[1])
        except ValueError:
            continue
        if part_date < cutoff:
            shutil.rmtree(part)
            dropped.append(part.name)
    return dropped
