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


def write_logs(df: DataFrame, path: str, mode: str = "append") -> None:
    """Write logs rows as date-partitioned, cluster-sorted parquet.

    Equivalent of one MergeTree part flush: daily partition dirs
    (schema.sql:17), rows sorted by the cluster key within each file
    (schema.sql:18). ``repartition(date)`` keeps one writer task per day per
    shuffle partition so small files don't proliferate at scale.
    """
    (
        df.withColumn(PARTITION_COLUMN, F.to_date(F.col("timestamp")))
        .repartition(F.col(PARTITION_COLUMN))
        # date leads the sort: FileFormatWriter requires ordering by the
        # partition column and would otherwise inject its own sort on date
        # alone, destroying the cluster-key order inside each file.
        .sortWithinPartitions(PARTITION_COLUMN, *CLUSTER_KEY)
        .write.mode(mode)
        .partitionBy(PARTITION_COLUMN)
        .parquet(path)
    )


def read_logs(spark: SparkSession, path: str) -> DataFrame:
    """Read the logs table; select() restores the canonical column order."""
    return spark.read.parquet(path).select(PARTITION_COLUMN, *LOG_COLUMNS)


def register_view(spark: SparkSession, path: str, name: str = "logs") -> None:
    """Expose the table to spark.sql() — the read-path entry point (SURVEY §3.4)."""
    read_logs(spark, path).createOrReplaceTempView(name)


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
