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

from datetime import date, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .schema import CLUSTER_KEY, LOG_COLUMNS, PARTITION_COLUMN


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path-class, root-Path) for ``path`` via Hadoop's FS API —
    the same abstraction Spark itself writes through, so every table-lifecycle
    operation below works identically on file://, hdfs://, s3a://, etc.
    (the round-1 implementation used pathlib/shutil and was local-only)."""
    jvm = spark._jvm
    hpath_cls = jvm.org.apache.hadoop.fs.Path
    root = hpath_cls(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath_cls, root


LAYOUT_MARKER = "_layout.json"


def _write_layout_marker(spark: SparkSession, path: str, layout: dict) -> None:
    """Record the table's physical sort contract (cluster-key vs z-order)
    so every maintenance job that rewrites partitions — compaction,
    predicate deletes, backfills — re-sorts them the way the writer laid
    them out, instead of silently converting a z-ordered table back to the
    lexicographic key. '_'-prefixed so Spark readers ignore it; replaced
    atomically via temp-write + checked rename."""
    import json

    fs, hpath_cls, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        fs.mkdirs(root)
    tmp = hpath_cls(f"{path}/.{LAYOUT_MARKER}.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(json.dumps(layout).encode())
    finally:
        out.close()
    final = hpath_cls(f"{path}/{LAYOUT_MARKER}")
    if fs.exists(final):
        fs.delete(final, False)
    if not fs.rename(tmp, final):
        raise IOError(f"could not publish layout marker under {path}")


def read_layout(spark: SparkSession, path: str) -> dict:
    """The table's recorded sort layout; tables written before markers
    existed default to the reference cluster key."""
    import json

    fs, hpath_cls, _ = _hadoop_fs(spark, path)
    mf = hpath_cls(f"{path}/{LAYOUT_MARKER}")
    if not fs.exists(mf):
        return {"layout": "cluster"}
    stream = fs.open(mf)
    try:
        data = bytes(stream.readAllBytes())
    finally:
        stream.close()
    return json.loads(data.decode())


def _layout_sorted(df: DataFrame, layout: dict, lead_partition: bool) -> DataFrame:
    """Sort ``df`` per the table's layout contract. ``lead_partition``
    prepends the date column (required by FileFormatWriter when the frame
    spans partitions; single-partition rewrites omit it)."""
    lead = [PARTITION_COLUMN] if lead_partition else []
    if layout.get("layout") == "zorder":
        from .ext.zorder import add_zorder

        cols = df.columns
        z = add_zorder(df, list(layout["cols"]))
        return z.sortWithinPartitions(*lead, "_z", "timestamp").select(*cols)
    return df.sortWithinPartitions(*lead, *CLUSTER_KEY)


def write_logs(
    df: DataFrame,
    path: str,
    mode: str = "append",
    max_records_per_file: int = 4_000_000,
    mark_layout: bool = True,
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

    Promotion invariant (README.md:69-91 DEFAULT-column parity): when the
    table's layout marker records promoted columns, ANY append through
    this writer materializes the missing ones from the map — so every
    data file carries the physical column and the transparent read-path
    rewrite (logs_query) never serves NULLs for rows written by a plain
    append. Tables promoted AFTER accumulating plain history need the
    one-off :func:`materialize_promotions` backfill (the MATERIALIZE
    COLUMN twin).
    """
    if mark_layout:
        promos = read_layout(df.sparkSession, path).get("promotions") or {}
        missing = {
            k: c for k, c in promos.items() if c not in df.columns
        }
        if missing:
            from .transform import promote_string_field

            for key, column in missing.items():
                df = promote_string_field(df, key, column)
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
    # record the sort contract for maintenance jobs; never clobber an
    # existing marker (an append into a z-ordered table must not flip it).
    # mark_layout=False for writes into staging/scratch directories that
    # are not table roots (stream.exactly_once_sink's _staging batches).
    if mark_layout:
        spark = df.sparkSession
        fs, hpath_cls, _ = _hadoop_fs(spark, path)
        if not fs.exists(hpath_cls(f"{path}/{LAYOUT_MARKER}")):
            _write_layout_marker(spark, path, {"layout": "cluster"})


def read_logs(spark: SparkSession, path: str) -> DataFrame:
    """Read the logs table; select() restores the canonical column order.

    Manifest-aware (VERDICT r17 #2 + review): on a table with ANY
    published snapshot, a raw directory read is wrong twice over — it
    resurrects MOR-deleted rows when a deletion vector governs the head,
    and it double-reads the tombstone files a copy-on-write rewrite
    deliberately retains for pinned readers. Such tables read through
    the manifest layer's current-state view instead (head files +
    committed unmanifested appends, vector anti-joined). Plain
    directories pay one ``_manifest`` listStatus for the check and read
    raw as before."""
    from .manifest import read_current_state, snapshot_versions

    if snapshot_versions(spark, path):
        return read_current_state(spark, path).select(
            PARTITION_COLUMN, *LOG_COLUMNS
        )
    return spark.read.parquet(path).select(PARTITION_COLUMN, *LOG_COLUMNS)


def register_view(spark: SparkSession, path: str, name: str = "logs") -> None:
    """Expose the table to spark.sql() — the read-path entry point (SURVEY
    §3.4). Tables written with :func:`write_logs_promoted` additionally
    expose their promoted physical columns, so SQL callers can filter on
    the materialized fast path directly."""
    promos = read_layout(spark, path).get("promotions") or {}
    df = _read_with_promotions(spark, path, promos)
    df.createOrReplaceTempView(name)


def _read_with_promotions(spark: SparkSession, path: str, promos: dict):
    """Table read exposing the promoted physical columns. mergeSchema makes
    the columns resolve even on a table with not-yet-materialized plain
    history (those rows read NULL until materialize_promotions backfills
    them — the documented DEFAULT/MATERIALIZE contract). Manifest-aware
    like :func:`read_logs`: any published snapshot routes the read
    through the manifest layer's current-state view (read_current_state
    reads with mergeSchema, so promoted physical columns survive the
    detour)."""
    from .manifest import read_current_state, snapshot_versions

    if snapshot_versions(spark, path):
        return read_current_state(spark, path).select(
            PARTITION_COLUMN, *LOG_COLUMNS, *promos.values()
        )
    reader = spark.read
    if promos:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(path).select(
        PARTITION_COLUMN, *LOG_COLUMNS, *promos.values()
    )


def logs_query(spark: SparkSession, path: str):
    """Open the table for fluent querying with its recorded physical-design
    metadata applied: returns a :class:`klogs_spark.query.LogsQuery` whose
    dynamic-field predicates are TRANSPARENTLY rewritten onto promoted
    materialized columns when the layout marker records them
    (write_logs_promoted) — callers keep asking about
    ``fields_string['content.level']`` and the plan scans the physical
    column with the filter pushed down, the map column pruned away
    (reference README.md:69-91; SURVEY §4 option (b) completed engine-side,
    no Catalyst extension needed)."""
    from .query import LogsQuery

    layout = read_layout(spark, path)
    promos = layout.get("promotions") or {}
    return LogsQuery(
        _read_with_promotions(spark, path, promos),
        promos,
        promoted_exists_ok=not layout.get("promotions_deficient", False),
    )


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

    spark = df.sparkSession
    layout = read_layout(spark, path)
    new_keys = {
        k: c
        for k, c in promotions.items()
        if (layout.get("promotions") or {}).get(k) != c
    }
    # deficiency check BEFORE the write: promoting a key on a table that
    # already holds history means the old files lack the physical column —
    # existence fast paths must fall back to the map until
    # materialize_promotions backfills (see LogsQuery.where_exists)
    had_history = False
    if new_keys:
        fs, hpath_cls, root = _hadoop_fs(spark, path)
        prefix = f"{PARTITION_COLUMN}="
        had_history = fs.exists(root) and any(
            s.isDirectory() and s.getPath().getName().startswith(prefix)
            for s in fs.listStatus(root)
        )
    out = df
    for key, column in promotions.items():
        out = promote_string_field(out, key, column)
    write_logs(out, path, mode)
    # record the promotions in the layout marker so read paths
    # (logs_query, register_view) rewrite map-key access onto the
    # physical columns without the caller knowing
    merged = {**(layout.get("promotions") or {}), **promotions}
    deficient = bool(layout.get("promotions_deficient")) or (
        bool(new_keys) and had_history
    )
    if (
        layout.get("promotions") != merged
        or bool(layout.get("promotions_deficient")) != deficient
    ):
        _write_layout_marker(
            spark,
            path,
            {
                **layout,
                "promotions": merged,
                "promotions_deficient": deficient,
            },
        )


def write_logs_zordered(
    df: DataFrame,
    path: str,
    zorder_on: tuple[str, ...] = ("namespace", "app", "host"),
    mode: str = "append",
    max_records_per_file: int = 4_000_000,
) -> None:
    """Write logs z-ordered inside each day partition instead of
    lexicographically cluster-sorted.

    The lexicographic cluster key (schema.sql:18, :func:`write_logs`) gives
    all of its row-group-skipping power to leading columns; an equality
    filter on a trailing dimension (host) touches every row group. Sorting
    by the Morton interleave of the dimensions' hashes
    (:func:`klogs_spark.ext.zorder.zorder_value`) spreads the locality so
    min/max stats skip for ANY of the z-ordered columns — the right layout
    when the query mix filters on several dimensions none of which
    dominates. Timestamp remains the final sort component so time ranges
    stay locally ordered within a z-run.
    """
    from .ext.zorder import add_zorder

    dated = df.withColumn(PARTITION_COLUMN, F.to_date(F.col("timestamp")))
    (
        add_zorder(dated, list(zorder_on))
        .hint("rebalance", PARTITION_COLUMN)
        .sortWithinPartitions(PARTITION_COLUMN, "_z", "timestamp")
        .drop("_z")
        .select(*dated.columns)
        .write.mode(mode)
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy(PARTITION_COLUMN)
        .parquet(path)
    )
    # the z-order writer is the layout authority: maintenance jobs re-sort
    # rewritten partitions by this marker, not the lexicographic default
    _write_layout_marker(
        df.sparkSession, path, {"layout": "zorder", "cols": list(zorder_on)}
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 16,
    path: str | None = None,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (hash-pre-partitioned) table write — Spark's native
    co-location primitive, the storage-layout answer to the reference's
    Distributed-table sharding key (schema.sql:21 shards by
    ``rand()``; bucketing shards by CONTENT so equal keys co-locate).

    Each side of a recurring join written with the same bucket count and
    key joins with ZERO exchange: the scan's hash-bucketed layout already
    satisfies the join's required distribution, so at 100 TB the daily
    fact/dim join never reshuffles either table. ``sort_cols`` adds the
    in-bucket sort that lets the sort-merge join skip its Sort nodes too.
    Registered through the session catalog (bucket metadata lives there);
    ``path`` makes it an external table at that location.
    """
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table_name)



def _refuse_inplace_on_clone(spark: SparkSession, path: str, op: str) -> None:
    """The in-place maintenance tier's shallow-clone guard: when the head
    manifest references files OUTSIDE the table root, a directory listing
    is a strict subset of the table, so an in-place delete/compact/
    retention/backfill pass would silently skip (or half-apply to) the
    rows served through those references. The COW verbs handle clones
    correctly — route there."""
    from .manifest import has_live_dv, head_has_absolute_refs

    if head_has_absolute_refs(spark, path):
        raise ValueError(
            f"{op}({path}) refused: the head manifest references source "
            "files outside the table root (shallow clone) — in-place "
            "maintenance sees only clone-local files and would silently "
            "half-apply; use the COW tier (cow_delete_where / "
            "cow_compact_partition / cow_merge_upsert) instead"
        )
    if has_live_dv(spark, path):
        raise ValueError(
            f"{op}({path}) refused: the head snapshot is governed by a "
            "deletion vector (merge-on-read deletes) — an in-place "
            "rewrite reads raw parquet without the vector and re-keys "
            "files, RESURRECTING every MOR-deleted row; run dv_compact "
            "(or use the COW tier, which reads through read_snapshot) "
            "first"
        )


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
    _refuse_inplace_on_clone(spark, path, "table.compact_partition")
    fs, hpath_cls, root = _hadoop_fs(spark, path)
    part_path = hpath_cls(root, partition)
    if not fs.exists(part_path):
        return 0

    def _parquet_files():
        return [
            s
            for s in fs.listStatus(part_path)
            if s.getPath().getName().endswith(".parquet")
        ]

    total_bytes = sum(s.getLen() for s in _parquet_files())
    n_files = max(1, round(total_bytes / target_file_bytes))
    col, _, val = partition.partition("=")
    # Spark-native single-partition INSERT OVERWRITE: read the one partition
    # directory, restore the partition column from the dir name, and rewrite
    # through the committer with dynamic partition overwrite — only this
    # partition is replaced, the swap happens at job commit (a rename on
    # HDFS/local), and no engine-external rmtree/rename is involved, so the
    # operation is safe wherever the table lives. For stronger isolation
    # under concurrent readers on object stores, front the table with a
    # transactional format (Delta) — documented production option.
    df = spark.read.parquet(f"{path}/{partition}").withColumn(
        col, F.lit(val).cast("date" if col == PARTITION_COLUMN else "string")
    )
    (
        _layout_sorted(
            df.repartition(n_files), read_layout(spark, path),
            lead_partition=False,
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(col)
        .parquet(path)
    )
    return len(_parquet_files())


def reprocess_partition(
    spark: SparkSession,
    path: str,
    partition: str,
    transform,
) -> int:
    """Backfill one day through a new transform (the reprocessing job every
    pipeline eventually needs: a parser fix, a new promoted column, a
    redaction sweep): read ONLY the partition directory, apply
    ``transform(df) -> df``, and swap the day atomically via dynamic
    partition overwrite at job commit — exactly the
    :func:`compact_partition` machinery with a logic hook, and the same
    safety shape: sources are subdirectories, untouched days never
    rewrite. The transform must preserve the schema (minus the partition
    column, which is restored from the directory name). The table's
    recorded sort layout (cluster key or z-order, see ``read_layout``) is
    re-applied after the transform. Returns the day's row count.
    """
    _refuse_inplace_on_clone(spark, path, "table.reprocess_partition")
    fs, hpath_cls, root = _hadoop_fs(spark, path)
    if not fs.exists(hpath_cls(root, partition)):
        return 0
    col, _, val = partition.partition("=")
    df = spark.read.parquet(f"{path}/{partition}")
    out = transform(df).withColumn(
        col, F.lit(val).cast("date" if col == PARTITION_COLUMN else "string")
    )
    (
        _layout_sorted(out, read_layout(spark, path), lead_partition=False)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(col)
        .parquet(path)
    )
    return spark.read.parquet(f"{path}/{partition}").count()


def collect_column_stats(
    df: DataFrame,
    columns: list,
    approx: bool = False,
) -> DataFrame:
    """ANALYZE-style statistics job: one row per column with
    (col_name, n_rows, n_nulls, ndv, min_value, max_value) — the inputs a
    cost-based planner (or a human sizing a query) needs, the Spark twin
    of ``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS``.

    ``columns`` may contain names or (name, Column) pairs, so stats can
    cover derived expressions (e.g. a map key) alongside physical columns.
    Everything is ONE aggregate over the table: counts/min/max are plain
    partial aggs; the exact distinct counts expand the aggregate but stay
    map-side-combinable. ``approx=True`` swaps exact ``count_distinct``
    for ``approx_count_distinct`` (HLL++) — the 100 TB default where
    ±2% NDV is fine; exact mode exists for oracles and small tables.
    The single stats row unpivots via ``stack`` — constant-size output.
    """
    specs = [
        (c, F.col(c)) if isinstance(c, str) else c for c in columns
    ]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, col in specs:
        ndv = (
            F.approx_count_distinct(col)
            if approx
            else F.count_distinct(col)
        )
        aggs += [
            F.sum(col.isNull().cast("long")).alias(f"{name}__nulls"),
            ndv.alias(f"{name}__ndv"),
            F.min(col).cast("string").alias(f"{name}__min"),
            F.max(col).cast("string").alias(f"{name}__max"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', __n, {name}__nulls, {name}__ndv, {name}__min, {name}__max"
        for name, _ in specs
    )
    return row.selectExpr(
        f"stack({len(specs)}, {stack_args}) AS "
        "(col_name, n_rows, n_nulls, ndv, min_value, max_value)"
    )


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
) -> dict:
    """Row-level delete (the GDPR / right-to-be-forgotten job): remove every
    row matching ``predicate`` (a Column or SQL string) by rewriting ONLY
    the day-partitions that contain matches.

    Three phases, none corpus-sized beyond the targeted partitions:

      1. find affected days — one aggregate over the predicate (partition
         stats + pushdown prune the scan);
      2. dynamic-partition-overwrite the affected days with their KEPT rows
         (cluster sort preserved). Spark's dynamic mode only replaces
         partitions that receive data, so untouched days never rewrite;
      3. a day whose every row matched emits no data in (2) and would
         survive as a stale directory — those days are dropped through the
         FileSystem API (checked delete, same contract as apply_retention).

    Returns {"partitions_rewritten": [...], "partitions_dropped": [...],
    "rows_deleted": n}. At 100 TB the rewrite cost is proportional to the
    affected days' data, the norm for parquet-backed row deletes (the same
    copy-on-write contract as Delta/Iceberg without the manifest layer).

    SQL DELETE contract: a row is deleted only where the predicate is TRUE.
    A NULL predicate (e.g. ``element_at(fields_string,'user')='42'`` on a
    row missing the key) keeps the row — three-valued logic is collapsed
    with ``coalesce(pred, false)`` so survivors are "not TRUE", never
    "TRUE of the negation".
    """
    _refuse_inplace_on_clone(spark, path, "table.delete_where")
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate
    pred = F.coalesce(pred, F.lit(False))
    tbl = spark.read.parquet(path)
    per_day = (
        tbl.groupBy(PARTITION_COLUMN)
        .agg(
            F.sum(pred.cast("int")).alias("_matches"),
            F.count(F.lit(1)).alias("_rows"),
        )
        .filter(F.col("_matches") > 0)
        .collect()
    )
    rewritten: list[str] = []
    dropped: list[str] = []
    deleted = 0
    full = [r for r in per_day if r["_matches"] == r["_rows"]]
    partial = [r for r in per_day if r["_matches"] < r["_rows"]]
    if partial:
        # read each affected day as a SUBDIRECTORY (the compact_partition
        # precedent): the write plan's sources never equal the output root,
        # so Spark's overwrite-while-reading guard stays satisfied, and
        # dynamic mode swaps exactly these days at job commit
        days = [r[PARTITION_COLUMN] for r in partial]
        parts = [
            spark.read.parquet(f"{path}/{PARTITION_COLUMN}={d}")
            .withColumn(PARTITION_COLUMN, F.lit(str(d)).cast("date"))
            for d in days
        ]
        keep = parts[0]
        for p in parts[1:]:
            keep = keep.unionByName(p)
        (
            _layout_sorted(
                keep.filter(~pred), read_layout(spark, path),
                lead_partition=True,
            )
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COLUMN)
            .parquet(path)
        )
        rewritten = [f"{PARTITION_COLUMN}={d}" for d in days]
        deleted += sum(r["_matches"] for r in partial)
    if full:
        fs, hpath_cls, root = _hadoop_fs(spark, path)
        for r in full:
            name = f"{PARTITION_COLUMN}={r[PARTITION_COLUMN]}"
            target = hpath_cls(root, name)
            if fs.exists(target) and not fs.delete(target, True):
                raise IOError(f"delete_where could not drop {name} under {path}")
            dropped.append(name)
            deleted += r["_matches"]
    return {
        "partitions_rewritten": rewritten,
        "partitions_dropped": dropped,
        "rows_deleted": int(deleted),
    }


def compact_table(
    spark: SparkSession,
    path: str,
    max_files_per_partition: int = 8,
    target_file_bytes: int = 512 * 1024 * 1024,
) -> dict[str, int]:
    """Maintenance sweep: compact every day-partition whose file count
    exceeds the threshold — the scheduled equivalent of MergeTree's
    background merges (streaming ingest appends one file set per
    micro-batch, so file counts grow until merged). O(#days) listing via
    the FS API; only oversized partitions rewrite. Returns
    {partition: resulting_file_count} for the partitions compacted.
    """
    _refuse_inplace_on_clone(spark, path, "table.compact_table")
    fs, _, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return {}
    compacted: dict[str, int] = {}
    prefix = f"{PARTITION_COLUMN}="
    for status in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue
        n_files = sum(
            1
            for f in fs.listStatus(status.getPath())
            if f.getPath().getName().endswith(".parquet")
        )
        if n_files > max_files_per_partition:
            compacted[name] = compact_partition(
                spark, path, name, target_file_bytes
            )
    return compacted


def apply_retention(
    path: str,
    retention_days: int = 30,
    today: date | None = None,
    spark: SparkSession | None = None,
    dry_run: bool = False,
) -> list[str]:
    """TTL job: drop day-partitions older than the retention window.

    Parity with ``TTL toDateTime(timestamp) + INTERVAL 30 DAY`` (schema.sql:19)
    — ClickHouse enforces it in storage; Spark needs an explicit partition-drop
    job (SURVEY §1.3). Deleting whole partition directories is O(#days), never
    a data rewrite, so it holds at any scale; deletion goes through the Hadoop
    FileSystem API so it works on object stores, not just file://.
    ``dry_run=True`` reports what WOULD drop without touching anything —
    the approve-before-delete step every retention runbook wants.
    Returns dropped (or would-drop) partition names.
    """
    spark = spark or SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
    _refuse_inplace_on_clone(spark, path, "table.apply_retention")
    today = today or date.today()
    cutoff = today - timedelta(days=retention_days)
    dropped: list[str] = []
    failed: list[str] = []
    fs, _, root = _hadoop_fs(spark, path)
    if not fs.exists(root):
        return dropped
    prefix = f"{PARTITION_COLUMN}="
    for status in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(prefix)):
            continue
        try:
            part_date = date.fromisoformat(name.split("=", 1)[1])
        except ValueError:
            continue
        if part_date < cutoff:
            if dry_run:
                dropped.append(name)
                continue
            # FileSystem.delete reports failure by returning FALSE, not by
            # raising (the S3A failure mode): a false here must not be
            # reported as dropped. Attempt every expired partition, then
            # surface the failures — the periodic TTL job retries next run.
            if fs.delete(status.getPath(), True):
                dropped.append(name)
                # drop the day's token-Bloom sidecar partition with it —
                # otherwise stale index days accumulate for the table's
                # lifetime (search stays correct either way: candidate days
                # are intersected with live partitions). A false/missing
                # delete is NOT a retention failure — the sidecar row is
                # unreachable once the data partition is gone.
                sidecar = _hadoop_fs(
                    spark, f"{path}/{TOKEN_BLOOM_DIR}/{name}"
                )[2]
                if fs.exists(sidecar):
                    fs.delete(sidecar, True)
            else:
                failed.append(name)
    if failed:
        raise IOError(
            f"retention could not drop partitions {failed} under {path}; "
            f"dropped so far: {dropped}"
        )
    return dropped


# --- token-bloom partition skip index ---------------------------------------
# Beyond the reference DDL (schema.sql has no skip indexes): a per-day token
# Bloom filter over the `log` column, the Spark-side equivalent of
# ClickHouse's tokenbf_v1 data-skipping index. The index is a sidecar
# parquet under the table root ("_"-prefixed, so table readers never see
# it): one (date, pos) row per SET Bloom bit per day — at most
# TOKEN_BLOOM_M rows/day no matter how many log lines the day holds. A
# token full-text search consults the index at PLAN time and reads only
# the day partitions whose filter can contain every needle token: Bloom
# false positives cost one pruned-partition scan, false negatives are
# impossible for whole-token matches. At 100 TB (30 daily partitions of
# ~3 TB) a rare-token search touches exactly the days that can match.
TOKEN_BLOOM_DIR = "_token_bloom"
TOKEN_BLOOM_M = 4096
TOKEN_BLOOM_K = 3


def optimize_zorder(
    spark: SparkSession,
    path: str,
    zorder_on: tuple[str, ...] = ("namespace", "app", "host"),
    days: list[str] | None = None,
) -> list[str]:
    """Convert an EXISTING table to the z-order layout in place — the
    ``OPTIMIZE ... ZORDER BY`` twin (write_logs_zordered covers new
    writes; this rewrites history). Day-at-a-time subdirectory reads keep
    Spark's overwrite-while-reading guard satisfied; each day rewrites in
    Morton order via dynamic partition overwrite, and the layout marker
    flips FIRST so maintenance jobs racing the rewrite already re-sort by
    the target layout (either sort is correct data-wise — the marker is a
    layout, not a correctness, contract). ``days`` restricts the rewrite
    (resumable backfill); default is every partition. Cost is the
    rewritten days' data — the same copy-on-write bill OPTIMIZE pays
    anywhere. Returns the rewritten partition names."""
    _refuse_inplace_on_clone(spark, path, "table.optimize_zorder")
    from .ext.zorder import add_zorder

    _write_layout_marker(
        spark, path, {
            **read_layout(spark, path),
            "layout": "zorder", "cols": list(zorder_on),
        },
    )
    fs, hpath_cls, root = _hadoop_fs(spark, path)
    prefix = f"{PARTITION_COLUMN}="
    targets = []
    for part in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        name = part.getPath().getName()
        if part.isDirectory() and name.startswith(prefix):
            if days is None or name.split("=", 1)[1] in set(days):
                targets.append(name)
    for name in targets:
        day = name.split("=", 1)[1]
        part_df = (
            spark.read.parquet(f"{path}/{name}")
            .withColumn(PARTITION_COLUMN, F.lit(day).cast("date"))
        )
        cols = part_df.columns
        (
            add_zorder(part_df, list(zorder_on))
            .sortWithinPartitions(PARTITION_COLUMN, "_z", "timestamp")
            .select(*cols)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(PARTITION_COLUMN)
            .parquet(path)
        )
    return targets


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
) -> dict:
    """Copy-on-write MERGE (the Delta/Iceberg ``MERGE INTO ... WHEN MATCHED
    UPDATE WHEN NOT MATCHED INSERT`` equivalent for the native table):
    rows in ``updates`` replace existing rows with the same key, new keys
    insert — rewriting ONLY the day partitions the updates touch.

    Mechanics per affected day (the delete_where discipline): read the day
    as a subdirectory, LEFT ANTI join out the matched keys, union the
    day's updates, re-sort per the recorded layout, dynamic-partition
    overwrite. Days the updates never mention are untouched; a day that
    exists only in the updates is created by the same write. The key
    must be unique within ``updates`` (last-writer-wins semantics would
    need an explicit precedence column — out of scope, stated).

    At 100 TB the rewrite cost is the touched days' data — the standard
    copy-on-write MERGE contract. Returns {"partitions_written": [...],
    "rows_updated": n, "rows_inserted": n}."""
    _refuse_inplace_on_clone(spark, path, "table.merge_upsert")
    # promotion invariant (same DEFAULT-on-insert contract as write_logs):
    # updates materialize any promoted columns they lack, so a MERGE into
    # a promoted table never produces deficient files or schema mismatches
    promos = read_layout(spark, path).get("promotions") or {}
    mat = updates
    for pkey, pcol in promos.items():
        if pcol not in mat.columns:
            from .transform import promote_string_field

            mat = promote_string_field(mat, pkey, pcol)
    dated = mat.withColumn(
        PARTITION_COLUMN, F.to_date(F.col("timestamp"))
    )
    days = [str(r[0]) for r in dated.select(PARTITION_COLUMN).distinct().collect()]
    if not days:
        return {"partitions_written": [], "rows_updated": 0,
                "rows_inserted": 0}
    fs, hpath_cls, _ = _hadoop_fs(spark, path)
    existing_parts = []
    for d in days:
        target = hpath_cls(f"{path}/{PARTITION_COLUMN}={d}")
        if fs.exists(target):
            # mergeSchema: a promoted table may hold pre-backfill files
            # lacking the promoted column inside one day — without it the
            # read can drop that column or break the union below
            existing_parts.append(
                spark.read.option("mergeSchema", "true")
                .parquet(f"{path}/{PARTITION_COLUMN}={d}")
                .withColumn(PARTITION_COLUMN, F.lit(d).cast("date"))
            )
    n_upd = 0
    if existing_parts:
        existing = existing_parts[0]
        for p in existing_parts[1:]:
            existing = existing.unionByName(p, allowMissingColumns=True)
        keys = dated.select(*key_cols)
        # count matched UPDATE rows (not matched existing rows): a key
        # matching several existing rows must not inflate rows_updated
        # past len(updates) and drive rows_inserted negative
        n_upd = keys.join(
            existing.select(*key_cols), key_cols, "left_semi"
        ).count()
        kept = existing.join(keys, key_cols, "left_anti")
        merged = kept.unionByName(dated, allowMissingColumns=True)
    else:
        merged = dated
    (
        _layout_sorted(merged, read_layout(spark, path), lead_partition=True)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COLUMN)
        .parquet(path)
    )
    n_updates = dated.count()
    return {
        "partitions_written": [f"{PARTITION_COLUMN}={d}" for d in sorted(days)],
        "rows_updated": int(n_upd),
        "rows_inserted": int(n_updates - n_upd),
    }


def apply_retention_policy(
    spark: SparkSession,
    path: str,
    policies: dict[str, int],
    default_days: int = 30,
    today: date | None = None,
) -> dict:
    """Differentiated TTL — per-namespace retention windows, the
    data-category retention a GDPR program needs beyond the reference's
    single ``TTL 30 DAY`` (schema.sql:19). ``policies`` maps namespace ->
    retention days; everything unlisted keeps ``default_days``.

    Namespaces share day partitions, so this composes onto
    :func:`delete_where`'s machinery with ONE predicate OR-ing each
    namespace's cutoff: days older than every applicable window empty out
    and drop as directories (the cheap whole-partition path — equivalent
    to apply_retention), while days where only some namespaces expired
    rewrite themselves once. One table pass total regardless of how many
    policies exist; untouched days never rewrite. Returns delete_where's
    report."""
    _refuse_inplace_on_clone(spark, path, "table.apply_retention_policy")
    today = today or date.today()
    listed = list(policies)
    conds = []
    for ns, days in policies.items():
        cut = (today - timedelta(days=days)).isoformat()
        conds.append(
            (F.col("namespace") == ns)
            & (F.col(PARTITION_COLUMN) < F.lit(cut).cast("date"))
        )
    dcut = (today - timedelta(days=default_days)).isoformat()
    default_cond = F.col(PARTITION_COLUMN) < F.lit(dcut).cast("date")
    if listed:
        default_cond = default_cond & ~F.col("namespace").isin(listed)
    conds.append(default_cond)
    pred = conds[0]
    for c in conds[1:]:
        pred = pred | c
    return delete_where(spark, path, pred)


def write_token_bloom_index(
    spark: SparkSession,
    path: str,
    m: int = TOKEN_BLOOM_M,
    k: int = TOKEN_BLOOM_K,
    days: list[str] | None = None,
) -> None:
    """Build or incrementally refresh the per-day token Bloom sidecar.

    One pass over `log`: explode whitespace tokens, compute each token's k
    double-hashed bit positions (the same Kirsch-Mitzenmacher scheme as
    ext.text.bloom_decontaminate), distinct per day. Map-side combines make
    the shuffled data at most m rows per (day, task).

    The sidecar is itself partitioned by day and written with DYNAMIC
    partition overwrite, so ``days=[...]`` recomputes only those days'
    filters and leaves every other day's sidecar files untouched — the
    incremental-maintenance path a daily ingest runs after appending to
    today's partition. ``days=None`` rebuilds everything (still via dynamic
    overwrite: only days present in the table are rewritten)."""
    from .ext.text import _bloom_pos

    logs = spark.read.parquet(path)
    if days is not None:
        logs = logs.filter(
            F.col(PARTITION_COLUMN).isin([str(d) for d in days])
        )
    toks = logs.select(
        F.col(PARTITION_COLUMN),
        F.explode(
            F.filter(F.split(F.col("log"), " "), lambda t: t != "")
        ).alias("tok"),
    )
    pos = (
        toks.select(
            PARTITION_COLUMN,
            F.explode(
                F.array(*[_bloom_pos(F.col("tok"), j, m) for j in range(k)])
            ).alias("pos"),
        )
        .distinct()
    )
    (
        pos.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COLUMN)
        .parquet(f"{path}/{TOKEN_BLOOM_DIR}")
    )


def _py_bloom_positions(token: str, m: int, k: int) -> list[int]:
    """Driver-side twin of ext.text._bloom_pos — must hash identically."""
    import hashlib

    h1 = int(hashlib.md5(b"a:" + token.encode()).hexdigest()[:8], 16)
    h2 = int(hashlib.md5(b"b:" + token.encode()).hexdigest()[:8], 16)
    return [(h1 + j * h2) % m for j in range(k)]


def _bloom_candidate_days(
    spark: SparkSession,
    path: str,
    needle_tokens: list[str],
    m: int,
    k: int,
    match: str,
) -> list:
    """Skip-index lookup: the day partitions whose Bloom filter CAN contain
    the needles — every token's k bits set (match='all') or at least one
    token fully present (match='any'). The index read is manifest-sized
    (<= m rows/day) — collecting it on the driver IS the lookup, the same
    plan-time role ClickHouse's index granule bitmap plays. Only days still
    present in the table are considered, so sidecar rows orphaned between a
    retention drop and the next index refresh can never resurrect a day."""
    idx = spark.read.parquet(f"{path}/{TOKEN_BLOOM_DIR}")
    fs, _, root = _hadoop_fs(spark, path)
    live_days = {
        s.getPath().getName().split("=", 1)[1]
        for s in fs.listStatus(root)
        if s.isDirectory()
        and s.getPath().getName().startswith(f"{PARTITION_COLUMN}=")
    }
    by_date: dict = {}
    for r in idx.collect():
        if str(r[PARTITION_COLUMN]) in live_days:
            by_date.setdefault(r[PARTITION_COLUMN], set()).add(r.pos)
    needed = [_py_bloom_positions(t, m, k) for t in needle_tokens]
    combine = all if match == "all" else any
    return sorted(
        d
        for d, bits in by_date.items()
        if combine(all(p in bits for p in ps) for ps in needed)
    )


def fulltext_token_search(
    spark: SparkSession,
    path: str,
    needle_tokens: list[str],
    m: int = TOKEN_BLOOM_M,
    k: int = TOKEN_BLOOM_K,
    match: str = "all",
) -> DataFrame:
    """Whole-token full-text search that skips day partitions via the Bloom
    sidecar. ``match='all'``: a day qualifies only if EVERY needle token's
    k bits are set in its filter, and rows must contain every token (the
    AND search). ``match='any'``: a day qualifies if ANY single token is
    fully present, and rows must contain at least one token (the OR
    search — the pruned set is the union of each token's candidate days).
    Candidate days become a partition-column IN-filter, so the parquet scan
    lists only those directories (PartitionFilters in the plan); the exact
    token match then removes Bloom false positives. Bloom false negatives
    are impossible for whole-token matches in both modes."""
    if match not in ("all", "any"):
        raise ValueError(f"match must be 'all' or 'any', got {match!r}")
    dates = _bloom_candidate_days(spark, path, needle_tokens, m, k, match)
    base = read_logs(spark, path)
    if not dates:
        return base.filter(F.lit(False))
    out = base.filter(F.col(PARTITION_COLUMN).isin(dates))
    toks = F.split(F.col("log"), " ")
    token_filters = [F.array_contains(toks, t) for t in needle_tokens]
    if match == "all":
        for cond in token_filters:
            out = out.filter(cond)
        return out
    any_cond = token_filters[0]
    for cond in token_filters[1:]:
        any_cond = any_cond | cond
    return out.filter(any_cond)


def fulltext_phrase_search(
    spark: SparkSession,
    path: str,
    phrase: str,
    m: int = TOKEN_BLOOM_M,
    k: int = TOKEN_BLOOM_K,
) -> DataFrame:
    """Quoted-phrase search on the SAME token-Bloom sidecar: a phrase can
    only occur in a day where every one of its tokens occurs, so the prune
    is the match='all' token lookup; the verification filter then checks
    the exact contiguous phrase (substring containment) on the pruned
    scan. Same guarantee as the token search: pruning can only lose Bloom
    false positives, never a day that holds the phrase."""
    tokens = [t for t in phrase.split(" ") if t]
    if not tokens:
        raise ValueError("phrase must contain at least one token")
    dates = _bloom_candidate_days(spark, path, tokens, m, k, "all")
    base = read_logs(spark, path)
    if not dates:
        return base.filter(F.lit(False))
    return base.filter(F.col(PARTITION_COLUMN).isin(dates)).filter(
        F.col("log").contains(phrase)
    )


def materialize_promotions(spark: SparkSession, path: str) -> list[str]:
    """Backfill promoted columns into data files written BEFORE the
    promotion was recorded — the MATERIALIZE COLUMN half of the reference
    recipe (README.md:69-91; the DEFAULT half is write_logs's automatic
    materialization on append). Needed exactly when write_logs_promoted
    appends onto a table with plain history: those old files lack the
    physical column, and the transparent read-path rewrite would serve
    NULLs for their rows.

    Detection is footer-only (one parquet metadata read per file, no data
    scan — the standard cost of a one-off backfill job); only days with a
    deficient file rewrite, via the same subdirectory-read +
    dynamic-overwrite discipline as delete_where, preserving the recorded
    sort layout. Values come from ``coalesce(column, map[key])`` so mixed
    days keep already-materialized values byte-identical. Returns the
    rewritten partition names."""
    _refuse_inplace_on_clone(spark, path, "table.materialize_promotions")
    from .transform import field_string

    promos = read_layout(spark, path).get("promotions") or {}
    if not promos:
        return []
    fs, hpath_cls, root = _hadoop_fs(spark, path)
    prefix = f"{PARTITION_COLUMN}="
    deficient: list[str] = []
    for part in sorted(fs.listStatus(root), key=lambda s: s.getPath().getName()):
        name = part.getPath().getName()
        if not (part.isDirectory() and name.startswith(prefix)):
            continue
        for f in fs.listStatus(part.getPath()):
            if not f.getPath().getName().endswith(".parquet"):
                continue
            cols = set(spark.read.parquet(str(f.getPath())).schema.names)
            if any(c not in cols for c in promos.values()):
                deficient.append(name)
                break
    layout = read_layout(spark, path)

    def _mark_clean() -> None:
        # backfill complete (or verified unnecessary): promoted existence
        # fast paths are safe again — see write_logs_promoted
        if layout.get("promotions_deficient"):
            _write_layout_marker(
                spark, path, {**layout, "promotions_deficient": False}
            )

    if not deficient:
        _mark_clean()
        return []
    parts = []
    for name in deficient:
        day = name.split("=", 1)[1]
        parts.append(
            spark.read.option("mergeSchema", "true")
            .parquet(f"{path}/{name}")
            .withColumn(PARTITION_COLUMN, F.lit(day).cast("date"))
        )
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p, allowMissingColumns=True)
    out = merged
    for key, column in promos.items():
        src = field_string(key)
        out = out.withColumn(
            column,
            F.coalesce(F.col(column), src) if column in merged.columns else src,
        )
    (
        _layout_sorted(out, read_layout(spark, path), lead_partition=True)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COLUMN)
        .parquet(path)
    )
    _mark_clean()
    return deficient


# --- numeric zone-map sidecar for dynamic map fields ------------------------
# Parquet footers carry min/max for plain columns, but NOT for values inside
# a Map column — so a numeric range query over fields_number['k'] scans every
# day no matter how selective the range is. This sidecar is the zone map the
# format can't give us: per (day, key) min/max, at most len(keys) rows per
# day, consulted at plan time to turn the range into a partition IN-filter
# (the same role schema.sql's sparse primary index plays for envelope
# columns, extended to the dynamic fields).
FIELD_MINMAX_DIR = "_field_minmax"


def write_field_minmax_index(
    spark: SparkSession,
    path: str,
    keys: list[str],
    days: list[str] | None = None,
    per_file: bool = False,
) -> None:
    """Build or incrementally refresh the numeric zone-map sidecar for the
    given ``fields_number`` keys. One pass over the (filtered) table: a
    narrow explode of (key, value) pairs into a keyed min/max aggregate —
    map-side combined. Dynamic partition overwrite gives the same
    incremental-maintenance contract as the token-Bloom sidecar:
    ``days=[...]`` rewrites only those days.

    Granularity: default is per (day, key) — <= |days| * |keys| rows.
    ``per_file=True`` records per (day, FILE, key) stats instead (file =
    basename via ``input_file_name``): inside a hot day of many files the
    range scan then skips individual files, the granularity parquet
    footers provide for plain columns but cannot for Map values. The
    sidecar self-describes its granularity through the ``fname`` column
    ('' at day level), so :func:`field_range_scan` serves either."""
    from .transform import field_number

    logs = spark.read.parquet(path)
    if days is not None:
        logs = logs.filter(
            F.col(PARTITION_COLUMN).isin([str(d) for d in days])
        )
    pairs = F.array(
        *[
            F.struct(F.lit(k).alias("fkey"), field_number(k).alias("v"))
            for k in keys
        ]
    )
    fname = (
        F.regexp_extract(F.input_file_name(), "([^/]+)$", 1)
        if per_file
        else F.lit("")
    )
    (
        logs.select(
            F.col(PARTITION_COLUMN), fname.alias("fname"),
            F.explode(pairs).alias("p"),
        )
        .select(PARTITION_COLUMN, "fname", "p.fkey", "p.v")
        .filter(F.col("v").isNotNull())
        .groupBy(PARTITION_COLUMN, "fname", "fkey")
        .agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COLUMN)
        .parquet(f"{path}/{FIELD_MINMAX_DIR}")
    )


def field_range_scan(
    spark: SparkSession,
    path: str,
    key: str,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """F4 numeric range query over ``fields_number[key]`` with zone-map
    pruning at the sidecar's recorded granularity:

    * day-level rows (``fname = ''``): non-overlapping days drop from the
      scan via a partition IN-filter (directory listing never touches
      them);
    * file-level rows (``per_file=True`` sidecars): inside candidate
      days, individual files whose [vmin, vmax] cannot overlap are
      excluded from an explicit file-list read (``basePath`` keeps the
      partition column) — the granularity parquet footers give plain
      columns but cannot for Map values.

    Conservative throughout: days or files without stats are kept, and
    the exact per-row range filter always applies after pruning. Orphaned
    sidecar rows intersect with live files exactly like the Bloom
    lookup.

    Scale note: the day-level lookup is manifest-sized (<= |days|*|keys|
    rows); the file-level lookup is O(#files) driver work — the same
    bill Spark's own file index pays to plan any scan, but pick per-file
    granularity deliberately (hot tables, recent windows) rather than as
    the blanket default on a million-file corpus."""
    from .transform import field_number

    fs, _, root = _hadoop_fs(spark, path)
    prefix = f"{PARTITION_COLUMN}="
    live: dict[str, list[str]] = {}
    for s in fs.listStatus(root):
        name = s.getPath().getName()
        if s.isDirectory() and name.startswith(prefix):
            live[name.split("=", 1)[1]] = [
                f.getPath().getName()
                for f in fs.listStatus(s.getPath())
                if f.getPath().getName().endswith(".parquet")
            ]
    rows = (
        spark.read.parquet(f"{path}/{FIELD_MINMAX_DIR}")
        .filter(F.col("fkey") == key)
        .collect()
    )
    day_stats: dict[str, tuple] = {}
    file_stats: dict[tuple, tuple] = {}
    for r in rows:
        d = str(r[PARTITION_COLUMN])
        if d not in live:
            continue
        if r.fname:
            file_stats[(d, r.fname)] = (r.vmin, r.vmax)
        else:
            day_stats[d] = (r.vmin, r.vmax)

    def overlaps(mm: tuple | None) -> bool:
        if mm is None:
            return True  # no stats recorded -> cannot prune
        vmin, vmax = mm
        if lo is not None and vmax < lo:
            return False
        if hi is not None and vmin > hi:
            return False
        return True

    v = field_number(key)

    def residual(df: DataFrame) -> DataFrame:
        if lo is not None:
            df = df.filter(v >= lo)
        if hi is not None:
            df = df.filter(v <= hi)
        return df

    if not file_stats:
        dates = sorted(d for d in live if overlaps(day_stats.get(d)))
        base = read_logs(spark, path)
        if not dates:
            return base.filter(F.lit(False))
        return residual(base.filter(F.col(PARTITION_COLUMN).isin(dates)))

    from .manifest import snapshot_versions as _snapshot_versions

    if _snapshot_versions(spark, path):
        # manifest-governed table (review r18): the raw directory
        # listing above includes COW-retained tombstone files, and a
        # live deletion vector must apply — prune the CURRENT STATE's
        # file list instead and read through the manifest layer.
        # Absolute clone references and bare explicit entries carry no
        # local zone-map rows, so they pass unpruned (conservative).
        from .manifest import (
            _apply_dv,
            _current_state_files,
            _dv_refs,
            _is_abs_entry,
            _read_data_files,
            _read_dv,
        )

        cs_files, dv_ref = _current_state_files(spark, path)
        keep: list[str] = []
        for f in cs_files:
            day_dir, _, fname = f.rpartition("/")
            if _is_abs_entry(f) or not day_dir.startswith(prefix):
                keep.append(f)
                continue
            d = day_dir.split("=", 1)[1]
            if not overlaps(day_stats.get(d)):
                continue
            if overlaps(file_stats.get((d, fname))):
                keep.append(f)
        if not keep:
            return read_logs(spark, path).filter(F.lit(False))
        df = _read_data_files(
            spark, path, keep, with_pos=bool(_dv_refs(dv_ref))
        )
        if _dv_refs(dv_ref):
            df = _apply_dv(df, _read_dv(spark, path, dv_ref))
        return residual(df.select(PARTITION_COLUMN, *LOG_COLUMNS))

    selected: list[str] = []
    for d, files in live.items():
        if not overlaps(day_stats.get(d)):
            continue
        for fname in files:
            if overlaps(file_stats.get((d, fname))):
                selected.append(
                    f"{path}/{PARTITION_COLUMN}={d}/{fname}"
                )
    if not selected:
        return read_logs(spark, path).filter(F.lit(False))
    out = (
        spark.read.option("basePath", path)
        .parquet(*selected)
        .select(PARTITION_COLUMN, *LOG_COLUMNS)
    )
    return residual(out)


# --- streaming materialized rollup ------------------------------------------
def refresh_rollup(
    spark: SparkSession,
    path: str,
    rollup_path: str,
    days: list[str] | None = None,
) -> None:
    """(Re)compute the per-(day, namespace) rollup — row count, error count,
    distinct apps — from the TABLE for the given days and dynamic-overwrite
    exactly those rollup partitions. Recomputing whole days from the source
    of truth (instead of merging per-batch deltas) makes the maintenance
    IDEMPOTENT: a replayed micro-batch or a manual backfill converges to
    the same rollup, and non-distributive aggregates (distinct counts) stay
    exact without merge state."""
    from .transform import field_string

    tbl = spark.read.parquet(path)
    if days is not None:
        tbl = tbl.filter(F.col(PARTITION_COLUMN).isin([str(d) for d in days]))
    roll = tbl.groupBy(PARTITION_COLUMN, "namespace").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(
            (field_string("level") == "error").cast("int")
        ).alias("n_errors"),
        F.count_distinct("app").alias("n_apps"),
    )
    (
        roll.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(PARTITION_COLUMN)
        .parquet(rollup_path)
    )


ROLLUP_STATE_PREFIX = "state_v"
ROLLUP_LOCK = ".rollup-inprogress.json"


class ConcurrentRollupError(IOError):
    """An incremental-rollup advance found another advance's live lock
    under the rollup path and aborted WITHOUT reading or writing any
    state — the loud-loser half of the enforced single-maintenance-
    writer contract (a silent race could read a state the winner's
    post-commit prune deletes mid-scan). Retry after the holder
    finishes, or :func:`release_rollup_lock` if it crashed."""


def release_rollup_lock(spark: SparkSession, rollup_path: str) -> bool:
    """Release a crashed advance's ``.rollup-inprogress.json`` lock.
    Safe by construction: states commit via temp-dir + atomic rename,
    so a crashed holder left at most an invisible ``.tmp-`` dir (swept
    by the next successful advance) — never a torn state. Returns
    whether a lock was actually removed. Only call once the holder is
    confirmed dead; releasing a LIVE holder's lock re-opens the
    prune-vs-reader race the lock exists to prevent."""
    fs, hpath_cls, _ = _hadoop_fs(spark, rollup_path)
    lock = hpath_cls(f"{rollup_path}/{ROLLUP_LOCK}")
    if not fs.exists(lock):
        return False
    return bool(fs.delete(lock, False))


def _rollup_state_versions(fs, hpath_cls, rollup_path: str) -> list[int]:
    root = hpath_cls(rollup_path)
    if not fs.exists(root):
        return []
    out = []
    for st in fs.listStatus(root):
        n = st.getPath().getName()
        if st.isDirectory() and n.startswith(ROLLUP_STATE_PREFIX):
            try:
                out.append(int(n[len(ROLLUP_STATE_PREFIX):]))
            except ValueError:
                continue
    return sorted(out)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """The latest committed incremental-rollup state (see
    :func:`incremental_rollup`)."""
    fs, hpath_cls, _ = _hadoop_fs(spark, rollup_path)
    states = _rollup_state_versions(fs, hpath_cls, rollup_path)
    if not states:
        raise FileNotFoundError(
            f"no rollup state committed under {rollup_path}"
        )
    return spark.read.parquet(
        f"{rollup_path}/{ROLLUP_STATE_PREFIX}{states[-1]}"
    )


def _is_missing_file_error(exc: BaseException) -> bool:
    """Execution-time vacuumed-base detection for
    :func:`incremental_rollup`'s fail-open path: Spark surfaces a file
    deleted under a running scan as java.io.FileNotFoundException
    wrapped in Py4JJavaError/SparkException, or (plan-time, late) as
    AnalysisException PATH_NOT_FOUND. Anything else — disk full,
    permissions, transient executor loss — must propagate: a silent
    full-corpus recompute would spend one whole aggregation before the
    real error resurfaced on the retry (review r18). Deliberately
    narrow even within AnalysisException: Spark uses that class (and
    the words "does not exist") for corrupt-state and unresolved-name
    errors too, which are real defects a recompute would mask — only
    the documented missing-PATH shapes qualify (review r19)."""
    if isinstance(exc, FileNotFoundError):
        return True
    s = str(exc)
    return (
        "java.io.FileNotFoundException" in s
        or "PATH_NOT_FOUND" in s
        or "Path does not exist" in s
    )


def incremental_rollup(
    spark: SparkSession,
    path: str,
    rollup_path: str,
    keep_states: int = 2,
    owner: str | None = None,
) -> dict:
    """Incremental materialized-view maintenance from the manifest
    layer's change feed — the consumer side of Delta's streaming CDF:
    advance the per-(day, namespace) rollup from its last committed
    table version to the head by applying ONLY the net row churn
    (:func:`klogs_spark.manifest.snapshot_changes`, file-pruned to
    churned files), never re-aggregating the corpus. At 100 TB a
    nightly delete touching three days costs three days of diff, while
    :func:`refresh_rollup`'s recompute bill grows with the table.

    Summable aggregates only (row count, error count): inserts add,
    deletes subtract, and a merge-on-read UPDATE nets to zero inside an
    unchanged group — ``refresh_rollup`` remains the tool when
    non-distributive aggregates (distinct counts) are needed.

    Exactly-once state advance without a separate cursor file: each
    state commits as ``state_v{N}`` where N is the TABLE version it
    reflects, written to a temp dir and RENAMED into place — a crash
    mid-write leaves an invisible temp dir (swept by the next
    successful advance) and the next call replays the same diff from
    the previous state (idempotent, since the diff is keyed by version
    range, not wall-clock). Older states beyond ``keep_states`` are
    pruned after a successful commit. When the diff's base is no longer
    readable (vacuumed files — the pin-until-rewrite limit; surfaces as
    FileNotFoundError at the probe or AnalysisException/Py4J errors at
    plan/execution time) the maintenance FAILS OPEN to a full recompute
    at the head and says so in the returned mode.

    Single-writer ENFORCED (VERDICT r18 #6 — it used to be convention
    only, and the post-commit prune could delete a state a slower
    concurrent advance was reading): each advance claims
    ``{rollup_path}/.rollup-inprogress.json`` with the manifest layer's
    create-exclusive marker primitive and releases it when done; a
    second concurrent advance aborts loudly with
    :class:`ConcurrentRollupError` instead of racing the prune. A
    crashed advance leaves the lock behind — states commit by atomic
    rename, so recovery is simply :func:`release_rollup_lock` once the
    crash is confirmed. A STABLE-IDENTITY writer (the streaming CDF
    sink, whose batches are serial by construction) may pass ``owner``:
    a lock carrying the same owner id is reclaimed automatically, so a
    crashed stream restart never wedges behind its own dead
    predecessor."""
    import uuid as _uuid

    from .manifest import _claim_marker, snapshot_versions

    if keep_states < 1:
        raise ValueError(
            f"incremental_rollup: keep_states must be >= 1 (the current "
            f"state is a kept state), got {keep_states}"
        )
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(
            f"incremental_rollup({path}): no snapshots published — the "
            "change feed is manifest-defined"
        )
    head = versions[-1]
    fs, hpath_cls, _ = _hadoop_fs(spark, rollup_path)
    payload = {"op": "incremental_rollup", "table": path, "head": head,
               "token": _uuid.uuid4().hex, "owner": owner}
    claimed = _claim_marker(fs, hpath_cls, rollup_path, ROLLUP_LOCK, payload)
    if not claimed and owner is not None:
        # Self-reclaim for a STABLE-IDENTITY writer (the streaming CDF
        # sink): an owner runs one advance at a time by construction
        # (foreachBatch batches are serial), so a live lock carrying OUR
        # owner id can only be a dead predecessor's — a crashed driver
        # must not brick every replayed batch behind a manual
        # release_rollup_lock. A TORN lock (unreadable json: the
        # claimant died inside _claim_marker, before any advance ran) is
        # reclaimed too. A lock with a DIFFERENT owner stays untouched.
        from .manifest import _read_small_json

        def _lock_owner_or_torn():
            # -> (owner-or-None, torn?). TORN means the lock is
            # positively known to carry no claim: the file vanished
            # (claimant lost the race and released, or died pre-write)
            # or its payload is readable but not valid JSON (died
            # mid-write). A TRANSIENT read/IO failure on a live foreign
            # holder's lock is neither — treating it as torn would
            # steal the lock and re-open the prune-vs-reader race this
            # lock exists to prevent (ADVICE r19), so such errors
            # propagate after one retry.
            import json as _json

            try:
                return (
                    _read_small_json(
                        fs, hpath_cls, rollup_path, ROLLUP_LOCK
                    ).get("owner"),
                    False,
                )
            except (_json.JSONDecodeError, UnicodeDecodeError):
                return None, True
            except Exception as exc:
                if _is_missing_file_error(exc):
                    return None, True
                raise

        try:
            stale_owner, torn = _lock_owner_or_torn()
        except Exception:
            stale_owner, torn = _lock_owner_or_torn()  # retry once
        reclaim = torn or stale_owner == owner
        if reclaim:
            fs.delete(hpath_cls(f"{rollup_path}/{ROLLUP_LOCK}"), False)
            claimed = _claim_marker(
                fs, hpath_cls, rollup_path, ROLLUP_LOCK, payload
            )
    if not claimed:
        raise ConcurrentRollupError(
            f"incremental_rollup({rollup_path}) refused: another advance "
            f"holds {ROLLUP_LOCK}; if that maintainer crashed, "
            "release_rollup_lock reclaims the slot (committed states are "
            "rename-atomic, so no state repair is needed)"
        )
    lock = hpath_cls(f"{rollup_path}/{ROLLUP_LOCK}")
    try:
        result = _advance_rollup(
            spark, path, rollup_path, keep_states, versions, head
        )
    except BaseException:
        fs.delete(lock, False)  # best-effort on the error path
        raise
    # on success the release must be VERIFIED (manifest._must pattern):
    # a silently surviving lock makes every later advance claim a
    # phantom concurrent writer with no error at the true failure point
    if not fs.delete(lock, False) and fs.exists(lock):
        raise OSError(
            f"incremental_rollup: failed to release {ROLLUP_LOCK} under "
            f"{rollup_path} (the advance committed; release the lock "
            "manually with release_rollup_lock)"
        )
    return result


def _advance_rollup(
    spark: SparkSession,
    path: str,
    rollup_path: str,
    keep_states: int,
    versions: list,
    head: int,
) -> dict:
    """The lock-held body of :func:`incremental_rollup`."""
    import uuid as _uuid

    from .manifest import (
        ManifestChainError,
        read_snapshot,
        snapshot_changes,
    )
    from .transform import field_string

    fs, hpath_cls, _ = _hadoop_fs(spark, rollup_path)
    states = _rollup_state_versions(fs, hpath_cls, rollup_path)
    cur = states[-1] if states else None
    if cur == head:
        return {"from_version": cur, "to_version": head, "mode": "noop"}

    def _full_state() -> DataFrame:
        return read_snapshot(spark, path, head).groupBy(
            PARTITION_COLUMN, "namespace"
        ).agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum((field_string("level") == "error").cast("long"))
            .alias("n_errors"),
        )

    from pyspark.errors import AnalysisException

    mode = "incremental"
    new_state = None
    if cur is None or cur > head or cur not in versions:
        # first materialization, or the state points at a version the
        # table no longer publishes — recompute from scratch
        new_state, mode = _full_state(), "full"
    else:
        try:
            feed = snapshot_changes(spark, path, cur, head)
            sign = F.when(
                F.col("_change_type") == "insert", F.lit(1)
            ).otherwise(F.lit(-1)).cast("long")
            # snapshot_changes emits maps entry-encoded (set-op contract)
            is_err = (
                F.element_at(
                    F.map_from_entries("fields_string"), "level"
                ) == "error"
            ).cast("long")
            deltas = feed.select(
                F.col(PARTITION_COLUMN),
                F.col("namespace"),
                sign.alias("s"),
                (sign * F.coalesce(is_err, F.lit(0))).alias("e"),
            ).groupBy(PARTITION_COLUMN, "namespace").agg(
                F.sum("s").alias("d_rows"), F.sum("e").alias("d_errors")
            )
            old = spark.read.parquet(
                f"{rollup_path}/{ROLLUP_STATE_PREFIX}{cur}"
            )
            z = F.lit(0).cast("long")
            new_state = (
                old.join(
                    deltas, [PARTITION_COLUMN, "namespace"], "full_outer"
                )
                .select(
                    PARTITION_COLUMN,
                    "namespace",
                    (F.coalesce("n_rows", z) + F.coalesce("d_rows", z))
                    .alias("n_rows"),
                    (F.coalesce("n_errors", z)
                     + F.coalesce("d_errors", z)).alias("n_errors"),
                )
                .filter(F.col("n_rows") > 0)
            )
        except (FileNotFoundError, ManifestChainError):
            # base version vacuumed away under the state (plan-time
            # detection) — fail open
            new_state, mode = _full_state(), "full"
        except AnalysisException as exc:
            # same narrowing as the execution-time catch below: only the
            # missing-path shapes fail open; unresolved-name / corrupt-
            # state AnalysisExceptions are real defects and propagate
            if not _is_missing_file_error(exc):
                raise
            new_state, mode = _full_state(), "full"

    def _write_state(df) -> str:
        t = (
            f"{rollup_path}/.tmp-{ROLLUP_STATE_PREFIX}{head}"
            f"-{_uuid.uuid4().hex}"
        )
        try:
            df.write.parquet(t)
        except BaseException:
            if fs.exists(hpath_cls(t)):
                fs.delete(hpath_cls(t), True)
            raise
        return t

    try:
        tmp = _write_state(new_state)
    except Exception as exc:
        if mode == "full":
            raise  # the scratch recompute itself failed — nothing to try
        if not _is_missing_file_error(exc):
            raise
        # execution-time missing files under the incremental plan (a
        # vacuumed base detected only at scan) — fail open, once
        new_state, mode = _full_state(), "full"
        tmp = _write_state(new_state)
    final = hpath_cls(f"{rollup_path}/{ROLLUP_STATE_PREFIX}{head}")
    if fs.exists(final):  # lost a concurrent race to the same head
        fs.delete(hpath_cls(tmp), True)
        return {"from_version": cur, "to_version": head, "mode": mode}
    if not fs.rename(hpath_cls(tmp), final):
        fs.delete(hpath_cls(tmp), True)
        raise OSError(
            f"incremental_rollup: rename to {final} failed"
        )
    # housekeeping only after OUR successful commit (single-writer
    # contract): prune superseded states and sweep crash-orphaned temps
    for old_v in _rollup_state_versions(fs, hpath_cls, rollup_path)[
        :-keep_states
    ]:
        fs.delete(
            hpath_cls(f"{rollup_path}/{ROLLUP_STATE_PREFIX}{old_v}"), True
        )
    for st in fs.listStatus(hpath_cls(rollup_path)):
        n = st.getPath().getName()
        if n.startswith(f".tmp-{ROLLUP_STATE_PREFIX}") and n not in tmp:
            fs.delete(st.getPath(), True)
    return {"from_version": cur, "to_version": head, "mode": mode}


def rollup_logs_sink(path: str, rollup_path: str):
    """foreachBatch sink: append the batch to the logs table AND refresh the
    materialized per-day rollup for exactly the days the batch touched —
    the streaming materialized-view pattern (ClickHouse's materialized view
    into a SummingMergeTree, re-expressed as idempotent day recompute).
    Dashboards read the rollup (|days| x |namespaces| rows) instead of
    re-aggregating the corpus; maintenance cost per batch is proportional
    to the touched days' data, and replays converge (refresh_rollup is
    idempotent). Composes with klogs_spark.stream via its ``sink`` param."""

    def sink_fn(batch: DataFrame, batch_id: int) -> None:
        # standard foreachBatch idiom: the sink takes several actions on
        # the batch (append + day discovery) — persist so the streaming
        # source is read once, not once per action
        batch.persist()
        try:
            write_logs(batch, path, mode="append")
            days = [
                str(r[0])
                for r in batch.select(
                    F.to_date(F.col("timestamp")).alias("d")
                ).distinct().collect()
            ]
        finally:
            batch.unpersist()
        if days:
            refresh_rollup(batch.sparkSession, path, rollup_path, days)

    return sink_fn


def indexed_logs_sink(path: str, m: int = TOKEN_BLOOM_M, k: int = TOKEN_BLOOM_K,
                      exactly_once: bool = False, snapshot: bool = False,
                      minmax_keys: list[str] | None = None):
    """foreachBatch sink: append the batch to the logs table AND refresh the
    token-Bloom sidecar for exactly the days the batch touched — the
    streaming-ingest integration of the skip index. Day discovery is one
    distinct over the batch's dates (micro-batch-sized); the refresh is the
    dynamic-partition-overwrite incremental path, so historical days' sidecar
    files are never rewritten. Composes with klogs_spark.stream's pipeline
    via its ``sink`` parameter.

    Delivery semantics: the default data path is a plain append, so a
    micro-batch REPLAY after a sink failure duplicates rows — at-least-once,
    the reference's own contract (main.go:364-369). Pass
    ``exactly_once=True`` to route the data write through
    ``stream.exactly_once_sink`` (batch_id-guarded staged publication):
    replays then converge to exactly one copy. The sidecar refresh is
    idempotent under either mode (dynamic overwrite of the touched days).

    ``snapshot=True`` additionally publishes a manifest version
    (klogs_spark.manifest) after each batch's data+index commit: readers
    on ``read_snapshot`` see batch-consistent table states instead of
    mid-append file sets — the streaming half of the snapshot contract."""
    data_sink = None
    if exactly_once:
        from .stream import exactly_once_sink

        data_sink = exactly_once_sink(path)

    def sink_fn(batch: DataFrame, batch_id: int) -> None:
        # several actions on the batch (append + day discovery): persist
        # so the streaming source is read once (foreachBatch idiom)
        batch.persist()
        try:
            if data_sink is not None:
                data_sink(batch, batch_id)
            else:
                write_logs(batch, path, mode="append")
            days = [
                str(r[0])
                for r in batch.select(
                    F.to_date(F.col("timestamp")).alias("d")
                ).distinct().collect()
            ]
        finally:
            batch.unpersist()
        if days:
            write_token_bloom_index(batch.sparkSession, path, m=m, k=k, days=days)
            if minmax_keys:
                # same incremental contract for the numeric zone map:
                # recompute exactly the touched days' (day, key) stats
                write_field_minmax_index(
                    batch.sparkSession, path, minmax_keys, days=days
                )
        if snapshot:
            from .manifest import publish_snapshot

            publish_snapshot(batch.sparkSession, path)

    return sink_fn
