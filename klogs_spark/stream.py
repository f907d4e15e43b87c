"""Structured Streaming ingest — the engine's FLBPluginFlushCtx equivalent.

Reference hot path (main.go:237-377): msgpack chunk -> per-record decode ->
buffer -> size-or-time flush -> batched INSERT. Spark mapping (SURVEY §3.2):

    readStream (json-lines files / any streaming source)        <- S1/S7
      -> foreachBatch:
           decode_dataframe (flatten+dispatch, Arrow batches)   <- P1,P2,S2
           sink.write(batch)                                    <- S3
      trigger(processingTime=flush_interval)                    <- T1
      checkpointLocation=...                                    <- T2/T4

Delivery semantics: at-least-once, same as the reference (flush failure ->
FLB_ERROR -> Fluent Bit redelivers the chunk, main.go:364-369). Structured
Streaming's checkpoint replays an uncommitted micro-batch after failure; the
parquet sink appends (duplicates possible on replay, exactly like the
reference), while a transactional sink could consume ``batch_id`` for
idempotence.

Trigger duality (T1): the reference flushes on size OR time
(main.go:357-361). The time half is the processing-time trigger
(flush_interval); the size half is exact in the sink — ClickHouseSink's
per-partition buffer force-flushes every ``batch_size`` rows, so no INSERT
exceeds the cap and the interval only ever flushes a sub-batch_size
remainder (sink_clickhouse.ClickHouseSink.write_batch). Source rate caps
(maxFilesPerTrigger / maxOffsetsPerTrigger) additionally bound micro-batch
size at the source.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from .config import EngineConfig
from .decode import decode_dataframe
from .table import write_logs


def read_json_lines_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """S1/S7: file-source stream of raw JSON-lines events (one event per
    line). ``maxFilesPerTrigger`` is the size-half of the reference's
    size-or-time flush policy."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def read_msgpack_chunk_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
    glob: str = "*.msgpack",
) -> DataFrame:
    """S1 true-to-reference variant: Fluent Bit msgpack chunk files.

    The reference's real input is a msgpack chunk per flush
    (main.go:238-247), not JSON lines; ``binaryFile`` streams each chunk
    whole as a ``content`` blob, and ``decode.decode_msgpack_dataframe``
    (pure-Python msgpack_lite, incl. FLBTime ext) replaces the JSON decode.
    Pass the result to :func:`start_ingest`/:func:`run_ingest_once` with
    ``input_format="msgpack"``.
    """
    reader = (
        spark.readStream.format("binaryFile")
        # binaryFile's schema is fixed, but the streaming source still
        # requires it to be declared explicitly
        .schema("path string, modificationTime timestamp, "
                "length long, content binary")
        .option("pathGlobFilter", glob)
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path).select("content")


def read_kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """S1 alternative: Kafka source of raw JSON events (value = one event).

    ``maxOffsetsPerTrigger`` is the Batch_Size half of the reference's
    size-or-time flush duality (main.go:357-361) — it caps each micro-batch
    like the 10k-row buffer cap. Requires the spark-sql-kafka package on the
    classpath; not exercised in this repo's tests (no broker in the
    environment) — the decode/sink pipeline downstream is source-agnostic.
    """
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    from pyspark.sql import functions as F

    return reader.load().select(
        F.col("value").cast("string").alias("value")
    )


def start_ingest(
    raw_stream: DataFrame,
    sink: Callable[[DataFrame, int], None] | str,
    config: EngineConfig | None = None,
    checkpoint_dir: str | None = None,
    query_name: str = "klogs-ingest",
    dead_letter_dir: str | None = None,
    metrics: "IngestMetrics | None" = None,
    input_format: str = "json",
) -> StreamingQuery:
    """Wire decode -> sink inside foreachBatch and start the query.

    ``sink`` is either a path (parquet logs table via table.write_logs) or a
    callable ``(decoded_batch_df, batch_id) -> None`` (e.g.
    sink_clickhouse.ClickHouseSink.write_batch).

    The trigger honors the reference's Flush_Interval default (60 s,
    main.go:38) via config.flush_interval_s; checkpointing gives T2
    (final drain — restart resumes the uncommitted batch) and T4
    (at-least-once redelivery). ``dead_letter_dir`` quarantines undecodable
    lines for replay instead of dropping them.
    """
    cfg = config or EngineConfig()
    ckpt = checkpoint_dir or cfg.checkpoint_dir
    if not ckpt:
        raise ValueError("checkpoint_dir is required (T2/T4 delivery semantics)")

    sink_fn = _resolve_sink(sink)
    process_batch = _make_batch_processor(
        cfg, sink_fn, dead_letter_dir, metrics, input_format
    )

    return (
        raw_stream.writeStream.queryName(query_name)
        .foreachBatch(process_batch)
        .trigger(processingTime=f"{cfg.flush_interval_s} seconds")
        .option("checkpointLocation", ckpt)
        .start()
    )


def exactly_once_sink(path: str) -> Callable[[DataFrame, int], None]:
    """Idempotent parquet sink: exactly-once table contents across replays.

    The reference is at-least-once (redelivered chunks insert twice,
    main.go:364-369). Structured Streaming hands foreachBatch a stable
    ``batch_id`` per epoch; the publication protocol makes any replay
    converge to exactly one copy, with NO duplication window:

    1. marker exists -> batch fully published on an earlier attempt; no-op.
    2. purge ``b<id>-*`` files from the table — leftovers of a previous
       attempt that crashed mid-publish (batch-id-prefixed names make the
       partial attempt identifiable without a manifest).
    3. write the batch to ``<path>/_staging/batch-<id>`` (overwrite: a
       crashed STAGING attempt is simply rewritten).
    4. publish: rename each staged file into its day partition under the
       ``b<id>-`` prefix, then create the marker under ``<path>/_commits/``.

    A crash after step 4's renames but before the marker re-runs 2-4 — the
    purge removes exactly what the dead attempt published. All paths go
    through the Hadoop FileSystem API (object-store-safe; on S3A the rename
    is a server-side copy). Readers never see a duplicate row; they can see
    a batch's rows appear slightly before its marker — same visibility as
    any non-transactional parquet append. ``_staging``/``_commits`` start
    with ``_`` so Spark's partition discovery ignores them.

    Hadoop ``FileSystem.rename/delete/mkdirs`` report failure by returning
    **false**, not raising (the classic S3A copy-rename hazard). Every
    boolean here is checked and failure raises, so the micro-batch fails
    and Structured Streaming replays it — a silently dropped staged file
    can never be committed under the marker.
    """
    from .table import _hadoop_fs

    def _must(ok: bool, op: str, target) -> None:
        if not ok:
            raise IOError(f"exactly_once_sink: {op} failed for {target} "
                          "(Hadoop FS returned false); failing batch for replay")

    def sink_fn(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        fs, hpath_cls, root = _hadoop_fs(spark, path)
        marker = hpath_cls(root, f"_commits/batch-{batch_id}")
        if fs.exists(marker):
            return  # replayed epoch: already fully published
        prefix = f"b{batch_id}-"
        if fs.exists(root):  # purge a crashed attempt's partial publication
            for part in fs.listStatus(root):
                if not (part.isDirectory()
                        and part.getPath().getName().startswith("date=")):
                    continue
                for f in fs.listStatus(part.getPath()):
                    if f.getPath().getName().startswith(prefix):
                        _must(fs.delete(f.getPath(), False),
                              "purge-delete", f.getPath())
        staging = hpath_cls(root, f"_staging/batch-{batch_id}")
        write_logs(batch, f"{path}/_staging/batch-{batch_id}", mode="overwrite",
                   mark_layout=False)
        for part in fs.listStatus(staging):
            if not (part.isDirectory()
                    and part.getPath().getName().startswith("date=")):
                continue
            target_dir = hpath_cls(root, part.getPath().getName())
            _must(fs.mkdirs(target_dir), "mkdirs", target_dir)
            for f in fs.listStatus(part.getPath()):
                name = f.getPath().getName()
                if name.endswith(".parquet"):
                    _must(fs.rename(f.getPath(),
                                    hpath_cls(target_dir, prefix + name)),
                          "publish-rename", f.getPath())
        _must(fs.mkdirs(hpath_cls(root, "_commits")), "mkdirs", "_commits")
        fs.create(marker, True).close()
        # staging cleanup is best-effort: the marker is already durable, so a
        # false here must NOT fail (and replay) an already-published batch —
        # leftover staging files are overwritten by any later attempt.
        fs.delete(staging, True)

    return sink_fn


def _resolve_sink(
    sink: Callable[[DataFrame, int], None] | str,
) -> Callable[[DataFrame, int], None]:
    if isinstance(sink, str):
        sink_path = sink

        def sink_fn(batch: DataFrame, batch_id: int) -> None:
            write_logs(batch, sink_path, mode="append")

        return sink_fn
    return sink


def _make_batch_processor(
    cfg: EngineConfig,
    sink_fn: Callable[[DataFrame, int], None],
    dead_letter_dir: str | None,
    metrics: "IngestMetrics | None" = None,
    input_format: str = "json",
) -> Callable[[DataFrame, int], None]:
    """decode -> sink, with undecodable lines quarantined as text.

    The reference only warns-and-drops bad records (main.go:251-254); a
    dead-letter directory makes them replayable instead — each micro-batch
    appends its reject lines so nothing is silently lost.

    ``metrics`` hooks the flush path inline, exactly where the reference
    instruments (main.go:246, 371-373) — ``input_records_total`` counts the
    RAW received lines before decode (reference semantics: rejects/blanks
    are received records too), ``batch_size`` summarizes the decoded rows
    actually flushed, and ``flush_time_seconds`` times decode+sink. (A
    StreamingQueryListener would need the py4j callback server, which
    headless drivers may not run.)

    ``input_format``: "json" (one JSON event per ``value`` line) or
    "msgpack" (one Fluent Bit chunk per ``content`` blob, the reference's
    true wire shape). The dead-letter channel is line-granular and only
    meaningful for json; msgpack chunk failures are warn-and-drop like the
    reference (main.go:251-254). Note the raw input count is per DataFrame
    row, i.e. per CHUNK for msgpack (the reference counts per record,
    main.go:246) — batch_size still reports decoded records.
    """
    if input_format not in ("json", "msgpack"):
        raise ValueError(f"unknown input_format: {input_format!r}")
    if input_format == "msgpack" and dead_letter_dir:
        raise ValueError("dead_letter_dir is json-only (msgpack chunks are "
                         "warn-and-drop, reference main.go:251-254)")

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        import time as _time

        from .decode import decode_msgpack_dataframe

        t0 = _time.perf_counter()
        if metrics is not None:
            batch_df = batch_df.persist()
        if input_format == "msgpack":
            decoded = decode_msgpack_dataframe(batch_df, cfg)
        else:
            decoded = decode_dataframe(batch_df, cfg)
        if metrics is not None:
            decoded = decoded.persist()
        try:
            try:
                sink_fn(decoded, batch_id)
            except Exception:
                if metrics is not None:
                    metrics.observe_error()
                raise
            if metrics is not None:
                # elapsed captured BEFORE the counts so the count jobs'
                # runtime is not folded into the flush duration; both counts
                # read persisted data instead of re-scanning the source
                elapsed = _time.perf_counter() - t0
                metrics.observe_batch(
                    batch_df.count(), elapsed, decoded_rows=decoded.count()
                )
        finally:
            # unpersist even when the sink raises — a long-running stream
            # must not leak one cached DataFrame per failed micro-batch
            if metrics is not None:
                decoded.unpersist()
                batch_df.unpersist()
        if dead_letter_dir:
            def _find_rejects(batches):
                import json as _json

                import pandas as pd

                # the SAME parser as the decode stage (orjson fast path with
                # stdlib fallback) — accept/reject decisions must agree or a
                # line could be both decoded and dead-lettered
                from .decode import _loads

                for batch in batches:
                    rejects = []
                    for line in batch["value"].tolist():
                        line = line.strip()
                        if not line:
                            continue
                        try:
                            obj = _loads(line)
                        except (_json.JSONDecodeError, RecursionError):
                            rejects.append(line)
                            continue
                        record = (
                            obj.get("record")
                            if isinstance(obj, dict) and "record" in obj
                            else obj
                        )
                        if not isinstance(record, dict):
                            rejects.append(line)
                    if rejects:
                        yield pd.DataFrame({"value": rejects})

            bad = batch_df.mapInPandas(_find_rejects, schema="value string")
            bad.write.mode("append").text(dead_letter_dir)

    return process_batch


def run_ingest_once(
    raw_stream: DataFrame,
    sink: Callable[[DataFrame, int], None] | str,
    config: EngineConfig | None = None,
    checkpoint_dir: str | None = None,
    dead_letter_dir: str | None = None,
    metrics: "IngestMetrics | None" = None,
    input_format: str = "json",
) -> None:
    """Drain everything currently available, then stop (availableNow).

    The batch-mode twin of :func:`start_ingest`; also the shutdown-drain
    path — the reference's FLBPluginExitCtx final BufferWrite
    (main.go:386-396) is this plus checkpoint bookkeeping.
    """
    cfg = config or EngineConfig()
    ckpt = checkpoint_dir or cfg.checkpoint_dir
    if not ckpt:
        raise ValueError("checkpoint_dir is required")

    process_batch = _make_batch_processor(
        cfg, _resolve_sink(sink), dead_letter_dir, metrics, input_format
    )
    q = (
        raw_stream.writeStream.foreachBatch(process_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", ckpt)
        .start()
    )
    q.awaitTermination()
