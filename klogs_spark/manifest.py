"""Snapshot manifests — versioned reads over the parquet logs table.

Plain parquet directories give readers whatever files exist at scan time:
a reader overlapping an append sees a torn table, and there is no way to
re-run yesterday's report against yesterday's data. Transactional table
formats (Delta, Iceberg) fix this with a manifest layer; this module is
the minimal same-idea implementation for the engine's native table — a
``_manifest/v{N}.json`` sequence, each listing the exact data files of
one consistent snapshot.

* :func:`publish_snapshot` — enumerate current data files through the
  Hadoop FS API, write ``v{N}.json`` to a temp name and publish it with a
  CHECKED rename (the same object-store-safe discipline as
  ``stream.exactly_once_sink``: Hadoop FS booleans are failure returns,
  not exceptions). Writers call it after each append/job commit.
* :func:`read_snapshot` — load a pinned version's exact file list (or the
  latest), read those files only. Readers never see files published after
  their snapshot.

Scale: a manifest is one small JSON per version (file paths only) and
``publish`` is an O(#partitions) listing — no data pass. Honest limits,
stated not hidden: snapshots pin FILES, so jobs that rewrite files
(compaction, delete_where, retention, reprocess) invalidate OLDER
snapshots that reference the rewritten files — full Delta-style time
travel across rewrites needs copy-on-write retention of old files plus a
vacuum policy, which is out of scope; the supported contract is
consistent reads across APPENDS plus pin-until-next-rewrite.

``_manifest`` starts with ``_`` so Spark partition discovery ignores it.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from .table import PARTITION_COLUMN, _hadoop_fs

MANIFEST_DIR = "_manifest"


def _must(ok: bool, op: str, target) -> None:
    if not ok:
        raise IOError(
            f"manifest: {op} failed for {target} (Hadoop FS returned false)"
        )


def _list_data_files(fs, root, hpath_cls) -> list[str]:
    files: list[str] = []
    prefix = f"{PARTITION_COLUMN}="
    for part in fs.listStatus(root):
        name = part.getPath().getName()
        if not (part.isDirectory() and name.startswith(prefix)):
            continue
        for f in fs.listStatus(part.getPath()):
            fname = f.getPath().getName()
            if fname.endswith(".parquet"):
                files.append(f"{name}/{fname}")
    return sorted(files)


def snapshot_versions(spark: SparkSession, path: str) -> list[int]:
    fs, hpath_cls, _ = _hadoop_fs(spark, path)
    mdir = hpath_cls(f"{path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        return []
    versions = []
    for f in fs.listStatus(mdir):
        name = f.getPath().getName()
        if name.startswith("v") and name.endswith(".json"):
            try:
                versions.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(versions)


def publish_snapshot(spark: SparkSession, path: str) -> int:
    """Record the table's current file set as the next snapshot version.
    Returns the published version number."""
    fs, hpath_cls, root = _hadoop_fs(spark, path)
    files = _list_data_files(fs, root, hpath_cls)
    version = (snapshot_versions(spark, path) or [0])[-1] + 1
    mdir = hpath_cls(f"{path}/{MANIFEST_DIR}")
    if not fs.exists(mdir):
        _must(fs.mkdirs(mdir), "mkdirs", mdir)
    tmp = hpath_cls(f"{path}/{MANIFEST_DIR}/.v{version}.json.tmp")
    out = fs.create(tmp, True)
    try:
        out.write(
            json.dumps({"version": version, "files": files}).encode()
        )
    finally:
        out.close()
    final = hpath_cls(f"{path}/{MANIFEST_DIR}/v{version}.json")
    _must(fs.rename(tmp, final), "publish-rename", final)
    return version


def read_snapshot(
    spark: SparkSession,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Read the table as of a snapshot: exactly the files its manifest
    lists, nothing published later. ``basePath`` keeps the partition
    column. Raises if no snapshot exists or a listed file is gone
    (rewritten by compaction/delete — the stated pin-until-rewrite limit)."""
    versions = snapshot_versions(spark, path)
    if not versions:
        raise FileNotFoundError(f"no snapshots published under {path}")
    version = versions[-1] if version is None else version
    if version not in versions:
        raise FileNotFoundError(f"snapshot v{version} not found in {versions}")
    fs, hpath_cls, _ = _hadoop_fs(spark, path)
    mf = hpath_cls(f"{path}/{MANIFEST_DIR}/v{version}.json")
    stream = fs.open(mf)
    try:
        raw = bytes(
            stream.readAllBytes()
            if hasattr(stream, "readAllBytes")
            else _read_all(stream)
        )
    finally:
        stream.close()
    files = json.loads(raw.decode())["files"]
    missing = [f for f in files if not fs.exists(hpath_cls(f"{path}/{f}"))]
    if missing:
        raise FileNotFoundError(
            f"snapshot v{version} references rewritten/removed files "
            f"{missing[:3]}{'...' if len(missing) > 3 else ''} — older "
            "snapshots do not survive compaction/delete rewrites"
        )
    return (
        spark.read.option("basePath", path)
        .parquet(*[f"{path}/{f}" for f in files])
    )


def read_logs_at(
    spark: SparkSession,
    path: str,
    version: int | None = None,
) -> DataFrame:
    """Time-travel read: the logs table AS OF snapshot ``version`` (default
    latest), in canonical column order — :func:`read_snapshot` plus the
    same projection contract as ``table.read_logs``. A reader pinned to
    v1 keeps seeing the pre-append corpus no matter how many appends have
    published later versions (until a rewrite job invalidates the pin —
    the stated pin-until-rewrite limit)."""
    from .table import LOG_COLUMNS

    return read_snapshot(spark, path, version).select(
        PARTITION_COLUMN, *LOG_COLUMNS
    )


def _read_all(stream) -> bytes:
    chunks = []
    while True:
        b = stream.read()
        if b < 0:
            break
        chunks.append(b)
    return bytes(chunks)
