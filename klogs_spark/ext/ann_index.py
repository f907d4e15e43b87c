"""Persisted IVF-PQ ANN index — build once, search many.

The round-7 ANN queries (queries/ext.py q_ann_ivfpq_topk) rebuild the coarse
quantizer and PQ codebooks inside every query: correct, but at 100 TB the
index build is a training job, not a query step. This module splits the two
the way FAISS / ScaNN deployments do:

``build_ivfpq_index``
    one batch job over the corpus that writes a parquet sidecar:

    ``{path}/centroids``   (centroid_id, centroid)        — IVF coarse cells
    ``{path}/codebooks``   (m, centroid_id, cv)           — per-subspace PQ
    ``{path}/codes``       (id, m, code) PARTITIONED BY centroid_id

    ``codes`` is partitioned by the IVF cell, so a probe of ``n_probe``
    cells is a partition-pruned read — the scanned bytes are proportional
    to the probed cells, not the corpus (the on-disk twin of the in-memory
    inverted lists). Per vector the index stores M small ints (the PQ
    codes) instead of the raw floats: the 100 TB corpus' raw embeddings
    never need to be read again at search time.

``ivfpq_search``
    the query step: rank centroids against the query (a k-row read —
    manifest-sized, same plan-time role as the token-Bloom skip index in
    table.fulltext_token_search), read ONLY the probed ``codes``
    partitions, score them via the broadcast ADC distance table, top-k.
    The physical plan contains no k-means, no codebook training, and no
    scan of the embeddings table — tests/test_plans.py asserts this.

Numeric parity with the in-query implementation (and therefore with the
DuckDB oracle): centroid components are Lloyd-refined with per-round
rounding (similarity.kmeans_refine) and parquet round-trips doubles
bit-exactly, so searching the stored index reproduces the in-query
q_ann_ivfpq_topk result hash-identically.

Reference parity note: the reference engine (kobsio/klogs) has no ANN
surface at all — this is EXT scope for the training-data pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import similarity as sim
from .hashing import lit_double_array, lit_double_matrix

ANN_INDEX_VERSION = 1

# Sidecar metadata files. All marker/journal I/O below goes through the
# manifest layer's Hadoop-FS helpers (manifest._claim_marker /
# _write_small_json / _read_small_json over table._hadoop_fs) so the index
# works on file://, hdfs://, s3a://, ... exactly like the data tables —
# the r13 lesson the manifest layer learned (manifest.py _claim_marker)
# applied to the index sidecar.
REMOVE_MARKER = "_remove-inprogress.json"
REMOVE_PLAN = "_remove-plan.json"
CELLMAP = "_cellmap.json"


class ConcurrentIndexMaintenanceError(RuntimeError):
    """Another maintenance op holds this index's removal journal."""


class InjectedCrash(RuntimeError):
    """Test-only: raised at a named failpoint to exercise crash recovery."""


_FAILPOINT: str | None = None  # test hook; never set in production


def _maybe_crash(name: str) -> None:
    if _FAILPOINT == name:
        raise InjectedCrash(name)


def _fs(spark: SparkSession, path: str):
    from ..table import _hadoop_fs

    return _hadoop_fs(spark, path)


def _active_spark() -> SparkSession:
    # getActiveSession is THREAD-local; callers like the pooled oracle
    # differential invoke query fns from worker threads, so fall back to
    # the process-wide instantiated session
    s = SparkSession.getActiveSession() or SparkSession._instantiatedSession
    if s is None:  # pragma: no cover - only hit outside any Spark job
        raise RuntimeError("no active SparkSession for index metadata I/O")
    return s


def build_ivfpq_index(
    emb: DataFrame,
    path: str,
    ivf_k: int = 16,
    refine_iters: int = 2,
    ivf_round: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
    pq_k: int = sim.PQ_CODEBOOK_K,
    pq_iters: int = 1,
) -> None:
    """Train and persist the IVF-PQ index for ``emb`` under ``path``.

    One pass each for the coarse quantizer, the PQ codebooks, and the coded
    inverted lists. The centroids/codebooks are written FIRST and read back
    for the assignment/encoding passes, so the (expensive) Lloyd lineage is
    materialized exactly once and the stored bytes — not a re-execution —
    define all downstream math. All intermediate ``.cache()`` frames are
    unpersisted before return.
    """
    spark = emb.sparkSession
    seeds = sim.deterministic_centroids(emb, ivf_k, id_col, vec_col)
    cents = sim.kmeans_refine(
        emb, seeds, iterations=refine_iters,
        id_col=id_col, vec_col=vec_col, round_decimals=ivf_round,
    )
    cents.write.mode("overwrite").parquet(f"{path}/centroids")
    cents.unpersist()
    cents_stored = spark.read.parquet(f"{path}/centroids")

    cb = sim.pq_codebooks(
        emb, k=pq_k, iterations=pq_iters,
        id_col=id_col, vec_col=vec_col, m=m, dim=dim,
    )
    cb.write.mode("overwrite").parquet(f"{path}/codebooks")
    cb.unpersist()
    cb_stored = spark.read.parquet(f"{path}/codebooks")

    assigned = sim.ivf_assign(emb, cents_stored, id_col, vec_col).select(
        "id", "centroid_id"
    )
    codes = sim.pq_encode(emb, cb_stored, id_col, vec_col, m, dim)
    (
        codes.join(assigned, "id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(f"{path}/codes")
    )


def refresh_ivfpq_index(
    new_emb: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
) -> None:
    """Incremental index maintenance: assign and PQ-encode ONLY the new
    vectors against the STORED coarse quantizer and codebooks, appending to
    the cell-partitioned ``codes`` — no retraining, no rewrite of existing
    cells' files (parquet append adds files inside the touched
    ``centroid_id=`` directories only).

    This is the FAISS train-once/add-many contract and the 100 TB ingest
    shape: the daily job's cost scales with the increment, not the corpus.
    Quantizer drift as the distribution shifts is real but out of scope
    here — production gates a re-train on recall monitoring, then rebuilds
    under a fresh index path. Callers must ensure new ids are disjoint
    from stored ones (the same at-least-once contract as the data path).
    """
    spark = new_emb.sparkSession
    cents_stored = spark.read.parquet(f"{path}/centroids")
    cb_stored = spark.read.parquet(f"{path}/codebooks")
    assigned = sim.ivf_assign(new_emb, cents_stored, id_col, vec_col).select(
        "id", "centroid_id"
    )
    codes = sim.pq_encode(new_emb, cb_stored, id_col, vec_col, m, dim)
    (
        codes.join(assigned, "id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(f"{path}/codes")
    )


def remove_from_ivfpq_index(
    spark: SparkSession, path: str, ids, id_col: str = "id"
) -> dict:
    """Right-to-be-forgotten for the deployed index: delete the given
    vector ids from the ``codes`` store, rewriting ONLY the cells that
    contain them. The data-table side of a GDPR delete is
    ``manifest.cow_delete_where``; this is its index-sidecar twin — a
    forgotten user must stop being retrievable by similarity search too,
    and a full index rebuild per deletion batch would be corpus-sized.

    Plan shape: one narrow columnar scan of ``codes`` broadcast-semi-
    joined to the id set finds the affected cells (ids are not derivable
    without the deleted embeddings, so this scan is irreducible — but it
    projects two columns and carries no vectors); the survivors of ONLY
    those cells (partition-pruned read) are rewritten through a staging
    directory and swapped in per cell dir. Untouched cells' files are
    never opened or rewritten — cost scales with the affected cells, not
    the corpus. The quantizer and codebooks are untouched (FAISS
    ``remove_ids`` semantics: removal filters the inverted lists; it
    never retrains — drift from heavy deletion is the rebuild gate's
    job, :func:`rebuild_if_drifted`).

    The per-cell swap is a maintenance-window operation under the
    engine's single-maintenance-writer norm: a concurrent searcher can
    observe an affected cell absent for the instant between its two
    renames. The window is journaled and crash-safe: the removal claims
    an exclusive ``_remove-inprogress`` marker (atomic create — the
    manifest layer's `_claim_marker`), fully stages the survivor files,
    journals the per-cell swap plan, and only then swaps; a crash at ANY
    point is replayed or rolled back by
    :func:`recover_incomplete_removal`, so a recovered index is always
    wholly-old or wholly-new per cell, never a mix of old and new files.
    All filesystem ops go through Hadoop's FS API, so the protocol works
    unchanged on HDFS/object stores. The atomic alternative for online
    serving — no absence window at all — is the generation publish
    (:func:`commit_index_removal`).
    Returns {"rows_removed", "cells_rewritten"}.
    """
    import uuid

    from ..manifest import _claim_marker, _write_small_json

    fs, hp, _ = _fs(spark, path)
    # Refuse to operate on a removal GENERATION: its cells live in parent
    # builds via the cellmap — an in-place swap here would remove nothing
    # from referenced cells yet report success. And refuse on a build a
    # COMMITTED child generation references: swapping its cells in place
    # mutates the serving generation's view mid-operation, breaking the
    # old-or-new contract commit_index_removal exists to provide.
    if fs.exists(hp(f"{path}/{CELLMAP}")):
        raise ValueError(
            f"{path} is a removal generation (cellmap): its cells are "
            "references into parent builds — use commit_index_removal "
            "on the index root instead"
        )
    _refuse_if_referenced_by_child(spark, path)
    # NOTE: no automatic crash recovery here — recovery of a marker whose
    # writer is still ALIVE would delete its claim and staging mid-run
    # (two writers would then both swap). A crashed predecessor's journal
    # makes the claim below fail loudly; the operator (or a maintenance
    # job that KNOWS no writer is live) runs recover_incomplete_removal.
    if isinstance(ids, (list, tuple)):
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], "id bigint"
        )
    else:
        ids_df = ids.select(F.col(id_col).cast("long").alias("id"))
    codes = spark.read.parquet(f"{path}/codes")
    cells = [
        r.centroid_id
        for r in (
            codes.join(F.broadcast(ids_df), "id", "left_semi")
            .select("centroid_id")
            .distinct()
            .collect()
        )
    ]
    if not cells:
        return {"rows_removed": 0, "cells_rewritten": 0}
    affected = codes.filter(F.col("centroid_id").isin(cells))
    n_before = affected.count()
    survivors = affected.join(F.broadcast(ids_df), "id", "left_anti")
    staging_rel = f"codes_rm_staging_{uuid.uuid4().hex[:8]}"
    if not _claim_marker(
        fs, hp, path, REMOVE_MARKER, {"staging": staging_rel}
    ):
        raise ConcurrentIndexMaintenanceError(
            f"a removal is already in progress under {path}; "
            "run recover_incomplete_removal if its writer crashed"
        )
    _maybe_crash("after-claim")
    # stage first: Spark refuses to overwrite a path it is reading from,
    # and a direct overwrite would drop the unaffected cells anyway
    survivors.write.mode("overwrite").partitionBy("centroid_id").parquet(
        f"{path}/{staging_rel}"
    )
    _maybe_crash("after-staging")
    # journal the swap plan AFTER staging completes: recovery can then
    # replay the swaps idempotently (an absent staging cell means either
    # "every row of the cell was removed" — staged=False — or "this
    # cell's swap already ran"); written atomically via tmp+rename.
    plan = {
        "staging": staging_rel,
        "cells": [int(c) for c in cells],
        "staged": {
            str(int(c)): bool(
                fs.exists(hp(f"{path}/{staging_rel}/centroid_id={int(c)}"))
            )
            for c in cells
        },
    }
    _write_small_json(fs, hp, path, REMOVE_PLAN, plan)
    _maybe_crash("after-plan")
    _apply_removal_plan(spark, path, plan)
    _cleanup_removal(spark, path, staging_rel)
    n_after = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("centroid_id").isin(cells))
        .count()
    )
    return {
        "rows_removed": n_before - n_after,
        "cells_rewritten": len(cells),
    }


def _refuse_if_referenced_by_child(spark: SparkSession, path: str) -> None:
    """If ``path`` is a ``builds/b{N}`` generation whose directories a
    COMMITTED sibling generation's cellmap references, in-place cell
    swaps would mutate that (possibly serving) generation's view."""
    import re

    from ..manifest import _read_small_json

    m = re.search(r"^(.*)/builds/b(\d+)$", path.rstrip("/"))
    if not m:
        return
    root, me = m.group(1), int(m.group(2))
    me_path = path.rstrip("/")
    fs, hp, _ = _fs(spark, path)
    for bid in _committed_builds(root, spark):
        if bid == me:
            continue
        gdir = f"{root}/builds/b{bid}"
        if not fs.exists(hp(f"{gdir}/{CELLMAP}")):
            continue
        try:
            cm = _read_small_json(fs, hp, gdir, CELLMAP)
        except Exception as exc:
            # fail CLOSED: a guard that exists to refuse must not fall
            # open because a committed generation's cellmap would not
            # read (object-store hiccup = maybe-referenced)
            raise RuntimeError(
                f"cannot verify whether {path} is referenced: committed "
                f"generation {gdir}'s cellmap is unreadable ({exc}); "
                "retry, or use commit_index_removal which never touches "
                "parent cells"
            ) from exc
        refs = [cm.get("centroids", ""), cm.get("codebooks", "")] + [
            d for dirs in cm.get("cells", {}).values() for d in dirs
        ]
        # boundary-aware prefix: builds/b1 must not match builds/b10
        if any(
            r.rstrip("/") == me_path or r.startswith(me_path + "/")
            for r in refs
        ):
            raise ValueError(
                f"{path} is referenced by committed generation {gdir}'s "
                "cellmap — an in-place swap would mutate that "
                "generation's view; use commit_index_removal on "
                f"{root} instead"
            )


def _apply_removal_plan(spark: SparkSession, path: str, plan: dict) -> None:
    """Execute (or idempotently replay) a journaled per-cell swap. Whole-
    directory renames through the Hadoop FS API: a cell is always a
    complete old directory or a complete new one — a crash can leave a
    cell momentarily absent (delete landed, rename didn't), and replay
    finishes the rename; old and new files never mix inside a cell."""
    from ..manifest import _must

    fs, hp, _ = _fs(spark, path)
    for c in plan["cells"]:
        dst = hp(f"{path}/codes/centroid_id={c}")
        src = hp(f"{path}/{plan['staging']}/centroid_id={c}")
        if plan["staged"][str(c)]:
            if not fs.exists(src):
                continue  # replay: this cell's swap already completed
            if fs.exists(dst):
                _must(fs.delete(dst, True), "cell-swap-delete", dst)
            _maybe_crash("mid-swap")
            _must(fs.rename(src, dst), "cell-swap-rename", dst)
        elif fs.exists(dst):  # every row of the cell removed
            _must(fs.delete(dst, True), "cell-drop-delete", dst)
        _maybe_crash("after-first-cell")


def _cleanup_removal(
    spark: SparkSession, path: str, staging_rel: str | None
) -> None:
    fs, hp, _ = _fs(spark, path)
    if staging_rel and fs.exists(hp(f"{path}/{staging_rel}")):
        fs.delete(hp(f"{path}/{staging_rel}"), True)
    for rel in (REMOVE_PLAN, REMOVE_MARKER):
        if fs.exists(hp(f"{path}/{rel}")):
            fs.delete(hp(f"{path}/{rel}"), False)


def recover_incomplete_removal(spark: SparkSession, path: str) -> dict:
    """Crash recovery for :func:`remove_from_ivfpq_index` — the index
    twin of manifest.recover_incomplete_rewrite. Three cases, decided by
    the journal files (both written through atomic FS primitives):

    * no ``_remove-inprogress`` marker — nothing to do;
    * marker but no ``_remove-plan`` — the writer died before the swap
      plan landed, so NO cell was touched yet: roll back by dropping the
      (possibly partial) staging directory and the marker. A torn marker
      (claim crashed between create-exclusive and payload write) lands
      here too — staging dirs are found by prefix listing;
    * marker + plan — the staging is complete and swaps may have started:
      REPLAY the plan to completion (idempotent — see
      :func:`_apply_removal_plan`) and clean up.

    Returns {"recovered", "completed"}: ``completed`` True when a
    journaled plan was replayed forward, False when rolled back.
    """
    fs, hp, _ = _fs(spark, path)
    if not fs.exists(hp(f"{path}/{REMOVE_MARKER}")):
        return {"recovered": False, "completed": False}
    from ..manifest import _read_small_json

    if fs.exists(hp(f"{path}/{REMOVE_PLAN}")):
        plan = _read_small_json(fs, hp, path, REMOVE_PLAN)
        _apply_removal_plan(spark, path, plan)
        _cleanup_removal(spark, path, plan["staging"])
        return {"recovered": True, "completed": True}
    # No plan: no swap ever started. Drop any staging dirs (prefix-listed,
    # so a torn marker whose payload never landed is handled identically).
    root_status = fs.listStatus(hp(path))
    for st in root_status:
        name = st.getPath().getName()
        if name.startswith("codes_rm_staging_"):
            fs.delete(st.getPath(), True)
    fs.delete(hp(f"{path}/{REMOVE_MARKER}"), False)
    return {"recovered": True, "completed": False}


COMMIT_MARKER = "_COMMITTED"


def _build_dir_ids(spark: SparkSession, root: str) -> list[int]:
    """Every ``b{N}`` directory under ``{root}/builds`` — committed or
    not."""
    fs, hp, _ = _fs(spark, root)
    bdir = hp(f"{root}/builds")
    if not fs.exists(bdir):
        return []
    out = []
    for st in fs.listStatus(bdir):
        name = st.getPath().getName()
        if name.startswith("b") and name[1:].isdigit():
            out.append(int(name[1:]))
    return sorted(out)


def _committed_builds(
    root: str, spark: SparkSession | None = None
) -> list[int]:
    """Generations with a READABLE commit marker, via the Hadoop FS API.
    A torn marker (claimant crashed between the exclusive create and the
    payload write) parses as nothing and is treated as uncommitted — the
    same torn-claim rule as manifest.recover_incomplete_rewrite."""
    from ..manifest import _read_small_json

    spark = spark or _active_spark()
    fs, hp, _ = _fs(spark, root)
    out = []
    for bid in _build_dir_ids(spark, root):
        gdir = f"{root}/builds/b{bid}"
        if not fs.exists(hp(f"{gdir}/{COMMIT_MARKER}")):
            continue
        try:
            _read_small_json(fs, hp, gdir, COMMIT_MARKER)
        except Exception:
            continue  # torn marker: never served
        out.append(bid)
    return sorted(out)


def current_index_path(
    root: str, spark: SparkSession | None = None
) -> str:
    """The serving build: highest COMMITTED generation under
    ``{root}/builds/b{N}``. Committing is the creation of one marker file
    (exclusive create through the Hadoop FS — the manifest-style atomic
    publish), so readers resolve either the old or the new build, never a
    torn one; a crashed rebuild leaves an uncommitted directory that is
    never served."""
    builds = _committed_builds(root, spark)
    if not builds:
        raise FileNotFoundError(f"no committed index builds under {root}")
    return f"{root}/builds/b{builds[-1]}"


def commit_index_build(emb: DataFrame, root: str, **build_kwargs) -> str:
    """Train a NEW index generation under ``{root}/builds/b{N+1}`` and
    atomically publish it: the commit marker (holding {"n_trained": ...})
    is written LAST with exclusive create (manifest._claim_marker — works
    on HDFS/object stores, kernel-atomic O_EXCL on local FS), so the swap
    to the new build is a single metadata operation and concurrent
    searchers keep reading the previous generation until it lands.
    Returns the committed path."""
    spark = emb.sparkSession
    bid, bdir = _allocate_generation(spark, root)
    build_ivfpq_index(emb, bdir, **build_kwargs)
    n_trained = emb.count()
    _publish_generation(
        spark, bdir, {"build": bid, "n_trained": int(n_trained)}
    )
    return bdir


ALLOC_MARKER = "_ALLOCATED"


def _allocate_generation(spark: SparkSession, root: str) -> tuple:
    """Claim the next generation directory BEFORE any data is written
    into it: two concurrent publishers must never share a ``b{N}`` (the
    marker winner would otherwise publish a directory holding the
    loser's files). Allocation is an exclusive-create ``_ALLOCATED``
    marker; on contention the id advances and the claim retries.
    Uncommitted husks from crashed builds keep their allocation, so a
    later writer never reuses their directory either."""
    from ..manifest import _claim_marker

    fs, hp, _ = _fs(spark, root)
    builds = _committed_builds(root, spark)
    bid = (builds[-1] if builds else 0) + 1
    while True:
        bdir = f"{root}/builds/b{bid}"
        # a pre-claim-era husk dir without a marker: claim inside it
        if _claim_marker(fs, hp, bdir, ALLOC_MARKER, {"build": bid}):
            # clear any husk leftovers NOW: the asset writers replace
            # their own stores, but a stale _cellmap.json from a crashed
            # removal publish would otherwise shadow a fresh full build
            # (resolve_assets checks the cellmap first), and stale codes
            # partitions would union into a removal generation's own
            # cells — delete everything except our claim
            for st in fs.listStatus(hp(bdir)):
                name = st.getPath().getName()
                if name != ALLOC_MARKER:
                    fs.delete(st.getPath(), True)
            return bid, bdir
        bid += 1


def _publish_generation(spark: SparkSession, bdir: str, payload: dict) -> None:
    """Atomically commit a generation: exclusive-create its marker. A
    husk left by a crashed writer may hold a TORN marker (claim crashed
    mid-payload) — unreadable means uncommitted, so it is dropped and
    re-claimed (same torn-claim rule as the manifest layer); a READABLE
    existing marker means a concurrent writer genuinely won."""
    from ..manifest import _claim_marker, _read_small_json

    fs, hp, _ = _fs(spark, bdir)
    if not _claim_marker(fs, hp, bdir, COMMIT_MARKER, payload):
        try:
            _read_small_json(fs, hp, bdir, COMMIT_MARKER)
            torn = False
        except Exception:
            torn = True
        if not torn:
            raise ConcurrentIndexMaintenanceError(
                f"generation {bdir} was already committed by another writer"
            )
        fs.delete(hp(f"{bdir}/{COMMIT_MARKER}"), False)
        if not _claim_marker(fs, hp, bdir, COMMIT_MARKER, payload):
            raise ConcurrentIndexMaintenanceError(
                f"generation {bdir} was already committed by another writer"
            )


def index_drift_ppm(spark: SparkSession, root: str) -> int:
    """Quantizer-drift signal of the SERVING build: the share (ppm) of
    indexed vectors that arrived AFTER training — i.e. via
    :func:`refresh_ivfpq_index` appends, which never move the quantizer.
    Reads only the codes sidecar's distinct ids plus the commit marker's
    ``n_trained``; the raw corpus is never rescanned."""
    from ..manifest import _read_small_json

    cur = current_index_path(root, spark)
    fs, hp, _ = _fs(spark, cur)
    n_trained = int(_read_small_json(fs, hp, cur, COMMIT_MARKER)["n_trained"])
    n_now = (
        _codes_for_cells(spark, cur).select("id").distinct().count()
    )
    if n_now <= 0:
        return 0
    return max(0, (n_now - n_trained)) * 1_000_000 // n_now


def rebuild_if_drifted(
    spark: SparkSession,
    emb: DataFrame,
    root: str,
    threshold_ppm: int,
    **build_kwargs,
) -> dict:
    """The production retrain gate the drift monitor feeds
    (q_ann_index_drift measures; this acts): when the serving build's
    post-training share reaches ``threshold_ppm``, retrain on ``emb``
    under a FRESH generation directory and atomically swap the committed
    pointer (:func:`commit_index_build`). Search results switch to the
    rebuilt quantizer only after the marker lands; below threshold this
    is a metadata-only no-op. Returns
    {"rebuilt", "drift_ppm", "path"}."""
    drift = index_drift_ppm(spark, root)
    if drift < threshold_ppm:
        return {
            "rebuilt": False,
            "drift_ppm": drift,
            "path": current_index_path(root),
        }
    path = commit_index_build(emb, root, **build_kwargs)
    return {"rebuilt": True, "drift_ppm": drift, "path": path}


def vacuum_index(
    spark: SparkSession, root: str, dry_run: bool = False,
    force: bool = False,
) -> dict:
    """Reclaim superseded index generations — the index twin of the
    table layer's manifest vacuum, and REFERENCE-AWARE: a removal
    generation's cellmap points into its parent's physical directories,
    so a build directory may only be deleted when NO committed
    generation >= the serving one references any path under it. The
    serving build itself, uncommitted husks' referenced assets, and
    anything the serving cellmap chain reaches are kept.

    Uncommitted directories split two ways: a dir WITHOUT an
    ``_ALLOCATED`` claim (pre-claim-era husk) is reclaimed; a dir whose
    claim exists but whose commit marker doesn't may be a LIVE build
    mid-publish — those are SKIPPED and reported under ``in_flight``
    unless ``force=True`` (operator asserts no writer is alive).
    Returns {"kept", "deleted", "in_flight", "dry_run"} with build dir
    paths."""
    fs, hp, _ = _fs(spark, root)
    committed = _committed_builds(root, spark)
    if not committed:
        return {"kept": [], "deleted": [], "in_flight": [],
                "dry_run": dry_run}
    serving = committed[-1]
    # every physical path the serving generation (the only one new
    # readers resolve) transitively references
    referenced: set[str] = set()
    cur = f"{root}/builds/b{serving}"
    referenced.add(cur)
    assets = _resolve_assets(spark, cur)
    # {build}/centroids, {build}/codebooks -> keep the owning build dir
    referenced.add(assets["centroids"].rsplit("/", 1)[0])
    referenced.add(assets["codebooks"].rsplit("/", 1)[0])
    if assets["cells"] is not None:
        for dirs in assets["cells"].values():
            for d in dirs:
                # cell dirs live at {build}/codes/centroid_id=N — keep
                # the owning build directory
                referenced.add(d.rsplit("/codes/", 1)[0])
    committed_set = set(committed)
    kept, deleted, in_flight = [], [], []
    for bid in _build_dir_ids(spark, root):
        bdir = f"{root}/builds/b{bid}"
        if bid == serving or bdir in referenced:
            kept.append(bdir)
            continue
        if (
            not force
            and bid not in committed_set
            and fs.exists(hp(f"{bdir}/{ALLOC_MARKER}"))
        ):
            # claimed but never committed: a concurrent writer may be
            # mid-build — never reclaim without an explicit operator
            # assertion that no writer is alive (force=True)
            in_flight.append(bdir)
            continue
        deleted.append(bdir)
        if not dry_run:
            fs.delete(hp(bdir), True)
    return {"kept": sorted(kept), "deleted": sorted(deleted),
            "in_flight": sorted(in_flight), "dry_run": dry_run}


def _resolve_assets(spark: SparkSession, path: str) -> dict:
    """Physical asset locations for the index at ``path``. A full build
    (or a flat index dir) owns all three stores; a REMOVAL generation
    (:func:`commit_index_removal`) references its untouched assets from
    the parent generation via ``_cellmap.json`` — {"centroids": dir,
    "codebooks": dir, "cells": {cid: [dir, ...]}} — and owns only the
    survivor-rewritten cells under its own ``codes``."""
    fs, hp, _ = _fs(spark, path)
    own = f"{path}/codes" if fs.exists(hp(f"{path}/codes")) else None
    if fs.exists(hp(f"{path}/{CELLMAP}")):
        from ..manifest import _read_small_json

        m = _read_small_json(fs, hp, path, CELLMAP)
        return {
            "centroids": m["centroids"],
            "codebooks": m["codebooks"],
            "cells": {int(k): list(v) for k, v in m["cells"].items()},
            "own_codes": own,
        }
    return {
        "centroids": f"{path}/centroids",
        "codebooks": f"{path}/codebooks",
        "cells": None,
        "own_codes": own,
    }


def _own_cell_ids(spark: SparkSession, codes_dir: str) -> list[int]:
    """Partition values present in a ``codes`` directory, from the FS
    listing (manifest-sized — one listStatus, no data read)."""
    fs, hp, _ = _fs(spark, codes_dir)
    if not fs.exists(hp(codes_dir)):
        return []
    out = []
    for st in fs.listStatus(hp(codes_dir)):
        name = st.getPath().getName()
        if name.startswith("centroid_id="):
            out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _codes_for_cells(
    spark: SparkSession, path: str, cells: list[int] | None = None
) -> DataFrame:
    """The (id, m, code, centroid_id) rows of the given cells (all cells
    when ``cells`` is None), resolved through the generation's cellmap.

    Flat/full-build layout: one partitioned read with an ``isin`` filter
    — the partition-pruned plan the search always had. Removal
    generations: referenced cell directories are GROUPED BY their owning
    build's ``codes`` root and read with ``basePath`` (the partition
    column comes back from the directory names), so the plan holds one
    pruned scan per GENERATION in the reference chain — O(#generations)
    reads regardless of the cell count, never one read per cell (at a
    production 64k-cell quantizer a per-cell loop would be a driver-side
    planning explosion). Per cell the map holds a LIST of directories so
    a parent generation's own refresh appends stack under later removals
    without ever copying untouched bytes."""
    assets = _resolve_assets(spark, path)
    if assets["cells"] is None:
        df = spark.read.parquet(assets["own_codes"])
        if cells is not None:
            df = df.filter(
                F.col("centroid_id").isin([int(c) for c in cells])
            )
        return df.select("id", "m", "code", "centroid_id")
    own_all = (
        set(_own_cell_ids(spark, assets["own_codes"]))
        if assets["own_codes"]
        else set()
    )
    wanted = (
        {int(c) for c in cells}
        if cells is not None
        else set(assets["cells"]) | own_all
    )
    from collections import defaultdict

    by_base: dict = defaultdict(set)
    for c in sorted(wanted):
        for d in assets["cells"].get(c, []):
            by_base[d.rsplit("/centroid_id=", 1)[0]].add(d)
        if c in own_all:
            by_base[assets["own_codes"]].add(
                f"{assets['own_codes']}/centroid_id={c}"
            )
    parts = [
        spark.read.option("basePath", base)
        .parquet(*sorted(dirs))
        .select(
            "id", "m", "code", F.col("centroid_id").cast("int").alias(
                "centroid_id"
            )
        )
        for base, dirs in sorted(by_base.items())
    ]
    if not parts:
        return spark.createDataFrame(
            [], "id bigint, m int, code int, centroid_id int"
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def commit_index_removal(
    spark: SparkSession, root: str, ids, id_col: str = "id"
) -> str:
    """ONLINE GDPR removal for a served generation-rooted index: publish
    a NEW generation whose affected cells are survivor-rewritten and
    whose untouched assets — quantizer, codebooks, and every unaffected
    cell — are REFERENCED from the parent via ``_cellmap.json``, never
    copied or rewritten (metadata cost is one k-entry JSON; data cost is
    the affected cells only). The commit marker lands LAST with exclusive
    create, exactly like :func:`commit_index_build`: a concurrent
    searcher resolves the old generation until the marker exists and the
    new one after — old-or-new, never torn, no maintenance window. This
    is the composition the in-place :func:`remove_from_ivfpq_index`
    documents as its online alternative; FAISS ``remove_ids`` semantics
    otherwise (inverted lists filtered, quantizer untouched).

    Superseded generations stay on disk until an explicit cleanup;
    because later cellmaps may reference their cell directories, any
    vacuum must keep every directory referenced by a committed
    generation >= the serving one. Returns the committed path."""
    from ..manifest import _read_small_json, _write_small_json

    cur = current_index_path(root, spark)
    assets = _resolve_assets(spark, cur)
    fs, hp, _ = _fs(spark, root)
    if isinstance(ids, (list, tuple)):
        ids_df = spark.createDataFrame(
            [(int(i),) for i in ids], "id bigint"
        )
    else:
        ids_df = ids.select(F.col(id_col).cast("long").alias("id"))
    codes = _codes_for_cells(spark, cur)
    affected = sorted(
        r.centroid_id
        for r in (
            codes.join(F.broadcast(ids_df), "id", "left_semi")
            .select("centroid_id")
            .distinct()
            .collect()
        )
    )
    bid, bdir = _allocate_generation(spark, root)
    if affected:
        survivors = _codes_for_cells(spark, cur, affected).join(
            F.broadcast(ids_df), "id", "left_anti"
        )
        (
            survivors.select("id", "m", "code", "centroid_id")
            .write.mode("overwrite")
            .partitionBy("centroid_id")
            .parquet(f"{bdir}/codes")
        )
    # Untouched cells resolve to the parent's physical directories; a
    # parent cell split across a referenced dir + the parent's own
    # refresh appends carries BOTH paths forward.
    if assets["cells"] is None:
        parent_cells = {
            c: [f"{assets['own_codes']}/centroid_id={c}"]
            for c in (
                _own_cell_ids(spark, assets["own_codes"])
                if assets["own_codes"]
                else []
            )
        }
    else:
        parent_cells = {c: list(v) for c, v in assets["cells"].items()}
        if assets["own_codes"]:
            for c in _own_cell_ids(spark, assets["own_codes"]):
                parent_cells.setdefault(c, []).append(
                    f"{assets['own_codes']}/centroid_id={c}"
                )
    cellmap = {
        "centroids": assets["centroids"],
        "codebooks": assets["codebooks"],
        "cells": {
            str(c): dirs
            for c, dirs in parent_cells.items()
            if c not in set(affected)
        },
    }
    _write_small_json(fs, hp, bdir, CELLMAP, cellmap)
    parent_marker = _read_small_json(fs, hp, cur, COMMIT_MARKER)
    _publish_generation(
        spark, bdir,
        {
            "build": bid,
            "n_trained": int(parent_marker["n_trained"]),
            "removed_from": cur,
            "cells_rewritten": len(affected),
        },
    )
    return bdir


def streaming_index_sink(
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
):
    """foreachBatch sink for continuous index maintenance: each micro-batch
    of newly embedded vectors is assigned + PQ-encoded against the STORED
    quantizer/codebooks and parquet-appended into the touched cells — the
    streaming composition of :func:`refresh_ivfpq_index`, mirroring
    table.indexed_logs_sink's token-Bloom refresh.

    Batch atomicity rides the parquet commit protocol (a failed batch
    leaves only uncommitted temp files; the next replay re-appends), so
    searchers see a cell's new codes only after its batch commits — never
    a torn cell. Replay is made IDEMPOTENT by a per-batch commit marker
    (``_stream_commits/batch-{id}``, written after the refresh): when
    Structured Streaming re-delivers a batch whose sink work already
    committed (failure between the sink call and the checkpoint commit —
    the standard foreachBatch at-least-once window), the marker short-
    circuits the refresh and the codes are never double-appended. The
    residual window (crash between the parquet commit and the marker
    write) is the same two-phase gap as every marker protocol in this
    engine — one batch's codes could double on a crash landing exactly
    there, the documented at-least-once floor. Single writer stream per
    index path (the engine's maintenance norm): markers are keyed by
    batch_id alone. Cost per batch is proportional
    to the batch (one k-row centroid broadcast + one m*k-row codebook
    broadcast + encode of the batch's vectors); the corpus-sized ``codes``
    store is never rewritten. The index must have been built
    (:func:`build_ivfpq_index`) before the stream starts. Markers are
    created exclusively through the Hadoop FS (manifest._claim_marker),
    so the protocol is identical on HDFS/object stores.
    """

    def sink_fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        from ..manifest import _claim_marker

        spark = batch.sparkSession
        fs, hp, _ = _fs(spark, path)
        rel = f"_stream_commits/batch-{batch_id}"
        if fs.exists(hp(f"{path}/{rel}")):
            return  # replay of an already-committed batch — skip, no dupes
        refresh_ivfpq_index(
            batch, path, id_col=id_col, vec_col=vec_col, m=m, dim=dim
        )
        _claim_marker(fs, hp, path, rel, {"batch": int(batch_id)})

    return sink_fn


def probe_cells(
    spark: SparkSession, path: str, query_vec: list[float], n_probe: int
) -> list[int]:
    """Rank the stored centroids against the query, return the ``n_probe``
    nearest cell ids. The centroids table is k rows — this read is
    manifest-sized and plays the same plan-time role as a skip-index
    lookup (ties break to the lower centroid_id, matching the oracle)."""
    q = lit_double_array(query_vec)
    from .dedup import cosine_col

    return [
        r.centroid_id
        for r in (
            spark.read.parquet(_resolve_assets(spark, path)["centroids"])
            .select(
                "centroid_id", cosine_col(F.col("centroid"), q).alias("s")
            )
            .orderBy(F.col("s").desc(), F.col("centroid_id"))
            .limit(n_probe)
            .collect()
        )
    ]


def ivfpq_search(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 2,
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
) -> DataFrame:
    """ADC top-k over the prebuilt index — no training, no embeddings scan.

    Reads: centroids (k rows, probe ranking), codebooks (m*k rows, the
    broadcast distance table), and ONLY the probed ``codes`` partitions
    (partition-pruned: ``PartitionFilters: [centroid_id IN ...]`` in the
    plan). Distances enter the sum as integer micro-units exactly as
    similarity.pq_adc_topk, so results hash-match the in-query path.
    Returns (id, adist_micros) ascending, ties by id.
    """
    cells = probe_cells(spark, path, query_vec, n_probe)
    return _adc_topk(spark, path, cells, query_vec, k, m, dim)


def _adc_topk(
    spark: SparkSession,
    path: str,
    cells: list,
    query_vec: list[float],
    k: int,
    m: int,
    dim: int,
    id_filter: DataFrame | None = None,
) -> DataFrame:
    """The shared ADC scoring stage: broadcast distance table from the
    codebooks, partition-pruned read of the probed cells' codes
    (optionally pre-joined against a broadcast id filter — the hybrid
    search path), integer micro-unit sums, top-k. ONE home for the
    hash-checked quantization (floor(l2 * 1e6)) so the plain and
    filtered search paths can never diverge."""
    per = dim // m
    qsub = lit_double_matrix(
        [query_vec[j * per:(j + 1) * per] for j in range(m)]
    )
    cb = spark.read.parquet(_resolve_assets(spark, path)["codebooks"])
    dist_table = F.broadcast(
        cb.select(
            "m",
            F.col("centroid_id").alias("code"),
            F.floor(
                sim.l2_col(F.col("cv"), F.element_at(qsub, F.col("m") + 1))
                * 1000000
            )
            .cast("long")
            .alias("dmic"),
        )
    )
    codes = _codes_for_cells(spark, path, [int(c) for c in cells])
    if id_filter is not None:
        codes = codes.join(id_filter, "id")
    return (
        codes.join(dist_table, ["m", "code"])
        .groupBy("id")
        .agg(F.sum("dmic").alias("adist_micros"))
        .orderBy("adist_micros", "id")
        .limit(k)
    )


def ivfpq_search_filtered(
    spark: SparkSession,
    path: str,
    allowed: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_probe_start: int = 2,
    id_col: str = "id",
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
) -> DataFrame:
    """FILTERED (hybrid) ANN search — metadata predicate + vector top-k,
    the query shape every production vector store serves ("nearest
    documents WHERE lang = 'en'"). Post-filtering a fixed-probe ADC
    result under-fills when the predicate is selective, so this uses the
    standard PROBE-WIDENING loop: probe ``n_probe_start`` cells, count
    the predicate-surviving candidates in them (a partition-pruned read
    joined against the broadcast allowed-id set), and double the probe
    count until at least ``k`` survivors exist (or every cell is
    probed). The widening schedule is deterministic given the data, so
    the oracle replays the level choice exactly.

    Returns the ADC top-k among allowed ids, with the audit columns
    ``n_probe_used`` and ``n_allowed_cand`` in every row (the external
    check pins the widening decision, not just the ranking). Scale: each
    widening step reads only newly-probed cells' codes; the allowed-id
    set broadcasts (a selective predicate's id list is small by
    definition — for huge allowed sets flip to post-filtering, which
    cannot under-fill there)."""
    ids = F.broadcast(
        allowed.select(F.col(id_col).alias("id")).distinct()
    )
    n_cells = (
        spark.read.parquet(_resolve_assets(spark, path)["centroids"]).count()
    )
    # incremental widening: each level counts survivors in the NEWLY
    # probed cells only (a vector lives in exactly one cell, so the
    # per-level counts are disjoint and sum exactly)
    n_probe = min(n_probe_start, n_cells)
    counted: set[int] = set()
    n_cand = 0
    while True:
        cells = [int(c) for c in probe_cells(spark, path, query_vec, n_probe)]
        new = [c for c in cells if c not in counted]
        if new:
            n_cand += (
                _codes_for_cells(spark, path, new)
                .select("id").distinct().join(ids, "id").count()
            )
            counted.update(new)
        if n_cand >= k or n_probe >= n_cells:
            break
        n_probe = min(n_probe * 2, n_cells)
    out = _adc_topk(
        spark, path, cells, query_vec, k, m, dim, id_filter=ids
    )
    return out.select(
        "id", "adist_micros",
        F.lit(n_probe).cast("long").alias("n_probe_used"),
        F.lit(n_cand).cast("long").alias("n_allowed_cand"),
    )


def ivfpq_rerank(
    spark: SparkSession,
    path: str,
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    rerank: int = 20,
    n_probe: int = 2,
    m: int = sim.PQ_SUBSPACES,
    dim: int = sim.EMB_DIM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact re-ranking on top of ADC — the standard two-stage IVF-PQ
    search (FAISS ``IndexRefineFlat``): the quantized ADC pass nominates
    ``rerank`` (R >> k) candidates cheaply, then ONLY those R rows' full
    vectors are fetched from the corpus and scored exactly, and the true
    top-k of the exact scores is returned. ADC's quantization error can
    demote a true neighbor below rank k while keeping it inside rank R,
    so this recovers most of the recall gap at the cost of R exact
    distance computations instead of a corpus scan.

    Plan shape: the ADC stage is the partition-pruned probed-cells read
    of :func:`ivfpq_search`; its R-row result broadcasts into the corpus
    join, so the exact stage touches R rows of ``emb`` (a broadcast-semi
    lookup, never a scan-and-sort of the corpus). Exact scores are the
    same squared-L2 micro-unit integers as ADC (floor(l2 * 1e6)), so
    cross-engine hashes stay exact. Returns (id, edist_micros) ascending,
    ties by id."""
    cand = ivfpq_search(
        spark, path, query_vec, k=rerank, n_probe=n_probe, m=m, dim=dim
    ).select(F.col("id").alias("_cand_id"))
    q = lit_double_array(query_vec)
    return (
        emb.join(
            F.broadcast(cand), emb[id_col] == F.col("_cand_id")
        )
        .select(
            F.col(id_col).cast("long").alias("id"),
            # float32-stored vectors must promote BEFORE the dot products:
            # mixing a float32 dot(a,a) with float64 dot(a,b) breaks the
            # exact-zero self-distance identity (and cross-engine hashes)
            F.floor(
                sim.l2_col(F.col(vec_col).cast("array<double>"), q)
                * 1000000
            )
            .cast("long")
            .alias("edist_micros"),
        )
        .orderBy("edist_micros", "id")
        .limit(k)
    )
