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

ANN_INDEX_VERSION = 1


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

    The per-cell swap (rm + move) is a maintenance-window operation under
    the engine's single-maintenance-writer norm: a concurrent searcher
    can observe a cell mid-swap. The atomic alternative for online
    serving is a generation publish (:func:`commit_index_build`).
    Returns {"rows_removed", "cells_rewritten"}.
    """
    import os
    import shutil
    import uuid

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
    # stage first: Spark refuses to overwrite a path it is reading from,
    # and a direct overwrite would drop the unaffected cells anyway
    staging = f"{path}/codes_rm_staging_{uuid.uuid4().hex[:8]}"
    survivors.write.mode("overwrite").partitionBy("centroid_id").parquet(
        staging
    )
    for c in cells:
        dst = os.path.join(path, "codes", f"centroid_id={c}")
        src = os.path.join(staging, f"centroid_id={c}")
        shutil.rmtree(dst, ignore_errors=True)
        if os.path.exists(src):  # absent = every row of the cell removed
            shutil.move(src, dst)
    shutil.rmtree(staging, ignore_errors=True)
    n_after = (
        spark.read.parquet(f"{path}/codes")
        .filter(F.col("centroid_id").isin(cells))
        .count()
    )
    return {
        "rows_removed": n_before - n_after,
        "cells_rewritten": len(cells),
    }


COMMIT_MARKER = "_COMMITTED"


def _committed_builds(root: str) -> list[int]:
    import os

    bdir = os.path.join(root, "builds")
    if not os.path.isdir(bdir):
        return []
    out = []
    for name in os.listdir(bdir):
        if (
            name.startswith("b")
            and name[1:].isdigit()
            and os.path.exists(os.path.join(bdir, name, COMMIT_MARKER))
        ):
            out.append(int(name[1:]))
    return sorted(out)


def current_index_path(root: str) -> str:
    """The serving build: highest COMMITTED generation under
    ``{root}/builds/b{N}``. Committing is the creation of one marker file
    (exclusive create — the manifest-style atomic publish), so readers
    resolve either the old or the new build, never a torn one; a crashed
    rebuild leaves an uncommitted directory that is never served."""
    builds = _committed_builds(root)
    if not builds:
        raise FileNotFoundError(f"no committed index builds under {root}")
    import os

    return os.path.join(root, "builds", f"b{builds[-1]}")


def commit_index_build(emb: DataFrame, root: str, **build_kwargs) -> str:
    """Train a NEW index generation under ``{root}/builds/b{N+1}`` and
    atomically publish it: the commit marker (holding {"n_trained": ...})
    is written LAST with exclusive create, so the swap to the new build is
    a single metadata operation and concurrent searchers keep reading the
    previous generation until it lands. Returns the committed path."""
    import json as _json
    import os

    builds = _committed_builds(root)
    bid = (builds[-1] if builds else 0) + 1
    bdir = os.path.join(root, "builds", f"b{bid}")
    build_ivfpq_index(emb, bdir, **build_kwargs)
    n_trained = emb.count()
    with open(os.path.join(bdir, COMMIT_MARKER), "x") as fh:
        fh.write(_json.dumps({"build": bid, "n_trained": int(n_trained)}))
    return bdir


def index_drift_ppm(spark: SparkSession, root: str) -> int:
    """Quantizer-drift signal of the SERVING build: the share (ppm) of
    indexed vectors that arrived AFTER training — i.e. via
    :func:`refresh_ivfpq_index` appends, which never move the quantizer.
    Reads only the codes sidecar's distinct ids plus the commit marker's
    ``n_trained``; the raw corpus is never rescanned."""
    import json as _json
    import os

    cur = current_index_path(root)
    with open(os.path.join(cur, COMMIT_MARKER)) as fh:
        n_trained = int(_json.load(fh)["n_trained"])
    n_now = (
        spark.read.parquet(f"{cur}/codes").select("id").distinct().count()
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
    (:func:`build_ivfpq_index`) before the stream starts.
    """
    import os

    def sink_fn(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        mdir = os.path.join(path, "_stream_commits")
        marker = os.path.join(mdir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return  # replay of an already-committed batch — skip, no dupes
        refresh_ivfpq_index(
            batch, path, id_col=id_col, vec_col=vec_col, m=m, dim=dim
        )
        os.makedirs(mdir, exist_ok=True)
        with open(marker, "w"):
            pass

    return sink_fn


def probe_cells(
    spark: SparkSession, path: str, query_vec: list[float], n_probe: int
) -> list[int]:
    """Rank the stored centroids against the query, return the ``n_probe``
    nearest cell ids. The centroids table is k rows — this read is
    manifest-sized and plays the same plan-time role as a skip-index
    lookup (ties break to the lower centroid_id, matching the oracle)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    from .dedup import cosine_col

    return [
        r.centroid_id
        for r in (
            spark.read.parquet(f"{path}/centroids")
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
    per = dim // m
    qsub = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in query_vec[j * per:(j + 1) * per]])
            for j in range(m)
        ]
    )
    cb = spark.read.parquet(f"{path}/codebooks")
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
    codes = spark.read.parquet(f"{path}/codes").filter(
        F.col("centroid_id").isin([int(c) for c in cells])
    )
    return (
        codes.join(dist_table, ["m", "code"])
        .groupBy("id")
        .agg(F.sum("dmic").alias("adist_micros"))
        .orderBy("adist_micros", "id")
        .limit(k)
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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
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
