#!/usr/bin/env python
"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": <sf>}

Each query runs through the same code path the driver's correctness gate uses
(klogs_spark.queries registry); timing covers plan + execution + collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # klogs read surface
    "logs_env_map_count",
    "logs_number_stats",
    "logs_hourly_histogram",
    "logs_env_counts",
    "logs_newest",
    "logs_top_pods",
    # ingest hot paths (real decode over nested JSON / msgpack chunks)
    "ingest_decode_pipeline",
    "ingest_msgpack_pipeline",
    # generic analytics
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier",
    "tpch_q6_forecast_revenue",
    "events_sessionize",
    # LLM-pipeline EXT
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "text_quality",
    # round-7 addition: cluster-bounded semantic dedup
    "dedup_semantic",
    # round-9: the benched ANN surface is the DEPLOYED search shape only —
    # brute-force baseline (ann_cosine_topk above) + the persisted IVF-PQ
    # sidecar (trial 1 pays the one-off build; best-of-N reports the warm
    # search cost, which is the steady-state number a deployed index
    # serves). The in-query training forms (ann_pq_topk, ann_ivfpq_topk)
    # remain registry/oracle entries but are retired from the bench: a
    # codebook build is a training job, not a query cost (VERDICT r8 #2).
    "ann_ivfpq_prebuilt",
    # end-to-end corpus prep (quality filter -> dedup -> contamination)
    "pipeline_pretrain_prep",
    # round-8 primitives: exact global packing via the two-phase distributed
    # prefix sum, and the one-pass d^2 covariance aggregate
    "sample_pack_global_prefix",
    "embedding_covariance",
    # round-9 primitives: the distributed global_rank machinery (exact
    # NTILE/top-percent with no unpartitioned window) — tracked so a
    # regression in the two-phase rank path is visible per round
    "events_equidepth_histogram",
    "tpch_revenue_concentration",
    # round-9 late additions: the SymSpell deletion-neighborhood join
    # (keyed-candidate string similarity — the never-quadratic claim is a
    # perf claim, so it's benched) and the per-day interval-count peak
    # concurrency (two-phase baseline+running-sum, no global sort)
    "text_edit_distance_join",
    "events_peak_concurrency",
    # round-10: BM25's posting-list plan is a perf claim (work ∝ query
    # postings, not vocabulary) — benched so a regression to a full
    # vocabulary aggregate is visible
    "text_bm25_topk",
    # round-14: the two new corpus passes a pretraining pipeline runs
    # per-document — BPE tokenization (train + one vocab equi-join) and
    # fastText-style classifier inference (hashed features + broadcast
    # model join + argmax). Both are whole-corpus hot paths, so their
    # cost is tracked per round from the start.
    "text_bpe_tokenize",
    "text_classifier_score",
    # round-15: the trigram stupid-backoff LM (three corpus n-gram
    # explodes reducing through vocab-sized count tables — the heaviest
    # text scorer, tracked from the start), the Gopher rule battery
    # (row-local zero-shuffle projection — its cost IS the corpus scan
    # floor, a useful per-round calibration of the text read path), and
    # shot-boundary detection (full AVI demux + per-frame JPEG decode +
    # per-video window — the video-decode hot path).
    "text_lm_trigram_backoff",
    "text_gopher_rules",
    "multimodal_video_scene_cuts",
    # round-15 late: the winnowing window-min is the dedup family's
    # heaviest row-local loop — tracked after its fan-out fix (3.6->2.6s)
    "dedup_winnowing_pairs",
    # round-13 (VERDICT r12 #5): the two green-but-unmeasured query-time
    # paths. ivfpq_rerank = the prebuilt ADC search + an R-row (R=40)
    # broadcast-semi exact re-rank — expected ≈ ann_ivfpq_prebuilt plus a
    # small constant, never a corpus scan. context_anchor = the
    # interactive ±N context fetch over the real table layout — two
    # small constant, never a corpus scan. NOT the registry carrier
    # (q_ann_ivfpq_rerank also computes the plain ADC answer, an exact
    # FULL-SCAN ground truth, and two recall joins — a correctness gate,
    # ~3x the deployed search) — the timed block below runs the search
    # alone against the cached prebuilt index. The context fetch is
    # likewise timed in the materialized-table section
    # (table_context_fetch) against the already-built bench table, so the
    # measured cost is the FETCH — two partition-pruned day directories
    # with TakeOrderedAndProject both sides — not the table write the
    # registry carrier re-does per call.
    # round-17: the web-corpus entry path a pretraining pipeline runs on
    # every archive — WARC encode+decode round-trip (one fused
    # mapInPandas, gzip member per record), HTML boilerplate extraction
    # (native block split + tag strip + link-density filter, zero
    # Python), and RFC 3986 URL canonicalization (Arrow-batched UDF) —
    # all whole-corpus passes, tracked from the start.
    "ingest_warc_roundtrip",
    "text_html_extract",
    "text_url_normalize",
    # round-18: the two new whole-corpus multimodal-curation passes —
    # image-text pair alignment (one Arrow image tower + native caption
    # tower + broadcast join + SimHash pair dedup) and interleaved
    # sequence assembly + shard packing (native arrays + one window).
    "multimodal_pair_alignment",
    "multimodal_interleaved_pack",
    # round-19: the audio and video twins of pair alignment — real WAV
    # synth+decode (resp. AVI demux + JPEG frame decode) clip towers in
    # one Arrow pass + native caption tower + AQE-chosen pair join.
    "multimodal_audio_pair_alignment",
    "multimodal_video_pair_alignment",
    # round-19 late: the recall@1 retrieval eval — LSH bucket equi-join
    # candidates + per-caption top-1 window; the perf claim is "work ∝
    # eval_set x bucket_occupancy (linear in corpus at fixed planes;
    # plane count grows log2(corpus) at real scale)", so it's benched.
    "multimodal_pair_retrieval",
    # round-20: the bidirectional recall@1/@5 eval (CLIP-report
    # protocol) — both directions over the same bucketed candidates,
    # one cached Arrow tower feeding candidate pool AND query set.
    "multimodal_pair_retrieval_bidir",
]


_QUERY_NOTES = {
        # r7 flagged tpch_q1 crossing 2x (0.318 -> 0.734).
        # Root-caused in r8: sf0.1 lineitem.parquet ships as ONE
        # 600k-row row group in ONE file, so the scan+agg is a
        # single task no matter the core count — isolated
        # timings put the floor at ~0.19s (pushed-filter scan)
        # + ~0.32s (8-function agg) single-threaded. The plan
        # is optimal (PushedFilters carries the shipdate range,
        # the NTZ->LTZ cast is constant-folded away, two-phase
        # HashAggregate); the r5->r7 delta tracks the driver's
        # testdata regeneration (timestamp encoding changed in
        # r6) plus box noise. At 100 TB the table is many
        # files/row-groups and the same plan parallelizes.
        "tpch_q1_pricing_summary":
            "single-row-group input file => 1-task scan+agg; "
            "plan verified optimal (full pushdown, cast "
            "eliminated); delta vs r5 = testdata regeneration "
            "+ box noise",
        # r7's 0.927s for dedup_semantic was flattered by
        # cross-query cache leakage: the r7 bench never released
        # operator caches, so the ANN queries that ran earlier
        # had already materialized the identical centroid chain
        # and dedup_semantic timed only its pair join. r8
        # releases tracked caches between queries (the bounded-
        # cache contract), so the number now includes the
        # k-means build — the honest isolated cost. An r8 interim
        # regression (eager per-iteration materialize+drop made
        # repeat calls re-run iteration 1) was found and fixed:
        # warm cost measured 3.8-4.6s -> 1.4-1.9s at sf0.1.
        "dedup_semantic":
            "r7 number excluded the k-means build (cache "
            "leakage from earlier ANN queries); r8 isolates "
            "per-query cost via release_tracked — not "
            "comparable round-over-round",
        # r13 additions (VERDICT r12 #5)
        "ann_ivfpq_rerank_search":
            "deployed two-stage search: prebuilt-ADC nominates "
            "R candidates, R-row broadcast-semi exact re-rank; "
            "expected ~ ann_ivfpq_prebuilt + small constant",
        "table_context_fetch":
            "interactive ±N context fetch: ±12h horizon -> "
            "<=2 day dirs scanned (partition-pruned), "
            "TakeOrderedAndProject per side, never a day sort",
        "ingest_msgpack_pipeline":
            "r13: encode+decode share one mapInPandas worker "
            "(production pays ONE binary crossing; the old "
            "second Arrow hop was ~0.3s of synthetic-generator "
            "plumbing) + register-based iterative decoder with "
            "interned fixstr cache (2.15x) — not comparable "
            "round-over-round",
}


# Driver tail-capture budget for the final line. r20 PROVED the driver's
# window is 2000 chars (BENCH_r20.json.tail is exactly 2000 B and starts
# mid-object), not the 4096 this guard previously assumed — the ~2.2 KB
# compact line passed the guard and the official record was still lost
# (third time: r13, r19, r20). 1900 leaves headroom under the observed
# 2000-char window.
STDOUT_WINDOW = 1900


def compact_stdout_line(doc: dict, limit: int = STDOUT_WINDOW) -> str:
    """The FINAL stdout line for the driver's tail capture (r13/r19/r20 all
    lost their official per-query record to oversized lines): prose and
    derivable fields never ship (they live in BENCH_LOCAL.json), per-query
    seconds are rounded to 2 decimals (3-decimal values stay on disk),
    separators are compact, and if the line still exceeds ``limit`` bytes,
    secondary fields shed one by one — queries{} (the per-round record) is
    NEVER shed."""
    compact = {
        k: v for k, v in doc.items()
        if k not in ("notes", "timing", "calibration_protocol",
                     "capture_order")
    }
    if "queries" in compact:
        compact["queries"] = {
            k: round(v, 2) for k, v in compact["queries"].items()
        }
    if isinstance(compact.get("value"), float):
        compact["value"] = round(compact["value"], 2)
    dumps = lambda d: json.dumps(d, separators=(",", ":"))  # noqa: E731
    line = dumps(compact)
    # derivable/secondary fields shed first (all live in BENCH_LOCAL.json);
    # errors{} last — when non-empty it is diagnostic, not derivable
    sheddable = (
        ["comparable_r8_subtotal_sec"]
        + [k for k in compact if k.startswith("box_")]
        + ["comparable_r4_subtotal_sec", "trials", "errors"]
    )
    while len(line) > limit and sheddable:
        compact.pop(sheddable.pop(0), None)
        line = dumps(compact)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from klogs_spark.session import get_spark
    from klogs_spark.queries import registry

    spark = get_spark("klogs-spark-bench")
    specs = registry()

    # Warm-up outside the timed region: JVM/codegen, the parquet
    # FileFormatWriter/committer classes, a shuffle, and the Python worker
    # pool (each of the 32 workers imports pandas/pyarrow on first use —
    # ~8 s that would otherwise land on the first mapInPandas query).
    import tempfile

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(1_000).repartition(64, "id").count()
    spark.range(64, numPartitions=64).mapInPandas(
        lambda it: it, "id long"
    ).count()
    with tempfile.TemporaryDirectory(prefix="bench-warm-") as warm_dir:
        spark.range(1_000).write.mode("overwrite").parquet(warm_dir + "/w")

    # best-of-5 default: round-4 data showed ±53% swings on UNCHANGED code
    # with single-shot timing — the box is noisy (co-tenants, thermal), and
    # only the min over several trials is comparable across rounds.
    trials = int(os.environ.get("BENCH_TRIALS", "5"))
    timings: dict[str, float] = {}

    # box calibration: a fixed pure-JVM workload (no parquet, no Python, no
    # code that ever changes round-over-round) timed best-of-3. Dividing any
    # query's seconds by this factor normalizes away box-speed drift between
    # rounds — r8 observed ~20-40% uniform slowdown on UNTOUCHED queries vs
    # r7, which this metric makes visible and correctable.
    def probe(fn, trials_n: int = 3) -> float:
        best = float("inf")
        for _ in range(trials_n):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    _cpu_probe_fn = lambda: spark.range(100_000_000).selectExpr(  # noqa: E731
        "sum(id * 3 % 7)", "count(distinct id % 1024)"
    ).collect()
    calibration = probe(_cpu_probe_fn)
    print(f"# calibration: {calibration}s", file=sys.stderr)

    # shuffle-path calibration: a fixed repartition job timed next to the
    # CPU probe. The CPU-only probe cannot normalize SHUFFLE-path drift
    # (serializer, disk, page cache) — r15 and r16 driver captures each
    # looked like uniform 12-75% regressions and needed a judge bench
    # re-run to adjudicate as box drift. Two probes separate the axes:
    # cpu-probe flat + shuffle-probe up = shuffle-path drift, both flat =
    # real code regression in the queries that moved.
    _shuffle_probe_fn = lambda: spark.range(  # noqa: E731
        4_000_000
    ).repartition(64, "id").selectExpr("sum(id % 97)").collect()
    shuffle_calibration = probe(_shuffle_probe_fn)
    print(f"# shuffle calibration: {shuffle_calibration}s", file=sys.stderr)

    # parquet-scan calibration: a fixed filter+agg over the PINNED sf0.1
    # lineitem file — plain spark.read.parquet, no engine code, no Python.
    # The CPU and shuffle probes cannot see parquet-scan/page-cache/disk
    # drift: r18's +31% comparable subtotal moved on exactly this axis
    # while both probes were flat, and adjudication needed the judge's
    # manual re-runs (VERDICT r18 #2). Pinned to the default sf0.1 path
    # (not $SPARK_GRAFT_SF_DIR) so the probe workload is identical across
    # rounds regardless of the benched scale factor.
    _scan_probe = "/root/testdata/sf0.1/lineitem.parquet"
    scan_calibration = None
    _scan_probe_fn = lambda: spark.read.parquet(_scan_probe).filter(  # noqa: E731
        "l_quantity > 25"
    ).selectExpr(
        "sum(l_extendedprice * (1 - l_discount))",
        "count(distinct l_suppkey)",
    ).collect()
    if os.path.exists(_scan_probe):
        scan_calibration = probe(_scan_probe_fn)
    print(f"# scan calibration: {scan_calibration}s", file=sys.stderr)

    # Python-worker calibration: a fixed Arrow round-trip over the same
    # pinned file — isolates the fourth axis (Python worker pool, Arrow
    # serialization) that mapInPandas-heavy rows (decode, image tower)
    # ride on. No engine code: an identity mapInPandas plus a trivial agg.
    py_calibration = None
    _py_probe_fn = lambda: spark.read.parquet(_scan_probe).select(  # noqa: E731
        "l_orderkey", "l_quantity"
    ).mapInPandas(
        lambda it: it, "l_orderkey long, l_quantity double"
    ).selectExpr("sum(l_quantity)").collect()
    if os.path.exists(_scan_probe):
        py_calibration = probe(_py_probe_fn)
    print(f"# python-worker calibration: {py_calibration}s", file=sys.stderr)

    # Materialized-table section: write the logs view ONCE as the engine's
    # native table (daily partitions + cluster-key sort), then time the
    # canonical klogs filters against real storage — this is the layout the
    # 100 TB deployment queries, with partition pruning and row-group
    # skipping in play (vs the derived-view queries above, which scan the
    # raw events parquet every time).
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from klogs_spark.query import LogsQuery
    from klogs_spark.table import read_logs, write_logs
    from klogs_spark.views import derive_logs_from_events

    errors = {}
    table_dir = tempfile.mkdtemp(prefix="bench-logs-")
    # same-plan-shape warm-up at tiny scale: the derive+write plan carries
    # higher-order functions and map-typed columns whose generated code is
    # janino-compiled on first use (~4 s once per JVM) — compile it outside
    # the timed region so the metric is the steady-state write cost.
    # The whole materialized-table section shares one try/except: if the
    # write setup breaks, only the four table_* slots are lost, never the
    # HEADLINE loop below (the round-6 failure mode).
    try:
        with tempfile.TemporaryDirectory(prefix="bench-warm-") as warm_dir:
            write_logs(
                derive_logs_from_events(spark, sf_dir).limit(1_000),
                warm_dir + "/w",
                mode="overwrite",
            )
        # best-of-N like everything else: r4 proved single-shot timings on
        # this box swing ±50% on unchanged code, so one sample cannot
        # distinguish a real regression under ~2x
        best = float("inf")
        for _ in range(max(trials, 1)):
            t0 = time.perf_counter()
            write_logs(derive_logs_from_events(spark, sf_dir), table_dir,
                       mode="overwrite")
            best = min(best, time.perf_counter() - t0)
        timings["table_write_logs"] = round(best, 3)
        print(f"# table_write_logs: {best:.3f}s", file=sys.stderr)
        logs_table = read_logs(spark, table_dir)
    except Exception as exc:  # noqa: BLE001
        errors["table_write_logs"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# table_write_logs: FAILED {errors['table_write_logs']}",
              file=sys.stderr)
        logs_table = None
    # the alternative layout's write cost (rank lookups + Morton sort):
    # tracked so a regression in the z-order path is visible per round.
    # Own try/except keyed under its own name — a z-order failure must not
    # overwrite the (already successful) base-write slot above.
    try:
        from klogs_spark.table import write_logs_zordered

        with tempfile.TemporaryDirectory(prefix="bench-z-") as zdir:
            bestz = float("inf")
            for _ in range(max(trials, 1)):
                t0 = time.perf_counter()
                write_logs_zordered(
                    derive_logs_from_events(spark, sf_dir), zdir + "/z",
                    mode="overwrite",
                )
                bestz = min(bestz, time.perf_counter() - t0)
            timings["table_write_zordered"] = round(bestz, 3)
            print(f"# table_write_zordered: {bestz:.3f}s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["table_write_zordered"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# table_write_zordered: FAILED "
              f"{errors['table_write_zordered']}", file=sys.stderr)

    def table_env_map_count():
        return (
            LogsQuery(logs_table.filter("date BETWEEN '2024-01-05' AND '2024-01-15'"))
            .where_env(namespace="ns-1")
            .where_field_eq("level", "error")
            .count_all()
        )

    def table_newest():
        return LogsQuery(logs_table).where_env(namespace="ns-2").newest(100)

    def table_hourly():
        return (
            logs_table.filter("date = '2024-01-07'")
            .groupBy(F.date_trunc("hour", F.col("timestamp")).alias("b"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def table_context_fetch():
        # the interactive ±N context fetch (VERDICT r12 #5): ±12 h horizon
        # → at most two day directories scanned (partition-pruned), each
        # side a TakeOrderedAndProject top-n, never a day sort
        from klogs_spark.queries.ingest import CTX_ANCHOR_POD, CTX_ANCHOR_TS, CTX_N
        from klogs_spark.query import fetch_context

        return fetch_context(
            spark, table_dir, CTX_ANCHOR_POD, CTX_ANCHOR_TS, n=CTX_N
        )

    for name, builder in (
        ("table_env_map_count", table_env_map_count),
        ("table_newest", table_newest),
        ("table_hourly_histogram", table_hourly),
        ("table_context_fetch", table_context_fetch),
    ):
        best, n = float("inf"), -1
        # same per-query isolation as the HEADLINE loop: a broken table
        # query costs only its own slot, never the whole bench run
        try:
            if logs_table is None:
                raise RuntimeError("table setup failed; slot skipped")
            for _ in range(max(trials, 1)):
                t0 = time.perf_counter()
                n = builder().count()
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)
    shutil.rmtree(table_dir, ignore_errors=True)

    # COW lifecycle costs (VERDICT r9 #9): the copy-on-write delete rewrite
    # and the file-pruned CDC read. Rewrite scope note: the predicate pins
    # the first week only, so the delete rewrites ~7 affected day
    # partitions and leaves the rest of the month untouched — the timed
    # cost is the affected days' survivor write + O(#files) driver
    # manifest algebra, NOT a table rewrite. snapshot_changes reads only
    # the churned files (O(churn)). The table build per trial is untimed
    # setup (a delete mutates its input, so trials need fresh tables).
    try:
        from klogs_spark.manifest import (
            cow_delete_where,
            publish_snapshot,
            snapshot_changes,
        )

        best_del, best_cdc = float("inf"), float("inf")
        n_del = n_cdc = -1
        for _ in range(max(trials, 1)):
            cdir = tempfile.mkdtemp(prefix="bench-cow-")
            write_logs(
                derive_logs_from_events(spark, sf_dir), cdir,
                mode="overwrite",
            )
            v1 = publish_snapshot(spark, cdir)
            t0 = time.perf_counter()
            res = cow_delete_where(
                spark, cdir,
                F.expr("pod_name = 'pod-7' AND date < '2024-01-08'"),
            )
            best_del = min(best_del, time.perf_counter() - t0)
            n_del = res["rows_deleted"]
            t0 = time.perf_counter()
            n_cdc = snapshot_changes(spark, cdir, v1, res["version"]).count()
            best_cdc = min(best_cdc, time.perf_counter() - t0)
            shutil.rmtree(cdir, ignore_errors=True)
        timings["table_cow_delete"] = round(best_del, 3)
        timings["table_snapshot_cdc"] = round(best_cdc, 3)
        print(f"# table_cow_delete: {best_del:.3f}s ({n_del} rows deleted)",
              file=sys.stderr)
        print(f"# table_snapshot_cdc: {best_cdc:.3f}s ({n_cdc} rows)",
              file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["table_cow_delete"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# table_cow_delete: FAILED {errors['table_cow_delete']}",
              file=sys.stderr)

    # COW MERGE + RESTORE costs (VERDICT r10 #8 / r11 #4). Rewrite scope
    # notes: the merge's update batch touches HALF of Jan 3 only, so the
    # timed cost is ONE day's merged-state rewrite (anti-join + survivor
    # write) + O(#files) manifest algebra — untouched days never open;
    # RESTORE republishes an old manifest's exact file list, one small
    # JSON write with NO data pass, and is benched to pin that it never
    # regresses into a data copy. Fresh table per trial (both ops mutate
    # their input); the build is untimed setup.
    try:
        from klogs_spark.manifest import (
            cow_merge_upsert,
            restore_snapshot,
        )

        best_mrg, best_rst = float("inf"), float("inf")
        n_upd = -1
        for _ in range(max(trials, 1)):
            mdir = tempfile.mkdtemp(prefix="bench-cowm-")
            write_logs(
                derive_logs_from_events(spark, sf_dir), mdir,
                mode="overwrite",
            )
            v1 = publish_snapshot(spark, mdir)
            upd = (
                derive_logs_from_events(spark, sf_dir)
                .filter(
                    "timestamp >= '2024-01-03' "
                    "AND timestamp < '2024-01-03 12:00:00'"
                )
                .withColumn("log", F.concat(F.col("log"), F.lit(" [v2]")))
            )
            t0 = time.perf_counter()
            res = cow_merge_upsert(spark, mdir, upd, key_cols=["timestamp"])
            best_mrg = min(best_mrg, time.perf_counter() - t0)
            n_upd = res["rows_updated"]
            t0 = time.perf_counter()
            restore_snapshot(spark, mdir, v1)
            best_rst = min(best_rst, time.perf_counter() - t0)
            shutil.rmtree(mdir, ignore_errors=True)
        timings["table_cow_merge"] = round(best_mrg, 3)
        timings["table_restore"] = round(best_rst, 3)
        print(f"# table_cow_merge: {best_mrg:.3f}s ({n_upd} rows updated)",
              file=sys.stderr)
        print(f"# table_restore: {best_rst:.3f}s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["table_cow_merge"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# table_cow_merge: FAILED {errors['table_cow_merge']}",
              file=sys.stderr)

    # MERGE-ON-READ delete + vector-applied read (r17). The claims being
    # pinned: mor_delete writes NO survivor files (one predicate scan +
    # an O(deleted rows) positions write — expected well under
    # table_cow_delete, whose survivor rewrite dominates), and a read
    # under the vector pays one broadcast anti-join over a plain read.
    # Fresh table per trial (the op mutates metadata); build untimed.
    try:
        from klogs_spark.manifest import mor_delete_where, read_logs_at

        best_mor, best_dvr = float("inf"), float("inf")
        n_mor = -1
        for _ in range(max(trials, 1)):
            ddir = tempfile.mkdtemp(prefix="bench-mor-")
            write_logs(
                derive_logs_from_events(spark, sf_dir), ddir,
                mode="overwrite",
            )
            publish_snapshot(spark, ddir)
            t0 = time.perf_counter()
            # same predicate as the COW merge/delete rows — the contrast
            # is the cost MODEL (positions write vs survivor rewrite)
            res = mor_delete_where(
                spark, ddir,
                F.expr("pod_name = 'pod-7' AND date < '2024-01-08'"),
            )
            best_mor = min(best_mor, time.perf_counter() - t0)
            n_mor = res["rows_deleted"]
            t0 = time.perf_counter()
            read_logs_at(spark, ddir).count()
            best_dvr = min(best_dvr, time.perf_counter() - t0)
            shutil.rmtree(ddir, ignore_errors=True)
        timings["table_mor_delete"] = round(best_mor, 3)
        timings["table_dv_read"] = round(best_dvr, 3)
        print(f"# table_mor_delete: {best_mor:.3f}s ({n_mor} rows, zero "
              "files rewritten)", file=sys.stderr)
        print(f"# table_dv_read: {best_dvr:.3f}s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001
        errors["table_mor_delete"] = f"{type(exc).__name__}: {exc}"[:300]
        print(f"# table_mor_delete: FAILED {errors['table_mor_delete']}",
              file=sys.stderr)

    # Thresholded DV maintenance (r18, VERDICT r17 #3/#7): a tiny GDPR
    # drip must not trigger day rewrites — dv_compact at the default
    # maintain ratio no-ops after its per-file ratio probe (metadata +
    # one footer-count scan of affected files, never a survivor write),
    # and dv_coalesce collapses the 3-generation chain into ONE without
    # touching any data file. Expected well under table_cow_delete.
    try:
        from klogs_spark.manifest import (
            dv_coalesce,
            dv_compact,
            mor_delete_where,
            publish_snapshot,
        )

        best_dvm = float("inf")
        kept = gens = -1
        for _ in range(max(trials, 1)):
            ddir = tempfile.mkdtemp(prefix="bench-dvc-")
            write_logs(
                derive_logs_from_events(spark, sf_dir), ddir,
                mode="overwrite",
            )
            publish_snapshot(spark, ddir)
            for h in (0, 1, 2):  # the drip: 3 tiny vector generations
                mor_delete_where(
                    spark, ddir,
                    F.expr(
                        f"pod_name = 'pod-3' AND hour(timestamp) = {h}"
                        " AND date = '2024-01-03'"
                    ),
                )
            t0 = time.perf_counter()
            resc = dv_compact(spark, ddir, min_deleted_ratio=0.1)
            resl = dv_coalesce(spark, ddir)
            best_dvm = min(best_dvm, time.perf_counter() - t0)
            kept = resc["positions_kept"]
            gens = resl["generations_after"]
            shutil.rmtree(ddir, ignore_errors=True)
        timings["table_dv_threshold_maintain"] = round(best_dvm, 3)
        print(
            f"# table_dv_threshold_maintain: {best_dvm:.3f}s "
            f"({kept} positions kept live, chain -> {gens} gen)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        errors["table_dv_threshold_maintain"] = (
            f"{type(exc).__name__}: {exc}"[:300]
        )
        print(
            "# table_dv_threshold_maintain: FAILED "
            f"{errors['table_dv_threshold_maintain']}",
            file=sys.stderr,
        )

    # ann_ivfpq_rerank_search (VERDICT r12 #5): the deployed two-stage
    # search — prebuilt-index ADC nominates R candidates, an R-row
    # broadcast-semi fetch re-scores them exactly. Expected ≈
    # ann_ivfpq_prebuilt plus a small constant (the R-row join), never a
    # corpus scan; R is reported alongside. Trial 1 may pay the one-off
    # index build (content-keyed cache, same as ann_ivfpq_prebuilt);
    # best-of-N reports the warm search cost a deployment serves.
    try:
        from klogs_spark.ext import ann_index as _ann_index
        from klogs_spark.queries.ext import (
            IVFPQ_K,
            IVFPQ_NPROBE,
            IVFPQ_RERANK_R,
            _ensure_ivfpq_index,
            _query_vec,
        )
        from klogs_spark.views import load_table as _load_table

        _ipath = _ensure_ivfpq_index(spark, sf_dir)
        _iqv = _query_vec(spark, sf_dir)
        _iemb = _load_table(spark, sf_dir, "embeddings")
        best, n = float("inf"), -1
        for _ in range(max(trials, 1)):
            t0 = time.perf_counter()
            n = _ann_index.ivfpq_rerank(
                spark, _ipath, _iemb, _iqv, k=IVFPQ_K,
                rerank=IVFPQ_RERANK_R, n_probe=IVFPQ_NPROBE,
            ).count()
            best = min(best, time.perf_counter() - t0)
        timings["ann_ivfpq_rerank_search"] = round(best, 3)
        print(
            f"# ann_ivfpq_rerank_search: {best:.3f}s "
            f"({n} rows, R={IVFPQ_RERANK_R})",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        errors["ann_ivfpq_rerank_search"] = f"{type(exc).__name__}: {exc}"[:300]
        print(
            f"# ann_ivfpq_rerank_search: FAILED "
            f"{errors['ann_ivfpq_rerank_search']}",
            file=sys.stderr,
        )

    from klogs_spark.ext.caching import release_tracked

    def reset_between_queries() -> None:
        # r18's official capture overstated two rows ~1.8x beyond their
        # fresh-session times (VERDICT r18 #3): release_tracked() alone
        # leaves untracked cached relations, shuffle files, and JVM heap
        # pressure from earlier heavy rows to bleed into the next query's
        # first trials. Clear the catalog cache and hint a GC between
        # queries so each slot starts from comparable JVM state — a
        # best-of-5 over clean state, not over whatever the previous
        # query left behind.
        release_tracked()
        try:
            spark.catalog.clearCache()
            spark._jvm.System.gc()
        except Exception:  # noqa: BLE001
            pass

    reset_between_queries()  # the table sections above wrote ~GBs
    for name in HEADLINE:
        fn = specs[name].fn
        best, n = float("inf"), -1
        # one broken query must cost only its own slot, never the whole
        # bench run (round 6 lost all numbers to a single AnalysisException)
        try:
            for _ in range(max(trials, 1)):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = df.count() if not df.isStreaming else -1
                best = min(best, time.perf_counter() - t0)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"# {name}: FAILED {errors[name]}", file=sys.stderr)
            continue
        finally:
            # operator-internal caches (signatures, centroids, codebooks)
            # are tracked; trials within a query reuse the materialized
            # frames, then the whole state resets before the next slot
            reset_between_queries()
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    # END-of-run probe re-capture: the same four fixed probes, re-timed
    # after the full query sweep. Start-vs-end drift on a probe axis is
    # the harness's OWN measurement of late-run state (heap/page-cache/
    # worker-pool pressure, thermal) — late-capture rows inflated beyond
    # what the end probes show is a real regression, not capture
    # pollution (the r18 artifact inflated two late rows ~1.8x with no
    # instrument to say so).
    end_probes = {
        "box_calibration_end_sec": probe(_cpu_probe_fn),
        "box_shuffle_calibration_end_sec": probe(_shuffle_probe_fn),
        "box_scan_calibration_end_sec": (
            probe(_scan_probe_fn) if os.path.exists(_scan_probe) else None
        ),
        "box_python_calibration_end_sec": (
            probe(_py_probe_fn) if os.path.exists(_scan_probe) else None
        ),
    }
    print(f"# end probes: {end_probes}", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # the set timed in rounds <= 4 — keep a like-for-like subtotal so adding
    # queries to the bench never reads as a regression across rounds
    r4_set = {
        "table_write_logs", "table_env_map_count", "table_newest",
        "table_hourly_histogram", "logs_env_map_count", "logs_number_stats",
        "logs_hourly_histogram", "logs_env_counts", "logs_newest",
        "logs_top_pods", "ingest_decode_pipeline", "tpch_q1_pricing_summary",
        "tpch_q3_shipping_priority", "tpch_q5_local_supplier",
        "tpch_q6_forecast_revenue", "events_sessionize", "dedup_exact",
        "dedup_minhash_lsh", "dedup_simhash_pairs", "ann_cosine_topk",
        "text_quality",
    }
    comparable = round(
        sum(v for k, v in timings.items() if k in r4_set), 3
    )
    # the wider like-for-like set from round 8 on: r4_set + the operators
    # first benched in r8 that remain in the bench (the r8 VERDICT asked
    # that new bench entries join a pinned subtotal going forward)
    r8_set = r4_set | {
        "table_write_zordered", "ann_ivfpq_prebuilt",
        "pipeline_pretrain_prep", "ingest_msgpack_pipeline",
        "dedup_semantic", "sample_pack_global_prefix",
        "embedding_covariance",
    }
    comparable_r8 = round(
        sum(v for k, v in timings.items() if k in r8_set), 3
    )
    doc = {
        "metric": "headline_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf),
        "trials": trials,
        "errors": errors,
        "comparable_r4_subtotal_sec": comparable,
        "comparable_r8_subtotal_sec": comparable_r8,
        "box_calibration_sec": calibration,
        "box_shuffle_calibration_sec": shuffle_calibration,
        "box_scan_calibration_sec": scan_calibration,
        "box_python_calibration_sec": py_calibration,
        **end_probes,
        "calibration_protocol": (
            "four fixed probes, no engine code, best-of-3: cpu (pure JVM "
            "arithmetic), shuffle (repartition), scan (pinned sf0.1 "
            "lineitem filter+agg), python (identity mapInPandas over the "
            "same pinned file). Round-over-round adjudication: a query "
            "drift matching the movement of exactly one probe axis is box "
            "drift on that axis, not a plan regression; all probes flat + "
            "a query up = real regression in that query. r18's +31% "
            "comparable drift moved on the scan axis the old two probes "
            "could not see. Each probe is captured at bench START and "
            "again at bench END (*_end_sec): end-vs-start drift measures "
            "late-run state pressure, so late-capture rows inflated "
            "beyond the end probes indicate a real regression."
        ),
        # timings{} inserts in exact capture order, so the record cannot
        # drift from the code (failed slots are absent — see errors{})
        "capture_order": list(timings),
        "timing": "best-of-N per query (single-shot swings up to "
                  "+/-50% on this box with unchanged code); catalog cache "
                  "cleared + GC hinted between headline slots (r18's "
                  "capture-order artifact); "
                  "'value' includes queries newly added to the "
                  "bench this round — use comparable_r4_subtotal_sec "
                  "for round-over-round comparison",
        "notes": _QUERY_NOTES,
    }
    # The driver tail-captures limited output: r13's BENCH json outgrew it
    # (the notes dict alone is ~2 KB) and the round lost its official
    # per-query record (parsed: null); r19 REPEATED the failure because the
    # "compact" line still carried calibration_protocol (~700 B prose) and
    # capture_order (~1.3 KB) and the round's new queries pushed queries{}
    # past the window (VERDICT r19 #2). So: the full document goes to
    # BENCH_LOCAL.json on disk, per-query notes go to stderr as '# ' lines,
    # and the FINAL stdout line carries ONLY machine-read fields — prose
    # and derivable fields stay on disk — with a hard size guard below.
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_LOCAL.json"), "w") as fh:
        json.dump(doc, fh, indent=2)
    for qname, note in _QUERY_NOTES.items():
        print(f"# note {qname}: {note}", file=sys.stderr)
    line = compact_stdout_line(doc)
    if len(line) > STDOUT_WINDOW:
        print(f"# WARNING: compact bench line {len(line)} B > "
              f"{STDOUT_WINDOW} B even after shedding; driver capture may "
              "truncate", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
