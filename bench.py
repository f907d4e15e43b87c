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
    # ingest hot path (real decode over nested JSON)
    "ingest_decode_pipeline",
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
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    from klogs_spark.session import get_spark
    from klogs_spark.queries import registry

    spark = get_spark("klogs-spark-bench")
    specs = registry()

    # JVM/codegen warm-up outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    trials = int(os.environ.get("BENCH_TRIALS", "2"))
    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = specs[name].fn
        best, n = float("inf"), -1
        for _ in range(max(trials, 1)):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            n = df.count() if not df.isStreaming else -1
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )


if __name__ == "__main__":
    main()
