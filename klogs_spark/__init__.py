"""klogs_spark — a PySpark-native log-analytics engine.

Re-implements the full query and data-processing surface of kobsio/klogs
(a Fluent Bit → ClickHouse log shipper, reference at /root/reference) as an
idiomatic Spark engine:

- ``decode``      — flatten + type dispatch + timestamp extraction (the plugin hot
                    path, reference main.go:237-377), vectorized over Arrow batches.
- ``transform``   — envelope routing / key normalization as Column expressions.
- ``table``       — the logs table: date-partitioned, cluster-key-sorted Parquet
                    (reference schema.sql:16-21) + TTL retention job.
- ``query``       — the read surface (filters F1-F6, aggregations A1-A7,
                    sorts O1-O3 of SURVEY.md §2).
- ``stream``      — Structured Streaming ingest (foreachBatch pipeline, trigger /
                    checkpoint mapping of reference main.go:357-377).
- ``sink_clickhouse`` — batched-INSERT-shaped sink (reference pkg/clickhouse).
- ``manifest``    — snapshot manifests: versioned consistent reads + time travel
                    (``read_logs_at``).
- ``expectations`` — declarative data-quality gate (Deequ pattern): one-pass
                    check reports, row-level quarantine routing for streams.
- ``ext``         — beyond-reference LLM-data-pipeline operators: dedup (exact,
                    canonical, MinHash-LSH, SimHash, n-gram Jaccard, prefix-
                    filtered exact joins, embedding cosine, SemDeDup),
                    similarity search (brute-force, LSH, IVF, SQ8, PQ, IVF-PQ
                    with a persisted, stream-refreshable index), sampling
                    (DSIR, DoReMi step, packing, deterministic shuffles,
                    distributed global rank/NTILE), text analysis (lang-id,
                    quality, tokens, fingerprints, sketches), multimodal
                    column plumbing with real WAV PCM decode.

Everything is DataFrame/Catalyst-first; Python executes only in the decode stage
and in explicitly-vectorized pandas UDFs.
"""

__version__ = "0.1.0"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
