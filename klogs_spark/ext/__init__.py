"""Beyond-reference operators for large-scale training-data pipelines.

The reference (kobsio/klogs) has no dedup/similarity/text-analysis surface;
these are the driver-mandated EXT operators (BASELINE.json north star):

- ``hashing``    — deterministic cross-engine hashes (md5-prefix integers) so
                   every sketch below is reproducible in the DuckDB oracle.
- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                   cosine near-dup.
- ``similarity`` — brute-force cosine top-k + random-hyperplane LSH-bucketed ANN.
- ``text``       — language-ID, quality scoring, token counting, fingerprints.
- ``multimodal`` — opaque binary columns with typed metadata; decode stubs.

All hot paths are Column expressions (JVM-side, codegen); the only pandas UDFs
are in multimodal decode where per-item Python is the point.
"""
