"""Similarity search over embedding columns — brute-force and LSH-bucketed ANN.

Driver-mandated EXT surface (BASELINE.json). Column-expression only; the dot
products run inside whole-stage codegen via higher-order functions.

Scale design: brute-force top-k is the correctness baseline (TakeOrdered — no
full sort, no collect). The scale path is random-hyperplane LSH: bucket ids
are computed per-row with fixed literal hyperplanes (ext.hashing.hyperplanes),
so the candidate set for a query is one bucket equi-lookup instead of a full
scan; multiple probe tables (bit-flip probing) trade recall for fan-out.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import cache_tracked as _cache_tracked
from .dedup import cosine_col
from .hashing import hyperplanes, lit_double_array

# 2^N_PLANES buckets; sized so the test corpora (500-2000 vectors) keep
# meaningful bucket occupancy. At real scale, choose log2(corpus/target_bucket).
N_PLANES = 6
EMB_DIM = 64


def _dot_literal(vec: Column, plane: list[float]) -> Column:
    """Dot product of an array column with a literal hyperplane.

    Array-literal + zip_with + left-fold aggregate: same sequential
    left-to-right double summation as an unrolled term sum (and as DuckDB's
    list_dot_product), but the generated code stays tiny — a fully unrolled
    64-term sum times several planes breaks the JVM's 64KB method limit and
    drops the whole stage to interpreted eval.
    """
    lits = lit_double_array(plane)
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), lits, lambda x, w: x * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def lsh_bucket(vec: Column, planes: list[list[float]] | None = None) -> Column:
    """Sign-LSH bucket id: bit_j = (vec . plane_j) > 0, packed into a long."""
    planes = planes or hyperplanes(N_PLANES, EMB_DIM)
    bits = [
        F.when(_dot_literal(vec, p) > 0, F.lit(1 << j).cast("long")).otherwise(0)
        for j, p in enumerate(planes)
    ]
    return reduce(lambda a, b: a + b, bits)


def lsh_bucket_assignments(emb: DataFrame, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           planes: list[list[float]] | None = None) -> DataFrame:
    """(id, bucket) for every vector — the index-build step of IVF-style ANN."""
    return emb.select(
        F.col(id_col).alias("id"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Plans as Project (codegen dot product) + TakeOrderedAndProject: each
    partition keeps its local top-k, the driver merges k rows — O(k) result
    movement at any scale. Returns (id, cosine) sorted desc.
    """
    q = lit_double_array(query_vec)
    return (
        emb.select(
            F.col(id_col).alias("id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def lsh_topk(emb: DataFrame, query_vec: list[float], k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             planes: list[list[float]] | None = None) -> DataFrame:
    """ANN top-k: restrict the exact search to the query's LSH bucket.

    At scale the bucket column is a partition/bucketing key of the stored
    index table, so this is a single-bucket scan, not a filter over all rows.
    Returns (id, cosine) sorted desc within the bucket.
    """
    planes = planes or hyperplanes(N_PLANES, EMB_DIM)
    q_bucket = sum(
        (1 << j)
        for j, p in enumerate(planes)
        if sum(float(x) * w for x, w in zip(query_vec, p)) > 0
    )
    q = lit_double_array(query_vec)
    return (
        emb.filter(lsh_bucket(F.col(vec_col), planes) == q_bucket)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def lsh_knn_join(emb: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 q_id: str = "vec_id", q_vec: str = "embedding",
                 planes: list[list[float]] | None = None,
                 probes: int = 0) -> DataFrame:
    """Approximate batch k-NN: knn_join restricted to each query's sign-LSH
    bucket — a bucket equi-join instead of the crossJoin, so per query the
    candidate set is one bucket, not the corpus.

    ``probes`` > 0 enables multi-probe: each query additionally scans the
    buckets one bit-flip away in the first ``probes`` hyperplane bits (the
    standard recall lever — near neighbors most often land across ONE
    hyperplane). The query side is tiny, so probing explodes queries, never
    the corpus; candidates stay a bucket equi-join.

    At scale the corpus side is stored bucketed on the bucket id, making
    this a co-located join; the query side stays broadcast. Recall trades
    against bucket occupancy (see q_ann_recall_eval for the measured gap).
    Returns (query_id, neighbor_id, cosine, rnk) like knn_join.
    """
    from pyspark.sql.window import Window

    planes = planes or hyperplanes(N_PLANES, EMB_DIM)
    qb = lsh_bucket(F.col(q_vec), planes)
    probe_buckets = F.array(
        qb, *[qb.bitwiseXOR(F.lit(1 << j)) for j in range(probes)]
    )
    q = F.broadcast(
        queries.select(
            F.col(q_id).alias("query_id"),
            F.col(q_vec).alias("qv"),
            F.explode(probe_buckets).alias("bucket"),
        )
    )
    scored = (
        emb.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("cv"),
            lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        )
        .join(q, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("cv"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


def ivf_assign(
    emb: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest centroid.

    ``centroids`` is (centroid_id, centroid) — tiny, so it broadcasts; the
    corpus never shuffles for assignment. argmin is a single min_by per
    vector (no window). At scale the result is written bucketed by
    ``centroid_id`` — the inverted-file index.
    """
    c = F.broadcast(
        centroids.select(
            F.col("centroid_id"), F.col("centroid").alias("cv")
        )
    )
    scored = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .crossJoin(c)
        .select(
            "id", "v", "centroid_id",
            cosine_col(F.col("v"), F.col("cv")).alias("sim"),
        )
    )
    return scored.groupBy("id").agg(
        F.max_by("centroid_id", F.struct(F.col("sim"), -F.col("centroid_id")))
        .alias("centroid_id"),
        F.first("v").alias("v"),
    )


def deterministic_centroids(
    emb: DataFrame, k: int, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Centroid seed set: the k lowest-id vectors. A stand-in for a k-means
    fit (deterministic so the oracle can reproduce it); the IVF mechanics —
    assignment, bucketing, probing — are identical either way."""
    return (
        emb.filter(F.col(id_col) < k)
        .select(
            F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid")
        )
    )


def kmeans_refine(
    emb: DataFrame,
    centroids: DataFrame,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int | None = None,
) -> DataFrame:
    """Lloyd iterations over the coarse quantizer, pure DataFrame ops.

    Each round: broadcast-assign every vector to its nearest centroid
    (cosine), then recompute each centroid as the element-wise mean of its
    members — posexplode to (cluster, position, value), one keyed aggregate,
    reassemble with an ordered collect. No driver-side math beyond plan
    construction; each iteration is two shuffles (assign output is
    broadcast-joined, mean is keyed on (cluster, pos)).

    ``round_decimals`` rounds each centroid component after every iteration:
    float summation order differs across engines (and shuffles), so chained
    iterations only stay cross-engine reproducible when the intermediates are
    pinned to a fixed precision both sides compute identically.
    Returns (centroid_id, centroid) like the input.
    """
    current = centroids
    for _ in range(iterations):
        assigned = ivf_assign(emb, current, id_col, vec_col)
        mean_expr = F.avg("val")
        if round_decimals is not None:
            mean_expr = F.round(mean_expr, round_decimals)
        means = (
            assigned.select(
                "centroid_id",
                F.posexplode(F.col("v").cast("array<double>")).alias("pos", "val"),
            )
            .groupBy("centroid_id", "pos")
            .agg(mean_expr.alias("m"))
        )
        refined = (
            means.groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            # k rows — cache each iteration's centroids so the next
            # iteration's broadcast build (and every downstream consumer)
            # materializes this chain ONCE instead of re-executing all
            # prior iterations' lineage per use (O(iter^2) otherwise).
            # cache() rather than a driver-side collect: plan equality is
            # preserved, so repeated calls (bench trials, retries) reuse
            # the materialized chain instead of recomputing it. Tracked
            # (ext.caching) so hosts can bound total cache growth. LAZY on
            # purpose: an earlier eager count()+unpersist-previous variant
            # dropped each prior iteration's cache, so every repeat call
            # re-ran iteration 1 from scratch (measured ~1s/call at sf0.1)
            # to save k cached rows — all iterations stay cached until the
            # host's release_tracked(), and the consumer's single job
            # materializes the whole chain in one pass. _cache_tracked
            # recognizes an already-cached plan (repeat calls) and only
            # re-registers it — no already-cached warning per call.
        )
        current = _cache_tracked(refined)
    return current


def ivf_topk(
    emb: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 5,
    n_probe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF cell-probe search: rank centroids against the query, scan only the
    ``n_probe`` nearest cells, exact top-k inside them.

    At scale the assignment table is stored bucketed by centroid_id, so the
    probe is n_probe bucket reads — corpus-size-independent like LSH, but
    with data-adaptive cells. Returns (id, cosine) desc.
    """
    assigned = ivf_assign(emb, centroids, id_col, vec_col)
    q = lit_double_array(query_vec)
    probe_cells = [
        r.centroid_id
        for r in (
            centroids.select(
                "centroid_id",
                cosine_col(F.col("centroid"), q).alias("sim"),
            )
            .orderBy(F.col("sim").desc(), F.col("centroid_id"))
            .limit(n_probe)
            .collect()
        )
    ]
    return (
        assigned.filter(F.col("centroid_id").isin(probe_cells))
        .select(
            "id", F.round(cosine_col(F.col("v"), q), 6).alias("cosine")
        )
        .orderBy(F.col("cosine").desc(), F.col("id"))
        .limit(k)
    )


def knn_join(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             q_id: str = "vec_id", q_vec: str = "embedding") -> DataFrame:
    """Batch k-NN: every query row gets its k nearest corpus rows.

    Broadcast the (small) query side; rank per query with a window — the
    corpus never shuffles. Returns (query_id, neighbor_id, cosine, rnk).
    """
    from pyspark.sql.window import Window

    q = F.broadcast(
        queries.select(F.col(q_id).alias("query_id"), F.col(q_vec).alias("qv"))
    )
    scored = (
        emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
        .crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("cv"), F.col("qv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= k
    )


# --- product quantization (IVF-PQ-style ADC search) -------------------------
# PQ is the standard way to hold a billion-vector index in memory: each
# vector is compressed to M one-byte codes (nearest centroid per subspace),
# and queries score candidates with an Asymmetric Distance Computation —
# a per-subspace lookup table built once per query (Jegou et al., "Product
# Quantization for Nearest Neighbor Search", TPAMI 2011).
PQ_SUBSPACES = 4     # M: subvectors per embedding
PQ_CODEBOOK_K = 16   # centroids per subspace (one nibble per code here)
PQ_ROUND = 6         # centroid-component precision pinned for parity


def l2_col(a: Column, b: Column) -> Column:
    """Squared L2 distance via three dot products (dot(a,a) - 2*dot(a,b) +
    dot(b,b)), each a left-to-right fold — the exact shape DuckDB's
    list_dot_product computes, so distances are bit-identical cross-engine."""

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    return dot(a, a) - 2 * dot(a, b) + dot(b, b)


def pq_subvectors(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """(id, m, sv): each vector split into m contiguous subvectors (cast to
    double first so slices match the oracle's DOUBLE[] slicing exactly)."""
    per = dim // m
    v = F.col(vec_col).cast("array<double>")
    structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("m"),
                F.slice(v, j * per + 1, per).alias("sv"),
            )
            for j in range(m)
        ]
    )
    return emb.select(
        F.col(id_col).alias("id"), F.explode(structs).alias("s")
    ).select("id", "s.m", "s.sv")


def _pq_assign(sv: DataFrame, codebooks: DataFrame) -> DataFrame:
    """argmin-L2 codebook assignment per (id, m): broadcast the (tiny)
    codebook table, equi-join on the subspace, one min_by — the corpus
    never shuffles. Ties break to the lowest centroid id."""
    c = F.broadcast(codebooks)
    scored = sv.join(c, "m").select(
        "id", "m", "sv",
        F.col("centroid_id"),
        l2_col(F.col("sv"), F.col("cv")).alias("d"),
    )
    return scored.groupBy("id", "m").agg(
        F.min_by(
            "centroid_id", F.struct(F.col("d"), F.col("centroid_id"))
        ).alias("code"),
        F.first("sv").alias("sv"),
    )


def pq_codebooks(
    emb: DataFrame,
    k: int = PQ_CODEBOOK_K,
    iterations: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
    round_decimals: int = PQ_ROUND,
) -> DataFrame:
    """Per-subspace k-means codebooks, seeded from the k lowest-id vectors'
    subvectors (the same deterministic-seed convention as the IVF coarse
    quantizer) and refined with Lloyd rounds under squared-L2.

    All m subspaces train in ONE pass: the subspace index is just another
    grouping key, so each round is one broadcast-assign plus one keyed mean
    — no per-subspace jobs. Components are rounded every round so chained
    means stay cross-engine reproducible. Returns (m, centroid_id, cv).
    """
    sv = pq_subvectors(emb, id_col, vec_col, m, dim)
    current = sv.filter(F.col("id") < k).select(
        "m", F.col("id").alias("centroid_id"), F.col("sv").alias("cv")
    )
    for _ in range(iterations):
        assigned = _pq_assign(sv, current)
        means = (
            assigned.select(
                "m",
                F.col("code").alias("centroid_id"),
                F.posexplode("sv").alias("pos", "val"),
            )
            .groupBy("m", "centroid_id", "pos")
            .agg(F.round(F.avg("val"), round_decimals).alias("c"))
        )
        refined = means.groupBy("m", "centroid_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
            # m*k rows — cached for the same O(iter^2)-avoidance and
            # cross-call plan-reuse reasons as kmeans_refine; tracked, LAZY
            # (see kmeans_refine: eager materialize+drop-previous forced a
            # full re-run of earlier rounds on every repeat call)
        )
        current = _cache_tracked(refined)
    return current


def pq_encode(
    emb: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Compress every vector to its per-subspace nearest-centroid codes.
    Returns (id, m, code) — m rows per vector; at rest this is the M-byte
    PQ code the 100 TB index stores instead of the raw floats."""
    sv = pq_subvectors(emb, id_col, vec_col, m, dim)
    return _pq_assign(sv, codebooks).select("id", "m", "code")


SQ8_LEVELS = 256  # one byte per component


def sq8_stats(
    emb: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension (lo, hi) training stats for scalar quantization — the
    posexplode keyed aggregate (d rows out, map-side combined), never a
    d-expression-wide agg."""
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    )


def sq8_encode(
    emb: DataFrame,
    stats: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SQ8 scalar quantization (FAISS's ScalarQuantizer): each component
    maps to one uint8 level inside its dimension's [lo, hi] —
    ``floor((x - lo) * 255 / (hi - lo))``, constant dimensions to 0. One
    byte per component = a 4x compression below raw float32 with NO
    training beyond the d-row min/max pass (where PQ needs k-means), the
    standard first rung of the compression ladder. Returns (id, i, code)
    — the stats table broadcasts, the corpus never shuffles to encode."""
    v = F.col(vec_col).cast("array<double>")
    comps = emb.select(
        F.col(id_col).alias("id"), F.posexplode(v).alias("i", "x")
    )
    code = F.when(F.col("hi") > F.col("lo"), F.least(
        F.lit(SQ8_LEVELS - 1),
        F.floor(
            (F.col("x") - F.col("lo")) * (SQ8_LEVELS - 1)
            / (F.col("hi") - F.col("lo"))
        ),
    )).otherwise(F.lit(0))
    return (
        comps.join(F.broadcast(stats), "i")
        .select("id", "i", code.cast("int").alias("code"))
    )


def sq8_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ADC top-k over SQ8 codes: the (d x 256)-row query-to-level distance
    table broadcasts (each level scores as its reconstruction midpoint
    ``lo + (code + 0.5) * (hi - lo) / 256``), codes join it, integer
    micro-unit sums per vector — the same aggregation-order-proof
    discipline as pq_adc_topk. Returns (id, adist_micros) ascending,
    ties by id."""
    spark = emb.sparkSession
    stats = _cache_tracked(sq8_stats(emb, vec_col))
    q = lit_double_array(query_vec)
    levels = spark.range(SQ8_LEVELS).select(F.col("id").cast("int").alias("code"))
    recon = F.col("lo") + (F.col("code") + 0.5) * (
        F.col("hi") - F.col("lo")
    ) / SQ8_LEVELS
    qi = F.element_at(q, F.col("i") + 1)
    dist_table = F.broadcast(
        stats.crossJoin(F.broadcast(levels)).select(
            "i",
            "code",
            F.floor((qi - recon) * (qi - recon) * 1000000)
            .cast("long")
            .alias("dmic"),
        )
    )
    codes = sq8_encode(emb, stats, id_col, vec_col)
    return (
        codes.join(dist_table, ["i", "code"])
        .groupBy("id")
        .agg(F.sum("dmic").alias("adist_micros"))
        .orderBy("adist_micros", "id")
        .limit(k)
    )


def pq_adc_topk(
    emb: DataFrame,
    codebooks: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_SUBSPACES,
    dim: int = EMB_DIM,
) -> DataFrame:
    """Asymmetric Distance Computation top-k: build the per-subspace
    query-to-centroid distance table (m x k rows — tiny, broadcast), join it
    to the stored codes, and sum per vector.

    Distances enter the sum as integer micro-units (floor(d * 1e6)): the
    per-entry doubles are bit-identical cross-engine, and integer summation
    makes the aggregation order irrelevant — no float-sum drift between
    Spark's partial aggregates and the oracle. Returns (id, adist_micros),
    ascending, ties broken by id.
    """
    # the codebook table feeds both the encoder and the distance table —
    # cache it so the k-means build lineage runs once, not per consumer
    # (skip when the caller already cached it: re-caching a cached plan
    # only logs warnings — the r7 bench's "already cached" noise)
    if not codebooks.is_cached:
        codebooks = _cache_tracked(codebooks)
    enc = pq_encode(emb, codebooks, id_col, vec_col, m, dim)
    qsv = pq_subvectors(query, id_col, vec_col, m, dim).select(
        "m", F.col("sv").alias("qsv")
    )
    dist_table = F.broadcast(
        codebooks.join(F.broadcast(qsv), "m").select(
            "m",
            F.col("centroid_id").alias("code"),
            F.floor(l2_col(F.col("cv"), F.col("qsv")) * 1000000)
            .cast("long")
            .alias("dmic"),
        )
    )
    return (
        enc.join(dist_table, ["m", "code"])
        .groupBy("id")
        .agg(F.sum("dmic").alias("adist_micros"))
        .orderBy("adist_micros", "id")
        .limit(k)
    )
