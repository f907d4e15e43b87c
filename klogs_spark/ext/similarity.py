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

from .dedup import cosine_col
from .hashing import hyperplanes

# 2^N_PLANES buckets; sized so the test corpora (500-2000 vectors) keep
# meaningful bucket occupancy. At real scale, choose log2(corpus/target_bucket).
N_PLANES = 6
EMB_DIM = 64


def _dot_literal(vec: Column, plane: list[float]) -> Column:
    """Dot product of an array column with a literal hyperplane — unrolled to
    a flat sum of products so it stays a single codegen expression."""
    terms = [
        F.element_at(vec, i + 1).cast("double") * F.lit(w)
        for i, w in enumerate(plane)
        if w != 0.0
    ]
    return reduce(lambda a, b: a + b, terms)


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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
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
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        emb.filter(lsh_bucket(F.col(vec_col), planes) == q_bucket)
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_col(F.col(vec_col), q), 6).alias("cosine"),
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
