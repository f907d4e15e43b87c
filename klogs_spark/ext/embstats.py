"""Distributed second-order embedding statistics: covariance and PCA.

The classic big-data linear-algebra split: anything O(corpus) is a Spark
aggregate, anything O(dim^2) rides the driver. The covariance of a
(n x d) embedding table needs n, sum(v_i), and sum(v_i * v_j) — the pair
sums come from a double posexplode into (i, j, x*y) rows feeding ONE
keyed aggregation with map-side combine: d^2 = 4096 groups total, no
join, no 4096-expression aggregate (which would blow past codegen
limits). The d x d eigendecomposition is driver-side numpy (bounded,
same shape as collecting n_probe centroids), and the projection back
onto the corpus is a broadcast-literal expression — a narrow map.

This is the whitening / PCA-reduction step embedding pipelines run ahead
of indexing (dimensionality reduction before IVF-PQ, SVD-whitening of
sentence embeddings); at 100 TB the only corpus-sized cost is one pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import similarity as sim


def embedding_mean(
    emb: DataFrame,
    vec_col: str = "embedding",
) -> DataFrame:
    """Component means as (i, mean, n) rows via the posexplode aggregate —
    d keyed groups, map-side combined. NOT a d-expression-wide agg: at
    d=4096 that is thousands of codegen expressions per task (the exact
    blowup covariance_entries avoids); the keyed form is one narrow
    explode at any dimensionality."""
    v = F.col(vec_col).cast("array<double>")
    return (
        emb.select(F.posexplode(v).alias("i", "x"))
        .groupBy("i")
        .agg(F.avg("x").alias("mean"), F.count(F.lit(1)).alias("n"))
    )


def covariance_entries(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = sim.EMB_DIM,
    round_decimals: int = 8,
) -> DataFrame:
    """Covariance matrix as (i, j, cov) rows: cov_ij =
    E[v_i v_j] - E[v_i] E[v_j].

    Corpus-sized work: a narrow double posexplode (d^2 product rows per
    vector) into a (i, j)-keyed sum — partial aggregation collapses each
    task's contribution to <= d^2 rows before the single shuffle. The
    mean row broadcasts into the finishing expression. Rounded for
    cross-engine hashing."""
    v = F.col(vec_col).cast("array<double>")
    prods = (
        emb.select(v.alias("_v"))
        .select(F.posexplode("_v").alias("i", "x"), F.col("_v"))
        .select("i", "x", F.posexplode("_v").alias("j", "y"))
        .groupBy("i", "j")
        .agg(F.sum(F.col("x") * F.col("y")).alias("sxy"))
    )
    means = embedding_mean(emb, vec_col)
    mi = means.select(F.col("i"), F.col("mean").alias("mean_i"), "n")
    mj = means.select(F.col("i").alias("j"), F.col("mean").alias("mean_j"))
    return (
        prods.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            F.round(
                F.col("sxy") / F.col("n")
                - F.col("mean_i") * F.col("mean_j"),
                round_decimals,
            ).alias("cov"),
        )
    )


def pca_project(
    emb: DataFrame,
    k: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = sim.EMB_DIM,
) -> tuple[DataFrame, list[float]]:
    """Project the corpus onto its top-k principal components.

    Covariance via the distributed pair-sum aggregate (d^2 rows collected
    — ~4 KB, corpus-size-independent); eigendecomposition of the d x d
    matrix on the driver (numpy.linalg.eigh — symmetric, exact);
    components ship back as broadcast literals and the projection is a
    pure narrow expression per row. Sign convention: each eigenvector is
    flipped so its largest-magnitude component is positive (eigh's sign
    is arbitrary; this makes results deterministic). Returns
    (DataFrame[id, pc0..pc{k-1}], top-k eigenvalues descending).
    """
    import numpy as np

    cov = np.zeros((dim, dim))
    for r in covariance_entries(emb, vec_col, dim, round_decimals=12).collect():
        cov[r.i][r.j] = r.cov
    v = F.col(vec_col).cast("array<double>")
    mean = np.zeros(dim)
    for r in embedding_mean(emb, vec_col).collect():
        mean[r.i] = r.mean
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = []
    for c in order:
        vec = vecs[:, c]
        if vec[np.argmax(np.abs(vec))] < 0:
            vec = -vec
        comps.append(vec)
    mean_lit = F.array(*[F.lit(float(m)) for m in mean])
    cent = F.zip_with(v, mean_lit, lambda a, b: a - b)
    proj_cols = [
        F.aggregate(
            F.zip_with(
                cent,
                F.array(*[F.lit(float(x)) for x in comp]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias(f"pc{idx}")
        for idx, comp in enumerate(comps)
    ]
    out = emb.select(F.col(id_col).alias("id"), *proj_cols)
    return out, [float(vals[c]) for c in order]


def mmr_select(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 5,
    lam: float = 0.75,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_decimals: int = 6,
) -> DataFrame:
    """Maximal Marginal Relevance selection (Carbonell & Goldstein 1998):
    pick ``k`` corpus vectors greedily, each step's score =
    ``lam * rel(query, d) - (1 - lam) * max_sim(d, selected)`` — relevance
    traded against redundancy, the standard diversity-aware pick for
    retrieval results and curated training subsets.

    Selection is inherently sequential, so the driver runs k rounds; each
    round is ONE narrow corpus pass (the selected vectors ride along as
    broadcast literals — at most k of them) plus a 1-row argmax collect.
    Total cost: k scans, no pairwise matrix, nothing driver-side beyond
    k rows. Cosines round at ``round_decimals`` before combining and ties
    break on id, so the pick sequence is engine-exact. ``lam`` must be
    exactly representable in binary (0.75 default) so both engines weight
    identically. Returns (rank, id, mmr_score).
    """
    from .dedup import cosine_col

    q = F.array(*[F.lit(float(x)) for x in query_vec])
    v = F.col(vec_col).cast("array<double>")
    rel = F.round(cosine_col(v, q), round_decimals)
    base = emb.select(F.col(id_col).alias("id"), v.alias("v"), rel.alias("rel"))
    mu = 1.0 - lam
    chosen: list[tuple] = []
    for _ in range(k):
        cand = (
            base.filter(~F.col("id").isin([c[0] for c in chosen]))
            if chosen
            else base
        )
        if chosen:
            sims = [
                F.round(
                    cosine_col(
                        F.col("v"), F.array(*[F.lit(float(x)) for x in vec])
                    ),
                    round_decimals,
                )
                for _, vec, _ in chosen
            ]
            maxsim = sims[0] if len(sims) == 1 else F.greatest(*sims)
        else:
            maxsim = F.lit(0.0)
        score = F.round(lam * F.col("rel") - mu * maxsim, round_decimals)
        top = (
            cand.select("id", "v", score.alias("s"))
            .orderBy(F.col("s").desc(), "id")
            .first()
        )
        chosen.append((top.id, list(top.v), float(top.s)))
    return emb.sparkSession.createDataFrame(
        [(i + 1, c[0], c[2]) for i, c in enumerate(chosen)],
        "sel_rank int, id bigint, mmr_score double",
    )
