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
from .hashing import lit_double_array


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
    mean_lit = lit_double_array(mean)
    cent = F.zip_with(v, mean_lit, lambda a, b: a - b)
    proj_cols = [
        F.aggregate(
            F.zip_with(
                cent,
                lit_double_array(comp),
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

    q = lit_double_array(query_vec)
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
                        F.col("v"), lit_double_array(vec)
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


def _round_half_away(x: float) -> float:
    """Round-half-away-from-zero — Python's round() is banker's, but the
    DuckDB oracle's round() is away-from-zero; iteration states must
    round identically or they drift apart."""
    import math

    return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)


def _top_component_ints(
    emb: DataFrame, squarings: int, vec_col: str, dim: int
) -> tuple[list[list[int]], list[int]]:
    """The integer-exact power-iteration core shared by
    :func:`power_iteration_component` and :func:`pca_project_top`:
    returns (Cint, v) — the exact integer covariance (cov * 1e8) and the
    unit top-component vector in exact 1e6 micro-units. Behavior and
    arithmetic are byte-for-byte the r12 power_iteration_component chain
    (see its docstring for the exactness design); extracted so the
    projection operator reuses the identical vector."""
    import math

    rng = range(dim)
    Cint = [[0] * dim for _ in rng]
    for r in covariance_entries(emb, vec_col, dim, round_decimals=8).collect():
        Cint[r.i][r.j] = int(_round_half_away(r.cov * 1e8))
    M = Cint
    for _ in range(squarings):
        P = [
            [sum(M[i][k] * M[k][j] for k in rng) for j in rng] for i in rng
        ]  # exact ints: |entry| <= 64 * (1e7)^2 < 2^53
        s = max(abs(e) for row in P for e in row) or 1
        # one deterministic double division by the EXACT integer max —
        # identical IEEE ops in the SQL mirror, no order sensitivity
        M = [
            [int(_round_half_away(1e6 * (float(e) / float(s)))) for e in row]
            for row in P
        ]
    w = [sum(M[i][j] for j in rng) for i in rng]  # M @ ones, exact
    nw = math.sqrt(sum(float(x) * float(x) for x in w))
    v = [int(_round_half_away(1e6 * float(x) / nw)) for x in w]
    return Cint, v


def pca_project_top(
    emb: DataFrame,
    squarings: int = 7,
    vec_col: str = "embedding",
    dim: int = sim.EMB_DIM,
    id_col: str = "vec_id",
) -> DataFrame:
    """Corpus projection onto the integer-exact top principal direction —
    the oracle-able form of :func:`pca_project`'s first output column
    (numpy's eigh has no SQL equivalent; the power-iteration vector
    does). One corpus pass: per vector, ``proj = dot(v, w)`` against the
    exact 1e6-micro-unit component ``w`` as a broadcast literal — a
    narrow JVM-side fold, no Python crossing, no shuffle beyond the
    covariance aggregate that derived ``w``. The dot is a left fold in
    ascending index order, matching DuckDB's ``list_dot_product``; the
    result is snapped within 2e-6 of half-integers (float-noise guard)
    and rounded half-away to integer micro-units, so the hash is
    boundary-stable. Returns (id, proj_micros) — the column an outlier
    trim or drift monitor consumes."""
    _, v = _top_component_ints(emb, squarings, vec_col, dim)
    vlit = lit_double_array(v)
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), vlit, lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # mirror of queries/ext._sql_rha: snap-near-half, then half-away round
    y = dot * 2
    snapped = F.when(F.abs(y - F.round(y, 0)) < 2e-6, F.round(y, 0) / 2).otherwise(dot)
    proj = (
        F.when(snapped >= 0, F.floor(snapped + 0.5))
        .otherwise(-F.floor(-snapped + 0.5))
        .cast("long")
    )
    return emb.select(
        F.col(id_col).cast("long").alias("id"), proj.alias("proj_micros")
    )


def power_iteration_component(
    emb: DataFrame,
    squarings: int = 7,
    vec_col: str = "embedding",
    dim: int = sim.EMB_DIM,
    label_col: str = "label",
) -> DataFrame:
    """Top principal direction of the embedding corpus by INTEGER-exact
    power iteration WITH MATRIX SQUARING — the oracle-checkable sibling
    of :func:`pca_project` (whose numpy.linalg.eigh has no SQL
    equivalent, so it is pinned by pytest only; this one hash-matches a
    DuckDB oracle that runs the SAME algorithm).

    Squaring, not plain iteration, because real embedding spectra are
    nearly flat (this corpus: λ2/λ1 ≈ 0.93, so 4 plain mat-vecs leave
    cos ≈ 0.2 to the true direction): ``squarings`` rounds of C <- C·C
    give effective power 2^squarings (= 128 by default, 0.93^128 ≈
    1e-4 — converged), in ``squarings`` exact steps instead of hundreds.

    Exactness design: the only corpus-sized pass is the covariance
    aggregate (already cross-engine-exact via its 8-decimal round); its
    d^2 entries scale to EXACT integers (cov * 1e8). Each squaring is a
    pure-integer matrix product (order-free, < 2^53, identical in any
    engine) rescaled back to +/-1e6 integer entries through ONE
    deterministic division by the exact integer max — no aggregation-
    order float anywhere in the chain. Floats appear only in the final
    vector normalization and the Rayleigh quotient, where ulp noise is
    crushed by rescale-to-integer / fixed-decimal rounding (half-away
    on both sides). d^2 is corpus-size-independent, so the iteration is
    driver-side metadata work, like probe_cells' centroid ranking.

    Returns rows (kind, id, val):
      * ('component', j, v_j)    — the unit eigenvector * 1e6, exact ints
      * ('eigenvalue', -1, λ)    — Rayleigh-quotient estimate, 9 dp
      * ('label_mean', label, m) — per-label mean projection, 6 dp (the
        drift-direction summary a corpus monitor actually watches)."""
    spark = emb.sparkSession
    rng = range(dim)
    Cint, v = _top_component_ints(emb, squarings, vec_col, dim)
    # Rayleigh quotient on the ORIGINAL covariance: u = C v exact, then
    # two short double sums whose ulps the 9-dp round absorbs
    u = [sum(Cint[i][j] * v[j] for j in rng) for i in rng]
    num = sum((v[i] / 1e6) * (float(u[i]) / 1e14) for i in rng)
    den = sum((v[i] / 1e6) * (v[i] / 1e6) for i in rng)
    lam = _round_half_away(num / den * 1e9) / 1e9

    vlit = lit_double_array(v)
    dot = F.aggregate(
        F.zip_with(
            F.col(vec_col).cast("array<double>"), vlit, lambda a, b: a * b
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    label_means = emb.groupBy(
        F.lit("label_mean").alias("kind"),
        F.col(label_col).cast("int").alias("id"),
    ).agg(F.round(F.avg(dot / 1e6), 6).alias("val"))
    head = spark.createDataFrame(
        [("component", j, float(v[j])) for j in range(dim)]
        + [("eigenvalue", -1, float(lam))],
        "kind string, id int, val double",
    )
    return head.unionByName(label_means)
