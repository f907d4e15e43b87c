"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

No reference equivalent (kobsio/klogs ships none); mandated by the driver
north star (BASELINE.json). Design stance for 100 TB:

- Everything is Column-expression based (JVM, whole-stage codegen) — zero
  Python in these paths.
- Candidate generation is always a *bucketed equi-join* (LSH bands, simhash
  prefixes), never a cross join; the exact verifications run only on
  candidates. Brute-force pairwise variants exist for oracle checks and small
  inputs only.
- All hashes are md5-prefix integers (ext.hashing) so results reproduce
  bit-for-bit in any engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import cache_tracked as _cache_tracked
from .caching import key_parallel

from .hashing import HASH_PRIME, MD5_CHARS, md5_long, perm_params

NUM_PERM = 16          # minhash signature length
LSH_BANDS = 4          # bands x rows_per_band == NUM_PERM
LSH_ROWS = 4
SIMHASH_BITS = 60      # md5-prefix of 15 hex chars -> 60-bit token hashes


def tokens_col(text: Column) -> Column:
    """Whitespace tokens with empties removed (both engines keep trailing
    empties on split — filter them so token counts agree)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty array for docs shorter than n
    tokens (sequence() would go negative-descending otherwise)."""
    toks = tokens_col(text)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- exact dedup ------------------------------------------------------------
def exact_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Hash-groupBy exact dedup: one survivor (min id) per distinct text.

    Scale: a single shuffle on md5(text); with map-side partial aggregation
    the shuffled data is one row per distinct text per task.
    Returns (survivor_id, n_copies).
    """
    return (
        df.groupBy(F.md5(F.col(text)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("survivor_id", "n_copies")
    )


def exact_dedup_rows(df: DataFrame, text: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Survivor ROWS of exact dedup — the one-shuffle form of
    ``df ⋈ exact_dedup(df)`` (min ``id_col`` per distinct ``text``).

    The join-back form shuffles the corpus twice (hash groupBy, then the
    id-keyed reattach join) and computes ``df`` once per join side; a
    min-id window over the text hash does it in ONE exchange with the
    input computed once. Row set identical by construction (same md5
    grouping key, same min-id survivor rule); column order preserved."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(F.md5(F.col(text))).orderBy(F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )


# --- n-gram Jaccard ---------------------------------------------------------
def doc_shingles(df: DataFrame, text: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """Exploded (id, shingle) pairs — the shared substrate for exact Jaccard.

    ``repartition(id)`` first: corpus files are often few/large, and the
    downstream explode+md5 work is CPU-bound — spreading by id keys the
    parallelism to the cluster width instead of the input file count.

    Short docs are dropped by filtering on the CHEAP token count, never on
    ``size(sh)``: a predicate on the built shingle array gets
    predicate-pushed below the repartition exchange, which evaluates the
    whole O(shingles) expression inside the single-file scan task and then
    AGAIN above the exchange — measured 2x serialized shingle builds per
    query at sf0.1. (explode alone would drop empty arrays anyway; the
    token filter just avoids shuffling doomed rows.)
    """
    return key_parallel(
        df.select(F.col(id_col).alias("id"), F.col(text).alias("t"))
        .filter(F.size(tokens_col(F.col("t"))) >= n),
        "id",
    ).select(
        # explode of the INLINE expression (r21): exploding a
        # materialized array column makes InferFiltersFromGenerate add
        # size(sh) > 0 on the alias, which collapses into the scan-side
        # filter below the exchange — the full shingle build then ran
        # twice, serially, inside the single-file scan task (measured
        # 4.2 s vs 0.4 s at sf0.1). The inline form infers no filter.
        "id", F.explode(shingles_col(F.col("t"), n)).alias("shingle")
    )


def jaccard_pairs(shingled: DataFrame, min_jaccard: float,
                  candidates: DataFrame | None = None) -> DataFrame:
    """Exact pairwise Jaccard via a shingle-equi-join (NOT a cross join):
    only pairs sharing >=1 shingle materialize, |A∩B| falls out of the join
    group-count, |A∪B| = |A|+|B|-|A∩B|.

    ``candidates`` (id_a, id_b) restricts verification to an LSH candidate set
    — the 100 TB path where the full equi-join would still be too hot.
    Returns (id_a, id_b, jaccard).
    """
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        # Verify-only-candidates path: route the candidate pair list through
        # the shingle table twice (id_a then id_b+shingle equi-joins) so the
        # intersection count materializes ONLY for candidate pairs — the
        # full shingle self-join below never runs. At scale this is
        # |candidates| x shingles_per_doc, independent of corpus size.
        a = shingled.select(F.col("id").alias("id_a"), "shingle")
        b = shingled.select(F.col("id").alias("id_b"), "shingle")
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = shingled.alias("a")
        b = shingled.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "id_a").join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "jaccard")
    )


def prefix_filter_pairs(
    token_sets: DataFrame, threshold: float
) -> DataFrame:
    """EXACT set-similarity self-join candidates via prefix filtering (the
    AllPairs/PPJoin family, Bayardo et al. WWW'07) — the deterministic
    alternative to MinHash-LSH blocking: zero false negatives BY
    CONSTRUCTION, not just in expectation.

    Order every set's tokens by the one global total order (ascending
    corpus document frequency, token as tiebreak — rarest first). If
    J(A,B) >= t then |A∩B| >= ceil(t*|A|) and >= ceil(t*|B|), so the
    globally-smallest shared token must sit inside EACH set's first
    |X| - ceil(t*|X|) + 1 tokens (were it deeper, too few positions
    remain for the required overlap). Candidates therefore join only on
    PREFIX tokens — and because the order is df-ascending, prefixes are
    made of the RAREST tokens: the stopword keys that blow up a naive
    token equi-join are structurally last and never block. A too-long
    prefix (float ceil noise) only adds candidates; exact verification
    keeps the answer identical.

    Input: distinct (id, tok) rows. Returns candidate (id_a, id_b)."""
    from pyspark.sql.window import Window

    dfreq = token_sets.groupBy("tok").agg(F.count(F.lit(1)).alias("_df"))
    sizes = token_sets.groupBy("id").agg(F.count(F.lit(1)).alias("_sz"))
    w = Window.partitionBy("id").orderBy("_df", "tok")
    prefix = (
        token_sets.join(dfreq, "tok")
        .withColumn("_pos", F.row_number().over(w))
        .join(sizes, "id")
        .filter(
            F.col("_pos")
            <= F.col("_sz") - F.ceil(F.lit(threshold) * F.col("_sz")) + 1
        )
        .select("id", "tok")
    )
    a = prefix.select(F.col("id").alias("id_a"), "tok")
    b = prefix.select(F.col("id").alias("id_b"), "tok")
    return (
        a.join(b, "tok")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def prefix_jaccard_join(
    docs: DataFrame,
    threshold: float,
    text: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact word-set Jaccard self-join at threshold ``threshold`` with
    prefix-filter blocking: candidates from :func:`prefix_filter_pairs`,
    verification through the candidate-restricted :func:`jaccard_pairs`
    path (intersections materialize only for candidate pairs). The result
    is IDENTICAL to the all-pairs join — the blocking is lossless — at a
    cost bounded by prefix-token document frequencies instead of the
    quadratic token fan-out. Returns (id_a, id_b, jaccard)."""
    tk = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(tokens_col(F.col(text))).alias("tok"),
        )
        .distinct()
    )
    cands = prefix_filter_pairs(tk, threshold)
    return jaccard_pairs(
        tk.withColumnRenamed("tok", "shingle"), threshold, cands
    )


def cap_hot_shingles(shingled: DataFrame, max_df: int) -> DataFrame:
    """Drop shingles whose document frequency exceeds ``max_df``.

    Hot shingles (boilerplate 3-grams shared by thousands of documents) are
    the skew bomb in every shingle equi-join: one key fanning out to df²
    pairs. The hot set is small by construction (only keys above the cap),
    so it broadcasts and the corpus-side filter is a broadcast anti-join —
    no shuffle of the shingle table. One aggregation pass computes the
    frequencies (map-side partial counts).
    """
    hot = F.broadcast(
        shingled.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") > max_df)
        .select("shingle")
    )
    return shingled.join(hot, "shingle", "left_anti")


def containment_pairs(shingled: DataFrame, min_containment: float,
                      candidates: DataFrame | None = None) -> DataFrame:
    """Asymmetric near-dup: containment(A in B) = |A∩B| / |A| — the measure
    that catches a document EMBEDDED in a longer one, which Jaccard dilutes
    toward zero as the length ratio grows (Broder's resemblance vs
    containment distinction). Directional: one row per ordered pair with
    id_a's shingles contained in id_b at >= min_containment.

    ``candidates`` (id_a, id_b — ORDERED pairs; pass both orientations of an
    unordered candidate list) restricts verification to a candidate set,
    exactly like :func:`jaccard_pairs`: the intersection materializes only
    for candidate pairs via two equi-joins, and the full shingle self-join
    never runs — the 100 TB path. Compose with :func:`cap_hot_shingles`
    upstream to bound the per-shingle fan-out of the unrestricted form.
    Returns (id_a, id_b, containment) with id_a != id_b.
    """
    sizes = shingled.groupBy("id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        a = shingled.select(F.col("id").alias("id_a"), "shingle")
        b = shingled.select(F.col("id").alias("id_b"), "shingle")
        inter = (
            candidates.join(a, "id_a")
            .join(b, ["id_b", "shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    else:
        a = shingled.alias("a")
        b = shingled.alias("b")
        inter = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
                   & (F.col("a.id") != F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_inter"))
        )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a"))
    return (
        inter.join(sa, "id_a")
        .withColumn(
            "containment",
            F.round(F.col("n_inter") / F.col("sz_a"), 6),
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "containment")
    )


def containment_lsh(df: DataFrame, text: str = "text", id_col: str = "doc_id",
                    min_containment: float = 0.3,
                    max_shingle_df: int | None = None) -> DataFrame:
    """Scale path for containment detection: cap hot shingles, MinHash-sign
    the capped shingle table, LSH-band for candidates, verify containment in
    BOTH orientations of each candidate pair.

    Sizes (|A|) and intersections are computed over the capped shingle
    space, so the score is exact containment within it — the same
    denominator convention both sides of the candidate pair see. The
    shingle and signature tables are cached: each feeds two join sides
    (the dedup-index materialization a 100 TB run persists anyway).
    Returns (id_a, id_b, containment), ordered pairs.
    """
    sh = doc_shingles(df, text, id_col)
    if max_shingle_df is not None:
        sh = cap_hot_shingles(sh, max_shingle_df)
    sh = _cache_tracked(sh)
    sigs = _cache_tracked(minhash_signatures_from_shingles(sh))
    cands = lsh_candidate_pairs(sigs)
    both = cands.union(
        cands.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    )
    return containment_pairs(sh, min_containment, candidates=both)


# --- MinHash + LSH ----------------------------------------------------------
def minhash_signatures(df: DataFrame, text: str = "text",
                       id_col: str = "doc_id", k: int = NUM_PERM) -> DataFrame:
    """MinHash signatures: shingle -> 32-bit md5 hash h, signature_i =
    min((a_i*h + b_i) mod P) over the doc's shingles.

    One explode + one hash-aggregate; k mins compute in a single pass
    (map-side partial min per permutation — shuffle carries k longs per doc).
    Returns (id, mh_0..mh_{k-1}).
    """
    return minhash_signatures_from_shingles(doc_shingles(df, text, id_col), k)


def minhash_signatures_from_shingles(shingled: DataFrame,
                                     k: int = NUM_PERM) -> DataFrame:
    """Signatures from an existing (id, shingle) table — lets pipelines share
    one shingle materialization between signing and verification."""
    a, b = perm_params(k)
    # parsed-once SQL strings: the per-Column py4j construction of k
    # universal-hash mins costs driver-side milliseconds-per-operator
    # that dominated warm invocations (measured r21; same fix as simhash)
    h = f"CAST(conv(substring(md5(shingle), 1, {MD5_CHARS}), 16, 10) AS BIGINT)"
    return shingled.groupBy("id").agg(
        *[
            F.expr(f"min(({a[i]} * {h} + {b[i]}) % {HASH_PRIME})").alias(
                f"mh_{i}"
            )
            for i in range(k)
        ]
    )


def lsh_candidate_pairs(signatures: DataFrame, bands: int = LSH_BANDS,
                        rows: int = LSH_ROWS) -> DataFrame:
    """LSH banding: hash each band of the signature, equi-join per band bucket.

    The banded self-join is the scale path: collision probability
    1-(1-s^rows)^bands, and the join key (band_id, band_hash) shards
    uniformly. Returns distinct (id_a, id_b), id_a < id_b.
    """
    band_structs = F.expr(
        "array(" + ", ".join(
            f"struct({j} AS band_id, md5(concat_ws('_', "
            + ", ".join(f"mh_{j * rows + r}" for r in range(rows))
            + ")) AS band_hash)"
            for j in range(bands)
        ) + ")"
    )
    banded = signatures.select(
        "id", F.explode(band_structs).alias("band")
    ).select("id", "band.band_id", "band.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup(df: DataFrame, text: str = "text", id_col: str = "doc_id",
                  min_jaccard: float = 0.5) -> DataFrame:
    """Full near-dup pipeline: MinHash -> LSH bands -> exact-Jaccard verify.

    The signature and shingle tables are cached: each feeds both sides of a
    self-join, and without materialization Spark would re-derive the whole
    explode+aggregate lineage once per join side. Both are tiny relative to
    the corpus (k longs per doc; shingle strings per doc) — at 100 TB these
    are the tables you'd persist as the dedup index anyway.
    """
    sh = _cache_tracked(doc_shingles(df, text, id_col))
    sigs = _cache_tracked(minhash_signatures_from_shingles(sh))
    cands = lsh_candidate_pairs(sigs)
    return jaccard_pairs(sh, min_jaccard, cands)


# --- paragraph-level dedup --------------------------------------------------
PARA_KEY = 100_000  # paragraph key = doc_id * PARA_KEY + paragraph index


def paragraph_chunks(df: DataFrame, paragraph_tokens: int = 30,
                     text: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Paragraph substrate for sub-document dedup: fixed token windows as
    pseudo-paragraphs (a corpus with real structure would split on blank
    lines first; this testdata is single-line text). Narrow map stage only —
    no shuffle. The paragraph key packs (doc, index) into one orderable
    long so the whole MinHash/LSH machinery below runs unchanged on
    paragraphs. Returns (pid, id, chunk_id, chunk_text).
    """
    from .text import chunk_documents

    paras = chunk_documents(df, paragraph_tokens, 0, text, id_col)
    return paras.select(
        (F.col("id") * PARA_KEY + F.col("chunk_id")).alias("pid"),
        "id", "chunk_id", "chunk_text",
    )


def paragraph_exact_dedup(df: DataFrame, paragraph_tokens: int = 30,
                          text: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Exact duplicated paragraphs across the corpus (pretraining boilerplate
    removal at sub-document granularity). One shuffle on md5(paragraph) with
    map-side partial aggregation — same scale profile as exact_dedup.
    Returns (para_hash, n_copies, n_docs, survivor_doc, survivor_para) for
    paragraphs occurring more than once.
    """
    paras = paragraph_chunks(df, paragraph_tokens, text, id_col)
    return (
        paras.groupBy(F.md5("chunk_text").alias("para_hash"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.countDistinct("id").alias("n_docs"),
            F.min("pid").alias("_skey"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "para_hash", "n_copies", "n_docs",
            F.expr(f"_skey div {PARA_KEY}").alias("survivor_doc"),
            (F.col("_skey") % PARA_KEY).alias("survivor_para"),
        )
    )


def paragraph_minhash_dedup(df: DataFrame, paragraph_tokens: int = 30,
                            min_jaccard: float = 0.5, text: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Near-dup paragraphs: the existing MinHash -> LSH bands -> exact-Jaccard
    pipeline fed paragraph-granularity shingles. Same-document pairs are
    dropped (paragraph dedup targets cross-document repetition); candidate
    generation stays a banded equi-join, so the paragraph explosion only
    multiplies the *rows*, not the join shape — scale-safe at 100 TB.
    Returns (doc_a, para_a, doc_b, para_b, jaccard).
    """
    paras = paragraph_chunks(df, paragraph_tokens, text, id_col)
    sh = _cache_tracked(doc_shingles(paras, text="chunk_text", id_col="pid"))
    sigs = _cache_tracked(minhash_signatures_from_shingles(sh))
    cands = lsh_candidate_pairs(sigs)
    pairs = jaccard_pairs(sh, min_jaccard, cands)
    return (
        pairs.filter(
            F.expr(f"id_a div {PARA_KEY} <> id_b div {PARA_KEY}")
        )
        .select(
            F.expr(f"id_a div {PARA_KEY}").alias("doc_a"),
            (F.col("id_a") % PARA_KEY).alias("para_a"),
            F.expr(f"id_b div {PARA_KEY}").alias("doc_b"),
            (F.col("id_b") % PARA_KEY).alias("para_b"),
            "jaccard",
        )
    )


# --- SimHash ----------------------------------------------------------------
# Packed-lane geometry for the simhash bit-count aggregation: two 31-bit
# counter lanes per 64-bit sum (2*31 = 62 bits). Each token contributes 0 or
# 1 per lane, so lanes never carry into each other while the number of
# tokens summed together stays below 2^31. Boundedness is STRUCTURAL with no
# guard and no extra aggregation level: a Spark StringType value holds at
# most 2^31-1 chars and whitespace tokens are non-empty, so one document can
# never carry more than 2^30 tokens — strictly below the lane cap. (r21's
# single-level 20-bit lanes hard-failed past 2^20 tokens, VERDICT r21 #3;
# the first r22 fix chunked tokens by position and folded per-chunk counts
# in a second aggregation, which was exact but cost ~25% on the simhash
# rows — the wider lanes keep the r21 single-aggregate plan shape instead.)
_SIMHASH_LANE = 31
_SIMHASH_LANE_CAP = 1 << _SIMHASH_LANE


def simhash(df: DataFrame, text: str = "text", id_col: str = "doc_id",
            bits: int = SIMHASH_BITS) -> DataFrame:
    """Per-doc SimHash over token hashes: bit_j = sign(sum_t (+1 if bit_j(h(t))
    else -1)). Single explode + single aggregate. Returns (id, simhash).

    Two measured optimizations over the naive ``bits`` separate per-bit
    sums (identical results by construction):

    * **Packed-lane aggregation**: bit counts accumulate two-per-long in
      31-bit lanes (``sum((h >> g) & 0x...)`` with a lane-spread mask), so
      the token-level aggregate carries ~bits/2 sum columns instead of
      ``bits`` — the per-token aggregation work and the map-side
      partial-agg row width both shrink ~2x. Exactness at any doc size is
      structural (see the lane-geometry note above): per-doc token counts
      are bounded by 2^30 < the 2^31 lane cap, so ONE aggregation level
      suffices with no overflow guard.
    * **Single-parse expressions**: the aggregate and the bit-majority
      assembly are built as SQL strings parsed once in the JVM. The
      Column-by-Column form cost ~2 s of DRIVER time per invocation
      (hundreds of py4j round trips for 60 bits — measured r21), which
      dwarfed the execution itself. The token hash (md5/conv) is
      materialized by a projection BELOW the aggregate so each token
      hashes exactly once — inlined in the sums it is evaluated once per
      LANE GROUP by the partial-aggregate update (measured ~2.4x on the
      whole query, r22).
    """
    toks = (
        key_parallel(
            df.select(F.col(id_col).alias("id"), F.col(text).alias("t")),
            "id",
        )  # explicit width: parallelize past the input file count
        .select("id", F.explode(tokens_col(F.col("t"))).alias("tok"))
        # 60-bit token hash (md5_long(col, 15) as one SQL string),
        # computed once per token here, NOT once per sum column
        .select(
            "id",
            F.expr(
                "CAST(conv(substring(md5(tok), 1, 15), 16, 10) AS BIGINT)"
            ).alias("h"),
        )
    )
    n_groups = min(bits, _SIMHASH_LANE)
    masks = {
        g: sum(
            1 << (_SIMHASH_LANE * m)
            for m in range((bits - g + _SIMHASH_LANE - 1) // _SIMHASH_LANE)
        )
        for g in range(n_groups)
    }
    packed = toks.groupBy("id").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.expr(f"sum(shiftright(h, {g}) & {masks[g]})").alias(f"p_{g}")
            for g in range(n_groups)
        ],
    )
    # bit j (= g + 31m) majority: 2 * lane_count > n; lane extraction and
    # the 2^j weighting assemble in one parsed expression
    lane_mask = _SIMHASH_LANE_CAP - 1
    terms = " + ".join(
        f"IF(2 * (shiftright(p_{j % _SIMHASH_LANE}, "
        f"{_SIMHASH_LANE * (j // _SIMHASH_LANE)}) & {lane_mask}) > n, "
        f"CAST({1 << j} AS BIGINT), CAST(0 AS BIGINT))"
        for j in range(bits)
    )
    return packed.select("id", F.expr(terms).alias("simhash"))


def simhash_pairs(sims: DataFrame, max_hamming: int) -> DataFrame:
    """Near-dup pairs by Hamming distance on SimHash.

    Small-input form is a pairwise join; at scale, pre-bucket by signature
    prefix (pigeonhole: any pair within d of each other shares one of d+1
    prefix blocks) — see ``simhash_pairs_bucketed``.
    Returns (id_a, id_b, hamming).
    """
    sims = _cache_tracked(sims)  # feeds both join sides; avoid double signature agg
    a = sims.alias("a")
    b = sims.alias("b")
    hamming = F.bit_count(F.expr("a.simhash").bitwiseXOR(F.expr("b.simhash")))
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def simhash_pairs_bucketed(sims: DataFrame, max_hamming: int,
                           blocks: int | None = None,
                           bits: int = SIMHASH_BITS) -> DataFrame:
    """Scale path: split the signature into ``max_hamming+1`` blocks; any pair
    with hamming <= max_hamming agrees exactly on >=1 block (pigeonhole), so an
    equi-join per block finds all of them without a cross join."""
    blocks = blocks or (max_hamming + 1)
    width = bits // blocks
    # one parsed expression for the block fan-out (the per-Column py4j
    # form costs driver milliseconds per block; the string parses once)
    block_structs = F.expr(
        "array(" + ", ".join(
            f"struct({j} AS block_id, "
            f"shiftright(simhash, {j * width}) & {(1 << width) - 1} "
            "AS block_val)"
            for j in range(blocks)
        ) + ")"
    )
    blocked = (
        sims.select("id", "simhash", F.explode(block_structs).alias("blk"))
        .select("id", "simhash", "blk.block_id", "blk.block_val")
    )
    blocked = _cache_tracked(blocked)  # feeds both join sides
    a = blocked.alias("a")
    b = blocked.alias("b")
    hamming = F.bit_count(F.expr("a.simhash").bitwiseXOR(F.expr("b.simhash")))
    return (
        a.join(
            b,
            (F.col("a.block_id") == F.col("b.block_id"))
            & (F.col("a.block_val") == F.col("b.block_val"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --- embedding cosine near-dup ----------------------------------------------
def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<float|double> columns, computed in
    double with left-to-right accumulation (deterministic across engines)."""
    da = a.cast("array<double>")
    db = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(da, db, lambda x, y: x * y),
                      F.lit(0.0), lambda acc, v: acc + v)
    na = F.sqrt(F.aggregate(F.transform(da, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    nb = F.sqrt(F.aggregate(F.transform(db, lambda x: x * x),
                            F.lit(0.0), lambda acc, v: acc + v))
    return dot / (na * nb)


def embedding_neardup(emb: DataFrame, threshold: float,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Pairs with cosine >= threshold, EXACT all-pairs form — O(n²), kept only
    as the small-input oracle double and recall baseline. The default/scale
    path is :func:`embedding_neardup_lsh`. Returns (id_a, id_b, cosine)."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# Multi-table sign-LSH parameters for the bucketed near-dup default: fewer
# planes per table than the ANN index (wider buckets -> higher per-table
# recall at near-dup thresholds), several independent tables OR-ed together.
# Recall for a pair at angle θ is 1 - (1 - (1-θ/π)^PLANES)^TABLES.
EMB_LSH_TABLES = 8
EMB_LSH_PLANES = 4


def emb_plane_tables(dim: int = 64, tables: int = EMB_LSH_TABLES,
                     planes_per_table: int = EMB_LSH_PLANES,
                     seed: int = 11) -> list[list[list[float]]]:
    """Deterministic hyperplane tables (shared literals with the oracle SQL);
    seed differs from the ANN index planes so the two surfaces decorrelate."""
    from .hashing import hyperplanes

    pool = hyperplanes(tables * planes_per_table, dim, seed=seed)
    return [
        pool[t * planes_per_table:(t + 1) * planes_per_table]
        for t in range(tables)
    ]


def embedding_neardup_lsh(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_tables: list[list[list[float]]] | None = None,
) -> DataFrame:
    """Bucketed near-dup — the 100 TB default path.

    Same candidates-then-verify shape as :func:`minhash_dedup`: candidate
    pairs come from a bucket EQUI-join per LSH table (cost ~ sum of squared
    bucket occupancies — corpus-size-linear for well-spread buckets), and the
    exact cosine runs on candidates only. Never a cross join. The bucket
    table is cached because it feeds both sides of the self-join (and at
    scale it's the index you'd persist, bucketed on (table_id, bucket)).
    Semantics are approximate by design: a pair missed by every table is not
    reported (tune TABLES/PLANES for the recall target).
    Returns (id_a, id_b, cosine).
    """
    from .similarity import lsh_bucket

    plane_tables = plane_tables or emb_plane_tables()
    v = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    table_structs = F.array(
        *[
            F.struct(
                F.lit(t).alias("table_id"),
                lsh_bucket(F.col("v"), planes).alias("bucket"),
            )
            for t, planes in enumerate(plane_tables)
        ]
    )
    buckets = (
        key_parallel(v, "id")  # explicit width past the input file count
        .select("id", F.explode(table_structs).alias("tb"))
        .select("id", "tb.table_id", "tb.bucket")
    )
    buckets = _cache_tracked(buckets)
    a = buckets.alias("a")
    b = buckets.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.table_id") == F.col("b.table_id"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    return (
        cands.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


# --- semantic dedup (SemDeDup: cluster, then prune within cluster) ----------
def semantic_dedup(
    emb: DataFrame,
    centroids: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): k-means-cluster the embeddings, then run the exact
    pairwise cosine check only WITHIN each cluster and prune every member
    that has a sufficiently similar lower-id member.

    This is the missing middle ground between :func:`embedding_neardup`
    (exact all-pairs, O(n²)) and :func:`embedding_neardup_lsh` (random
    hyperplane buckets): the clusters are data-adaptive, so semantically
    near-identical documents land in the same cell even when random planes
    would split them.

    100 TB design: assignment is a broadcast of the (tiny) centroid table —
    the corpus never shuffles for it — and the quadratic term is bounded per
    cell at (n/k)² per cluster; k grows with the corpus so cell size stays
    constant. The within-cell self-join is an equi-join on ``centroid_id``
    (co-partitioned, no cross join). Deterministic keeper rule: a vector is
    pruned iff some LOWER-id cell member matches it at >= threshold; ties
    and chains keep the minimum id, mirroring the reference pipelines'
    keep-first convention.

    Returns (centroid_id, pruned_id, keeper_id, max_cosine) — one row per
    pruned vector; keeper_id is the smallest qualifying lower id,
    max_cosine the strongest match that doomed it.
    """
    from .similarity import ivf_assign

    # normalize ONCE per vector so the O(cell²) pair scan is a single dot
    # product instead of dot + two norms — 3x less expression work where the
    # quadratic term lives (the oracle mirrors the same normalized form)
    dv = F.col("v").cast("array<double>")
    norm = F.sqrt(
        F.aggregate(
            F.transform(dv, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    assigned = (
        ivf_assign(emb, centroids, id_col, vec_col)
        .select(
            "centroid_id", "id", F.transform(dv, lambda x: x / norm).alias("nv")
        )
        # feeds both sides of the pair self-join: without this the
        # whole centroid-refine + assignment lineage runs once per side
    )
    assigned = _cache_tracked(assigned)
    a = assigned.select(
        "centroid_id", F.col("id").alias("id_a"), F.col("nv").alias("na")
    )
    b = assigned.select(
        "centroid_id", F.col("id").alias("id_b"), F.col("nv").alias("nb")
    )
    dot = F.aggregate(
        F.zip_with(F.col("na"), F.col("nb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "centroid_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "centroid_id",
            "id_a",
            "id_b",
            F.round(dot, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
    return pairs.groupBy(
        "centroid_id", F.col("id_b").alias("pruned_id")
    ).agg(
        F.min("id_a").alias("keeper_id"),
        F.max("cosine").alias("max_cosine"),
    )


# --- near-dup cluster resolution (connected components) ---------------------
def cluster_components(
    pairs: DataFrame,
    nodes: DataFrame,
    max_iterations: int = 50,
) -> DataFrame:
    """Resolve near-duplicate PAIRS into dedup CLUSTERS: assign every node the
    minimum id reachable through the pair graph (connected components), the
    step every training-data pipeline needs between "these documents match"
    and "keep one representative per group".

    ``pairs`` has (id_a, id_b); ``nodes`` has (id).  Returns (id, cluster_id)
    for EVERY node — singletons cluster to themselves.

    100 TB design: min-label propagation WITH pointer doubling.  Each round
    every active node adopts min(own label, neighbours' labels) — one shuffle
    equi-join of the edge list against the label table plus one aggregation —
    and then shortcuts through the label table itself (label := label[label],
    a self-join of the label table; labels are always node ids of the same
    component, so the lookup is total).  The shortcut halves the remaining
    pointer-chain depth each round, so rounds = O(log(diameter)) — a
    pathological 1000-doc duplicate chain converges in ~10 rounds, where
    plain one-hop propagation would need ~1000.  All JVM-side; only nodes
    that appear in at least one pair enter the loop; the (vastly larger)
    singleton set joins back once at the end.  ``localCheckpoint`` truncates
    lineage each round so the plan does not grow with iteration count, and
    the driver sees ONE scalar per round (the convergence count) — the label
    table itself never leaves the executors.

    Raises ``RuntimeError`` if the loop exits before convergence (never
    silently returns partially-merged clusters).
    """
    sym = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    sym = sym.localCheckpoint(eager=True)  # compute the pair graph ONCE

    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr"))
        )
        stepped = labels.join(nbr_min, "id", "left").select(
            "id",
            F.least("label", F.coalesce("nbr", "label")).alias("label"),
        )
        # pointer doubling: label := min(label, label[label]) — shortcut
        # through the label table so chain depth halves every round.
        grandparent = stepped.select(
            F.col("id").alias("label"), F.col("label").alias("gp")
        )
        new_labels = (
            stepped.join(grandparent, "label", "left")
            .select(
                "id",
                F.least("label", F.coalesce("gp", "label")).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        n_changed = (
            new_labels.withColumnRenamed("label", "new")
            .join(labels, "id")
            .filter(F.col("new") < F.col("label"))
            .count()
        )
        labels = new_labels
        if n_changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"cluster_components did not converge in {max_iterations} rounds"
            " — clusters would be wrong; raise max_iterations"
        )

    return (
        nodes.join(labels, "id", "left")
        .select("id", F.coalesce("label", F.col("id")).alias("cluster_id"))
    )


def dedup_survivors(
    pairs: DataFrame,
    nodes_with_rank: DataFrame,
    rank_col: str = "quality_score",
) -> DataFrame:
    """The final dedup decision: resolve near-dup pairs into clusters, then
    keep the best-ranked document per cluster (highest ``rank_col``, doc id
    as the deterministic tie-break) and mark the rest duplicates.

    ``nodes_with_rank`` has (id, <rank_col>). One window per cluster after
    the components resolve — the window shuffle is keyed on cluster_id, so
    a cluster's ranking never leaves its reducer. Returns
    (id, cluster_id, is_survivor).
    """
    from pyspark.sql.window import Window

    comps = cluster_components(pairs, nodes_with_rank.select("id"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col(rank_col).desc(), F.col("id")
    )
    return (
        comps.join(nodes_with_rank, "id")
        .withColumn("_rk", F.row_number().over(w))
        .select("id", "cluster_id", (F.col("_rk") == 1).alias("is_survivor"))
    )


def repeated_ngram_coverage(
    df: DataFrame,
    n: int = 10,
    min_docs: int | None = 2,
    text: str = "text",
    id_col: str = "doc_id",
    within_doc: bool = False,
) -> DataFrame:
    """ExactSubstr-style repeated-span detection (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): the
    fraction of each document's token positions covered by a token
    ``n``-gram that also occurs in at least ``min_docs - 1`` OTHER
    documents — the signal that drives span-level dedup of training
    corpora (doc-level exact/near dedup misses a copied paragraph inside
    an otherwise-unique page; this finds it at n-token granularity).

    ``within_doc=True`` adds the SELF-repetition half of ExactSubstr:
    an n-gram occurring at two or more positions of the SAME document
    also covers its positions (Lee et al. count any repeated substring,
    cross-document or not — boilerplate chorus lines inside one page are
    exactly as removable). ``min_docs=None`` disables the cross-document
    test entirely (requires ``within_doc=True``), giving a pure
    self-repetition coverage measure.

    Spark-first shape, suffix-array-free: one posexplode emits each
    position's n-gram FINGERPRINT (md5 of the joined token window — the
    rolling-hash role; fingerprints move, never the spans), one keyed
    aggregate computes each fingerprint's distinct-document frequency
    (plus, under ``within_doc``, its per-document occurrence count —
    the same two-phase aggregate, keyed (id, gh) then gh, so the self
    test is free), qualifying fingerprints join back (equi-join on the
    hash) and each hit expands to its n covered positions row-locally;
    a distinct keyed count yields covered-position totals. Every stage
    is a hash-keyed aggregate or equi-join — no self-join on documents,
    no window. The n-gram df table is corpus-sized but narrow (hash,
    count); hot boilerplate grams fan out only into position counting,
    which is bounded by doc length x n.

    Returns (id, n_tokens, covered_positions, coverage_ppm) for every
    doc with at least one n-gram position (docs shorter than ``n``
    tokens report 0/0/0)."""
    if min_docs is None and not within_doc:
        raise ValueError(
            "repeated_ngram_coverage: min_docs=None (no cross-document "
            "test) requires within_doc=True"
        )
    tk = tokens_col(F.col(text))
    docs = df.select(F.col(id_col).alias("id"), tk.alias("toks"))
    # sequence() descends when start > stop, so short docs get an
    # explicit empty gram array (the shingles_col discipline)
    gram_arr = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.md5(F.array_join(F.slice("toks", i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select(
        "id",
        F.size("toks").alias("n_tokens"),
        F.posexplode(gram_arr).alias("i", "gh"),
    )
    if within_doc:
        # two-phase: per-(doc, gram) occurrence counts feed BOTH tests —
        # c >= 2 is the self-repetition half, and the gram's document
        # frequency is just a count of its per-doc rows (map-side combine
        # on (id, gh) first, so hot grams never skew the gh aggregate)
        per = grams.groupBy("id", "gh").agg(F.count(F.lit(1)).alias("c"))
        cond = F.col("c") >= 2
        if min_docs is not None:
            nd = per.groupBy("gh").agg(F.count(F.lit(1)).alias("ndocs"))
            per = per.join(nd, "gh")
            cond = cond | (F.col("ndocs") >= min_docs)
        qual = per.filter(cond).select("id", "gh")
        hits = grams.join(qual, ["id", "gh"])
    else:
        rep = (
            grams.groupBy("gh")
            .agg(F.count_distinct("id").alias("ndocs"))
            .filter(F.col("ndocs") >= min_docs)
            .select("gh")
        )
        hits = grams.join(rep, "gh")
    covered = (
        hits.select(
            "id",
            F.explode(
                F.sequence(F.col("i"), F.col("i") + n - 1)
            ).alias("j"),
        )
        .distinct()
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("covered_positions"))
    )
    base = docs.select("id", F.size("toks").alias("n_tokens"))
    return base.join(covered, "id", "left").select(
        "id",
        "n_tokens",
        F.coalesce("covered_positions", F.lit(0))
        .cast("bigint")
        .alias("covered_positions"),
        F.expr(
            "CAST(coalesce(covered_positions, 0) * CAST(1000000 AS BIGINT)"
            " DIV greatest(n_tokens, 1) AS BIGINT)"
        ).alias("coverage_ppm"),
    )


def remove_repeated_spans(
    df: DataFrame,
    n: int = 10,
    min_docs: int | None = 2,
    text: str = "text",
    id_col: str = "doc_id",
    within_doc: bool = False,
) -> DataFrame:
    """The REMOVAL half of ExactSubstr dedup (Lee et al. 2022 cut the
    repeated spans out of the corpus; :func:`repeated_ngram_coverage`
    only measures them): rebuild each document's text with every covered
    token position dropped — the conservative both-copies-removed
    cleaning used for boilerplate stripping. Qualification is identical
    to the coverage measure (cross-document frequency >= ``min_docs``,
    plus same-document repeats when ``within_doc``).

    Spark-first shape: the same fingerprint-keyed qualification chain as
    the coverage measure, then one posexplode of (position, token), a
    left-anti equi-join against the covered positions, and a row-local
    rebuild — ``array_sort`` over (position, token) structs restores
    token order inside the aggregate, so no window and no second shuffle
    key. Whitespace normalizes to single spaces (the tokenizer's view of
    the text, same as every text operator here).

    Returns (id, n_tokens, kept_tokens, clean_text); a fully-covered
    document keeps 0 tokens and an empty string, a doc shorter than
    ``n`` tokens is untouched."""
    if min_docs is None and not within_doc:
        raise ValueError(
            "remove_repeated_spans: min_docs=None requires within_doc=True"
        )
    tk = tokens_col(F.col(text))
    docs = df.select(F.col(id_col).alias("id"), tk.alias("toks"))
    gram_arr = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.md5(F.array_join(F.slice("toks", i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = docs.select("id", F.posexplode(gram_arr).alias("i", "gh"))
    if within_doc:
        per = grams.groupBy("id", "gh").agg(F.count(F.lit(1)).alias("c"))
        cond = F.col("c") >= 2
        if min_docs is not None:
            nd = per.groupBy("gh").agg(F.count(F.lit(1)).alias("ndocs"))
            per = per.join(nd, "gh")
            cond = cond | (F.col("ndocs") >= min_docs)
        hits = grams.join(per.filter(cond).select("id", "gh"), ["id", "gh"])
    else:
        rep = (
            grams.groupBy("gh")
            .agg(F.count_distinct("id").alias("ndocs"))
            .filter(F.col("ndocs") >= min_docs)
            .select("gh")
        )
        hits = grams.join(rep, "gh")
    covered = hits.select(
        "id",
        F.explode(F.sequence(F.col("i"), F.col("i") + n - 1)).alias("j"),
    ).distinct()
    toks_pos = docs.select("id", F.posexplode("toks").alias("j", "tok"))
    rebuilt = (
        toks_pos.join(covered, ["id", "j"], "left_anti")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("kept_tokens"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("j", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        docs.select("id", F.size("toks").alias("n_tokens"))
        .join(rebuilt, "id", "left")
        .select(
            "id",
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.coalesce("kept_tokens", F.lit(0))
            .cast("bigint")
            .alias("kept_tokens"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def contamination_ngram_join(
    docs: DataFrame,
    probes: DataFrame,
    n: int = 5,
    text: str = "text",
    id_col: str = "doc_id",
    probe_id: str = "probe_id",
    probe_col: str = "probe",
) -> DataFrame:
    """Scale-path benchmark decontamination (the Dolma/FineWeb n-gram
    discipline): a document is contaminated by a probe iff the probe's
    FULL token sequence appears at some token position of the document.
    The broadcast substring scan (text.contamination_check) tests every
    doc against every probe — fine for a handful of probes, O(corpus ×
    eval set) when the eval suite has 100k held-out fragments. This form
    candidate-generates by FINGERPRINT EQUI-JOIN instead: each doc
    position's ``n``-gram md5 (the same md5-of-joined-window fingerprint
    as :func:`repeated_ngram_coverage`) joins the probe's first-``n``-gram
    md5, and each candidate (doc, position, probe) verifies the full
    probe with one row-local token-slice comparison — work scales with
    gram counts and true-candidate density, never docs × probes. Probes
    shorter than ``n`` tokens are rejected loudly (their key would be
    undefined; shrink ``n`` instead).

    Returns distinct (doc_id, probe_id) contamination pairs — token-
    boundary semantics, deliberately NOT raw-substring (a probe matching
    mid-token is an artifact, not contamination)."""
    ptoks = tokens_col(F.col(probe_col))
    pr = probes.select(
        F.col(probe_id).alias("pid"),
        ptoks.alias("ptoks"),
        F.size(ptoks).alias("plen"),
        F.md5(F.array_join(F.slice(ptoks, 1, n), " ")).alias("gh"),
    )
    n_short = pr.filter(F.col("plen") < n).count()
    if n_short:
        raise ValueError(
            f"contamination_ngram_join: {n_short} probe(s) shorter than "
            f"n={n} tokens — their fingerprint key would be undefined; "
            "use a smaller n"
        )
    tk = tokens_col(F.col(text))
    d = docs.select(F.col(id_col).alias("id"), tk.alias("toks"))
    gram_arr = F.when(
        F.size("toks") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - n),
            lambda i: F.md5(F.array_join(F.slice("toks", i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = d.select("id", F.posexplode(gram_arr).alias("i", "gh"))
    cand = grams.join(F.broadcast(pr), "gh").select(
        "id", "i", "pid", "ptoks", "plen"
    )
    verified = (
        cand.join(d, "id")
        .filter(
            F.expr("slice(toks, i + 1, plen)") == F.col("ptoks")
        )
        .select(
            F.col("id").alias("doc_id"), F.col("pid").alias(probe_id)
        )
        .distinct()
    )
    return verified


# --- winnowing fingerprints (MOSS) -------------------------------------------
WINNOW_WINDOW = 4  # w: one fingerprint guaranteed per w consecutive k-grams


def winnowing_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    w: int = WINNOW_WINDOW,
) -> DataFrame:
    """Winnowed document fingerprints (Schleimer, Wilkerson & Aiken 2003
    — the MOSS algorithm): hash every word ``n``-gram IN ORDER, slide a
    window of ``w`` consecutive hashes, and select each window's minimum
    (RIGHTMOST occurrence on ties). The selected (hash, position) set is
    the guaranteed-density fingerprint — any shared substring of at
    least ``n + w - 1`` tokens between two documents shares at least one
    fingerprint, which plain min-sampling cannot promise. Unlike
    ``text.fingerprints`` (a min/max summary) this is position-robust
    partial-overlap detection.

    The rightmost-min selection is one closed-form array expression
    (``i + w - array_position(reverse(window), min(window))``) evaluated
    identically by both engines — no UDF, no per-row Python. Returns the
    distinct (id, mh, pos) selections; corpus-linear, no shuffle until
    the caller aggregates."""
    toks = tokens_col(F.col(text_col))
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    # the per-position window-min expression below is the single heaviest
    # row-local computation in the dedup family — without an explicit
    # fan-out it runs at input-FILE parallelism (one task per parquet
    # file), the same serialization the key_parallel helper exists for
    base = key_parallel(
        df.filter(F.size(toks) >= n + w - 1).select(
            F.col(id_col).alias("id"), grams.alias("g")
        ),
        "id",
    )
    hs = base.select(
        "id", F.transform("g", lambda s: md5_long(s)).alias("hs")
    )
    sel = (
        hs.select(
            "id",
            F.explode(
                # SQL lambdas have no 'let': the single-element nested
                # transforms bind the window slice and its min ONCE each,
                # instead of re-slicing (3x) and re-scanning for the min
                # (2x) per position — the expression is the dedup
                # family's hottest row-local loop
                F.expr(
                    f"""transform(sequence(1, size(hs) - {w} + 1),
                  i -> transform(array(slice(hs, i, {w})),
                    win -> transform(array(array_min(win)),
                      m -> struct(
                        m AS mh,
                        i + {w} - array_position(reverse(win), m) AS pos
                      ))[0])[0])"""
                )
            ).alias("s"),
        )
        .select("id", F.col("s.mh").alias("mh"), F.col("s.pos").alias("pos"))
        .distinct()
    )
    return sel


def winnowing_pairs(
    df: DataFrame,
    min_shared: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    w: int = WINNOW_WINDOW,
) -> DataFrame:
    """Candidate near-duplicate pairs by shared winnowed fingerprints —
    the MOSS matching step: documents sharing >= ``min_shared`` distinct
    selected hashes. Pair generation is a keyed equi-join on the
    fingerprint hash (bucketed by construction, like every LSH-band join
    in this module — never all-pairs); count per pair is exact because
    the fingerprint set is already distinct per document. Returns
    (id_a, id_b, n_shared) with id_a < id_b."""
    # r21: pair generation needs only each document's DISTINCT set of
    # window-min hashes — positions and the rightmost-tie rule never
    # affect which hashes are selected (the set of window minima is
    # tie-break-independent), so the pair path skips them:
    #   * window minima via least() over w adjacent element_at()s — no
    #     per-window slice() array allocation (the old form allocated
    #     3 arrays per position; GC pressure made task times swing up
    #     to 10x on large docs);
    #   * array_distinct() INSIDE the row replaces the two shuffled
    #     global distincts (ids are unique per row, so doc-local
    #     distinct IS global distinct) — zero exchanges before the
    #     fingerprint-key join;
    #   * the whole chain is one parsed SQL expression (driver py4j
    #     cost is milliseconds, not the per-Column build).
    # winnowing_fingerprints stays the position-aware public API; both
    # derive the same selection by construction.
    toks = tokens_col(F.col(text_col))
    least_args = ", ".join(f"element_at(hs, i + {k})" for k in range(w))
    mins = key_parallel(
        df.filter(F.size(toks) >= n + w - 1).select(
            F.col(id_col).alias("id"), toks.alias("tk")
        ),
        "id",
    ).selectExpr(
        "id",
        f"""transform(sequence(0, size(tk) - {n}),
              i -> CAST(conv(substring(md5(
                     concat_ws(' ', slice(tk, i + 1, {n}))),
                   1, {MD5_CHARS}), 16, 10) AS BIGINT)) AS hs""",
    ).selectExpr(
        "id",
        f"""explode(array_distinct(transform(
              sequence(1, size(hs) - {w} + 1),
              i -> least({least_args})))) AS mh""",
    )
    a = mins.select(F.col("id").alias("id_a"), "mh")
    b = mins.select(F.col("id").alias("id_b"), "mh")
    return (
        a.join(b, "mh")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
