"""Text analysis operators — language-ID, quality scoring, token counting,
document fingerprinting.

Driver-mandated EXT surface (BASELINE.json). Pure Column expressions over the
``documents`` table; every number reproduces exactly in the DuckDB oracle
(rounding and hash constants shared via ext.hashing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import shingles_col, tokens_col
from .hashing import md5_long

# Stopword lists for the n-gram/stopword language heuristic. The driver corpus
# is synthetic word-soup, so the predictor is a deterministic scoring function
# (checked value-for-value by the oracle), not a real-language classifier.
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

# BPE-ish pre-tokenizer: letter runs, digit runs, or single non-space symbols
# (the GPT-2-style pretoken split, minus unicode classes both regex engines
# would disagree on).
BPE_REGEX = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

FINGERPRINT_NGRAM = 3


def token_count(text: Column) -> Column:
    """Whitespace token count (empties dropped)."""
    return F.size(tokens_col(text))


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-ish pretokens via regexp extraction."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0)))


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    stops = F.filter(
        toks, lambda t: t.isin(*STOPWORDS[lang]) if hasattr(t, "isin") else t
    )
    return F.size(stops) / F.greatest(F.size(toks), F.lit(1))


# Internal attribute names the single-pass gate projections materialize.
# Dunder-prefixed so they can never collide with a real corpus column.
_GATE_TOKS = "__gate_toks"
_GATE_STATS = "__gate_stats"
_GATE_PUNCT = "__gate_punct"
_GATE_PPM = "__gate_ppm"
_GATE_SCORE = "__gate_score"


def _token_stats_col(toks_name: str) -> Column:
    """ONE aggregate pass over an already-materialized token array,
    accumulating every token-derived integer the gates need: total token
    chars plus one stopword-hit count per language (guide §1.2 — the
    former shape ran five separate filter/aggregate array passes per row,
    four of them allocating an intermediate filtered array each)."""
    langs = sorted(STOPWORDS)
    zero = ", ".join(["0 AS len"] + [f"0 AS {lang}" for lang in langs])
    upd = ", ".join(
        ["acc.len + length(x) AS len"]
        + [
            "acc.{0} + IF(x IN ({1}), 1, 0) AS {0}".format(
                lang, ", ".join(f"'{w}'" for w in STOPWORDS[lang])
            )
            for lang in langs
        ]
    )
    return F.expr(
        f"aggregate(`{toks_name}`, struct({zero}), (acc, x) -> struct({upd}))"
    )


def _with_token_stats(df: DataFrame, text_col: str) -> DataFrame:
    """Materialize the token array and the single-pass token stats as
    attributes, in two chained projections. Each expensive alias is
    referenced more than once downstream, so CollapseProject keeps the
    projections separate and split/filter/aggregate run ONCE per row
    instead of once per consuming expression (higher-order functions are
    CodegenFallback, so codegen subexpression elimination never rescues
    the inlined form)."""
    d1 = df.select("*", tokens_col(F.col(text_col)).alias(_GATE_TOKS))
    return d1.select(
        "*",
        _token_stats_col(_GATE_TOKS).alias(_GATE_STATS),
        F.size(
            F.regexp_extract_all(
                F.col(text_col), F.lit("[^A-Za-z0-9 ]"), F.lit(0)
            )
        ).alias(_GATE_PUNCT),
    )


def _quality_cols_from(text: Column, toks: Column,
                       stats: Column) -> dict[str, Column]:
    """The row-local quality-feature columns over the materialized token
    attributes — shared by quality_features and the (join-free)
    quality_filter. Value-identical to the former per-expression passes:
    the counts are the same integers, the ratio/round arithmetic is
    unchanged."""
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    n_stop = stats["en"]
    n_punct = F.col(_GATE_PUNCT)
    avg_tok_len = F.when(
        n_tokens > 0,
        stats["len"] / n_tokens.cast("double"),
    ).otherwise(0.0)
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1)).cast("double")
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1)).cast("double")
    len_score = F.least(n_tokens.cast("double") / 50.0, F.lit(1.0))
    score = (
        F.lit(0.4) * len_score
        + F.lit(0.3) * F.least(stop_ratio * 5, F.lit(1.0))
        + F.lit(0.3) * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
    )
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_tok_len": F.round(avg_tok_len, 4),
        "stop_ratio": F.round(stop_ratio, 4),
        "punct_ratio": F.round(punct_ratio, 4),
        # 6 decimals: the weight formula can land exactly on a 5-decimal
        # half-way point (e.g. 0.86875) where engines' round() implementations
        # disagree; at 6 decimals no finite-decimal boundary is reachable.
        "quality_score": F.round(score, 6),
    }


def quality_features(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Per-doc quality features: length, token stats, punct/space/stopword
    ratios, and a composite quality score in [0, 1].

    The score formula is arbitrary-but-deterministic: it rewards mid-length
    docs with low punctuation and a healthy stopword rate — the standard
    shape of pretraining-corpus quality filters.
    """
    base = _with_token_stats(df, text_col)
    cols = _quality_cols_from(
        F.col(text_col), F.col(_GATE_TOKS), F.col(_GATE_STATS)
    )
    return base.select(
        F.col(id_col).alias("id"),
        *[c.alias(name) for name, c in cols.items()],
    )


def language_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-hit ratio (the n-gram heuristic's scoring
    half) as standalone Column expressions — the multi-pass form, kept
    for column-level callers; the DataFrame-level paths below share one
    single-pass aggregate instead."""
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))) / n
        for lang, words in STOPWORDS.items()
    }


def _language_best_from(toks: Column, stats: Column) -> Column:
    """Argmax (score, lang) struct over the per-language stopword scores,
    read from the single-pass stats attribute — the row-local core of
    language_id, shared by quality_filter."""
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    pairs = F.array(
        *[
            F.struct(
                F.round(stats[lang] / n, 6).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in sorted(STOPWORDS)
        ]
    )
    return F.array_max(pairs)  # struct compare: score first, then lang


def language_id(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Language-ID: argmax over per-language stopword scores with a
    deterministic tie-break (language name order), 'und' when all scores are 0.
    Returns (id, predicted_lang, lang_score)."""
    base = _with_token_stats(df, text_col)
    best = _language_best_from(F.col(_GATE_TOKS), F.col(_GATE_STATS))
    return base.select(
        F.col(id_col).alias("id"),
        F.when(best["score"] > 0, best["lang"]).otherwise("und").alias(
            "predicted_lang"
        ),
        best["score"].alias("lang_score"),
    )


# Composite-filter thresholds (quality_filter). Integer ppm / rounded-score
# comparisons so both engines decide identically; values chosen to trip each
# rule on a real fraction of the synthetic corpus.
FILTER_MIN_TOKENS = 20
FILTER_MAX_TOP_TOKEN_PPM = 130_000
FILTER_MIN_QUALITY = 0.55


def quality_filter(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """The composite keep/drop decision a pretraining corpus filter makes,
    with the reject reason — length gate, Gopher-style repetition gate,
    quality-score gate, language gate, evaluated in that fixed order.

    Every gate is computed row-locally in ONE projection — zero shuffles,
    zero joins (the r20 form exploded tokens through two aggregations and
    joined three per-id feature tables; at corpus scale those were full
    token-stream exchanges). All compared values are integers or
    already-rounded scores, so the decision replicates exactly in the
    oracle. Returns (id, keep, reason, n_tokens, top_token_ppm,
    quality_score).
    """
    # r21 shuffle removal (guide §2.4): every gating feature is row-local.
    # The top-token share — previously an explode + two token-scale
    # shuffled aggregations + an id-keyed join — is the max run length in
    # the doc's SORTED token array (identical to max(count) per token by
    # construction), so the whole filter is zero exchanges, zero joins.
    # r22 (guide §1.2): the token array and the language/stopword counts
    # materialize once per row (_with_token_stats) instead of re-running
    # split + five filter passes per consuming expression. The zero-token
    # docs the old inner join dropped (no exploded rows) are dropped by
    # an explicit filter.
    base = _with_gate_scalars(df, text_col)
    reason = _gate_reason()
    return base.filter(F.size(F.col(_GATE_TOKS)) > 0).select(
        F.col(id_col).alias("id"),
        (reason == "kept").alias("keep"),
        reason.alias("reason"),
        F.size(F.col(_GATE_TOKS)).alias("n_tokens"),
        F.col(_GATE_PPM).alias("top_token_ppm"),
        F.col(_GATE_SCORE).alias("quality_score"),
    )


def _with_gate_scalars(df: DataFrame, text_col: str) -> DataFrame:
    """:func:`_with_token_stats` plus the two EXPENSIVE gate scalars as
    attributes — the top-token ppm (an array_sort + run-length aggregate)
    and the rounded quality score. The reason CASE references each of
    them several times across quality_filter's output columns; inlined,
    the final projection ran the sorted-run aggregate three times per row
    (observed in the r22 before-plan)."""
    base = _with_token_stats(df, text_col)
    q = _quality_cols_from(
        F.col(text_col), F.col(_GATE_TOKS), F.col(_GATE_STATS)
    )
    # max token multiplicity == longest equal-run in the sorted token list;
    # integer `div` exactly as the aggregated form computed it. References
    # the materialized token attribute — the former form re-ran
    # split+filter twice inside this one expression (and interpolated the
    # raw text_col name into SQL, ADVICE r21 #2).
    top_token_ppm = F.expr(
        f"""CAST(aggregate(
              array_sort(`{_GATE_TOKS}`),
              struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
                     CAST(0 AS BIGINT) AS best),
              (acc, x) -> struct(
                x AS prev,
                IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)) AS run,
                GREATEST(acc.best,
                         IF(x <=> acc.prev, acc.run + 1,
                            CAST(1 AS BIGINT))) AS best),
              acc -> acc.best)
            * CAST(1000000 AS BIGINT)
            div size(`{_GATE_TOKS}`)
            AS BIGINT)"""
    )
    return base.select(
        "*",
        top_token_ppm.alias(_GATE_PPM),
        q["quality_score"].alias(_GATE_SCORE),
    )


def _gate_reason() -> Column:
    """The quality_filter reject-reason CASE over the attributes
    :func:`_with_gate_scalars` materializes — length gate, Gopher-style
    repetition gate, quality-score gate, language gate, in that fixed
    order. Pure attribute arithmetic: safe to inline many times."""
    best = _language_best_from(F.col(_GATE_TOKS), F.col(_GATE_STATS))
    predicted_lang = F.when(best["score"] > 0, best["lang"]).otherwise("und")
    return (
        F.when(F.size(F.col(_GATE_TOKS)) < FILTER_MIN_TOKENS, "too_short")
        .when(F.col(_GATE_PPM) >= FILTER_MAX_TOP_TOKEN_PPM, "repetitive")
        .when(F.col(_GATE_SCORE) < FILTER_MIN_QUALITY, "low_quality")
        .when(predicted_lang == "und", "unknown_lang")
        .otherwise("kept")
    )


def with_quality_keep(df: DataFrame, text_col: str = "text",
                      out_col: str = "_keep") -> DataFrame:
    """``df`` plus the row-local boolean keep decision of
    :func:`quality_filter` as ``out_col`` — the DataFrame-level form, so
    the gate rides the shared single-pass token projections. Zero-token
    and null-text rows evaluate False via the too_short gate (n_tokens
    <= 0 < FILTER_MIN_TOKENS), matching the rows the join form dropped."""
    base = _with_gate_scalars(df, text_col)
    return base.select(*df.columns, (_gate_reason() == "kept").alias(out_col))


def _quality_keep_expr(text_col: str) -> Column:
    """The boolean keep decision (``reason == 'kept'``: all four gates
    pass) as ONE self-contained expression in which each expensive
    sub-aggregate appears exactly once — the form for pure-FILTER
    consumers. A filter referencing the materialized gate attributes
    gets predicate-pushed below the projections, and every struct-field
    access then re-inlines its own copy of the producing aggregate
    (observed: 9 copies of the stopword aggregate in
    pipeline_pretrain_prep's pushed filter). Here the quality-score and
    language gates evaluate inside the stopword aggregate's FINISH
    lambda, where ``acc`` is a bound variable evaluated once; the
    language gate uses round(max_i count_i / n, 6) > 0, identical to
    best.score > 0 because round is monotone so max of rounded scores
    equals the rounded max."""
    langs = sorted(STOPWORDS)
    toks = f"filter(split(`{text_col}`, ' '), t -> t != '')"
    zero = ", ".join(["0 AS len"] + [f"0 AS {lang}" for lang in langs])
    upd = ", ".join(
        ["acc.len + length(x) AS len"]
        + [
            "acc.{0} + IF(x IN ({1}), 1, 0) AS {0}".format(
                lang, ", ".join(f"'{w}'" for w in STOPWORDS[lang])
            )
            for lang in langs
        ]
    )
    n = f"CAST(greatest(size({toks}), 1) AS DOUBLE)"
    score = (
        f"((0.4D * least(CAST(size({toks}) AS DOUBLE) / 50.0D, 1.0D))"
        f" + (0.3D * least((CAST(acc.en AS DOUBLE) / {n}) * 5.0D, 1.0D)))"
        f" + (0.3D * (1.0D - least((CAST(size(regexp_extract_all("
        f"`{text_col}`, '[^A-Za-z0-9 ]', 0)) AS DOUBLE)"
        f" / CAST(greatest(length(`{text_col}`), 1) AS DOUBLE)) * 10.0D,"
        f" 1.0D)))"
    )
    lang_max = "greatest(" + ", ".join(f"acc.{lang}" for lang in langs) + ")"
    ppm = f"""CAST(aggregate(
          array_sort({toks}),
          struct(CAST(NULL AS STRING) AS prev, CAST(0 AS BIGINT) AS run,
                 CAST(0 AS BIGINT) AS best),
          (acc, x) -> struct(
            x AS prev,
            IF(x <=> acc.prev, acc.run + 1, CAST(1 AS BIGINT)) AS run,
            GREATEST(acc.best,
                     IF(x <=> acc.prev, acc.run + 1,
                        CAST(1 AS BIGINT))) AS best),
          acc -> acc.best)
        * CAST(1000000 AS BIGINT)
        div size({toks})
        AS BIGINT)"""
    return F.expr(
        f"(size({toks}) >= {FILTER_MIN_TOKENS})"
        f" AND ({ppm} < {FILTER_MAX_TOP_TOKEN_PPM})"
        f" AND aggregate({toks}, struct({zero}),"
        f" (acc, x) -> struct({upd}),"
        f" acc -> (round({score}, 6) >= {FILTER_MIN_QUALITY!r}D)"
        f" AND (round(CAST({lang_max} AS DOUBLE) / {n}, 6) > 0.0D))"
    )


def quality_kept_rows(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """The input rows that pass :func:`quality_filter`'s keep decision —
    the join-free form of ``df ⋈ quality_filter(df).filter(keep)``.

    The keep predicate is row-local (see quality_filter), so selecting the
    surviving rows is ONE filter over the input: the r20 pipelines paid an
    id-keyed shuffle of the whole corpus on BOTH join sides to reattach
    the decision to the rows it was computed from. The filter is the
    single-expression form (:func:`_quality_keep_expr`) so pushdown
    cannot duplicate the gate aggregates. Row set and column order are
    identical to the join form (the join keyed on ``id_col`` led with
    it; so does this select); the former explicit zero-token filter is
    subsumed by the too_short gate (0 < FILTER_MIN_TOKENS) and NULL text
    evaluates the predicate to NULL, which the filter drops exactly as
    the old 'unknown_lang' reason did."""
    others = [c for c in df.columns if c != id_col]
    return df.filter(_quality_keep_expr(text_col)).select(id_col, *others)


# The Gopher / MassiveText document-filter rule set (Rae et al. 2021,
# "Scaling Language Models: ... Gopher", Appendix A1.1), the named filter
# battery most open pretraining pipelines (RedPajama, Dolma, FineWeb)
# re-implement. Bounds below are the published ones.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3
GOPHER_MAX_MEAN_WORD_LEN = 10
# Gopher requires >= 2 of these 8 stopwords to appear in the document
GOPHER_REQUIRED_STOPS = ["the", "be", "to", "of", "and", "that", "have",
                         "with"]


def gopher_rules(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document evaluation of the Gopher quality-filter rule battery
    (Rae et al. 2021 A1.1) — every rule an integer predicate, reported as
    a bitmask so the externally hash-checked answer pins each individual
    rule for every document, not just the final keep.

    Rules (bit i set = rule passed):
      0: word count in [GOPHER_MIN_WORDS, GOPHER_MAX_WORDS]
      1: mean word length in [3, 10]      (cross-multiplied: no division)
      2: symbol-to-word ratio < 0.1       ('#' chars + '...' occurrences)
      3: < 90% of lines start with a bullet ('-' or '*')
      4: < 30% of lines end with an ellipsis
      5: >= 80% of words contain an alphabetic character
      6: >= 2 of the 8 required stopwords appear

    All ratio thresholds compare as integer cross-products (e.g.
    10*symbols < words), so the oracle replays bit-exactly — no float
    exists anywhere. One narrow projection, no shuffle at all: the whole
    battery is a row-local select that pushes down to the parquet scan
    and stays inside whole-stage codegen at any corpus size.
    Returns (doc_id, n_words, word_chars, rules_mask, keep)."""
    words = tokens_col(F.col(text_col))
    n_words = F.size(words).cast("long")
    word_chars = F.aggregate(
        F.transform(words, lambda w: F.length(w).cast("long")),
        F.lit(0).cast("long"), lambda acc, v: acc + v,
    )
    txt = F.col(text_col)
    n_hash = (F.length(txt) - F.length(F.replace(txt, F.lit("#")))).cast("long")
    n_ellipsis = (
        (F.length(txt) - F.length(F.replace(txt, F.lit("...")))) / 3
    ).cast("long")
    lines = F.split(txt, "\n")
    n_lines = F.size(lines).cast("long")
    n_bullet = F.size(F.filter(
        lines, lambda l: l.startswith("-") | l.startswith("*")
    )).cast("long")
    n_ell_end = F.size(F.filter(lines, lambda l: l.endswith("..."))).cast("long")
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))).cast("long")
    n_req_stops = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPS]),
        lambda s: F.array_contains(words, s),
    )).cast("long")

    r = [
        (n_words >= GOPHER_MIN_WORDS) & (n_words <= GOPHER_MAX_WORDS),
        (word_chars >= GOPHER_MIN_MEAN_WORD_LEN * n_words)
        & (word_chars <= GOPHER_MAX_MEAN_WORD_LEN * n_words),
        (n_hash + n_ellipsis) * 10 < n_words,
        n_bullet * 10 < n_lines * 9,
        n_ell_end * 10 < n_lines * 3,
        n_alpha * 5 >= n_words * 4,
        n_req_stops >= 2,
    ]
    mask = r[0].cast("long")
    for i, cond in enumerate(r[1:], start=1):
        mask = mask + cond.cast("long") * (1 << i)
    keep = r[0]
    for cond in r[1:]:
        keep = keep & cond
    return df.select(
        F.col(id_col).cast("long").alias("doc_id"),
        n_words.alias("n_words"),
        word_chars.alias("word_chars"),
        mask.alias("rules_mask"),
        keep.cast("long").alias("keep"),
    )


def tfidf_doc_scores(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Corpus-relative rarity score per document: mean inverse document
    frequency (ln(N/df)) over the doc's distinct tokens.

    The standard "is this document unusual for the corpus" signal in
    pretraining pipelines. Two aggregations: token->df (map-side combined),
    then per-doc mean over an equi-join on token — no cross joins, both
    shuffles keyed on token/doc. Returns (id, n_distinct_tokens, mean_idf).
    """
    toks = (
        df.select(F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("tk"))
        .select("id", F.explode(F.array_distinct("tk")).alias("tok"))
    )
    n_docs = df.count()
    doc_freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = doc_freq.withColumn("idf", F.log(F.lit(float(n_docs)) / F.col("df")))
    return (
        toks.join(idf, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_distinct_tokens"),
            F.round(F.avg("idf"), 6).alias("mean_idf"),
        )
    )


def unigram_logprob_scores(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id") -> DataFrame:
    """Perplexity-proxy filter (the CCNet-style LM quality signal with the
    corpus itself as the unigram model): per-doc mean negative log
    probability of its tokens under corpus unigram frequencies. Unusually
    improbable docs (high mean NLL) are the ones a real LM filter drops.

    Same two-shuffle shape as tfidf_doc_scores: token->count aggregate
    (map-side combined), then an equi-join back onto the doc's tokens and a
    per-doc mean — corpus-linear, no cross joins. The total-token count is
    a 1-row aggregate broadcast into the probability expression.
    Returns (id, n_tokens, mean_nll), NLL rounded at 6.
    """
    toks = df.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("tk")
    ).select("id", F.explode("tk").alias("tok"))
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("_total"))
    nll = freq.join(F.broadcast(total)).select(
        "tok", (-F.log(F.col("c") / F.col("_total"))).alias("nll")
    )
    return (
        toks.join(nll, "tok")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("nll"), 6).alias("mean_nll"),
        )
    )


def contamination_check(docs: DataFrame, probes: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        probe_id: str = "probe_id",
                        probe_text: str = "probe") -> DataFrame:
    """Benchmark-contamination scan: which documents contain which probe
    strings (eval-set fragments) as exact substrings.

    The probe set is tiny next to the corpus — broadcast it; each doc row
    tests all probes in one codegen'd pass (contains), so the corpus is
    scanned once regardless of probe count. For huge probe sets, switch to
    the shingle-hash join in dedup.jaccard_pairs instead.
    Returns (doc_id, probe_id).
    """
    p = F.broadcast(
        probes.select(F.col(probe_id), F.col(probe_text).alias("_probe"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t"))
        .crossJoin(p)
        .filter(F.col("_t").contains(F.col("_probe")))
        .select("doc_id", probe_id)
    )


def decontaminate_rows(docs: DataFrame, probes: DataFrame,
                       text_col: str = "text",
                       probe_text: str = "probe") -> DataFrame:
    """Rows of ``docs`` containing NONE of the probe strings — the
    survivor form of :func:`contamination_check`.

    One broadcast anti-join pass: the r20 pipelines materialized the
    match list (broadcast nested scan), DISTINCTed it, then shuffled the
    corpus through an id-keyed anti-join — and referenced the corpus
    lineage twice. The per-row work (test every probe against every doc)
    is identical; the corpus-sized shuffle and the second lineage
    computation are gone. Same survivor set by construction: a row is
    dropped iff at least one probe is contained."""
    p = F.broadcast(probes.select(F.col(probe_text).alias("_probe")))
    return docs.join(
        p, F.col(text_col).contains(F.col("_probe")), "left_anti"
    )


# Email shape both regex engines (Java util.regex, DuckDB RE2) parse the
# same way — no lookarounds, no unicode classes.
EMAIL_REGEX = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_EMAIL_TOKEN = "<EMAIL>"


def redact_emails(text: Column) -> Column:
    """PII scrub: replace every email address with a redaction token.
    regexp_replace replaces ALL matches in both Spark and DuckDB('g')."""
    return F.regexp_replace(text, EMAIL_REGEX, PII_EMAIL_TOKEN)


def count_emails(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(EMAIL_REGEX), F.lit(0)))


def repetition_features(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Gopher-style repetition signals per document: the share of tokens
    taken by the single most frequent token / bigram, and the fraction of
    trigram occurrences that are duplicates. High values mark boilerplate
    and degenerate generations — the standard pretraining repetition filter.

    Shape: one explode per n-gram size feeding (id, gram) hash-aggregates
    with map-side partial counts, then a per-id max — all shuffles keyed on
    id, corpus-size-linear. Returns (id, n_tokens, top_token_frac,
    top_bigram_frac, dup_trigram_frac), ratios rounded at 6.
    """
    from .caching import key_parallel

    base = key_parallel(
        df.select(
            F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("tk")
        ),
        "id",
    )

    def gram_stats(n: int, out_prefix: str) -> DataFrame:
        grams = base.select(
            "id",
            F.explode(
                F.when(
                    F.size("tk") >= n,
                    F.transform(
                        F.sequence(F.lit(0), F.size("tk") - n),
                        lambda i: F.concat_ws(" ", F.slice(F.col("tk"), i + 1, n)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("gram"),
        )
        per_gram = grams.groupBy("id", "gram").agg(
            F.count(F.lit(1)).alias("c")
        )
        return per_gram.groupBy("id").agg(
            F.sum("c").alias(f"{out_prefix}_total"),
            F.max("c").alias(f"{out_prefix}_top"),
            F.count(F.lit(1)).alias(f"{out_prefix}_distinct"),
        )

    uni = gram_stats(1, "t1")
    bi = gram_stats(2, "t2")
    tri = gram_stats(3, "t3")
    # ratios as integer parts-per-million via integer division: a rounded
    # double ratio of small ints can land on a cross-engine rounding tie
    # (the logs_error_rate lesson); integers can't.
    ppm = "CAST({num} * CAST(1000000 AS BIGINT) div {den} AS BIGINT)"
    return (
        uni.join(bi, "id", "left")
        .join(tri, "id", "left")
        .select(
            "id",
            F.col("t1_total").alias("n_tokens"),
            F.expr(ppm.format(num="t1_top", den="t1_total")).alias(
                "top_token_ppm"
            ),
            F.coalesce(
                F.expr(ppm.format(num="t2_top", den="t2_total")),
                F.lit(0).cast("bigint"),
            ).alias("top_bigram_ppm"),
            F.coalesce(
                F.expr(ppm.format(num="(t3_total - t3_distinct)", den="t3_total")),
                F.lit(0).cast("bigint"),
            ).alias("dup_trigram_ppm"),
        )
    )


def kmv_distinct_tokens(df: DataFrame, k: int = 64, text_col: str = "text") -> DataFrame:
    """KMV (k-minimum-values) distinct-token sketch over the corpus.

    Unlike HLL, KMV is exactly reproducible across engines: hash every
    distinct token with the shared md5-prefix hash, keep the k smallest, and
    estimate |distinct| as (k-1) * U / h_(k) over the 32-bit universe. The
    k-min set plans as TakeOrdered (per-partition top-k, O(k) to the
    driver) and is trivially mergeable — at 100 TB each partition/day keeps
    its own k-mins and the union re-sketches. Returns one row:
    (k_used, kth_min_hash, est_distinct, exact_distinct) — integers only,
    no float-tie exposure.
    """
    hashes = (
        df.select(F.explode(tokens_col(F.col(text_col))).alias("tok"))
        .select(md5_long(F.col("tok")).alias("h"))
        .distinct()
    )
    kmin = hashes.orderBy("h").limit(k)
    return kmin.agg(
        F.count(F.lit(1)).alias("k_used"),
        F.max("h").alias("kth_min_hash"),
        F.expr(
            f"CAST((count(1) - 1) * CAST(4294967296 AS BIGINT) div max(h) "
            f"AS BIGINT)"
        ).alias("est_distinct"),
    ).crossJoin(
        hashes.agg(F.count(F.lit(1)).alias("exact_distinct"))
    )


def kmv_intersection(a: DataFrame, b: DataFrame, val_col: str,
                     k: int = 64) -> DataFrame:
    """Theta-sketch-style SET OPERATIONS on two KMV sketches — the
    distinct-count algebra HLL cannot do: estimate |A ∪ B| AND |A ∩ B|
    from two k-minimum-value sketches (Dasgupta et al. 2016, the theta
    sketch framework; KMV is its fixed-k instance).

    Both sides hash their distinct values with the shared md5-prefix
    hash. The union's k smallest values are necessarily each in their
    own side's k-min set, so the union sketch re-sketches ka ∪ kb;
    theta = its kth value. The intersection estimator counts hash
    values BOTH sketches retained below theta (n_both) and scales:
    est_inter = n_both · est_union // k. Everything is integer
    arithmetic over exactly-reproducible hashes — no float, no
    engine-dependent ties. Exact counts ship alongside so the carrier
    pins estimator accuracy, not just plumbing (at production scale the
    exact intersection is the expensive join the sketch replaces —
    it is computed here as the evaluation truth).

    Cost shape: each sketch is a TakeOrdered (per-partition top-k, O(k)
    to the driver-side merge); sketch-vs-sketch work is O(k). Returns
    one row: (k_used, theta, n_both, est_union, est_intersection,
    exact_a, exact_b, exact_intersection)."""
    U = 4_294_967_296  # 32-bit hash universe of the md5-prefix hash
    ha = a.select(md5_long(F.col(val_col).cast("string")).alias("h")).distinct()
    hb = b.select(md5_long(F.col(val_col).cast("string")).alias("h")).distinct()
    ka = ha.orderBy("h").limit(k)
    kb = hb.orderBy("h").limit(k)
    ku = ka.union(kb).distinct().orderBy("h").limit(k)
    usk = ku.agg(
        F.count(F.lit(1)).cast("long").alias("k_used"),
        F.max("h").alias("theta"),
        F.expr(
            f"CAST((count(1) - 1) * CAST({U} AS BIGINT) div max(h) "
            f"AS BIGINT)"
        ).alias("est_union"),
    )
    both = (
        ka.join(kb, "h")
        .crossJoin(usk.select("theta"))
        .filter(F.col("h") <= F.col("theta"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_both"))
    )
    exact = (
        ha.agg(F.count(F.lit(1)).cast("long").alias("exact_a"))
        .crossJoin(hb.agg(F.count(F.lit(1)).cast("long").alias("exact_b")))
        .crossJoin(
            ha.join(hb, "h").agg(
                F.count(F.lit(1)).cast("long").alias("exact_intersection")
            )
        )
    )
    return (
        usk.crossJoin(both)
        .crossJoin(exact)
        .select(
            "k_used", "theta", "n_both", "est_union",
            F.expr(
                "CAST(n_both * est_union div k_used AS BIGINT)"
            ).alias("est_intersection"),
            "exact_a", "exact_b", "exact_intersection",
        )
    )


def chunk_documents(df: DataFrame, chunk_tokens: int, overlap: int = 0,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split documents into fixed-token-count chunks with optional overlap —
    the context-window packing step before tokenization/training.

    Pure Column expressions: one sequence+transform builds the chunk starts,
    one explode emits (doc, chunk) rows; the token array slices per chunk
    without re-splitting the text. Shuffle-free (narrow) — chunk rows stay
    in their document's partition, so a 100 TB corpus chunks in a single
    map stage. Returns (id, chunk_id, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    starts = F.sequence(
        F.lit(0),
        F.greatest(
            F.floor(
                (F.size(F.col("tk")) - 1 - F.lit(overlap)) / F.lit(stride)
            ),
            F.lit(0),
        ).cast("int"),
    )
    return (
        df.select(
            F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("tk")
        )
        .filter(F.size("tk") > 0)
        .select("id", "tk", F.explode(starts).alias("chunk_id"))
        .select(
            "id",
            "chunk_id",
            F.slice(
                F.col("tk"), F.col("chunk_id") * stride + 1, chunk_tokens
            ).alias("chunk"),
        )
        .select(
            "id",
            "chunk_id",
            F.size("chunk").alias("n_chunk_tokens"),
            F.concat_ws(" ", "chunk").alias("chunk_text"),
        )
    )


def fingerprints(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", n: int = FINGERPRINT_NGRAM) -> DataFrame:
    """Document fingerprint: min/max/count over hashed word n-grams (the
    1-permutation MinHash / winnowing-style rolling summary).
    Returns (id, fp_min, fp_max, n_shingles)."""
    # cheap token-count guard instead of size(sh) — a predicate on the built
    # array re-evaluates the whole shingle expression in the pushed filter
    sh = df.filter(F.size(tokens_col(F.col(text_col))) >= n).select(
        F.col(id_col).alias("id"),
        shingles_col(F.col(text_col), n).alias("sh"),
    )
    hashes = sh.select(
        "id", F.transform(F.col("sh"), lambda s: md5_long(s)).alias("hs")
    )
    return hashes.select(
        "id",
        F.array_min("hs").alias("fp_min"),
        F.array_max("hs").alias("fp_max"),
        F.size("hs").alias("n_shingles"),
    )


# --- Bloom-filter decontamination -------------------------------------------
# A benchmark n-gram Bloom filter is the constant-size alternative to the
# exact anti-join (contamination_check): the filter is m bits regardless of
# benchmark size, so at 100 TB it rides along as a broadcast instead of a
# join side.  The distributed formulation below keeps Bloom SEMANTICS (k
# salted hashes per n-gram, membership = every position set, false positives
# possible) without materializing a bitset: the benchmark's set positions
# form a tiny distinct-position table (<= m rows), broadcast to the corpus,
# and an n-gram is flagged iff all k of its positions match.
BLOOM_M = 4096  # filter bits
BLOOM_K = 3     # hash functions per n-gram (double-hashed, 2 md5s total)


def _bloom_pos(shingle: Column, j: int, m: int) -> Column:
    """Position j via Kirsch-Mitzenmacher double hashing: g_j = h1 + j*h2
    (mod m) gives k Bloom-quality hash functions from TWO md5 evaluations
    instead of k — the standard trick, and a third less hashing on the
    corpus-side probe.  h1, h2 < 2^32 so h1 + j*h2 stays far inside int64."""
    h1 = md5_long(F.concat(F.lit("a:"), shingle))
    h2 = md5_long(F.concat(F.lit("b:"), shingle))
    return (h1 + j * h2) % m


def bloom_position_rows(
    shingled: DataFrame, m: int = BLOOM_M, k: int = BLOOM_K
) -> DataFrame:
    """(id, shingle) -> (id, shingle, salt, pos): the k Bloom bit positions
    of every shingle (the oracle SQL computes the identical positions)."""
    salted = F.array(
        *[
            F.struct(
                F.lit(j).alias("salt"),
                _bloom_pos(F.col("shingle"), j, m).alias("pos"),
            )
            for j in range(k)
        ]
    )
    return shingled.select(
        "id", "shingle", F.explode(salted).alias("sp")
    ).select("id", "shingle", "sp.salt", "sp.pos")


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m: int = BLOOM_M,
    k: int = BLOOM_K,
) -> DataFrame:
    """Flag corpus documents whose word n-grams hit a Bloom filter built
    from the benchmark set (the scalable eval-decontamination pass; see
    e.g. the n-gram overlap filters in GPT-3 / PaLM dataset reports).

    Build: distinct Bloom bit positions over the benchmark's n-grams,
    collapsed to an m-element bit array on the driver (the filter itself —
    m bits total, the whole point of Bloom at 100 TB) and shipped to every
    task as a broadcast literal.  Probe: a pure NARROW map — each document
    tests its shingles' k positions against the array and counts in-place;
    no explode, no join, no shuffle beyond the source partitioning.  False
    positives are inherent Bloom behavior and deterministic here (same
    hashes both engines).

    Returns (doc_id, n_shingles, n_flagged) for every document with at
    least ``n`` tokens.
    """
    from .dedup import shingles_col

    bench_bits = (
        bloom_position_rows(
            benchmark.select(
                F.col(id_col).alias("id"), F.col(text).alias("t")
            )
            .select("id", F.explode(shingles_col(F.col("t"), n)).alias("shingle")),
            m,
            k,
        )
        .select("pos")
        .distinct()
        .collect()
    )
    # pack the m bits into 16-bit words: a plain python list literal becomes
    # a CreateArray of one node PER ELEMENT, so literal size is plan-build
    # cost — 4096 unpacked bits cost ~2.5s of py4j + optimizer time per
    # query, 256 packed words are negligible. 16-bit words keep the
    # variable-exponent bit test exact in double arithmetic.
    words = [0] * ((m + 15) // 16)
    for r in bench_bits:
        words[r.pos // 16] |= 1 << (r.pos % 16)
    wlit = F.lit(words)

    def _bit_set(pos: Column) -> Column:
        word = F.element_at(wlit, (pos / 16).cast("int") + 1)
        bit = F.floor(
            word / F.pow(F.lit(2.0), (pos % 16).cast("double"))
        ) % 2
        return bit == 1

    def _hashes(s: Column) -> Column:
        # h1/h2 computed ONCE per shingle; the k probe positions derive from
        # them arithmetically (double hashing), so md5 runs 2x per shingle
        # regardless of k
        return F.struct(
            md5_long(F.concat(F.lit("a:"), s)).alias("h1"),
            md5_long(F.concat(F.lit("b:"), s)).alias("h2"),
        )

    def _shingle_set(h: Column) -> Column:
        tests = [
            _bit_set((h["h1"] + d * h["h2"]) % m) for d in range(k)
        ]
        cond = tests[0]
        for t in tests[1:]:
            cond = cond & t
        return F.when(cond, 1).otherwise(0)

    sh = shingles_col(F.col(text), n)
    flags = F.transform(F.transform(sh, _hashes), _shingle_set)
    from .dedup import tokens_col

    # filter on the CHEAP token count (shingles are empty iff tokens < n) so
    # the predicate that predicate-pushdown moves below the exchange is the
    # split, not the full shingle build — filtering on size(sh) would push
    # the whole O(shingles) expression into the single-file scan task AND
    # re-evaluate it after the exchange
    docs = docs.filter(F.size(tokens_col(F.col(text))) >= n)
    # corpus files are few/large and the probe is CPU-bound: spread rows to
    # cluster width or the narrow map runs at input-file parallelism
    parallelism = docs.sparkSession.sparkContext.defaultParallelism
    if docs.rdd.getNumPartitions() < parallelism:
        docs = docs.repartition(parallelism)
    return docs.select(
        F.col(id_col),
        F.size(sh).cast("long").alias("n_shingles"),
        F.aggregate(flags, F.lit(0), lambda acc, v: acc + v)
        .cast("long")
        .alias("n_flagged"),
    )


# --- count-min sketch frequency estimation ----------------------------------
# The fixed-size answer to "how often does this token appear in 100 TB":
# a (depth x width) counter grid where every occurrence increments one
# counter per row (salted hash), and an estimate reads the MINIMUM of its
# depth counters (Cormode & Muthukrishnan 2005). Counters are pure keyed
# counts here, so the sketch builds map-side-combined in one aggregate and
# is mergeable across partitions/days by simple addition.
CMS_WIDTH = 512
CMS_DEPTH = 3


def cms_counters(
    tokens: DataFrame,
    token_col: str = "tok",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Build the sketch: (d, pos, cnt) counter rows — at most depth*width of
    them regardless of corpus size. Position d of a token is
    md5("<d>:" + token) % width (salt prefix = independent hash per row,
    identical in the oracle SQL)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    md5_long(F.concat(F.lit(f"{d}:"), F.col(token_col)))
                    % width
                ).alias("pos"),
            )
            for d in range(depth)
        ]
    )
    return (
        tokens.select(F.explode(cells).alias("c"))
        .select("c.d", "c.pos")
        .groupBy("d", "pos")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    keys: DataFrame,
    counters: DataFrame,
    key_col: str = "tok",
    width: int = CMS_WIDTH,
    depth: int = CMS_DEPTH,
) -> DataFrame:
    """Point-estimate frequencies for ``keys`` from a built sketch: join each
    key's depth positions against the (broadcast, <= depth*width-row) counter
    table and take the per-key minimum. Estimates never undercount; collisions
    only inflate. Adds ``cms_est`` to the key rows.

    The counter join is a LEFT join with absent cells coalesced to 0: a key
    the sketch never saw touches (d, pos) cells with no counter row, and CMS
    point-estimate semantics require those to read as zero — an inner join
    would silently drop the key (and a partial hit would min over only the
    populated subset, inflating the estimate)."""
    cells = F.array(
        *[
            F.struct(
                F.lit(d).alias("d"),
                (
                    md5_long(F.concat(F.lit(f"{d}:"), F.col(key_col)))
                    % width
                ).alias("pos"),
            )
            for d in range(depth)
        ]
    )
    probed = keys.select(
        F.col(key_col), F.explode(cells).alias("c")
    ).select(key_col, "c.d", "c.pos")
    return (
        probed.join(F.broadcast(counters), ["d", "pos"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_est"))
    )


# --- HyperLogLog distinct sketch (engine-exact) ------------------------------
# A register-level-deterministic HLL (Flajolet et al. 2007): md5-derived
# 32-bit hashes, p leading bits pick the register, rho = position of the
# first set bit in the remaining 24. Every piece is exact integer/power-of-2
# arithmetic (the 2^-rho harmonic sum is EXACT in doubles — all partial sums
# fit one mantissa), so the estimate is bit-identical cross-engine and
# hash-checkable, unlike approx_count_distinct's opaque native sketch.
# Registers are mergeable by max() — the 100 TB union story.
HLL_P = 8
HLL_M = 1 << HLL_P          # 256 registers
HLL_W = 32 - HLL_P          # 24 value bits per hash
# alpha_m for m=256: 0.7213 / (1 + 1.079/m) — embedded as one literal so the
# oracle SQL uses the identical constant
HLL_ALPHA = 0.7213 / (1 + 1.079 / 256.0)


def _hll_rho(w: Column) -> Column:
    """Position of the first set bit of the 24-bit value (1-based from the
    MSB); 0-value hashes take rho = 25. A chain of integer comparisons —
    no float log2, whose floor sits on a cross-engine rounding boundary."""
    expr = F.when(w == 0, HLL_W + 1)
    for r in range(1, HLL_W + 1):
        expr = expr.when(w >= (1 << (HLL_W - r)), r)
    return expr


def hll_registers(
    values: DataFrame, value_col: str = "tok", p: int = HLL_P
) -> DataFrame:
    """Build the register table: (idx, rho) with rho = max over hashed
    values landing in the register. One keyed max-aggregate (map-side
    combined); at most 2^p rows out regardless of input size."""
    m = 1 << p
    wbits = 32 - p
    h = md5_long(F.col(value_col))
    return (
        values.select(
            (h / (1 << wbits)).cast("int").alias("idx"),
            (h % (1 << wbits)).alias("w"),
        )
        .select("idx", _hll_rho(F.col("w")).alias("r"))
        .groupBy("idx")
        .agg(F.max("r").alias("rho"))
    )


def exact_ngram_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    text: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram eval-set decontamination — the zero-false-positive
    companion to :func:`bloom_decontaminate` (same GPT-3/PaLM-style overlap
    rule, reference dataset reports): count each corpus document's distinct
    word n-grams that literally occur in the benchmark set.

    Scale shape: eval sets are MBs against a 100 TB corpus, so the
    benchmark's distinct hashed n-grams BROADCAST and flagging is a
    map-side join — the corpus never shuffles for the probe (only for its
    own per-document aggregation, which is keyed on ``id_col`` and
    map-side-combined).

    ``max_df`` is the hot-n-gram cap: benchmark n-grams whose CORPUS
    document frequency exceeds it are dropped from the contamination set
    (ubiquitous phrases would flag half the corpus; excluding them is the
    standard contamination-set hygiene). Computing that frequency is itself
    benchmark-restricted — corpus n-grams are semi-joined to the broadcast
    benchmark set BEFORE grouping, so the aggregate holds at most
    |benchmark n-grams| keys no matter the corpus size.

    Returns (``id_col``, n_shingles, n_contaminated) for documents with at
    least ``n`` tokens.
    """
    def grams(df: DataFrame, keep_id: bool) -> DataFrame:
        cols = [F.col(id_col).alias("id")] if keep_id else []
        g = df.select(
            *cols, F.explode(shingles_col(F.col(text), n)).alias("g")
        )
        return g.select(*(["id"] if keep_id else []), md5_long(F.col("g")).alias("h"))

    bench = grams(benchmark, keep_id=False).distinct()
    corpus = grams(docs, keep_id=True)  # shingles_col is already distinct-per-doc
    if max_df is not None:
        live = (
            corpus.join(F.broadcast(bench), "h", "left_semi")
            .groupBy("h")
            .agg(F.count(F.lit(1)).alias("_df"))  # 1 row/doc/gram -> doc freq
            .filter(F.col("_df") <= max_df)
            .select("h")
        )
        bench = live
    hit = bench.withColumn("_hit", F.lit(1))
    return (
        corpus.join(F.broadcast(hit), "h", "left")
        .groupBy(F.col("id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).alias("n_contaminated"),
        )
    )


def bigram_logprob_scores(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Bigram LM perplexity proxy — one order up from
    :func:`unigram_logprob_scores`: per-doc mean negative log probability of
    each token given its predecessor under add-1-smoothed corpus bigram
    frequencies, p(w_i | w_{i-1}) = (c(prev,cur) + 1) / (c(prev) + V).
    The sharper quality signal of the two: word-salad documents look fine
    to a unigram model but improbable to a bigram one.

    Bigrams come from zipping the token array against itself shifted by
    one — a NARROW per-row transform, no positional self-join. Counting is
    two keyed aggregates (bigram, unigram), both map-side combined; the
    vocabulary size is a 1-row broadcast; scoring joins the doc's bigrams
    to the model equi-keyed. Corpus-linear, same two-shuffle shape as
    TF-IDF. Returns (id, n_bigrams, mean_nll) for docs with >= 2 tokens,
    NLL rounded at 6.
    """
    tk = tokens_col(F.col(text_col))
    pairs = F.arrays_zip(
        F.slice(tk, 1, F.size(tk) - 1),
        F.slice(tk, 2, F.size(tk) - 1),
    )
    bg = (
        df.filter(F.size(tk) >= 2)
        .select(F.col(id_col).alias("id"), F.explode(pairs).alias("p"))
        .select("id", F.col("p.0").alias("prev"), F.col("p.1").alias("cur"))
    )
    toks = df.select(F.explode(tk).alias("tok"))
    uc = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("cu"))
    vocab = uc.agg(F.count(F.lit(1)).alias("_v"))
    bc = bg.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("cb"))
    nll = (
        bc.join(uc, bc.prev == uc.tok)
        .crossJoin(F.broadcast(vocab))
        .select(
            "prev", "cur",
            (-F.log((F.col("cb") + 1) / (F.col("cu") + F.col("_v")))).alias(
                "nll"
            ),
        )
    )
    return (
        bg.join(nll, ["prev", "cur"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 6).alias("mean_nll"),
        )
    )


def edit_distance_pairs(
    strings: DataFrame,
    col: str = "s",
    max_neighbors: "int | None" = None,
) -> DataFrame:
    """SymSpell-style edit-distance<=1 pair mining via deletion-neighborhood
    bucketing (Garbe's SymSpell, the spell-correction-join standard): each
    distinct string explodes into itself plus its single-character
    deletions, and any pair at Levenshtein distance <= 1 — substitution,
    insertion, or deletion — is guaranteed to share at least one variant
    key, so candidates come from an ordinary keyed equi-join, never the
    quadratic all-pairs cross join (that form is only the oracle double).
    Returns (s_a, s_b, dist) with s_a < s_b.

    Scale shape: variant fan-out is len per string (bounded by string
    length), and the candidate join is POSITION-SHARDED: an insertion/
    deletion pair collides as (whole string = deletion variant), while a
    substitution pair shares the deletion variant AT THE SAME POSITION —
    so del-del candidates join on (variant, position) instead of variant
    alone, splitting the hot buckets a digit-dense corpus produces (all
    names differing in one digit share every other-position deletion).
    The join keys are ``xxhash64`` of the variant (8-byte longs, not the
    ~len-byte variant strings — r20: cuts the shuffled key bytes several-
    fold on long strings), and every candidate is re-verified EXACTLY with
    two row-local substring equalities, so a 64-bit collision can neither
    emit a false pair nor duplicate a true one:

      * subst (keys (h(del(s,p)), p), da.s < db.s): the verify
        ``prefix(p-1) equal AND suffix(p+1..) equal`` holds iff the two
        strings agree everywhere except position p — equal-length dist-1
        exactly (unequal lengths force unequal suffix lengths), and a
        true pair passes at exactly ONE p (its differing position), so
        no pair-level distinct is needed;
      * indel (keys h(s) vs h(del(s,p))): the verify reconstructs
        ``del(b.s, p) == a.s`` character-wise. Repeated-letter runs,
        whose every in-run deletion yields the same variant, are
        collapsed row-locally BEFORE the join by keeping only the first
        position of each run (``p == 1 or s[p-1] != s[p]``), so each
        true insertion pair arises exactly once.

    A true pair is never lost (equal variants hash equal), so the exact-
    levenshtein filter and the global pair ``distinct()`` (formerly the
    largest shuffle here) stay dropped.

    ``max_neighbors`` (r20, VERDICT r19 #5): optional per-anchor candidate
    cap — for each ``s_a`` keep the ``max_neighbors`` lexicographically
    smallest ``s_b``. Dense corpora (digit-keyed IDs, replicated shards)
    grow NEIGHBORS per string with corpus size, so the uncapped output is
    super-linear even though the candidate join is linear (measured 12.6x
    pairs at 10x corpus, BENCH_SF1 r19); the cap bounds output to
    ``max_neighbors * |strings|`` — linear — and is deterministic (lexical
    order), so an oracle can mirror it with a plain row_number window."""
    from .caching import key_parallel

    # key_parallel right after the distinct: AQE size-coalesces the
    # distinct's output to ~1 partition (a string set is tiny in bytes),
    # and everything BETWEEN that exchange and the next — the deletion
    # explode, the variant hashing — would run serially in that one task
    # (measured 1-task stages at sf1, r20). The explicit width keeps the
    # expansion wide; the join keys (h, p) then partition the candidate
    # join + substring verify at the same width.
    s = key_parallel(strings.select(F.col(col).alias("s")).distinct(), "s")
    # one row per (string, 1-based deletion position); the variant string
    # itself never leaves the projection — only its 64-bit hash is joined.
    # Partitioned on h ALONE (not (h, p)): HashPartitioning(h) satisfies
    # the clustering requirement of BOTH downstream joins — (h) for indel
    # and (h, p) for subst, since h ⊆ {h, p} — so this single exchange is
    # written once and ReusedExchange serves every join side (verified:
    # 3 ReusedExchange nodes in the executed sf1 plan), where keying on
    # (h, p) forced a second full re-exchange on the indel branch.
    # length(s) > 0 guard (ADVICE r20): sequence(1, 0) on an EMPTY string
    # yields the DESCENDING [1, 0], so '' entered the deletion table and
    # the pair ('', x) passed BOTH the indel and subst verifies —
    # duplicate emission (and a wasted cap slot under max_neighbors).
    # Empty strings can only pair via the indel identity side, which
    # still carries them.
    dels = key_parallel(
        s.filter(F.length("s") > 0).select(
            "s", F.explode(F.sequence(F.lit(1), F.length("s"))).alias("p")
        ).select(
            "s",
            "p",
            F.xxhash64(
                F.concat(
                    F.col("s").substr(F.lit(1), F.col("p") - 1),
                    F.col("s").substr(F.col("p") + 1, F.length("s")),
                )
            ).alias("h"),
        ),
        "h",
    )
    # insertion/deletion pairs: one string IS a deletion of the other.
    # Run-collapse keeps one deletion position per repeated-letter run.
    # SHUFFLE_HASH on both joins: the static planner's size estimate for
    # an explode subtree is unreliable and was observed (r20) picking a
    # BROADCAST build of the corpus-sized VARIANT side — a driver OOM at
    # 100 TB and 4x recomputation of the scan→distinct→explode subtree at
    # any scale (broadcast conversion defeats exchange reuse). With both
    # sides exchanged on the join keys, the self-join reuses ONE exchange
    # and the build side stays bounded per task; AQE may still downgrade
    # to broadcast from MEASURED stats, which is scale-safe by definition.
    ident = s.select(F.col("s").alias("t"), F.xxhash64("s").alias("h"))
    dcanon = dels.where(
        (F.col("p") == 1)
        | (F.expr("substring(s, p - 1, 1) <> substring(s, p, 1)"))
    )
    indel = ident.alias("a").join(
        dcanon.alias("b").hint("shuffle_hash"), F.col("a.h") == F.col("b.h")
    ).where(
        F.expr("substring(b.s, 1, b.p - 1) = substring(a.t, 1, b.p - 1)")
        & F.expr("substring(b.s, b.p + 1) = substring(a.t, b.p)")
    ).select(
        F.least("a.t", "b.s").alias("s_a"),
        F.greatest("a.t", "b.s").alias("s_b"),
    )
    # substitution pairs: same deletion variant at the same position.
    # Both self-join sides carry the hint so their subtrees stay
    # plan-identical (a one-sided hint was observed breaking exchange
    # reuse by de-canonicalizing one side).
    da = dels.hint("shuffle_hash").alias("da")
    db = dels.hint("shuffle_hash").alias("db")
    subst = da.join(
        db,
        (F.col("da.h") == F.col("db.h"))
        & (F.col("da.p") == F.col("db.p"))
        & (F.col("da.s") < F.col("db.s")),
    ).where(
        F.expr("substring(da.s, 1, da.p - 1) = substring(db.s, 1, db.p - 1)")
        & F.expr("substring(da.s, da.p + 1) = substring(db.s, db.p + 1)")
    ).select(F.col("da.s").alias("s_a"), F.col("db.s").alias("s_b"))
    pairs = indel.unionAll(subst)
    if max_neighbors is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("s_a").orderBy("s_b")
        pairs = (
            key_parallel(pairs, "s_a")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= max_neighbors)
            .drop("rn")
        )
    # Measured (BENCH_SF1 protocol, r20): 15k names 1.13s / 150k names
    # 3.95s, ratio 3.5 at 10x input with output pinned linear by the cap
    # (118k -> 1.197M pairs, exactly 10.1x); the r19 uncapped form was
    # 13.5s / ratio 8.09 with 12.6x output growth.
    return pairs.select(
        "s_a", "s_b", F.lit(1).cast("long").alias("dist")
    )


def misra_gries_topk(
    df: DataFrame,
    col: str,
    k: int = 16,
) -> "tuple[DataFrame, int]":
    """Mergeable Misra-Gries heavy-hitter summary — the deterministic
    counter-based alternative to the CMS sketch (`cms_counters`): ≤ k
    counters per partition, NO shuffle over the data (the only movement
    is #partitions x k summary rows), and the classic guarantee survives
    the merge (Agarwal et al., "Mergeable Summaries", PODS'12):

      true_count - err  <=  est  <=  true_count

    where ``err`` (returned alongside) is the total decrement applied
    across partition summaries and the merge — every item with
    true_count > err is GUARANTEED present. At 100 TB this is the "top
    talkers without a shuffle" primitive: each executor keeps k counters,
    the driver merges a bounded #partitions x k table.

    Returns ``(summary_df, err)`` with columns (item, est) — est is the
    merged lower-estimate counter.
    """
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("item", StringType(), True),
            StructField("est", LongType(), False),
            StructField("deficit", LongType(), False),
        ]
    )

    def _partition_mg(batches):
        import pandas as pd

        counters: dict = {}
        deficit = 0
        for batch in batches:
            # vectorized: ONE value_counts per Arrow batch (C-speed), then
            # at most #distinct-in-batch weighted increments into the k
            # counters. Folding a batch is a k-bounded summary MERGE, so
            # the MG guarantee is untouched (Agarwal et al., PODS'12):
            # the cut step subtracts the (k+1)-th largest value m from
            # every counter — at least k+1 counters lose >= m mass each,
            # so total deficit stays <= n/(k+1), and no counter loses
            # more than the deficit accounts for. ~batch/distinct fewer
            # Python dispatches than per-row decrement-all.
            vc = batch[col].value_counts(dropna=False)
            for item, w in vc.items():
                key = None if pd.isna(item) else str(item)
                counters[key] = counters.get(key, 0) + int(w)
            if len(counters) > k:
                cut = sorted(counters.values(), reverse=True)[k]
                deficit += cut
                counters = {
                    i: c - cut for i, c in counters.items() if c > cut
                }
        yield pd.DataFrame(
            {
                "item": list(counters) or [None],
                "est": list(counters.values()) or [0],
                "deficit": [deficit] + [0] * (max(len(counters), 1) - 1),
            }
        )

    summaries = df.select(F.col(col).alias(col)).mapInPandas(
        _partition_mg, schema=out_schema
    ).collect()  # bounded: #partitions x k rows by construction
    merged: dict = {}
    err = 0
    for r in summaries:
        err += r.deficit
        if r.item is not None and r.est > 0:
            merged[r.item] = merged.get(r.item, 0) + r.est
    if len(merged) > k:
        # mergeable-summaries step: subtract the (k+1)-th largest counter
        # from every counter, drop the non-positive — restores size <= k
        # and adds that subtraction to the error bound
        cut = sorted(merged.values(), reverse=True)[k]
        err += cut
        merged = {i: c - cut for i, c in merged.items() if c - cut > 0}
    spark = df.sparkSession
    out = spark.createDataFrame(
        [(i, int(c)) for i, c in sorted(merged.items())] or [],
        "item string, est long",
    )
    return out, int(err)


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 20,
    text: str = "text",
    id_col: str = "doc_id",
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson/Sparck Jones probabilistic
    weighting, the Lucene-default scoring function) for a fixed bag of
    query ``terms`` — the exact-relevance complement to the embedding ANN
    surface:

        score(d) = Σ_t  ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
                        · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    Scale shape: the token explode is FILTERED to the query terms before
    any aggregation (the posting-list read — work proportional to the
    query's postings, not the corpus vocabulary); doc lengths come from a
    row-local size() (no explode); N/avgdl is ONE 1-row broadcast
    aggregate and the per-term df table (≤ |terms| rows) broadcasts into
    the scoring join. No unpartitioned window: top-k is a TakeOrdered
    over (rounded score desc, id). Scores round to 6 decimals so the
    cross-engine float math (ln included) hash-matches; ties after
    rounding break by id in both engines.

    Returns (id, score) — score rounded, descending, ≤ k rows."""
    from .dedup import tokens_col

    tk = tokens_col(F.col(text))
    dl = docs.select(F.col(id_col).alias("id"), F.size(tk).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = docs.select(
        F.col(id_col).alias("id"), F.explode(tk).alias("tok")
    ).filter(F.col("tok").isin(list(terms)))
    tf = toks.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        tf.join(F.broadcast(df_t), "tok")
        .join(dl, "id")
        .crossJoin(F.broadcast(stats))
        .select(
            "id",
            (
                F.log(
                    1.0
                    + (F.col("n_docs") - F.col("df") + 0.5)
                    / (F.col("df") + 0.5)
                )
                * (F.col("tf") * (k1 + 1))
                / (
                    F.col("tf")
                    + k1
                    * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("s"),
        )
        .groupBy("id")
        .agg(F.round(F.sum("s"), 6).alias("score"))
    )
    return scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)


RRF_K = 60


def rrf_fuse(
    rankings: "list[DataFrame]",
    score_cols: "list[str]",
    k_rrf: int = RRF_K,
    topk: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009 — the
    standard hybrid-retrieval combiner): each input ranking contributes
    1/(k + rank) per id and the fused score is the sum — rank-based, so
    incomparable score scales (BM25 vs cosine) fuse without calibration.

    Scale shape: every input is already a top-k frame (≤ tens of rows),
    so the rank windows are bounded by construction (unfoldable constant
    partition key marks them deliberate), fusion is a union + one keyed
    aggregate over ≤ Σk rows, and the final top-k is a TakeOrdered.
    Ranks order by (score desc, id) — deterministic under rounded scores
    in both engines. Returns (id, rrf_score, n_sources) descending."""
    from functools import reduce

    from pyspark.sql.window import Window

    from .sampling import bounded_window_key

    contribs = []
    for df, sc in zip(rankings, score_cols):
        w = (
            Window.partitionBy(bounded_window_key(F.col("id")))
            .orderBy(F.col(sc).desc(), F.col("id"))
        )
        contribs.append(
            df.select(
                "id",
                (1.0 / (k_rrf + F.row_number().over(w))).alias("c"),
            )
        )
    merged = reduce(lambda a, b: a.unionByName(b), contribs)
    return (
        merged.groupBy("id")
        .agg(
            F.round(F.sum("c"), 6).alias("rrf_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_sources"),
        )
        .orderBy(F.col("rrf_score").desc(), F.col("id"))
        .limit(topk)
    )


def textrank_keywords(
    df: DataFrame,
    vocab_size: int = 30,
    iterations: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """TextRank keyword centrality (Mihalcea & Tarau 2004) over the
    document-co-occurrence graph of the corpus's top terms — graph
    ranking for keyword extraction, the PageRank family's entry into the
    text-analysis surface.

    Graph: nodes are the ``vocab_size`` highest-document-frequency terms
    (ties break lexicographically); an undirected edge joins two terms
    with weight = number of documents containing BOTH. Rank iterates
    r'(v) = 0.15 + 0.85 * sum_u w_uv * r(u) / W_u  (W_u = u's weighted
    degree), the standard damped update.

    Exactness design (the oracle runs the SAME arithmetic): ranks are
    integers in 1e-6 units and the update is PURE integer arithmetic —
    each edge contributes (w_uv * r_u) // W_u (floor division, exact and
    order-free), the damping is (85 * sum) // 100 + 150000. No float
    exists anywhere in the iteration, so engines agree bit-for-bit with
    no rounding analysis at all. Corpus-sized work is two keyed
    aggregates (term df, pair counts — per-doc pair fanout is bounded by
    vocab_size^2/2); the <=vocab_size^2/2-edge graph then iterates
    driver-side, metadata-scale, like the ANN probe ranking.

    Returns (term, rank_micros, df_docs) — rank in 1e-6 units."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens_col(F.col(text_col))).alias("tk"),
    )
    term_df = (
        toks.select("id", F.explode("tk").alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    vocab_rows = (
        term_df.orderBy(F.col("df").desc(), F.col("tok")).limit(vocab_size)
    ).collect()
    vocab = {r.tok: int(r.df) for r in vocab_rows}
    vlit = F.array(*[F.lit(t) for t in vocab])
    doc_terms = toks.select(
        "id",
        F.array_sort(
            F.array_intersect(F.col("tk"), vlit)
        ).alias("vt"),
    ).filter(F.size("vt") >= 2)
    # per-doc pair expansion: bounded by C(vocab_size, 2) per document
    pairs = (
        doc_terms.select(
            "id", F.explode("vt").alias("a"), F.col("vt")
        )
        .select("id", "a", F.explode("vt").alias("b"))
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
        .collect()
    )
    # driver-side exact-integer iteration over the <=C(V,2)-edge graph
    terms = sorted(vocab)
    adj: dict[str, list[tuple[str, int]]] = {t: [] for t in terms}
    for r in pairs:
        adj[r.a].append((r.b, int(r.w)))
        adj[r.b].append((r.a, int(r.w)))
    wdeg = {t: sum(w for _, w in adj[t]) for t in terms}
    rank = {t: 1_000_000 for t in terms}
    for _ in range(iterations):
        nxt = {}
        for t in terms:
            s = sum(
                (w * rank[u]) // wdeg[u] for u, w in adj[t] if wdeg[u]
            )
            nxt[t] = 150_000 + (85 * s) // 100
        rank = nxt
    spark = df.sparkSession
    return spark.createDataFrame(
        [(t, rank[t], vocab[t]) for t in terms],
        "term string, rank_micros long, df_docs long",
    )


# --- PII redaction ----------------------------------------------------------
# The scrubbing pass every pretraining corpus runs before anything else
# ships: find personally identifying spans, replace them with typed tokens,
# and count what was removed (the redaction census privacy reviews ask for).
# Patterns are deliberately Java-regex/RE2 common ground (no lookarounds, no
# backreferences) so the same literal pattern runs JVM-side in Spark and in
# the DuckDB oracle. ORDER IS CONTRACT: replacement is sequential over this
# tuple, so an email's host part is consumed as <EMAIL> before the ipv4 pass
# ever sees it; per-kind counts are measured on the RAW text, independent of
# replacement order.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\+?\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"),
)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Typed PII scrub: adds one ``n_{kind}`` count column per pattern
    (matches in the ORIGINAL text) and ``clean_text`` with every match
    replaced by its ``<KIND>`` token, in :data:`PII_PATTERNS` order.

    Whole pass is JVM-side (regexp_count / regexp_replace inside
    whole-stage codegen) — no Python crossing, corpus-linear, and the
    scan stays a narrow projection at 100 TB. Spark's regexp_replace is
    replace-ALL by default; the DuckDB oracle needs the explicit 'g'
    flag (the known dialect trap)."""
    out = df
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat))
        )
    clean = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, f"<{kind.upper()}>")
    return out.withColumn("clean_text", clean)


# --- BPE vocabulary training -------------------------------------------------
# Above this many word TYPES the merge rounds stay distributed; below it
# the frequency table collects to the driver and the rounds run locally
# (the shape every production tokenizer trainer uses: corpus pass
# distributed, vocab-scale iteration centralized). 2M types ≈ tens of MB.
BPE_DRIVER_VOCAB_MAX = 2_000_000


def bpe_train_merges(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    return_state: bool = False,
    driver_vocab_max: int = BPE_DRIVER_VOCAB_MAX,
):
    """Distributed byte-pair-encoding vocabulary training (Sennrich,
    Haddow & Birch 2016) — learn the first ``k`` merge rules from the
    corpus, the table a tokenizer build ships.

    Algorithm and cost shape: BPE trains on the WORD FREQUENCY table,
    not the corpus — the only corpus-sized pass is one whitespace-split
    word count; the ``k`` merge rounds then iterate over the vocab-sized
    (word, freq) table (pair count → argmax → apply merge), which is
    metadata scale even at 100 TB (vocabulary grows Heaps-sublinearly).
    Ties on the pair count break lexicographically on (left, right) so
    the merge sequence is engine-exact.

    Symbol strings use the boundary-guarded encoding
    ``'·' + sym1 + '··' + sym2 + '··' ... + '·'`` (single sentinel at the
    edges, double between symbols): the merge of pair (a, b) is then the
    LITERAL replace of ``'·a··b·'`` with ``'·ab·'``, whose left-to-right
    non-overlapping scan is exactly BPE's greedy application — adjacent
    disjoint pairs both rewrite (each keeps one sentinel of the shared
    boundary), overlapping ones don't, and a pair can never false-match
    inside a longer symbol (its guards would have to be symbol-interior
    sentinels, which the encoding never produces). Plain ``replace``, no
    regex — identical semantics in Spark and the DuckDB oracle.

    Returns (merge_rank, left_sym, right_sym, merged, weighted_count);
    with ``return_state=True`` also the post-merge (sym, freq) table,
    the trained state :func:`bpe_encode_stats` tokenizes with.
    """
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.col(text_col)), r"\s+")
            ).alias("w")
        )
        # the interpunct is the encoding's reserved sentinel — a word
        # containing it would corrupt the boundary structure (both
        # engines identically, so the oracle would still match — but the
        # merges would be silently wrong). Such words are excluded from
        # the frequency table; real tokenizer builds byte-escape instead.
        .filter((F.length("w") > 0) & ~F.col("w").contains("·"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return bpe_train_from_word_freq(
        words, k, return_state=return_state,
        driver_vocab_max=driver_vocab_max,
    )


def bpe_train_from_word_freq(
    words: DataFrame,
    k: int = 8,
    return_state: bool = False,
    driver_vocab_max: int = BPE_DRIVER_VOCAB_MAX,
):
    """BPE merge rounds over a PRE-AGGREGATED (w, freq) table — the
    entry point for callers that already hold the word-frequency pass
    (bpe_tokenize_docs derives it from its per-document aggregate so
    the corpus is tokenized exactly once). Semantics identical to
    :func:`bpe_train_merges`, which delegates here."""
    spark = words.sparkSession
    init = F.concat(
        F.lit("·"), F.regexp_replace(F.col("w"), "(.)", "$1··")
    )
    init = F.substring(init, 1, F.length(init) - 1)
    from .caching import cache_tracked

    state_unc = words.select(init.alias("sym"), "freq")
    # ONE job probes AND fetches (r22, guide §1.2: the former
    # count-then-collect pair paid two scheduling round trips plus a cache
    # materialization for the same bytes): collect at most
    # driver_vocab_max+1 rows — if the limit did not truncate, this IS the
    # whole frequency table and the merge rounds run locally; driver
    # memory stays bounded either way.
    rows = state_unc.limit(driver_vocab_max + 1).collect()

    if len(rows) <= driver_vocab_max:
        # vocab is proven metadata-scale: run the merge rounds locally —
        # identical greedy semantics (left-to-right non-overlapping
        # application, ties on (count desc, left, right) with codepoint
        # order == UTF-8 byte order), zero per-round Spark jobs. This is
        # the hot path at every realistic scale; the distributed loop
        # below is the fallback for corpora whose TYPE count outgrows
        # the driver.
        merges, out_state = _bpe_merge_rounds_local(
            [(r["sym"], r["freq"]) for r in rows], k
        )
        merges_df = spark.createDataFrame(
            merges,
            "merge_rank int, left_sym string, right_sym string, "
            "merged string, weighted_count bigint",
        )
        if not return_state:
            return merges_df
        state_df = spark.createDataFrame(
            out_state, "sym string, freq bigint"
        )
        return merges_df, state_df

    state = cache_tracked(state_unc)  # distributed fallback: per-round reuse
    merges = []
    for rank in range(1, k + 1):
        toks = F.split(F.expr("trim(BOTH '·' FROM sym)"), "··")
        pairs = state.withColumn("t", toks).select(
            "freq",
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("a"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("b"),
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy(
                F.col("p.a").alias("a"), F.col("p.b").alias("b")
            )
            .agg(F.sum("freq").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .first()
        )
        if best is None:
            break
        merges.append(
            (rank, best.a, best.b, best.a + best.b, int(best.c))
        )
        state = state.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f"·{best.a}··{best.b}·"),
                F.lit(f"·{best.a}{best.b}·"),
            ),
        )
    merges_df = spark.createDataFrame(
        merges,
        "merge_rank int, left_sym string, right_sym string, "
        "merged string, weighted_count bigint",
    )
    return (merges_df, state) if return_state else merges_df


def _bpe_merge_rounds_local(sym_freq: list, k: int):
    """The k merge rounds over a collected (sym, freq) table. Words are
    held as symbol LISTS (decoded from the sentinel strings once); the
    greedy merge is an explicit left-to-right scan, which is the same
    non-overlapping semantics the distributed path's literal
    boundary-guarded replace implements. Returns (merges, state) with
    state re-encoded to the sentinel form."""
    words = [(s.strip("·").split("··"), int(f)) for s, f in sym_freq]
    merges = []
    for rank in range(1, k + 1):
        counts: dict = {}
        for toks, f in words:
            for i in range(len(toks) - 1):
                p = (toks[i], toks[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), c = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rank, a, b, a + b, int(c)))
        ab = a + b
        for wi, (toks, f) in enumerate(words):
            if a not in toks:
                continue
            out, i, n, changed = [], 0, len(toks), False
            while i < n:
                if i + 1 < n and toks[i] == a and toks[i + 1] == b:
                    out.append(ab)
                    i += 2
                    changed = True
                else:
                    out.append(toks[i])
                    i += 1
            if changed:
                words[wi] = (out, f)
    state = [
        ("·" + "··".join(toks) + "·", f) for toks, f in words
    ]
    return merges, state


def bpe_encode_stats(
    docs: DataFrame, k: int = 8, text_col: str = "text"
) -> DataFrame:
    """Corpus token statistics under the learned BPE vocabulary — the
    token-counting pass a training-data budget is planned with, using a
    REAL learned tokenizer instead of a whitespace proxy. Trains the
    first ``k`` merges (:func:`bpe_train_merges`), applies them, and
    reports one row: total corpus tokens (sum over words of
    freq × symbols-per-word), distinct word types, distinct symbol types
    (the effective vocabulary), and the raw character-token count the
    merges compressed from. Same cost shape as training: one corpus
    pass, then vocab-sized work."""
    merges_df, state = bpe_train_merges(
        docs, k=k, text_col=text_col, return_state=True
    )
    toks = F.split(F.expr("trim(BOTH '·' FROM sym)"), "··")
    per_word = state.select(
        "sym", "freq", F.size(toks).alias("n_syms"), toks.alias("t")
    )
    totals = per_word.agg(
        F.sum(F.col("freq") * F.col("n_syms")).cast("bigint").alias(
            "total_tokens"
        ),
        F.count(F.lit(1)).cast("bigint").alias("n_word_types"),
        F.sum(
            F.col("freq") * F.length(F.translate(F.col("sym"), "·", ""))
        ).cast("bigint").alias("total_chars"),
    )
    n_symbol_types = (
        per_word.select(F.explode("t").alias("s")).distinct().count()
    )
    return totals.withColumn(
        "n_symbol_types", F.lit(n_symbol_types).cast("bigint")
    )


def bpe_tokenize_docs(
    docs: DataFrame,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-DOCUMENT tokenization under the learned BPE vocabulary — the
    actual tokenize-the-corpus pass a training pipeline runs after
    training (:func:`bpe_train_merges` learns the rules;
    :func:`bpe_encode_stats` reports corpus totals; this emits the
    per-document numbers a packing/budgeting stage consumes).

    The trained state IS the word tokenizer: each post-merge symbol
    string decodes back to its word (strip the sentinels) with its
    greedy-BPE token count, so tokenizing a document is a keyed
    equi-join of the exploded corpus tokens against the vocab-sized
    word → n_syms table — no per-document merge replay, no Python.

    Cost shape (r22, guide §1.2/§5): exactly TWO independent corpus
    passes and NO corpus-sized cache — (1) the word-frequency pass
    (explode + one map-side-combined groupBy(w), vocab-sized shuffle),
    whose result the trainer collects; (2) the tokenize pass (explode +
    broadcast vocab lookup + one map-side-combined groupBy(id),
    doc-sized shuffle). The former shape materialized a cached
    (id, word, count) table to share between the passes: a corpus-scale
    memory hazard at 100 TB, an extra exchange, and TWO extra serial
    jobs at bench scale (cache-materializing count + collect) —
    interleaved same-session A/B 1.44-1.54s -> 0.78-0.91s at sf0.1.
    Repetition never reaches a SHUFFLE (both aggregations partial-agg
    map-side; the per-token work against the vocab is an O(1) broadcast
    hash lookup). Words containing the reserved sentinel are excluded
    on both engines (see bpe_train_merges). Returns
    (id, n_words, n_tokens, n_chars); tokens-per-word > 1 means the
    merge budget k left the word split."""
    words = docs.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(
            F.split(F.lower(F.col(text_col)), r"\s+")
        ).alias("w"),
    ).filter((F.length("w") > 0) & ~F.col("w").contains("·"))
    word_freq = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    _, state = bpe_train_from_word_freq(word_freq, k=k, return_state=True)
    toks = F.split(F.expr("trim(BOTH '·' FROM sym)"), "··")
    vocab = state.select(
        F.translate("sym", "·", "").alias("w"),
        F.size(toks).cast("long").alias("n_syms"),
    )
    if state.isLocal():
        # the hot path: the trainer ran locally, so the vocab is proven
        # <= driver_vocab_max rows — pin the broadcast (a LocalRelation
        # over the threshold would otherwise shuffle the exploded corpus
        # into a sort-merge join). The distributed-fallback state keeps
        # the planner's choice: a vocab that outgrew the driver must not
        # be forced into a broadcast build.
        vocab = F.broadcast(vocab)
    return (
        words.join(vocab, "w")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_tokens"),
            F.sum(F.length("w")).cast("bigint").alias("n_chars"),
        )
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    n_buckets: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    classes: list | None = None,
) -> DataFrame:
    """fastText-style linear classifier INFERENCE (Joulin et al. 2016,
    "Bag of Tricks for Efficient Text Classification") — the standard
    quality-classifier scoring pass a pretraining pipeline runs over the
    corpus (e.g. the GPT-3/CCNet quality filter shape).

    Features are hashed unigrams + adjacent bigrams (the fastText
    hashing trick: every feature — not just bigrams, our simplification
    — maps to one of ``n_buckets`` via the engine's cross-engine md5
    hash). ``weights`` is the trained model: (b, c, w) rows with INTEGER
    micro-unit weights, bucket × class — SPARSE tables are honored
    (absent (b, c) pairs score 0: per-document class scores collapse to
    a tiny map column and the full class list expands as a literal
    EXPRESSION over it — no document × class join ever forms). Pass
    ``classes`` explicitly to avoid the one vocab-scale collect that
    otherwise derives it from the model. Scoring is
    ``score(d, c) = Σ_b k_{d,b} · w_{b,c}`` with per-document bucket
    counts pre-aggregated BEFORE the model join (the lm_bigram
    discipline: repetition never reaches a join), the model join a
    BROADCAST keyed equi-join (the model is bucket-scale, never
    corpus-scale), and the argmax a single min_by aggregate (ties break
    to the lowest class id). ``n_features`` is the document's total
    feature-instance count, independent of model sparsity. All-integer
    arithmetic, so the pass oracles exactly.
    Returns (id, best_class, best_score_micro, n_features)."""
    from .hashing import md5_long

    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), toks.alias("t")
    )
    uni = base.select("id", F.explode("t").alias("f"))
    bi = base.select(
        "id",
        F.explode(
            F.zip_with(
                F.expr("slice(t, 1, size(t) - 1)"),
                F.expr("slice(t, 2, size(t) - 1)"),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("f"),
    )
    feats = uni.unionByName(bi)
    pb = (
        feats.select(
            "id", (md5_long(F.col("f")) % n_buckets).alias("b")
        )
        .groupBy("id", "b")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    n_feat = pb.groupBy("id").agg(F.sum("k").alias("n"))
    if classes is None:
        classes = [
            int(r.c) for r in weights.select("c").distinct().collect()
        ]
    classes = sorted(int(c) for c in classes)
    smap = (
        pb.join(F.broadcast(weights), "b")
        .groupBy("id", "c")
        .agg(F.sum(F.col("k") * F.col("w")).alias("s"))
        .groupBy("id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("c", "s"))
            ).alias("m")
        )
    )
    # per-class score = coalesce(m[c], 0) as a literal expression; argmax
    # with lowest-class tie-break = array_min over (negated score, class)
    # structs — the class grid never materializes as rows
    cand = F.array(
        *[
            F.struct(
                (
                    -F.coalesce(
                        F.element_at("m", F.lit(c)),
                        F.lit(0).cast("long"),
                    )
                ).alias("neg"),
                F.lit(c).alias("c"),
            )
            for c in classes
        ]
    )
    best = F.array_min(cand)
    return (
        n_feat.join(smap, "id", "left")  # no weighted buckets -> NULL map
        .select(
            "id",
            best["c"].cast("int").alias("best_class"),
            (-best["neg"]).cast("bigint").alias("best_score_micro"),
            F.col("n").cast("bigint").alias("n_features"),
        )
    )


# --- bigram language-model quality scoring -----------------------------------
def lm_bigram_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document negative log-likelihood under an add-one-smoothed
    corpus bigram model — the CCNet-style LM quality signal (Wenzek et
    al. 2020 rank corpora by LM perplexity; docs whose word transitions
    are atypical for the corpus score high NLL and get filtered or
    down-weighted).

    Model: ``p(b|a) = (C(a,b) + 1) / (C(a) + V)`` with C from the corpus
    itself and V the distinct-token count. Score: the sum of per-bigram
    negative log-probs in INTEGER MICRO-NATS — each distinct bigram's
    ``-ln p`` is quantized ONCE (snap within 2e-6 of an integer against
    libm ulp noise, then floor), and per-document aggregation is a pure
    integer sum, order-free and engine-exact (the
    power-iteration/IntegerExact doctrine: floats only at vocab-sized
    quantization points, never inside a corpus-sized aggregation).

    Plan shape: two corpus passes (bigram explode for counts, bigram
    explode for scoring) joined through vocab-sized count tables on
    bigram keys — keyed equi-joins, no window, no cross join. Returns
    (id, n_bigrams, nll_micro_nats); callers rank or threshold on
    ``nll_micro_nats / n_bigrams``. Documents with fewer than two
    tokens have no bigrams and are omitted (no model evidence)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), toks.alias("t")
    )
    bi = base.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 1)").alias("a"),
                F.expr("slice(t, 2, size(t) - 1)").alias("b"),
            )
        ).alias("p"),
    ).select("id", F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    v = (
        base.select(F.explode("t").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
        .collect()[0].v
    )
    # one corpus-sized aggregation feeds everything downstream: the count
    # tables reduce from per-document bigram counts (vocab-sized from here
    # on), and C(a) = Σ_b C(a,b) comes from the bigram table instead of a
    # third corpus explode
    per_doc = bi.groupBy("id", "a", "b").agg(
        F.count(F.lit(1)).alias("k")
    )
    big = per_doc.groupBy("a", "b").agg(F.sum("k").alias("c_ab"))
    uni = big.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    p = (F.col("c_ab") + 1) / (F.col("c_a") + F.lit(int(v)))
    y = -F.log(p) * 1e6
    snapped = F.when(
        F.abs(y - F.round(y, 0)) < 2e-6, F.round(y, 0)
    ).otherwise(y)
    mn = big.join(uni, "a").select(
        "a", "b", F.floor(snapped).cast("long").alias("mnats")
    )
    # the score join sees per-(id, a, b) counts, never raw instances:
    # within-document repetition never reaches the join (the r13 bench's
    # worst 10× ratio was this join's input growing with raw instances),
    # and the integer sum k·mnats is order-free so the result is
    # bit-identical
    return (
        per_doc.join(mn, ["a", "b"])
        .groupBy("id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("k") * F.col("mnats"))
            .cast("bigint")
            .alias("nll_micro_nats"),
        )
    )


def lm_trigram_backoff_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    train_mod: int = 2,
) -> DataFrame:
    """Per-document NLL under a TRIGRAM stupid-backoff model (Brants et
    al. 2007, "Large Language Models in Machine Translation" — the
    MapReduce-era web-scale LM this engine's cost shape descends from):

        S(c|a,b) = C(abc)/C(ab)                if the trigram was seen
                 = 0.4 * C(bc)/C(b)            else if the bigram was
                 = 0.16 * (C(c)+1)/(N+V)       else (add-one unigram)

    Counts come from the TRAINING HALF of the corpus (doc_id %
    ``train_mod`` == 0) and every document is scored held-out style, so
    the backoff branches genuinely fire (scoring a corpus against
    itself never backs off — every observed trigram has C >= 1). The
    unigram floor is add-one smoothed so unseen words stay finite.

    Scores follow the IntegerExact doctrine of lm_bigram_scores: each
    distinct trigram TYPE's -ln S quantizes once to integer micro-nats
    (snap within 2e-6, then floor; identical double arithmetic order in
    both engines), and the per-document aggregation is a pure integer
    sum — order-free, engine-exact. Per-branch instance counts ship too,
    so a backoff taken on the wrong branch anywhere breaks the hash.

    Plan shape: corpus passes are the trigram/bigram/unigram explodes;
    everything after reduces through vocab-sized count tables joined on
    token keys — keyed equi-joins only. Docs with < 3 tokens are
    omitted (no model evidence). Returns
    (id, n_trigrams, nll_micro_nats, n_bo_bi, n_bo_uni)."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"),
        lambda x: F.length(x) > 0,
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("id"), toks.alias("t")
    )
    # slice(t, 1, size-2) REJECTS negative lengths, so docs shorter than
    # the n-gram order must be filtered out, not just yield empty arrays
    # (review-found: a 1-token doc crashed the whole query instead of
    # being omitted). The oracle's generate_series+WHERE form skips them
    # naturally — these filters keep both engines scoring the same docs.
    base3 = base.filter(F.size("t") >= 3)
    tri = base3.select(
        "id",
        F.explode(
            F.arrays_zip(
                F.expr("slice(t, 1, size(t) - 2)").alias("a"),
                F.expr("slice(t, 2, size(t) - 2)").alias("b"),
                F.expr("slice(t, 3, size(t) - 2)").alias("c"),
            )
        ).alias("p"),
    ).select(
        "id", F.col("p.a").alias("a"), F.col("p.b").alias("b"),
        F.col("p.c").alias("c"),
    )
    train = base.filter(F.col("id") % train_mod == 0)
    tri_t = (
        train.filter(F.size("t") >= 3)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 2)").alias("a"),
                    F.expr("slice(t, 2, size(t) - 2)").alias("b"),
                    F.expr("slice(t, 3, size(t) - 2)").alias("c"),
                )
            ).alias("p")
        )
        .groupBy(
            F.col("p.a").alias("a"), F.col("p.b").alias("b"),
            F.col("p.c").alias("c"),
        )
        .agg(F.count(F.lit(1)).alias("c_abc"))
    )
    bi_t = (
        train.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(t, 1, size(t) - 1)").alias("a"),
                    F.expr("slice(t, 2, size(t) - 1)").alias("b"),
                )
            ).alias("p")
        )
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c_bi"))
    )
    # vocab-sized count tables feed 2+ consumers each (nv aggregate, two
    # bigram join sides, two unigram join sides) — cache them so the
    # train-half n-gram explodes run once, not once per consumer
    # (tri_t feeds exactly one join: not cached)
    from .caching import cache_tracked

    bi_t = cache_tracked(bi_t)
    uni_t = cache_tracked(
        train.select(F.explode("t").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c_w"))
    )
    nv = uni_t.agg(
        F.sum("c_w").alias("n"), F.count(F.lit(1)).alias("v")
    ).collect()[0]
    n_tok, v_tok = int(nv.n or 0), int(nv.v or 0)

    types = tri.select("a", "b", "c").distinct()
    j = (
        types
        .join(tri_t, ["a", "b", "c"], "left")
        .join(
            bi_t.select(
                F.col("a").alias("a"), F.col("b").alias("b"),
                F.col("c_bi").alias("c_ab"),
            ),
            ["a", "b"], "left",
        )
        .join(
            bi_t.select(
                F.col("a").alias("b"), F.col("b").alias("c"),
                F.col("c_bi").alias("c_bc"),
            ),
            ["b", "c"], "left",
        )
        .join(
            uni_t.select(F.col("w").alias("b"), F.col("c_w").alias("c_b")),
            ["b"], "left",
        )
        .join(
            uni_t.select(F.col("w").alias("c"), F.col("c_w").alias("c_c")),
            ["c"], "left",
        )
    )
    branch = (
        F.when(F.col("c_abc").isNotNull(), F.lit(1))
        .when(F.col("c_bc").isNotNull(), F.lit(2))
        .otherwise(F.lit(3))
    )
    s = (
        F.when(
            branch == 1,
            F.col("c_abc").cast("double") / F.col("c_ab"),
        )
        .when(
            branch == 2,
            F.lit(0.4) * (F.col("c_bc").cast("double") / F.col("c_b")),
        )
        .otherwise(
            F.lit(0.16)
            * (
                (F.coalesce(F.col("c_c"), F.lit(0)) + 1).cast("double")
                / F.lit(n_tok + v_tok)
            )
        )
    )
    y = -F.log(s) * 1e6
    snapped = F.when(
        F.abs(y - F.round(y, 0)) < 2e-6, F.round(y, 0)
    ).otherwise(y)
    mn = j.select(
        "a", "b", "c",
        F.floor(snapped).cast("long").alias("mnats"),
        branch.alias("branch"),
    )
    # r21: trigram INSTANCES join mn directly — the old per-doc
    # (id, a, b, c) pre-aggregation shuffled the full instance stream for
    # a ~0% row reduction (measured sf0.1: 260,704 instances vs 260,388
    # per-doc rows), then shuffled again for the mn join. The per-type
    # mnats are identical either way (sum k*mnats == sum of mnats per
    # instance), and mn stays type-sized (~10x smaller than instances),
    # so AQE broadcasts it at bench scale and the instance stream never
    # exchanges before the final per-doc aggregate.
    return (
        tri.join(mn, ["a", "b", "c"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.sum("mnats").cast("bigint").alias("nll_micro_nats"),
            F.sum(
                F.when(F.col("branch") == 2, 1).otherwise(F.lit(0))
            ).cast("bigint").alias("n_bo_bi"),
            F.sum(
                F.when(F.col("branch") == 3, 1).otherwise(F.lit(0))
            ).cast("bigint").alias("n_bo_uni"),
        )
    )
