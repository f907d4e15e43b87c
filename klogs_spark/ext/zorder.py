"""Z-order (Morton) multi-dimension clustering for the logs table layout.

The reference layout sorts each part by the lexicographic cluster key
(schema.sql:18): selective predicates on the LEADING key columns skip row
groups via parquet min/max stats, but a predicate on a trailing key column
(host, pod_name) sees every row group — a lexicographic sort gives all its
locality to the prefix. Z-ordering interleaves the bits of several columns'
ORDER-PRESERVING ranks into one sort value, so each participating column's
equal-value rows land in few runs of ADJACENT values and min/max stats
narrow for any of them (the ZORDER BY recipe popularized by Delta Lake;
public algorithm, original implementation).

Ranks, not hashes, feed the interleave — this is load-bearing: parquet
stats are min/max over the column's VALUES, so skipping only narrows when
the few values inside a row group are adjacent in value order. A hash
interleave clusters rows whose values are order-scattered and the stats
stay full-width (measured: hash-z admitted 12/12 row groups where rank-z
admits ~4/12 on the same data). Rank = position of the value among the
column's sorted distinct values, exactly reproducible in the oracle as
``ROW_NUMBER() OVER (ORDER BY value) - 1``.

Scale: each rank table is one ``distinct`` + a window over the DISTINCT
VALUES ONLY — bounded by the dimension's cardinality, which for z-order
candidates (envelope dimensions: namespace, app, host) is thousands, not
corpus-sized; the tables broadcast back. Ranks scale onto the full
``[0, 2^bits)`` range by exact integer arithmetic, so low- and
high-cardinality dimensions contribute equally to the sort prefix (a
dimension whose cardinality exceeds ``2^bits`` maps many-to-one onto the
range — adjacent values share buckets, which is exactly what skipping
wants). Everything else is pure Column shift/add arithmetic, JVM-side,
no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ZORDER_BITS = 8  # bits per column in the interleave


def interleave_bits(ranks: list[Column], bits_per_col: int = ZORDER_BITS) -> Column:
    """Morton-interleave ``bits_per_col``-bit non-negative ints: output bit
    ``i * len(ranks) + (n-1-j)`` is bit ``i`` of ``ranks[j]`` — earlier
    columns take the higher position within each bit level, so ties in
    discrimination break toward ``cols[0]`` (order columns most-queried
    first). 8 bits x up to 7 columns stays far inside int64."""
    n = len(ranks)
    z: Column = F.lit(0).cast("long")
    for i in range(bits_per_col):
        for j, r in enumerate(ranks):
            bit = F.shiftright(r.cast("int"), i).bitwiseAND(F.lit(1))
            z = z + bit.cast("long") * F.lit(1 << (i * n + (n - 1 - j)))
    return z


def add_zorder(
    df: DataFrame,
    cols: list[str],
    bits_per_col: int = ZORDER_BITS,
    out: str = "_z",
) -> DataFrame:
    """Add the z-order sort value over ``cols`` as column ``out``.

    Per column: rank its distinct values in value order (a window over the
    bounded distinct set — never the data), scale the rank onto the full
    ``[0, 2^bits_per_col)`` range with exact integer arithmetic
    (``rank * 2^bits // cardinality`` — a 5-value column must land its
    meaningful bits in the HIGH interleave positions or it contributes
    nothing to the sort prefix; measured 12/12 -> 5/12 admission on
    exactly this), broadcast the value->rank table back, and
    Morton-interleave. Sorting by ``out`` yields the
    multi-dimension-local layout.

    NULL handling (both paths, identically): NULL values rank 0 — they
    cluster with the smallest value and NO row is ever dropped. The rank
    tables are built NULL-free (collect_set already is; the join fallback
    filters explicitly) and the fallback joins LEFT, so literal-map and
    join paths agree for any cardinality.
    """
    width = 1 << bits_per_col

    # fast path: ONE aggregate collects every column's (capped) distinct
    # set; columns under the cap rank via a broadcast literal map — no
    # joins, no extra corpus passes (the join path costs one distinct
    # aggregate + broadcast join PER column; measured ~1.7x on the table
    # write). The cap keeps literal maps small (the Bloom-literal lesson:
    # thousands of plan literals cost seconds of optimizer time); columns
    # over it fall back to the join path, which is cardinality-safe.
    LITERAL_CAP = 1024
    capped = df.agg(
        *[
            F.slice(
                F.sort_array(F.collect_set(F.col(c))), 1, LITERAL_CAP + 1
            ).alias(f"_s{j}")
            for j, c in enumerate(cols)
        ]
    ).first()

    result = df
    rank_exprs: list[Column] = [None] * len(cols)
    join_cols = []
    for j, c in enumerate(cols):
        vals = capped[f"_s{j}"]
        if len(vals) <= LITERAL_CAP:
            n = len(vals)
            mapping = F.create_map(
                *[
                    F.lit(x)
                    for i, v in enumerate(vals)
                    for x in (v, (i * width) // n)
                ]
            )
            rank_exprs[j] = F.coalesce(
                F.element_at(mapping, F.col(c)), F.lit(0)
            )
        else:
            join_cols.append((j, c))
    for j, c in join_cols:
        rc = f"_zr{j}"
        from .sampling import bounded_window_key

        # the ranks table is bounded by the column's distinct values (it
        # must broadcast below anyway); the unfoldable constant key marks
        # the single-partition window as deliberate — Window.partitionBy
        # (lit(1)) would be folded away by EliminateWindowPartitions and
        # re-fire the WindowExec scale warning
        key = bounded_window_key(F.col("_zv"))
        w_all = Window.partitionBy(key)
        ranks = (
            df.select(F.col(c).alias("_zv"))
            .where(F.col("_zv").isNotNull())
            .distinct()
            .withColumn(
                "_zn",
                F.row_number().over(
                    Window.partitionBy(key).orderBy("_zv")
                ) - 1,
            )
            .withColumn("_zc", F.count(F.lit(1)).over(w_all))
            .withColumn(
                rc,
                # integer DIV keeps both engines in exact int64 arithmetic
                F.expr(f"CAST((_zn * {width}) DIV _zc AS INT)"),
            )
            .select(F.col("_zv").alias(c), rc)
        )
        # LEFT join: NULL z-values never match an equi-join key — an inner
        # join would silently drop those rows from the rewritten layout
        result = result.join(F.broadcast(ranks), c, "left")
        rank_exprs[j] = F.coalesce(F.col(rc), F.lit(0))
    z = interleave_bits(rank_exprs, bits_per_col)
    return result.withColumn(out, z).drop(
        *[f"_zr{j}" for j, _ in join_cols]
    )


def zorder_sql(
    table: str,
    cols: list[str],
    bits_per_col: int = ZORDER_BITS,
    out: str = "z",
) -> str:
    """DuckDB rendering of :func:`add_zorder` — same ranks (ROW_NUMBER over
    sorted distinct NON-NULL values, same full-width integer scaling), same
    interleave arithmetic, same NULL->rank-0 via LEFT JOIN + COALESCE.
    Returns a full SELECT over ``table`` adding column ``out``."""
    n = len(cols)
    width = 1 << bits_per_col
    ctes = ", ".join(
        f"rk{j} AS (SELECT {c} AS v{j}, "
        f"CAST(((ROW_NUMBER() OVER (ORDER BY {c}) - 1) * {width})"
        f" // (COUNT(*) OVER ()) AS INT) AS r{j} "
        f"FROM (SELECT DISTINCT {c} FROM {table} WHERE {c} IS NOT NULL))"
        for j, c in enumerate(cols)
    )
    joins = " ".join(
        f"LEFT JOIN rk{j} ON t.{c} = rk{j}.v{j}" for j, c in enumerate(cols)
    )
    terms = " + ".join(
        f"(((COALESCE(r{j}, 0) >> {i}) & 1) * {1 << (i * n + (n - 1 - j))})"
        for i in range(bits_per_col)
        for j in range(n)
    )
    return (
        f"WITH {ctes} SELECT t.*, CAST({terms} AS BIGINT) AS {out} "
        f"FROM {table} t {joins}"
    )
