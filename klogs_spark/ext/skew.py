"""Skew mitigation — salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one chatty namespace, one viral document)
can pin a shuffle partition while the rest of the cluster idles. AQE's skew
split (on in session.py) handles sort-merge joins automatically; these
utilities cover the cases AQE can't: hash aggregations with a hot group and
joins where the skewed side must stay a shuffle join.

Technique: explode the small side SALT times, salt the big side's key with a
deterministic per-row shard, join on (key, salt) — hot keys spread over SALT
partitions. Results are identical to the unsalted operation (tests assert
exact equality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with a salted key: ``big`` rows get a deterministic shard in
    [0, salt); ``small`` is exploded once per shard so every (key, shard)
    bucket finds its match. Use when ``small`` is too big to broadcast and
    ``big``'s key distribution is skewed."""
    # pmod, not abs(x)%n: abs(Long.MIN_VALUE) stays negative in Java
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*big.columns), F.lit(salt)).cast("int")
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")


def two_phase_count(
    df: DataFrame, group_cols: list[str], salt: int = 16
) -> DataFrame:
    """Hot-group aggregation in two phases: count per (group, salt) first
    (spreads a hot group over ``salt`` reducers), then sum the partials.
    Identical result to ``groupBy(group).count()``; use when one group holds
    a dominating share of rows. (Spark's partial aggregation already does
    this per-task; the explicit salt helps when the merge side itself skews.)
    """
    salted = df.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in group_cols])
            + F.spark_partition_id(),
            F.lit(salt),
        ).cast("int"),
    )
    partial = salted.groupBy(*group_cols, "_salt").agg(
        F.count(F.lit(1)).alias("_partial")
    )
    return partial.groupBy(*group_cols).agg(
        F.sum("_partial").cast("long").alias("cnt")
    )
