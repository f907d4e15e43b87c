"""Declarative data-quality expectations — the Deequ / Great Expectations
pattern (public pattern, original implementation) as ONE Spark aggregate.

A pipeline gate declares what must hold (not-null, domain membership,
ranges over dynamic fields, key uniqueness); the engine verifies every
expectation in a single pass and emits a per-check report the scheduler
can fail on. Nothing here is corpus-sized beyond that one scan:

* each boolean expectation contributes two partial-aggregatable terms
  (violation count = rows where the condition is NOT TRUE — three-valued
  logic collapsed exactly like ``table.delete_where``, so a NULL check
  result counts as a violation, the Great Expectations contract);
* uniqueness rides the same aggregate as an exact ``count_distinct``
  (swap to approx upstream if ±2% suffices at 100 TB);
* the single stats row unpivots via ``stack`` — constant-size output,
  one row per check.

At 100 TB this is the nightly quality gate: one table pass, map-side
combined, no matter how many expectations are registered.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_report(
    df: DataFrame,
    checks: list[tuple[str, Column]],
    unique_keys: list[tuple[str, Column]] | None = None,
) -> DataFrame:
    """Run every expectation in one aggregate.

    ``checks``: (name, boolean Column) — a row VIOLATES the check when
    the condition is not TRUE (NULL counts as a violation).
    ``unique_keys``: (name, key Column) — violated rows = duplicates
    beyond the first occurrence of each key value.

    Returns one row per check: (check_name, n_rows, n_violations,
    passed)."""
    unique_keys = unique_keys or []
    aggs = [F.count(F.lit(1)).alias("__n")]
    for name, cond in checks:
        aggs.append(
            F.sum((~F.coalesce(cond, F.lit(False))).cast("int"))
            .cast("bigint")
            .alias(f"{name}__v")
        )
    for name, key in unique_keys:
        aggs.append(
            (F.count(key) - F.count_distinct(key))
            .cast("bigint")
            .alias(f"{name}__v")
        )
    row = df.agg(*aggs)
    names = [n for n, _ in checks] + [n for n, _ in unique_keys]
    stack_args = ", ".join(f"'{n}', __n, {n}__v" for n in names)
    return row.selectExpr(
        f"stack({len(names)}, {stack_args}) AS "
        "(check_name, n_rows, n_violations)"
    ).withColumn("passed", F.col("n_violations") == 0)
