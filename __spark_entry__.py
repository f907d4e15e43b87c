"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All implementations live in ``klogs_spark``; this module is a thin adapter
over klogs_spark.queries.registry().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from klogs_spark.queries import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the canonical klogs question
    (time-range + envelope + map-field filter + count, SURVEY §7 step 2)."""
    from klogs_spark.queries.logs import q_env_map_count

    return q_env_map_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ EXT)."""
    return {name: spec.fn for name, spec in registry().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; ops without SQL-expressible semantics
    are omitted (driver records a rows-only check)."""
    return {
        name: spec.oracle
        for name, spec in registry().items()
        if spec.oracle is not None
    }
