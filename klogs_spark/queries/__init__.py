"""Query registry — every driver-checked query with its DuckDB oracle.

Each module contributes ``SPECS: dict[name -> QuerySpec]``; ``registry()``
merges them. ``__spark_entry__.queries()`` / ``oracle_sql()`` are thin views
over this. Column names of the Spark result and the oracle SQL match exactly
(the driver's compare sorts columns by name before hashing values).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    fn: QueryFn
    oracle: Optional[str]  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str = ""


def registry() -> dict[str, QuerySpec]:
    from . import ext, ingest, logs, tpch

    merged: dict[str, QuerySpec] = {}
    for mod in (logs, tpch, ext, ingest):
        overlap = merged.keys() & mod.SPECS.keys()
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(mod.SPECS)
    return merged
