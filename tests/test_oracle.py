"""Differential gate: every registry query vs its DuckDB oracle at sf0.01.

Replicates the driver's t2 comparison: row count, column names, and
order-insensitive value comparison (rows sorted; columns compared by sorted
name). Exact equality — if a query needs tolerance it must round identically
on both sides instead.
"""

from __future__ import annotations

import math
from datetime import datetime

import pytest

from klogs_spark.queries import registry
from tests.conftest import SF_ORACLE

SPECS = registry()
ORACLE_CASES = [n for n, s in SPECS.items() if s.oracle is not None]

# Dev profile opt-out: the all-registry differential dominates suite time
# (~6 min of the ~8-min run) and is the DRIVER's job to re-check per round.
# `pytest -m "not full_oracle"` runs the fast structural/unit suite while
# iterating; the default (unfiltered) run keeps the full differential —
# CI and the pre-commit gate are unchanged.
pytestmark = pytest.mark.full_oracle


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0/0.0 and float noise already handled by query-side rounding
        return repr(v + 0.0)
    if isinstance(v, datetime):
        return v.isoformat()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def _canon(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="session")
def spark_results(request, spark):
    """Run every SELECTED query's Spark side once, through a bounded
    thread pool — Spark's scheduler is thread-safe and the suite's wall
    clock is dominated by serial job latency at sf0.01 (each query is
    many small jobs on an 8-core local session; 6 concurrent submitters
    keep the scheduler fed). Each query fn isolates its own temp dirs
    (tempfile.mkdtemp) and content-keyed sidecar builds already guard
    against concurrent builders (os.replace / exclusive-create marker).
    The DuckDB side stays serial in-test (one connection, cheap).

    Only queries actually selected this run are computed (``-k`` stays
    fast); results are keyed by name, failures re-raise in the owning
    test so per-query reporting is unchanged."""
    from concurrent.futures import ThreadPoolExecutor

    names = sorted(
        {
            item.callspec.params["name"]
            for item in request.session.items
            if getattr(item, "callspec", None) is not None
            and item.function.__name__ == "test_query_matches_oracle"
        }
    )

    def run(name):
        try:
            sdf = SPECS[name].fn(spark, SF_ORACLE)
            return name, (sdf.columns, [tuple(r) for r in sdf.collect()], None)
        except Exception as exc:  # noqa: BLE001 — re-raised per-test
            return name, (None, None, exc)

    with ThreadPoolExecutor(max_workers=6) as ex:
        return dict(ex.map(run, names))


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_query_matches_oracle(name, spark, duck, spark_results):
    spec = SPECS[name]
    spark_cols, spark_rows, err = spark_results[name]
    if err is not None:
        raise err

    res = duck.execute(spec.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s_canon = _canon(spark_rows, spark_cols)
    d_canon = _canon(duck_rows, duck_cols)
    mism = [
        (a, b) for a, b in zip(s_canon, d_canon) if a != b
    ]
    assert not mism, f"{name}: first value mismatches: {mism[:3]}"


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_emits_no_hugeint(name, duck):
    """Driver-fetch parity guard: DuckDB ``sum()`` over integers returns
    HUGEINT (int128), which the external driver's pandas/arrow fetch mangles
    into float64 ("29.0" vs Spark's "29" -> hash mismatch) even though
    ``fetchall()`` — used by the differential above — returns exact ints.
    Every red CORRECTNESS row in rounds 1-2 was exactly this. Oracles must
    CAST integer sums to BIGINT.
    """
    rel = duck.sql(SPECS[name].oracle)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: oracle emits int128 columns {bad}; "
        "CAST(sum(...) AS BIGINT) — the driver fetch mangles HUGEINT"
    )
