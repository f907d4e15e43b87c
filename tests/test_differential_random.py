"""Randomized differential testing: hypothesis-generated filter/agg queries
run through the engine's fluent API vs equivalent SQL in DuckDB.

Complements the fixed oracle suite (test_oracle.py): instead of 40 hand-picked
queries, hundreds of machine-generated predicate combinations over the logs
view — any divergence in filter semantics (time ranges, map lookups, LIKE,
numeric comparisons, null handling) surfaces as a count/sum mismatch.
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from klogs_spark.query import LogsQuery
from klogs_spark.queries.logs import LOGS_CTE
from klogs_spark.views import derive_logs_from_events
from tests.conftest import SF_SMOKE

# sf0.001 keeps each generated example sub-second
_DUCK = None
_LOGS = None


@pytest.fixture(scope="module")
def env(spark):
    global _DUCK, _LOGS
    if _DUCK is None:
        _DUCK = duckdb.connect()
        _DUCK.execute(
            f"CREATE VIEW events AS SELECT * FROM '{SF_SMOKE}/events.parquet'"
        )
    if _LOGS is None:
        _LOGS = derive_logs_from_events(spark, SF_SMOKE).cache()
        _LOGS.count()
    return _DUCK, _LOGS


predicate = st.fixed_dictionaries(
    {
        "day_lo": st.integers(1, 28),
        "day_span": st.integers(0, 27),
        "namespace": st.one_of(st.none(), st.integers(0, 5)),  # 5 = no match
        "app": st.one_of(
            st.none(),
            st.sampled_from(["click", "view", "error", "signup", "purchase"]),
        ),
        "value_op": st.one_of(
            st.none(),
            st.tuples(st.sampled_from([">", "<", ">=", "<=", "="]),
                      st.floats(0, 500, allow_nan=False)),
        ),
        "level": st.one_of(st.none(), st.sampled_from(["info", "warn", "error"])),
        "needle": st.one_of(st.none(), st.sampled_from(
            ["error", "user=1", "k=2", "ok", "zzz-no-match"])),
        "exists_flag": st.booleans(),
    }
)


def _bounds(spec):
    lo = f"2024-01-{spec['day_lo']:02d} 00:00:00"
    hi_day = min(spec["day_lo"] + spec["day_span"], 30)
    hi = f"2024-01-{hi_day:02d} 23:59:59"
    return lo, hi


def _spark_result(logs, spec):
    q = LogsQuery(logs).time_range(*_bounds(spec))
    if spec["namespace"] is not None:
        q = q.where_env(namespace=f"ns-{spec['namespace']}")
    if spec["app"] is not None:
        q = q.where_env(app=spec["app"])
    if spec["value_op"] is not None:
        op, v = spec["value_op"]
        q = q.where_number("value", op, round(v, 2))
    if spec["level"] is not None:
        q = q.where_field_eq("level", spec["level"])
    if spec["needle"] is not None:
        q = q.where_log_contains(spec["needle"])
    if spec["exists_flag"]:
        q = q.where_exists("flag")
    row = q.df.agg(
        F.count(F.lit(1)).alias("c"),
        F.round(F.sum(F.element_at("fields_number", "value")), 2).alias("s"),
    ).collect()[0]
    return row.c, row.s


def _duck_result(duck, spec):
    lo, hi = _bounds(spec)
    where = [f""""timestamp" BETWEEN '{lo}' AND '{hi}'"""]
    if spec["namespace"] is not None:
        where.append(f"namespace = 'ns-{spec['namespace']}'")
    if spec["app"] is not None:
        where.append(f"app = '{spec['app']}'")
    if spec["value_op"] is not None:
        op, v = spec["value_op"]
        where.append(f"f_value {op} {round(v, 2)}")
    if spec["level"] is not None:
        where.append(f"f_level = '{spec['level']}'")
    if spec["needle"] is not None:
        where.append(f"log LIKE '%{spec['needle']}%'")
    if spec["exists_flag"]:
        where.append("f_flag IS NOT NULL")
    sql = (
        LOGS_CTE
        + "SELECT count(*) AS c, round(sum(f_value), 2) AS s FROM logs WHERE "
        + " AND ".join(where)
    )
    return duck.execute(sql).fetchone()


@given(spec=predicate)
@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_random_predicates_match_oracle(env, spec):
    duck, logs = env
    s_cnt, s_sum = _spark_result(logs, spec)
    d_cnt, d_sum = _duck_result(duck, spec)
    assert s_cnt == d_cnt, f"count mismatch for {spec}"
    assert (s_sum is None) == (d_sum is None), f"sum null mismatch for {spec}"
    if s_sum is not None:
        assert s_sum == pytest.approx(d_sum, abs=1e-9), f"sum mismatch {spec}"


# ---------------------------------------------------------------------------
# documents corpus: random text predicates + token aggregates
# ---------------------------------------------------------------------------
_DOCS = None


@pytest.fixture(scope="module")
def docs_env(spark):
    global _DOCS
    duck = duckdb.connect()
    duck.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet'"
    )
    if _DOCS is None:
        from klogs_spark.views import load_table

        _DOCS = load_table(spark, SF_SMOKE, "documents").cache()
        _DOCS.count()
    return duck, _DOCS


doc_predicate = st.fixed_dictionaries(
    {
        "lang": st.one_of(st.none(), st.sampled_from(["en", "de", "fr", "es", "zh"])),
        "source_mod": st.one_of(st.none(), st.integers(0, 4)),
        "chars_lo": st.integers(0, 400),
        "chars_hi_extra": st.integers(0, 300),
        "needle": st.one_of(st.none(), st.sampled_from(
            ["spark", "window", "agg", "zzz-not-there"])),
    }
)


@given(spec=doc_predicate)
@settings(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)
def test_random_document_predicates_match_oracle(docs_env, spec):
    from klogs_spark.ext.text import token_count

    duck, docs = docs_env
    hi = spec["chars_lo"] + spec["chars_hi_extra"]
    sdf = docs.filter(F.col("n_chars").between(spec["chars_lo"], hi))
    where = [f"n_chars BETWEEN {spec['chars_lo']} AND {hi}"]
    if spec["lang"] is not None:
        sdf = sdf.filter(F.col("lang") == spec["lang"])
        where.append(f"lang = '{spec['lang']}'")
    if spec["source_mod"] is not None:
        sdf = sdf.filter(F.col("source") == f"src{spec['source_mod']}")
        where.append(f"source = 'src{spec['source_mod']}'")
    if spec["needle"] is not None:
        sdf = sdf.filter(F.col("text").contains(spec["needle"]))
        where.append(f"contains(text, '{spec['needle']}')")
    row = sdf.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(token_count(F.col("text"))).alias("t"),
    ).collect()[0]
    d_c, d_t = duck.execute(
        "SELECT count(*), sum(len(list_filter(string_split(text,' '), "
        "t -> t <> ''))) FROM documents WHERE " + " AND ".join(where)
    ).fetchone()
    assert row.c == d_c, f"count mismatch for {spec}"
    assert (row.t or 0) == (d_t or 0), f"token sum mismatch for {spec}"
