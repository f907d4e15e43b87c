"""Data-quality expectations: one-pass report, row-level split, triage."""

from __future__ import annotations

from pyspark.sql import functions as F

from klogs_spark.expectations import check_report, split_by_expectations


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "info", 10.0),
            (2, "warn", -1.0),   # violates nonneg
            (3, "bogus", 5.0),   # violates domain
            (4, None, None),     # violates domain (NULL) + nonneg (NULL)
        ],
        "id long, level string, v double",
    )


def _checks():
    return [
        ("level_in_domain", F.col("level").isin("info", "warn", "error")),
        ("v_nonnegative", F.col("v") >= 0),
    ]


def test_check_report_counts_null_as_violation(spark):
    rep = {r.check_name: r for r in check_report(_df(spark), _checks()).collect()}
    assert rep["level_in_domain"].n_rows == 4
    assert rep["level_in_domain"].n_violations == 2  # 'bogus' + NULL
    assert rep["v_nonnegative"].n_violations == 2    # -1.0 + NULL
    assert not rep["level_in_domain"].passed


def test_check_report_uniqueness(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, None)], "id long, k string"
    )
    rep = {
        r.check_name: r
        for r in check_report(
            df, checks=[], unique_keys=[("k_unique", F.col("k"))]
        ).collect()
    }
    # one dup beyond first occurrence + one NULL-keyed row (a missing
    # key violates uniqueness; count/count_distinct alone would skip it)
    assert rep["k_unique"].n_violations == 2
    assert not rep["k_unique"].passed


def test_check_report_uniqueness_null_keys_not_exempt(spark):
    # regression: all-NULL duplicate keys must not pass the gate
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, None)], "id long, k string"
    )
    rep = check_report(
        df, checks=[], unique_keys=[("k_unique", F.col("k"))]
    ).collect()[0]
    assert rep.n_violations == 3
    assert not rep.passed


def test_split_by_expectations_partitions_and_triages(spark):
    clean, quar = split_by_expectations(_df(spark), _checks())
    assert {r.id for r in clean.collect()} == {1}
    triage = {r.id: sorted(r._failed_checks) for r in quar.collect()}
    assert triage == {
        2: ["v_nonnegative"],
        3: ["level_in_domain"],
        4: ["level_in_domain", "v_nonnegative"],
    }
    # partition property: every row lands in exactly one side
    assert clean.count() + quar.count() == 4
