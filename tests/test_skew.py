"""Skew utilities — salted operations must equal their unsalted twins."""

from __future__ import annotations

from pyspark.sql import functions as F

from klogs_spark.ext.skew import salted_join, two_phase_count


def _skewed_fact(spark):
    # 90% of rows share one hot key
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(0, 1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    return hot.union(cold)


def test_salted_join_equals_plain_join(spark):
    fact = _skewed_fact(spark)
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k7", "K7"), ("missing", "M")],
        "k string, label string",
    )
    plain = fact.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(fact, dim, "k", salt=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_two_phase_count_equals_plain_count(spark):
    fact = _skewed_fact(spark)
    plain = {(r.k, r["count"]) for r in fact.groupBy("k").count().collect()}
    two = {(r.k, r.cnt) for r in two_phase_count(fact, ["k"], salt=8).collect()}
    assert two == plain
    assert ("hot", 9000) in two


def test_streaming_dedup_batch_and_stream(spark, tmp_path):
    from datetime import datetime

    from klogs_spark.streaming_ext import dedup_events

    rows = [
        (datetime(2026, 1, 1, 0, 0, i % 3), "p1", f"line-{i % 3}")
        for i in range(9)  # each of 3 distinct events delivered 3x
    ]
    df = spark.createDataFrame(rows, "timestamp timestamp, pod_name string, log string")
    assert dedup_events(df).count() == 3

    src = str(tmp_path / "src")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (
        dedup_events(stream)
        .writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.awaitTermination()
    assert spark.sql("SELECT * FROM dedup_out").count() == 3
